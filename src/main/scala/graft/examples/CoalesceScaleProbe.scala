package graft.examples

import graft.engine.BucketStore

/** Measures the write-fan-in amortization of cross-request mutation
  * coalescing (MutationCoalescer, SCALE.md r18) at the serving layer:
  * N concurrent clients each POST one v1 batched write (128 records,
  * 64 KiB) through the REAL HTTP façade, vs the same N batches written
  * serially by one client. Without coalescing both cost N store
  * mutations (one ~0.5-0.8 s Spark job each, serialized on the store
  * lock) and concurrency buys nothing; with coalescing the concurrent
  * run folds queued writers into shared jobs, so wall-clock grows with
  * jobs-per-drain, not jobs-per-request.
  *
  * REQUIREs the concurrent run to beat 0.6x of serial — loose enough
  * for scheduler noise (folds are opportunistic: a client that enqueues
  * after the drain starts waits for the next one), strict enough that
  * a regression to one-job-per-request (concurrent ≈ serial, both lock-
  * bound) fails loudly.
  *
  * Usage: runMain graft.examples.CoalesceScaleProbe [clients]
  */
object CoalesceScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(16)
    val spark = graft.GraftSession.builder("local[32]", "graft-coalesce-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val storeDir = java.nio.file.Files.createTempDirectory("graft-coalesce").toString
    val store = new BucketStore(spark, storeDir)
    val api = new graft.engine.HttpApi(store, apiToken = "probe")
    val port = api.start()
    val payload = Array.fill[Byte](512)('x')

    def writeBatch(entry: String): Unit = {
      val http = java.net.http.HttpClient.newHttpClient()
      var b = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/api/v1/b/probe/$entry/batch"))
        .header("Authorization", "Bearer probe")
      for (i <- 0 until 128)
        b = b.header(s"x-reduct-time-${i * 1000}",
          s"${payload.length},application/octet-stream,k=v$i")
      val resp = http.send(
        b.POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(
          Array.fill[Byte](128 * payload.length)('x'))).build(),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      require(resp.statusCode() == 200,
        s"$entry -> ${resp.statusCode()}: ${new String(resp.body())}")
    }

    try {
      writeBatch("warmup") // JIT + first-job costs out of both arms
      val t0 = System.nanoTime()
      for (i <- 0 until n) writeBatch(s"ser$i")
      val serial = (System.nanoTime() - t0) / 1e9

      val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
      val t1 = System.nanoTime()
      val tasks = (0 until n).map(i =>
        pool.submit(new Runnable { def run(): Unit = writeBatch(s"con$i") }))
      tasks.foreach(_.get())
      val concurrent = (System.nanoTime() - t1) / 1e9
      pool.shutdownNow()

      val ratio = concurrent / serial
      println(f"[coalesce-scale] $n batched writes: serial $serial%.2f s, " +
        f"concurrent $concurrent%.2f s -> ${ratio}%.2f x serial " +
        f"(${serial / concurrent}%.1f x speedup from folding)")
      // every record must have landed exactly once in both arms
      val rows = store.table().count()
      require(rows == (2L * n + 1) * 128,
        s"expected ${(2L * n + 1) * 128} rows, got $rows")
      require(ratio < 0.6,
        f"coalescing regressed: concurrent $concurrent%.2f s vs serial " +
          f"$serial%.2f s (ratio $ratio%.2f >= 0.6)")
    } finally {
      api.stop(); store.close()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(storeDir)): Unit
    }
  }
}
