package graft.examples

import graft.GraftSession
import graft.engine.BucketStore

/** Phase decomposition of the bench's w_http_concurrent entry: where
  * does the NON-JOB wall go — store/api setup, the concurrent client
  * mix, or teardown? (r20 follow-up to HttpWorkloadProfile, which only
  * shows the job-time side.) */
object HttpPhaseProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", "graft-httpphase")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (rep <- 1 to reps) {
      val storeDir = java.nio.file.Files.createTempDirectory("graft-phase").toString
      val (store, tStore) = t(new BucketStore(spark, storeDir))
      val (api, tApi) = t(new graft.engine.HttpApi(store, apiToken = "bench",
        env = Map(
          "RS_RATE_LIMIT_API" -> "1000000000req/h",
          "RS_RATE_LIMIT_INGRESS" -> "100GB/h",
          "RS_RATE_LIMIT_EGRESS" -> "100GB/h",
          "RS_IO_MAX_WRITERS_IN_FLIGHT" -> "2")))
      val (port, tStart) = t(api.start())
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      val payload = Array.fill[Byte](512)('x')
      // per-client phase walls (max across the 4 clients)
      val wWrite = new java.util.concurrent.atomic.AtomicLong(0)
      val wQuery = new java.util.concurrent.atomic.AtomicLong(0)
      val wDrain = new java.util.concurrent.atomic.AtomicLong(0)
      val wMut = new java.util.concurrent.atomic.AtomicLong(0)
      def client(tid: Int): Runnable = () => {
        val http = java.net.http.HttpClient.newHttpClient()
        def req(method: String, path: String, body: Array[Byte],
            headers: Seq[(String, String)] = Nil) = {
          var b = java.net.http.HttpRequest.newBuilder(
              java.net.URI.create(s"http://127.0.0.1:$port/api/v1$path"))
            .header("Authorization", "Bearer bench")
            .method(method,
              java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
          headers.foreach { case (k, v) => b = b.header(k, v) }
          http.send(b.build(),
            java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        }
        val writeHdrs = (0 until 128).map(i =>
          (s"x-reduct-time-${i * 1000}",
            s"${payload.length},application/octet-stream,k=v$i"))
        val body = Array.fill[Byte](128 * payload.length)('x')
        val (_, t1) = t(require(req("POST", s"/b/bench/t$tid/batch", body,
          writeHdrs).statusCode() == 200))
        wWrite.accumulateAndGet((t1 * 1000).toLong, math.max)
        val (q, t2) = t(req("POST", s"/b/bench/t$tid/q", "{}".getBytes("UTF-8")))
        wQuery.accumulateAndGet((t2 * 1000).toLong, math.max)
        val id = "\\d+".r.findFirstIn(new String(q.body(), "UTF-8")).get.toLong
        val (_, t3) = t {
          var last = false
          while (!last) {
            val r = req("GET", s"/b/bench/t$tid/batch?q=$id", Array.empty)
            if (r.statusCode() == 204) last = true
            else last = r.headers().firstValue("x-reduct-last")
              .orElse("true").toBoolean
          }
        }
        wDrain.accumulateAndGet((t3 * 1000).toLong, math.max)
        val (_, t4) = t {
          if (tid % 2 == 0) {
            val updHdrs = (0 until 8).map(i =>
              (s"x-reduct-time-${i * 1000}", "0,,k2=updated"))
            require(req("PATCH", s"/b/bench/t$tid/batch", Array.empty,
              updHdrs).statusCode() == 200)
          } else {
            val rmHdrs = (8 until 16).map(i => (s"x-reduct-time-${i * 1000}", "0"))
            require(req("DELETE", s"/b/bench/t$tid/batch", Array.empty,
              rmHdrs).statusCode() == 200)
          }
        }
        wMut.accumulateAndGet((t4 * 1000).toLong, math.max)
      }
      val (_, tClients) = t {
        (0 until 4).map(tid => pool.submit(client(tid))).foreach(_.get())
      }
      val (_, tStop) = t { pool.shutdownNow(); api.stop() }
      val (_, tClose) = t(store.close())
      val (_, tDel) = t(org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(storeDir)))
      println(f"--- rep $rep: store $tStore%.3f api-ctor $tApi%.3f " +
        f"api-start $tStart%.3f clients $tClients%.3f " +
        f"(write ${wWrite.get / 1000.0}%.3f query ${wQuery.get / 1000.0}%.3f " +
        f"drain ${wDrain.get / 1000.0}%.3f mut ${wMut.get / 1000.0}%.3f) " +
        f"stop $tStop%.3f close $tClose%.3f rm $tDel%.3f")
    }
    spark.stop()
  }
}
