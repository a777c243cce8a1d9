package graft.examples

import graft.GraftSession
import graft.engine.{BucketStore, HttpApi}

/** Prices the replica's two serving-side loops (VERDICT r18 #6):
  *
  *  1. `$system` event forwarding: a replica flush forwards the whole
  *     event burst to the primary — since r20 as ONE multi-entry io-v2
  *     batch (one primary mutation per flush; r19 shipped one POST per
  *     event, ~21 primary drains per 25 events on loopback at 0.29-0.40
  *     s/event). This probe generates usage traffic across N buckets,
  *     times flushUsageNow(), and REQUIREs the per-event wall stays
  *     under 0.1 s — a per-event-mutation dispatch fails it; the
  *     batched flush passes because N events cost one store job.
  *  2. Replica read latency while the primary writes steadily: times
  *     100 replica table-count reads against a live write loop and
  *     prints p50/p95 (pinning the readConsistent retry path's cost
  *     under churn; correctness is ReplicaCompactionSpec's racing
  *     spec).
  */
object ReplicaForwardProbe {
  def main(args: Array[String]): Unit = {
    val nBuckets = if (args.nonEmpty) args(0).toInt else 24
    // r20 batched flush: one primary mutation per flush → the per-event
    // wall is the batch job cost / N. The bound is a regression guard
    // (VERDICT r19 #4: ≤0.1 s/event on loopback), not a target.
    val maxPerEvent = if (args.length > 1) args(1).toDouble else 0.1
    val spark = GraftSession.builder("local[8]", "graft-replica-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-fwd-probe").toString
    val primary = new BucketStore(spark, root)
    val primaryApi = new HttpApi(primary, apiToken = "shared")
    val pPort = primaryApi.start()
    val replica = new BucketStore(spark, root, readOnly = true)
    val api = new HttpApi(replica, apiToken = "shared",
      env = Map("RS_INSTANCE_ROLE" -> "REPLICA",
        "RS_PRIMARY_URL" -> s"http://127.0.0.1:$pPort",
        "RS_SYSTEM_EVENTS_REMOTE_TIMEOUT" -> "10"))
    api.start()
    try {
      // warm-up: absorb session/store cold start (first mutation pays
      // settings read, empty-store scans, codegen) so the timed flush
      // measures the steady-state the 60 s flusher actually lives in
      replica.usage.countRead("warm", "e", 1L, 8L)
      api.flushUsageNow()
      val warmed = primary.readConsistent {
        primary.table().filter(org.apache.spark.sql.functions.col("bucket") === "$system").count()
      }
      // --- 1. forwarder flush: one usage event per touched bucket
      for (b <- 0 until nBuckets)
        replica.usage.countRead(s"bucket$b", "e", 3L, 1024L)
      val t0 = System.nanoTime()
      api.flushUsageNow()
      val flushS = (System.nanoTime() - t0) / 1e9
      val landed = primary.readConsistent {
        primary.table().filter(org.apache.spark.sql.functions.col("bucket") === "$system").count()
      } - warmed
      // usage/total + one per bucket
      require(landed >= nBuckets,
        s"expected >= $nBuckets forwarded events, found $landed")
      val perEvent = flushS / landed
      println(f"[probe] forwarded $landed events in $flushS%.2f s " +
        f"(${perEvent}%.3f s/event, ${landed / flushS}%.1f events/s)")
      require(perEvent < maxPerEvent,
        f"forward flush backs up the flusher: $perEvent%.3f s/event " +
          "(serial per-event mutation regression?)")
      // --- 2. replica read latency while the primary writes
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val writer = new Thread(() => {
        var i = 0
        while (!stop.get()) {
          primary.writeBatch("load", "e", Seq(((i + 1).toLong,
            Map.empty[String, String], "x".getBytes("UTF-8"))))
          i += 1
        }
      })
      writer.start()
      val lat = new Array[Double](100)
      for (i <- lat.indices) {
        val r0 = System.nanoTime()
        replica.readConsistent { replica.table().count() }
        lat(i) = (System.nanoTime() - r0) / 1e9
      }
      stop.set(true); writer.join(30000)
      val s = lat.sorted
      println(f"[probe] replica read under churn: p50 ${s(49)}%.3f s " +
        f"p95 ${s(94)}%.3f s max ${s.last}%.3f s")
    } finally {
      api.stop(); primaryApi.stop(); primary.close()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root)): Unit
    }
    spark.stop()
  }
}
