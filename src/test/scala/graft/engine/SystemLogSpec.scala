package graft.engine

import graft.SparkTestBase
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** `$system` diagnostics writer: the batched `events()` path must stay
  * ONE store write regardless of batch size — the usage family emits one
  * event per bucket, so a per-event write makes the 60-second flusher
  * O(buckets) Spark jobs (measured ~1.5 s each: a 300-bucket instance
  * took 7.5 min to flush and a 10k-bucket one could never drain). */
class SystemLogSpec extends AnyFunSuite with SparkTestBase {

  /** Spark jobs started while `f` runs (listener-bus flushed before
    * counting). */
  private def countJobs(f: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try { f; Thread.sleep(500) } // jobs start synchronously; let the bus drain
    finally spark.sparkContext.removeSparkListener(listener)
    jobs.get()
  }

  test("events(batch) lands every event in ONE write, ts in sequence order") {
    val store = new BucketStore(spark,
      Files.createTempDirectory("graft-syslog").toString)
    val syslog = new SystemLog(store, "srv", None)
    val base = 1_700_000_000_000_000L
    val batch = (0 until 50).map { i =>
      // same nowUs on purpose: the shared clock must fan them out into
      // strictly-increasing microseconds in sequence order
      SystemLog.Event("usage", if (i == 0) "total" else s"b$i", 200,
        s"""{"event_type":"usage_stats","i":$i}""", base)
    }
    val jobs = countJobs { assert(syslog.events(batch)) }
    val rows = store.table()
      .filter(col("bucket") === "$system" && col("entry").startsWith("usage/"))
      .select("entry", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    assert(rows.length == 50)
    // sequence order: the leading total takes the smallest ts, b1..b49
    // follow each on the next strictly-increasing microsecond
    assert(rows.head._1 == "usage/srv/total" && rows.head._2 == base)
    assert(rows.map(_._2).toSeq == (base until base + 50))
    assert(rows.map(_._1).drop(1).toSeq ==
      (1 until 50).map(i => s"usage/srv/b$i"))
    // one writeWithSettings = a handful of jobs (commit/read-back), not
    // one-plus per event; the per-event shape needs >= 50
    assert(jobs <= 15, s"batched events() started $jobs jobs")
  }

  test("flushUsage job count is bounded, not O(buckets)") {
    import scala.jdk.CollectionConverters._
    val store = new BucketStore(spark,
      Files.createTempDirectory("graft-usage-flush").toString)
    val n = 20
    val rows = (0 until n).map(i => org.apache.spark.sql.Row(
      s"b$i", "e", 1_700_000_000_000_000L + i,
      Map.empty[String, String], Map.empty[String, String],
      "text/plain", graft.core.Records.State.Finished,
      Array[Byte](120)))
    store.write(spark.createDataFrame(rows.asJava, graft.core.Records.schema))
    val syslog = new SystemLog(store, "srv", None)
    val jobs = countJobs {
      graft.lifecycle.Lifecycle.flushUsage(store, syslog, 60.0)
    }
    val events = store.table()
      .filter(col("bucket") === "$system" && col("entry").startsWith("usage/"))
      .count()
    assert(events == n + 1) // total + one per user bucket
    assert(jobs < n, s"flushUsage started $jobs jobs for $n buckets " +
      "(per-bucket writes would need >= one job each)")
  }
}
