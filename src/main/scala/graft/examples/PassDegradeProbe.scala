package graft.examples

import graft.{GraftSession, SparkEntry}
import graft.core.Records
import graft.engine.{BucketStore, QueryEngine, QuerySpec}
import org.apache.spark.sql.functions._

/** Bisects the round-15 bench finding: events-family queries (q_logic
  * et al) run ~5x slower in bench passes AFTER the store workload — a
  * session-global degradation the workload leaves behind. Times one
  * representative query after each workload step to find the culprit. */
object PassDegradeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", "pass-degrade-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeQ(label: String): Unit = {
      // min of 2, like the bench
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries("q_logic")(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] q_logic after $label%-28s: ${ts.min}%.3f s (runs: ${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    // warm up
    SparkEntry.queries("q_logic")(spark, sfDir).count()
    timeQ("warmup")

    val records = Records.fromEvents(
      spark.read.parquet(s"$sfDir/events.parquet")).cache()
    records.count()
    timeQ("records.cache")

    val storeDir = java.nio.file.Files.createTempDirectory("probe-store").toString
    val store = new BucketStore(spark, storeDir)
    timeQ("new BucketStore")

    store.write(records)
    timeQ("store.write")

    QueryEngine.query(store.table(), QuerySpec())
      .agg(sum(length(col("payload")))).collect()
    timeQ("read_payload")

    store.updateLabels(QuerySpec(), set = Map("key" -> "value2"))
    timeQ("updateLabels")

    store.removeQuery(QuerySpec(when = Some("""{"$each_n": 2}""")))
    timeQ("removeQuery")

    records.unpersist()
    timeQ("records.unpersist")

    graft.pipeline.Staging.unstageAll()
    timeQ("unstageAll")

    spark.stop()
  }
}
