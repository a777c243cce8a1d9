package graft.examples

import graft.GraftSession
import graft.core.Records
import graft.engine.{BucketStore, QuerySpec}

/** Times the pieces of a label PATCH on the bench's workload shape to
  * localize per-patch cost (r15: w_update_labels drifted 1.8 → 2.8 s at
  * sf0.01 across the review-fix + update-log batches). */
object PatchCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[32]", "patch-cost-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val records = Records.fromEvents(
      spark.read.parquet(s"$sfDir/events.parquet")).cache()
    records.count()
    for (i <- 1 to 3) {
      val store = new BucketStore(spark,
        java.nio.file.Files.createTempDirectory("patch-probe").toString)
      timed(s"run$i store.write") { store.write(records) }
      timed(s"run$i updateLabels") {
        store.updateLabels(QuerySpec(), set = Map("key" -> "value2")): Unit
      }
      timed(s"run$i updateLabels2") {
        store.updateLabels(QuerySpec(), set = Map("key" -> "value3")): Unit
      }
    }
    spark.stop()
  }
}
