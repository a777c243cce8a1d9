package graft.examples

import graft.engine.BucketStore
import org.apache.spark.sql.functions._

/** Times the many-entry store write under FileOutputCommitter algorithm
  * v1 vs v2 (SCALE.md round-14): a 10k-entry batch creates 10k+
  * partition dirs, and v1's JOB commit moves them serially on the
  * driver while v2 moves files at TASK commit (parallel). Run once per
  * algorithm — the conf is fixed at session creation.
  *
  * Usage: runMain graft.examples.CommitterProbe <1|2> [entries] [threads]
  */
object CommitterProbe {
  def main(args: Array[String]): Unit = {
    val algo = args.headOption.getOrElse("1")
    val entries = if (args.length > 1) args(1).toInt else 10000
    val threads = if (args.length > 2) args(2).toInt else 4
    val spark = graft.GraftSession
      .builder(s"local[$threads]", "graft-committer-probe")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", algo)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val store = new BucketStore(spark,
      java.nio.file.Files.createTempDirectory("graft-committer").toString)
    val rows = spark.range(entries).select(
      lit("big").as("bucket"),
      concat(lit("e"), col("id")).as("entry"),
      col("id").as("ts"),
      map(lit("k"), lit("v")).as("labels"),
      typedLit(Map.empty[String, String]).as("computed_labels"),
      lit("text/plain").as("content_type"),
      lit(graft.core.Records.State.Finished).as("state"),
      lit("x".getBytes).as("payload"))
    val t0 = System.nanoTime()
    store.write(rows)
    println(f"algo=$algo entries=$entries threads=$threads " +
      f"write_secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
