package graft.examples

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing for the many-entries write path: where do the
  * minutes go when one batch fans out into N (bucket, entry, dt)
  * partition dirs? (The 10k-entry HttpApiSpec runs ~7 min; this probe
  * separates the write job, the commit, and the read-back aggregate so
  * the fix targets the real cost.)
  *
  * Usage: runMain graft.examples.WriteScaleProbe [nEntries] [codec]
  */
object WriteScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 10000
    val modes = if (args.length > 1) args.drop(1).toSeq else Seq("store")
    val b = SparkSession.builder()
      .master("local[32]")
      .appName("write-scale-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
    // A/B hook: GRAFT_PROBE_RAWFS=1 swaps file:// to RawLocalFileSystem
    // (no client-side .crc siblings → half the file creates per write).
    // Build-time config so the FileSystem cache never sees the default.
    if (sys.env.get("GRAFT_PROBE_RAWFS").contains("1"))
      b.config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rows = spark.range(n).select(
      lit("big").as("bucket"),
      concat(lit("e"), col("id")).as("entry"),
      col("id").as("ts"),
      map(lit("k"), lit("v")).as("labels"),
      typedLit(Map.empty[String, String]).as("computed_labels"),
      lit("text/plain").as("content_type"),
      lit(graft.core.Records.State.Finished).as("state"),
      lit("x".getBytes).as("payload"))
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val hc = spark.sparkContext.hadoopConfiguration
    for (mode <- modes) {
      val root = Files.createTempDirectory(s"graft-wp-$mode").toString
      mode match {
        case "store" =>
          val store = new graft.engine.BucketStore(spark, root)
          time(s"store.write n=$n")(store.write(rows))
        case "manybuckets" => // the 300-bucket /info spec's write shape
          val store = new graft.engine.BucketStore(spark, root)
          val r2 = spark.range(n).select(
            concat(lit("b"), col("id")).as("bucket"),
            lit("e").as("entry"),
            (col("id") + 5).as("ts"),
            map(lit("k"), lit("v")).as("labels"),
            typedLit(Map.empty[String, String]).as("computed_labels"),
            lit("text/plain").as("content_type"),
            lit(graft.core.Records.State.Finished).as("state"),
            lit("x".getBytes).as("payload"))
          time(s"store.write buckets=$n")(store.write(r2))
          time("table read-back") {
            println("  rows=" + store.table().count())
          }
        case "events" | "eventsraw" => // the w_write shape: sf0.1 events
          val records = graft.core.Records.fromEvents(
            spark.read.parquet("/root/testdata/sf0.1/events.parquet")).cache()
          records.count()
          for (i <- 1 to 2) {
            val r2 = Files.createTempDirectory(s"graft-wp-ev$i").toString
            if (mode == "events") {
              val store = new graft.engine.BucketStore(spark, r2)
              time(s"store.write events run$i")(store.write(records))
            } else time(s"raw unpinned events run$i") {
              records.withColumn("dt",
                  to_date(timestamp_micros(col("ts"))))
                .repartition(col("bucket"), col("entry"), col("dt"))
                .write.partitionBy("bucket", "entry", "dt")
                .mode("append").parquet(r2)
            }
          }
          records.unpersist()
        case "raw" => // the writer shape store.write uses, no checks
          time(s"raw zstd n=$n") {
            rows.withColumn("dt", lit("1970-01-01"))
              .repartition(col("bucket"), col("entry"), col("dt"))
              .write.partitionBy("bucket", "entry", "dt")
              .mode("append").parquet(root)
          }
        case "snappy" | "uncompressed" =>
          time(s"raw $mode n=$n") {
            rows.withColumn("dt", lit("1970-01-01"))
              .repartition(col("bucket"), col("entry"), col("dt"))
              .write.partitionBy("bucket", "entry", "dt")
              .option("compression", mode)
              .mode("append").parquet(root)
          }
        case "nodict" =>
          time(s"raw zstd nodict n=$n") {
            rows.withColumn("dt", lit("1970-01-01"))
              .repartition(col("bucket"), col("entry"), col("dt"))
              .write.partitionBy("bucket", "entry", "dt")
              .option("parquet.enable.dictionary", "false")
              .mode("append").parquet(root)
          }
        case "v2commit" =>
          val old = hc.get("mapreduce.fileoutputcommitter.algorithm.version")
          hc.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
          try time(s"raw zstd v2commit n=$n") {
            rows.withColumn("dt", lit("1970-01-01"))
              .repartition(col("bucket"), col("entry"), col("dt"))
              .write.partitionBy("bucket", "entry", "dt")
              .mode("append").parquet(root)
          } finally if (old == null)
            hc.unset("mapreduce.fileoutputcommitter.algorithm.version")
          else hc.set("mapreduce.fileoutputcommitter.algorithm.version", old)
      }
    }
    spark.stop()
  }
}
