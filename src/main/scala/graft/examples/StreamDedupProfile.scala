package graft.examples

import graft.core.Records
import graft.stream.StatefulStream
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Throughput probe for the streaming near-dup suppressor (dev tool):
  * feeds the documents corpus through [[StatefulStream.dedupNearMinhash]]
  * as one AvailableNow pass (per-source entries → 20 state keys) and
  * prints records/s plus the survivor count. The stateful step is a
  * per-key signature compare against a bounded history, so throughput
  * tracks corpus size / key parallelism, not history depth. */
object StreamDedupProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import scala.jdk.CollectionConverters._

    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
    val n = docs.length
    val src = java.nio.file.Files.createTempDirectory("sdp-src").toString
    val rows = docs.map { r =>
      Row("b", r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        Map.empty[String, String], Map.empty[String, String], "",
        Records.State.Finished, r.getAs[String]("text").getBytes("UTF-8"))
    }.toSeq.asJava
    spark.createDataFrame(rows, Records.schema)
      .write.mode("overwrite").parquet(src)

    val out = java.nio.file.Files.createTempDirectory("sdp-out").toString
    val ck = java.nio.file.Files.createTempDirectory("sdp-ck").toString
    val t0 = System.nanoTime()
    StatefulStream.dedupNearMinhash(
        spark.readStream.schema(Records.schema).parquet(src),
        decode(col("payload"), "UTF-8"), simThreshold = 0.7)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val kept = spark.read.parquet(out).count()
    println(f"streaming near-dup: $n records in $secs%.2fs " +
      f"(${n / secs}%.0f rec/s), $kept survivors")
    spark.stop()
  }
}
