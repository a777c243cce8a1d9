package graft.examples

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of one SparkEntry query — the
  * .explain feedback loop the scale audit uses (args: queryName [sfDir]). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q_tfidf"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
