package graft.examples

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Time one SparkEntry query N times in a warm session (args: name [sf] [n]). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q_tfidf"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 0 until n) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(name)(spark, dir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
    }
    spark.stop()
  }
}
