package graft.examples

import org.apache.spark.sql.SparkSession

/** Prints the session defaults the scale notes rely on (dev tool). */
object ConfCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (k <- Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled",
      "spark.sql.adaptive.enabled"))
      println(s"$k = " +
        (try spark.conf.get(k) catch { case _: Exception => "<unset>" }))
    spark.stop()
  }
}
