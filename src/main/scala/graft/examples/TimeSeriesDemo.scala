package graft.examples

import graft.pipeline.{Analytics, TimeSeries}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Downstream time-series analytics over the raw event stream: the
  * operations a store user runs after retrieval — sessionization, as-of
  * joins, rollups/downsampling, gap fill, rates, interval correlation,
  * and anomaly flags. Every stage is one keyed shuffle or less.
  */
object TimeSeriesDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = spark.read.parquet(s"$sf/events.parquet")

    val sessions = TimeSeries.sessionize(events, gapUs = 1800000000L)
    println(s"sessions (30 min gap): ${sessions.count()}")
    sessions.agg(avg("n_events"), max("n_events")).show()

    val asof = TimeSeries.asofJoin(events, "click", "purchase")
    println(s"purchases with a prior click: " +
      s"${asof.filter(col("asof_value").isNotNull).count()} of ${asof.count()}")

    val hourly = TimeSeries.tumblingRollup(events, widthUs = 3600000000L)
    println(s"hourly rollup rows: ${hourly.count()}")

    val filled = TimeSeries.gapFill(events, stepUs = 900000000L)
    println(s"15-min grid rows: ${filled.count()} " +
      s"(${filled.filter(col("filled")).count()} forward-filled)")

    val rates = TimeSeries.derivative(events)
    rates.groupBy("event_type").agg(
      round(min("rate"), 2).as("min_rate"),
      round(max("rate"), 2).as("max_rate")).orderBy("event_type").show()

    val near = TimeSeries.intervalJoin(events, "purchase", "click",
      beforeUs = 21600000000L, afterUs = 21600000000L)
    println(s"purchase-click pairs within 6 h (same user): ${near.count()}")

    val anomalies = TimeSeries.anomalies(events, nSigma = 3.0)
    println(s"3-sigma outliers: ${anomalies.count()}")

    val pivot = Analytics.pivotCounts(
      events.select(
        (graft.core.Records.eventTsUs(events) / 86400000000L).cast("long")
          .as("day"), col("event_type")),
      "day", "event_type",
      Seq("click", "view", "purchase", "signup", "error"))
    println(s"daily pivot: ${pivot.count()} days")
    spark.stop()
  }
}
