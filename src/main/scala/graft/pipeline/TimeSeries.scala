package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics over the raw event stream — the operations a
  * user of a timestamped record store (reference: ReductStore's
  * µs-keyed entries, `storage.proto:38`) runs downstream of the store:
  * sessionization, as-of joins, tumbling rollups, gap fill, and
  * deviation-based anomaly flags.
  *
  * Scale notes (100 TB): every operator here shuffles AT MOST once, on
  * its natural key (`user_id` / `event_type`), and every per-key pass is
  * a single window scan — no self-joins, no per-key driver loops. Double
  * aggregations route through `DECIMAL(38,6)` partial sums so results are
  * order-independent (bit-identical across engines and across retries at
  * any parallelism), then surface as doubles.
  */
object TimeSeries {

  private val Dec = "decimal(38,6)"

  /** Deterministic event ordering within equal timestamps. */
  private def eventOrder: Seq[Column] = Seq(col("ts_us"), col("event_id"))

  private def withTsUs(events: DataFrame): DataFrame =
    events.withColumn("ts_us", graft.core.Records.eventTsUs(events))

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than `gapUs`. One shuffle (by `user_id`), two window scans
    * over the same partitioning (Catalyst reuses the exchange), then a
    * partial-aggregated groupBy on (user, session).
    *
    * Output: one row per session with start/end (µs), event count, and an
    * order-independent decimal sum of `value`.
    */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(eventOrder: _*)
    val prevTs = lag(col("ts_us"), 1).over(byUser)
    val isNew = when(prevTs.isNull || col("ts_us") - prevTs > gapUs, 1L)
      .otherwise(0L)
    withTsUs(events)
      .withColumn("session_idx", sum(isNew).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts_us")).as("session_start"),
        max(col("ts_us")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast("double").as("sum_value"))
  }

  /** As-of join expressed as a single interleaved window scan (the
    * scalable formulation: tag both sides, sort once per key, carry the
    * left side forward) rather than a per-row lookup join. For every
    * `rightType` event, attaches the value and timestamp of the latest
    * STRICTLY EARLIER `leftType` event of the same user.
    *
    * One shuffle on `user_id`; no join node at all — `.explain` shows a
    * single Window over one Exchange, which is the plan an as-of join
    * should have at 100 TB (a lookup-join formulation would shuffle both
    * sides AND build a per-key index).
    */
  def asofJoin(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(eventOrder: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val leftVal = when(col("event_type") === leftType, col("value"))
    val leftTs = when(col("event_type") === leftType, col("ts_us"))
    withTsUs(events)
      .where(col("event_type").isin(leftType, rightType))
      .withColumn("asof_value", last(leftVal, ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(leftTs, ignoreNulls = true).over(w))
      .where(col("event_type") === rightType)
      .select(col("event_id"), col("user_id"), col("ts_us").as("ts"),
        col("value"), col("asof_value"), col("asof_ts"))
  }

  /** Tumbling-window rollup per event type: count / decimal sum / min /
    * max of `value` per `widthUs` bucket. Pure groupBy — partial
    * aggregation map-side, one shuffle on (type, bucket); the natural
    * downsampling query over a µs-keyed store.
    */
  def tumblingRollup(events: DataFrame, widthUs: Long): DataFrame =
    withTsUs(events)
      .withColumn("bucket_ts", col("ts_us") - col("ts_us") % widthUs)
      .groupBy(col("event_type"), col("bucket_ts"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Regular-grid downsample with forward fill: per event type, one row
    * per `stepUs` tick from the type's first tick to its last, carrying
    * the latest observed value forward into empty ticks.
    *
    * Shape: (1) one groupBy collapses events to at most one row per
    * occupied tick (`max_by` keeps the in-tick latest); (2) the tick grid
    * generates from each type's min/max via `sequence` — grid size is
    * (span / step) per type, independent of event count, so the explode
    * is bounded by time span, not data volume; (3) one window scan
    * forward-fills. Two shuffles total (tick agg, fill window).
    */
  def gapFill(events: DataFrame, stepUs: Long): DataFrame = {
    val ev = withTsUs(events)
      .withColumn("tick", col("ts_us") - col("ts_us") % stepUs)
    val perTick = ev.groupBy(col("event_type"), col("tick"))
      .agg(max_by(col("value"), struct(eventOrder: _*)).as("tick_value"))
    val grid = ev.groupBy(col("event_type"))
      .agg(min(col("tick")).as("t0"), max(col("tick")).as("t1"))
      .select(col("event_type"),
        explode(sequence(col("t0"), col("t1"), lit(stepUs))).as("tick"))
    val fill = Window.partitionBy(col("event_type")).orderBy(col("tick"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perTick, Seq("event_type", "tick"), "left")
      .withColumn("value", last(col("tick_value"), ignoreNulls = true).over(fill))
      .withColumn("filled", col("tick_value").isNull)
      .drop("tick_value")
  }

  /** Deviation-based anomaly flags: events whose value sits more than
    * `nSigma` sample standard deviations from their type's mean. The
    * moments come from decimal partial sums (sum, sum of squares, count)
    * so mean/σ are order-independent; the per-type moments broadcast back
    * onto the stream (tiny dimension — one row per event type).
    */
  def anomalies(events: DataFrame, nSigma: Double): DataFrame = {
    val moments = withTsUs(events).groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(Dec)).cast("double").as("s1"),
        sum((col("value") * col("value")).cast(Dec)).cast("double").as("s2"))
      .where(col("n") > 1)
      .select(col("event_type"),
        (col("s1") / col("n")).as("mean"),
        sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
          (col("n") - 1)).as("sigma"))
    withTsUs(events)
      .join(broadcast(moments), Seq("event_type"))
      .where(abs(col("value") - col("mean")) > lit(nSigma) * col("sigma"))
      .select(col("event_id"), col("event_type"), col("ts_us").as("ts"),
        col("value"),
        round((col("value") - col("mean")) / col("sigma"), 6).as("z"))
  }
}
