package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General distributed-analytics operators a curation pipeline leans on
  * around the core dedup/quality stages: per-group top-k, hierarchical
  * rollups, and exact quantiles.
  */
object Analytics {

  /** Top-k rows per group by `orderCols` (descending on the first,
    * `tieBreak` ascending for determinism). Window row_number — one
    * shuffle on the group key; AQE splits skewed groups. At extreme
    * k≪group-size ratios a per-partition pre-prune would cut shuffle
    * volume, but the window form keeps whole-stage codegen and is the
    * idiomatic Spark plan.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, orderCol: String,
      tieBreak: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(tieBreak).asc)
    df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Hierarchical rollup: aggregates at (a, b), (a), and grand-total
    * levels in ONE pass (Catalyst expands the grouping sets without
    * re-reading the input). Null grouping cells surface as "ALL" so the
    * result is join- and compare-friendly.
    */
  def rollupSum(df: DataFrame, a: String, b: String, valueCol: String): DataFrame =
    df.rollup(col(a), col(b))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(38,6)")).cast("double").as("total"))
      .select(
        coalesce(col(a), lit("ALL")).as(a),
        coalesce(col(b), lit("ALL")).as(b),
        col("n"), col("total"))

  /** Fixed-memory distinct-count sketch per group (HyperLogLog++ via
    * `approx_count_distinct`): the 100-TB path where an exact distinct
    * would shuffle one row per distinct value. `rsd` is the target
    * relative standard deviation (Spark default 0.05). Exact twin for
    * verification: `countDistinct`.
    */
  def approxDistinctPerGroup(df: DataFrame, groupCol: String,
      valueCol: String, rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Fixed-memory quantile sketch per group (`percentile_approx`,
    * `accuracy` trades memory for error ≤ 1/accuracy): the scale path
    * behind [[quantilesPerGroup]] — swap in when value cardinality per
    * group no longer fits the exact aggregate.
    */
  def approxQuantilesPerGroup(df: DataFrame, groupCol: String,
      valueCol: String, qs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val arr = array(qs.map(lit): _*)
    df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol), arr, lit(accuracy)).as("pcts"))
      .select(
        Seq(col(groupCol)) ++ qs.zipWithIndex.map { case (q, i) =>
          element_at(col("pcts"), i + 1).as("p" + math.round(q * 100))
        }: _*)
  }

  /** Count pivot: one row per `rowKey`, one column per pivot value of
    * `colKey` (explicit value list — Catalyst then plans ONE aggregate
    * pass with no distinct-values pre-job, and the output schema is
    * static, which a 100-TB pipeline needs for downstream contracts).
    * Missing cells are 0.
    */
  def pivotCounts(df: DataFrame, rowKey: String, colKey: String,
      values: Seq[String]): DataFrame =
    df.groupBy(col(rowKey))
      .pivot(colKey, values)
      .agg(count(lit(1)))
      .na.fill(0, values)

  /** Exact interpolated quantiles of `valueCol` per group (the
    * distribution signal length-trim and quality gates cut against).
    * Spark's `percentile` is a single-pass typed aggregate — one shuffle
    * on the group key; for a fixed-memory sketch at extreme cardinality,
    * swap `percentile` for `percentile_approx` at the call site.
    */
  def quantilesPerGroup(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    val arr = array(qs.map(lit): _*)
    val pct = percentile(col(valueCol), arr)
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), pct.as("pcts"))
      .select(
        Seq(col(groupCol), col("n")) ++
          qs.zipWithIndex.map { case (q, i) =>
            round(element_at(col("pcts"), i + 1), 6)
              .as("p" + math.round(q * 100))
          }: _*)
  }
}
