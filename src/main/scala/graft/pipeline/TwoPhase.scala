package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared two-phase per-group top-k: phase 1 keeps the local k best
  * within each (group, chunk) — valid for ANY chunking, since the global
  * top-k is always a subset of the union of per-chunk top-ks — and
  * phase 2 ranks the ≤ k × nChunks survivors. No task ever sorts more
  * than a chunk, and the final window touches a bounded set regardless
  * of data volume. One definition so the chunk-prune invariant lives in
  * one place (Analytics.topKPerGroup and Sampling.stratifiedExactK both
  * lower through here).
  */
private[pipeline] object TwoPhase {

  /** The lowerings stage intermediate state in `__`-prefixed columns; an
    * input that already carries one would be silently clobbered — refuse
    * loudly instead. */
  def requireHelperColumnsFree(df: DataFrame, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has reserved helper column(s) ${clash.mkString(", ")}")
  }

  /** `orderCols` must totalize the order within a group for the result
    * to be deterministic (the same contract the naive window form had).
    * `chunk` is any deterministic expression; uniform hashes chunk best. */
  def boundedTopK(df: DataFrame, groupCols: Seq[Column],
      orderCols: Seq[Column], k: Int, chunk: Column,
      rankName: String, rankAsLong: Boolean): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireHelperColumnsFree(df, "__chunk", "__lr")
    val wLocal = Window.partitionBy(groupCols :+ col("__chunk"): _*)
      .orderBy(orderCols: _*)
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    val rank0 = row_number().over(w)
    val rank = if (rankAsLong) rank0.cast("long") else rank0
    df.withColumn("__chunk", chunk)
      .withColumn("__lr", row_number().over(wLocal))
      .where(col("__lr") <= k)
      .withColumn(rankName, rank)
      .where(col(rankName) <= k)
      .drop("__chunk", "__lr")
  }
}
