package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing — the "concatenate and chop" context-window
  * preparation of GPT-style pretraining: documents are laid end-to-end in
  * a deterministic order and the token stream is cut into fixed-size
  * packs. Each document's placement is a pure function of the exclusive
  * prefix sum of token counts, so the operator reduces to a distributed
  * scan.
  *
  * The prefix sum is NOT a global-order window (`sum().over(orderBy)`
  * collapses to a single partition — the classic scale killer). It is the
  * textbook two-phase distributed scan: range-partition by the order key,
  * per-partition totals (one small row per partition) to the driver,
  * exclusive partition offsets broadcast back, then a map-only running
  * sum within each partition. Shuffle cost = one range exchange; driver
  * state = one long per partition.
  */
object Packing {

  /** Append `start` = exclusive prefix sum of `valueCol` in `orderCol`
    * order. `orderCol` must be unique (it's the tie-less sort key). */
  def withRunningOffset(df: DataFrame, orderCol: String,
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val ranged = graft.core.Partitioning.pinnedByRange(
        df.withColumn(valueCol, col(valueCol).cast(LongType)),
        col(orderCol))
      .sortWithinPartitions(orderCol)
    val schema = ranged.schema.add("start", LongType, nullable = false)
    val vIdx = ranged.schema.fieldIndex(valueCol)
    // both phases read the ranged data — persist so the range exchange
    // and sort run once, not once per phase (caller may unpersist the
    // result's lineage after materializing)
    val rdd = ranged.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // phase 1: per-partition totals (partition index i holds keys < i+1's)
    val totals = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(vIdx))
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // exclusive partition offsets
    val bcast = spark.sparkContext.broadcast(offsets)
    // phase 2: map-only running sum seeded by the partition's offset
    val packed = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = bcast.value(i)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ s)
        s += r.getLong(vIdx)
        out
      }
    }
    spark.createDataFrame(packed, schema)
  }

  /** Globally-ordered shard assignment for training-data export: range-
    * partition by `orderCol` into `nShards` shards, sort within each, and
    * tag every row with its shard id — so shard files written from this
    * frame are TOTALLY ordered (every key in shard i precedes every key
    * in shard i+1, rows sorted inside each) without a single-partition
    * global sort. This is how a 100-TB curriculum export (quality-ordered
    * shards, deterministic resume points) ships: one range exchange
    * (sampled range boundaries), parallel sorted writes.
    *
    * `df.write.partitionBy("shard")` on the result materializes the
    * layout. Shard BOUNDARIES come from range-partitioner sampling, so
    * they are stable within a run but may shift between runs or after
    * upstream plan changes — resume bookkeeping must key on the sort
    * key ranges actually written (shard manifest), not on shard ids
    * alone.
    */
  def orderedShards(df: DataFrame, orderCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.repartitionByRange(nShards, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("shard", spark_partition_id().cast(LongType))
  }

  /** Deterministic variant of [[orderedShards]]: shard ids derive from
    * the GLOBAL RANK on (orderCol, tieBreak) — `shard = ((rank − 1) ·
    * nShards) div N` — so the assignment is a pure function of the data:
    * stable across runs, plans, partition counts, and engines, which is
    * what resume bookkeeping actually wants ([[orderedShards]]'s sampled
    * range boundaries shift between runs; its scaladoc says so). The
    * price is one extra tiny aggregation pass.
    *
    * Rank comes from the two-phase distributed scan (no global-order
    * window): range-exchange on (orderCol, tieBreak), per-partition
    * counts — ≤ shuffle-partitions rows — exclusive offsets under a
    * window over that tiny table, then a local row_number per
    * partition. `(orderCol, tieBreak)` must totalize the order. Emits
    * `rank` (1-based) and `shard` (0-based), both long; shard sizes
    * differ by at most one row.
    */
  def orderedShardsExact(df: DataFrame, orderCol: String, tieBreak: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    TwoPhase.requireHelperColumnsFree(df,
      "__pid", "__k", "__c", "__off", "__n", "__pos")
    TwoPhase.positioned(df, Nil, Seq(col(orderCol), col(tieBreak)))
      .withColumn("rank", col("__pos").cast(LongType))
      .withColumn("shard", expr(s"((rank - 1) * $nShards) DIV __n"))
      .select(df.columns.map(col) :+ col("rank") :+ col("shard"): _*)
  }

  /** Pack documents into fixed `budget`-token windows: (…, n_tokens,
    * start, pack_id, offset) where `pack_id` is the window holding the
    * document's FIRST token and `offset` its position there — a document
    * straddling a boundary continues into the next pack, exactly like
    * concatenate-and-chop pretraining batches. */
  def packSequences(docs: DataFrame, budget: Long,
      idCol: String = "doc_id", tokensCol: String = "n_tokens"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    withRunningOffset(docs, idCol, tokensCol)
      // integer DIV, not float /: doubles lose exactness past 2^53 —
      // reachable token offsets for a 100 TB corpus
      .withColumn("pack_id", expr(s"start DIV ${budget}L"))
      .withColumn("offset", expr(s"start % ${budget}L"))
  }
}
