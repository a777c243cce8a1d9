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
private[graft] object TwoPhase {

  /** The lowerings stage intermediate state in `__`-prefixed columns; an
    * input that already carries one would be silently clobbered — refuse
    * loudly instead. */
  def requireHelperColumnsFree(df: DataFrame, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has reserved helper column(s) ${clash.mkString(", ")}")
  }

  /** Default per-group row bound for the adaptive naive/chunked switch:
    * a window sort of ~1M rows sits comfortably in one task (tens of MB
    * — far under an executor slot's memory at any sane config), while
    * the chunked lowerings' boundary-pass + routing tax costs real time
    * at small scale (driver bench r11: 2-5× on the lowered ops vs their
    * plain-window r10 forms). Above the bound, one task per group is the
    * 100-TB serialization hazard the chunked forms exist to remove. */
  val NaiveMaxRows: Long = 1L << 20

  /** Byte budget gating the exact probe: inputs whose OPTIMIZER size
    * estimate exceeds this never pay a probe job — they take the chunked
    * branch outright, since chunked is correct at every scale and its
    * boundary-pass tax is amortized by exactly the data volumes that
    * exceed the budget. Inputs under the budget pay one probe scan that
    * is, by the same estimate, pinned under the budget — so a one-shot
    * 100 TB pipeline runs ZERO probe jobs while the small/mid inputs
    * where the naive window actually wins keep the exact decision.
    * `SizeInBytesOnlyStatsVisitor` never shrinks a filter's child and
    * scales projections by column width, so the estimate is conservative
    * for the probe's own column-pruned scan. */
  val ProbeByteBudget: Long = 1L << 30

  /** Caller cardinality hints, expressed through the `naiveMaxRows`
    * parameter every adaptive operator already exposes — no probe job
    * runs for either. */
  object ProbeHint {
    /** Caller asserts every group fits one task: plain window. */
    val Naive: Long = Long.MaxValue
    /** Caller asserts groups may exceed any task: chunked lowering. */
    val Chunked: Long = 0L
  }

  /** Exact plan-time probe: the largest per-group row count (0 for an
    * empty frame) — a count-aggregate job, column-pruned to the group
    * keys and map-side combined. [[useChunked]] only runs it when the
    * input's size statistic fits [[ProbeByteBudget]]; callers wanting
    * the unconditional exact decision can invoke it directly. */
  def maxGroupRows(df: DataFrame, keys: Seq[Column]): Long = {
    val r = df.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n"))).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** The optimizer's size-in-bytes estimate for `df` (file-relation
    * bytes × projection width ratios; filters never shrink it without
    * CBO). Saturates to Long.MaxValue. */
  def statsBytes(df: DataFrame): Long = {
    val s = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (s.isValidLong) s.toLong else Long.MaxValue
  }

  /** Data fingerprint for the probe memo: folds every file relation's
    * listed size + file count (a fresh read of a grown directory lists
    * fresh files, so in-place growth re-probes under an IDENTICAL
    * canonical plan) and every local relation's row count.
    *
    * LIFETIME CONTRACT: the fingerprint is exactly as fresh as the
    * caller's FileIndex. A DataFrame re-created per call (`spark.read`,
    * every BucketStore path) re-lists and re-probes — the spec pins
    * this. A long-lived DataFrame OBJECT held across in-place appends
    * keeps its cached listing, so its fingerprint — and hence the memoed
    * branch verdict — stays at the listing's snapshot until the holder
    * re-reads (or `spark.catalog.refreshByPath` invalidates the
    * relation cache). That is Spark's own staleness semantics for held
    * frames, not an extra window this memo introduces. */
  private def dataFingerprint(df: DataFrame): Long = {
    var h = -3750763034362895579L // FNV-1a offset basis
    def mix(x: Long): Unit = { h ^= x; h *= 1099511628211L }
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            mix(fs.location.sizeInBytes)
            fs.location match {
              // file count from the CACHED listing — inputFiles would
              // materialize a fresh path-string array per call, real
              // garbage at millions of files
              case pa: org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex =>
                mix(pa.allFiles().length.toLong)
              case _ => ()
            }
          case other => mix(other.sizeInBytes)
        }
      case lrel: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        mix(lrel.data.length.toLong)
      case _ =>
    }
    h
  }

  /** Probe memo, keyed on the CANONICALIZED analyzed plan + keys +
    * bound + a [[dataFingerprint]]: a bench/serving loop re-running the
    * same query re-pays the probe job otherwise (3x per bench entry:
    * warmup + two passes), while the fingerprint makes a stale verdict
    * self-healing — data growing in place under an identical plan keys
    * a fresh probe instead of re-creating the one-task hazard the
    * chunked branch exists to remove. The key holds TWO independent
    * 32-bit digests of the canonicalized plan — structural hashCode and
    * rendered-string hashCode — plus the schema, not the plan OBJECT
    * (which would pin up to 1024 full trees, including LocalRelation
    * row data, in a static map); joint collision of both digests AND
    * the schema is ~2^-64. Access-ordered with eldest-entry eviction at
    * the cap, so a long-lived process recycles one stale slot at a time
    * instead of thundering a full re-probe. */
  private val probeMemo =
    new java.util.LinkedHashMap[(Int, Int, String, String, Long), java.lang.Boolean](
        64, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, Int, String, String, Long), java.lang.Boolean]): Boolean =
        size() > 1024
    }

  /** Memoized probe evaluation (see [[probeMemo]]); `tag` distinguishes
    * probes over the same input plan. `compute` runs OUTSIDE the memo
    * lock (it launches a Spark job); a racing duplicate probe is benign. */
  def memoProbe(df: DataFrame, tag: String, compute: () => Boolean): Boolean = {
    val canon = df.queryExecution.analyzed.canonicalized
    val memoKey = (canon.hashCode(), canon.toString.hashCode,
      df.schema.treeString, tag, dataFingerprint(df))
    val cached = probeMemo.synchronized(probeMemo.get(memoKey))
    if (cached != null) cached.booleanValue()
    else {
      val v = compute()
      probeMemo.synchronized(probeMemo.put(memoKey, java.lang.Boolean.valueOf(v)))
      v
    }
  }

  /** The switch itself: chunked when forced (`naiveMaxRows <= 0`, the
    * [[ProbeHint.Chunked]] hint), plain when the caller vouches for the
    * cardinality (`Long.MaxValue`, the [[ProbeHint.Naive]] hint — no
    * probe job), chunked WITHOUT probing when the input's size estimate
    * exceeds `probeByteBudget`, and exactly probed otherwise. */
  def useChunked(df: DataFrame, keys: Seq[Column], naiveMaxRows: Long,
      probeByteBudget: Long = ProbeByteBudget): Boolean =
    if (naiveMaxRows <= 0) true
    else if (naiveMaxRows == ProbeHint.Naive) false
    else memoProbe(df,
      keys.map(_.toString).mkString(",") + "|" + naiveMaxRows + "|" + probeByteBudget,
      () => statsBytes(df) > probeByteBudget ||
        maxGroupRows(df, keys) > naiveMaxRows)

  /** Shared two-phase global-position scaffold: range-exchange on
    * (group, order) so partition order respects key order within each
    * group, per-(group, partition) counts — ≤ groups × shuffle-partition
    * rows — exclusive offsets and group totals under windows over that
    * tiny table, then a local row_number per (group, partition). Adds
    * `__pos` (1-based position within the group; global when
    * `groupCols` is empty) and `__n` (group size). The group key rides
    * as a STRUCT so a NULL group ranks like a window partition would
    * instead of dropping at the equi-join. `orderCols` must totalize
    * the order within a group. Callers own the reserved-helper-column
    * check (`__pid __k __c __off __n __pos`) and drop `__pos`/`__n`
    * when done. `Packing.orderedShardsExact` and
    * `TextAnalysis.percentileNormalize` both lower through here — the
    * range-exchange/pid determinism contract lives in ONE place. */
  def positioned(df: DataFrame, groupCols: Seq[Column],
      orderCols: Seq[Column]): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val key = if (groupCols.isEmpty) lit(0) else struct(groupCols: _*)
    val rp = df.repartitionByRange(parts, groupCols ++ orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__k", key)
    val counts = rp.groupBy(col("__k"), col("__pid"))
      .agg(count(lit(1)).as("__c"))
    val wOff = Window.partitionBy(col("__k")).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wN = Window.partitionBy(col("__k"))
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(wN))
      .select(col("__k"), col("__pid"), col("__off"), col("__n"))
    val wLocal = Window.partitionBy(col("__k"), col("__pid"))
      .orderBy(orderCols: _*)
    rp.join(offsets, Seq("__k", "__pid"))
      .withColumn("__pos", col("__off") + row_number().over(wLocal))
      .drop("__pid", "__k", "__off")
  }

  /** `orderCols` must totalize the order within a group for the result
    * to be deterministic (the same contract the naive window form had).
    * `chunk` is any deterministic expression; uniform hashes chunk best.
    *
    * ADAPTIVE: a plan-time [[maxGroupRows]] probe picks the plain
    * whole-group window when every group fits one task (`naiveMaxRows`
    * bound; `<= 0` forces the chunked form — differential specs pin the
    * branches equal). Both branches produce identical rows AND ranks. */
  def boundedTopK(df: DataFrame, groupCols: Seq[Column],
      orderCols: Seq[Column], k: Int, chunk: Column,
      rankName: String, rankAsLong: Boolean,
      naiveMaxRows: Long = NaiveMaxRows): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireHelperColumnsFree(df, "__chunk", "__lr")
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    val rank0 = row_number().over(w)
    val rank = if (rankAsLong) rank0.cast("long") else rank0
    if (!useChunked(df, groupCols, naiveMaxRows)) {
      df.withColumn(rankName, rank).where(col(rankName) <= k)
    } else {
      val wLocal = Window.partitionBy(groupCols :+ col("__chunk"): _*)
        .orderBy(orderCols: _*)
      df.withColumn("__chunk", chunk)
        .withColumn("__lr", row_number().over(wLocal))
        .where(col("__lr") <= k)
        .withColumn(rankName, rank)
        .where(col(rankName) <= k)
        .drop("__chunk", "__lr")
    }
  }
}
