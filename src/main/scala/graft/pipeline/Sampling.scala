package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Both samplers key on an md5-derived 60-bit hash of the row id — not on
  * `rand()` — so a sample is (a) reproducible run-over-run, (b) stable
  * under repartitioning/AQE (no per-partition seed dependence), and (c)
  * re-derivable by an external engine (the DuckDB oracle computes the
  * identical hash: `('0x'||substring(md5(s),1,15))::BIGINT`). Hash-keyed
  * samples also compose: the rate-0.1 sample is a superset of the
  * rate-0.01 sample, which is how corpus ablations stay nested.
  */
object Sampling {

  /** 60-bit md5 hash of `salt:id` as a codegen'd Column (conv/substring/
    * md5 are all built-ins). 15 hex digits = 60 bits, so the value is
    * always a non-negative Long. */
  def hash60(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** Bernoulli(rate) sample by hash threshold. Map-only: no count pass, no
    * shuffle, and the keep/drop decision for a row never depends on any
    * other row — the only sampling shape that stays O(0) coordination at
    * 100 TB. The realized fraction is binomial around `rate`; use
    * [[stratifiedExactK]] when an exact count matters more than
    * single-pass scaling. */
  def sampleByRate(df: DataFrame, rate: Double, idCol: String = "doc_id",
      salt: String = "graft:sample"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    val threshold = (rate * (1L << 60).toDouble).toLong
    df.filter(hash60(col(idCol), salt) < lit(threshold))
  }

  /** Exactly the k hash-smallest rows per stratum — a deterministic
    * reservoir sample (uniform without replacement, conditioned on the
    * stratum). `rank` (1-based, by hash then id) is included so callers
    * can tighten k downstream without resampling.
    *
    * TWO-PHASE: phase 1 keeps the local k hash-smallest within each
    * (stratum, hash-chunk) — correct for any chunking, because the
    * global k smallest are a subset of the union of per-chunk k
    * smallest — then phase 2 ranks the ≤ k × nChunks survivors. A
    * mega-stratum no longer serializes through one task's sort: no task
    * ever orders more than its chunk, and the final window touches a
    * bounded survivor set. */
  def stratifiedExactK(df: DataFrame, strataCol: String, k: Int,
      idCol: String = "doc_id", salt: String = "graft:sample",
      nChunks: Int = 64,
      naiveMaxRows: Long = TwoPhase.NaiveMaxRows): DataFrame = {
    require(nChunks >= 1, s"nChunks must be >= 1, got $nChunks")
    TwoPhase.requireHelperColumnsFree(df, "__h")
    TwoPhase.boundedTopK(
      df.withColumn("__h", hash60(col(idCol), salt)),
      Seq(col(strataCol)), Seq(col("__h"), col(idCol)), k,
      chunk = pmod(hash(col(idCol)), lit(nChunks)),
      rankName = "rank", rankAsLong = true, naiveMaxRows = naiveMaxRows)
      .drop("__h")
  }

  /** Deterministic source-weighted mixing: keep each stratum at rate
    * `weight / max(weight)` — the per-source down-sampling step that
    * turns relative mixture weights into a concrete training blend
    * (sources at the max weight pass whole; a weight-1 source under
    * max 4 keeps ~25%). Strata absent from `weights` drop entirely.
    *
    * The keep decision compares a 30-bit slice of the row hash against
    * `weight << 30` in INTEGER arithmetic — no double rounding at the
    * boundary, so an external engine reproduces the exact sample (the
    * float-threshold alternative is 1-ulp sensitive where
    * `rate * 2^60` lands between representable doubles). Map-only, no
    * count pass, no shuffle; same hash key as [[sampleByRate]], so
    * mixes nest with rate samples. */
  def weightedMix(df: DataFrame, weights: Map[String, Long],
      keyCol: String = "source", idCol: String = "doc_id",
      salt: String = "graft:mix"): DataFrame = {
    require(weights.nonEmpty, "weights must not be empty")
    require(weights.values.forall(w => w >= 0 && w <= (1L << 30)),
      s"weights must be in [0, 2^30], got $weights")
    val wMax = weights.values.max
    require(wMax > 0, "at least one weight must be positive")
    val wCol = element_at(
      map(weights.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
      col(keyCol))
    // keep iff (h >> 30) * wMax < w << 30 — both sides stay under 2^60
    df.filter(wCol.isNotNull &&
      shiftright(hash60(col(idCol), salt), 30) * lit(wMax) <
        wCol * lit(1L << 30))
  }

  /** Deterministic train/val/test assignment: each row gets the split
    * whose cumulative weight interval contains its hash — e.g.
    * `Seq("train" -> 98, "val" -> 1, "test" -> 1)` puts ~98% in train.
    * Same integer-exact boundary arithmetic as [[weightedMix]] (30-bit
    * hash slice × total weight vs cumulative-weight << 30), so the
    * assignment is bit-reproducible by any engine, stable under
    * repartitioning, and disjoint-and-exhaustive by construction.
    * Map-only. A distinct `salt` decorrelates the split from any
    * sampling done with the default salt. */
  def assignSplits(df: DataFrame, splits: Seq[(String, Long)],
      idCol: String = "doc_id", salt: String = "graft:split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"splits need positive weights: $splits")
    val total = splits.map(_._2).sum
    require(total <= (1L << 30), s"total weight must fit 2^30, got $total")
    val scaled = shiftright(hash60(col(idCol), salt), 30) * lit(total)
    val cums = splits.map(_._2).scanLeft(0L)(_ + _).tail
    val assigned = splits.zip(cums).init.reverse
      .foldLeft(lit(splits.last._1): Column) {
        case (els, ((name, _), cum)) =>
          when(scaled < lit(cum * (1L << 30)), lit(name)).otherwise(els)
      }
    df.withColumn("split", assigned)
  }

  /** Data-mixture building: per stratum (language, source, domain…),
    * take documents in the deterministic hash order until `budget`
    * tokens accumulate — the step that turns per-source token quotas
    * into a concrete training mix. A document is kept while the tokens
    * BEFORE it (exclusive running sum) are under the budget, so the
    * budget-crossing document is included and every stratum reaches ≥
    * its quota when it has the tokens. Same hash ordering as
    * [[stratifiedExactK]] ⇒ shrinking a budget yields a subset.
    * `cum_tokens` (exclusive) is emitted for downstream packing.
    *
    * TWO-PHASE running sum (the Packing.withRunningOffset pattern on
    * the hash axis): the 60-bit hash order is cut into `nChunks`
    * contiguous ranges; phase 1 aggregates each (stratum, chunk)'s token
    * sum — a table of ≤ strata × nChunks rows — and a per-stratum prefix
    * over it hands every chunk its exclusive starting offset; phase 2
    * adds the within-chunk exclusive running sum under a
    * (stratum, chunk) window. A mega-stratum never serializes: chunks
    * whose starting offset already exceeds the budget are pruned before
    * their rows are even sorted, so per-task work tracks the BUDGET,
    * not the stratum. */
  def byTokenBudget(df: DataFrame, strataCol: String, tokensCol: String,
      budget: Long, idCol: String = "doc_id",
      salt: String = "graft:sample", nChunks: Int = 64,
      naiveMaxRows: Long = TwoPhase.NaiveMaxRows): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nChunks >= 1 && (nChunks & (nChunks - 1)) == 0 && nChunks <= 1024,
      s"nChunks must be a power of two in [1,1024], got $nChunks")
    TwoPhase.requireHelperColumnsFree(df, "__h", "__chunk", "__k", "__prefix")
    // ADAPTIVE: when every stratum fits one task (plan-time probe;
    // naiveMaxRows <= 0 forces the chunked form), run the plain
    // per-stratum exclusive running sum — same decimal arithmetic, same
    // floor-to-long boundary rule, so both branches match bit-for-bit
    val tokDecA = col(tokensCol).cast("decimal(38,6)")
    if (!TwoPhase.useChunked(df, Seq(col(strataCol)), naiveMaxRows)) {
      val w = Window.partitionBy(col(strataCol))
        .orderBy(col("__h"), col(idCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      return df.withColumn("__h", hash60(col(idCol), salt))
        .withColumn("cum_tokens",
          coalesce(sum(tokDecA).over(w),
            lit(0).cast("decimal(38,6)")).cast("long"))
        .filter(col("cum_tokens") < budget)
        .select(df.columns.map(col) :+ col("cum_tokens"): _*)
    }
    val shift = 60 - java.lang.Long.numberOfTrailingZeros(nChunks.toLong)
    // the boundary join keys on a STRUCT-wrapped stratum: a window
    // treats NULL as its own partition, so the lowering must too — a
    // bare-column equi-join would silently drop null-stratum rows
    val withH = df
      .withColumn("__h", hash60(col(idCol), salt))
      .withColumn("__chunk", shiftright(col("__h"), shift))
      .withColumn("__k", struct(col(strataCol)))
    // token sums route through DECIMAL(38,6): the chunked form reorders
    // additions vs the old sequential running sum, and a double sum
    // would make the budget-boundary decision rounding-dependent for a
    // floating-point tokens column — decimal partial sums are exact (to
    // 6 dp) and order-independent, so both branches agree bit-for-bit
    val tokDec = col(tokensCol).cast("decimal(38,6)")
    val offsets = withH.groupBy(col("__k"), col("__chunk"))
      .agg(sum(tokDec).as("__cs"))
      .withColumn("__prefix", coalesce(
        sum(col("__cs")).over(Window.partitionBy(col("__k"))
          .orderBy(col("__chunk"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0).cast("decimal(38,6)")))
      .select(col("__k"), col("__chunk"), col("__prefix"))
    val wLocal = Window.partitionBy(col("__k"), col("__chunk"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withH.join(offsets, Seq("__k", "__chunk"))
      // a chunk whose starting offset is already past the budget cannot
      // contribute a kept row — prune it before anything sorts
      .filter(col("__prefix") < budget)
      .withColumn("cum_tokens",
        (coalesce(sum(tokDec).over(wLocal), lit(0).cast("decimal(38,6)")) +
          col("__prefix")).cast("long"))
      .filter(col("cum_tokens") < budget)
      .select(df.columns.map(col) :+ col("cum_tokens"): _*)
  }
}
