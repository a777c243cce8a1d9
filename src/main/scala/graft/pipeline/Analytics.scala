package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General distributed-analytics operators a curation pipeline leans on
  * around the core dedup/quality stages: per-group top-k, hierarchical
  * rollups, and exact quantiles.
  */
object Analytics {

  /** Top-k rows per group by `orderCol` (descending, `tieBreak`
    * ascending — the pair must totalize the order for determinism).
    *
    * TWO-PHASE: a single per-group window serializes each group through
    * one task — with a low-cardinality group column (sources, event
    * types) that is the whole corpus. Phase 1 prunes to the local top-k
    * within (group, hash-chunk) — valid for ANY chunking, since the
    * global top-k is always a subset of the union of per-chunk top-ks —
    * leaving ≤ k × nChunks survivors per group; phase 2 ranks the
    * survivors, a bounded set regardless of data volume. Both windows
    * are ordinary exchanges: different (group, chunk) cells land on
    * different tasks, so no task ever sorts more than a chunk.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, orderCol: String,
      tieBreak: String, k: Int, nChunks: Int = 64,
      naiveMaxRows: Long = TwoPhase.NaiveMaxRows): DataFrame = {
    require(nChunks >= 1, s"nChunks must be >= 1, got $nChunks")
    TwoPhase.boundedTopK(df, Seq(col(groupCol)),
      Seq(col(orderCol).desc, col(tieBreak).asc), k,
      chunk = pmod(hash(col(tieBreak)), lit(nChunks)),
      rankName = "rank", rankAsLong = false, naiveMaxRows = naiveMaxRows)
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

  /** Snapshot diff: classify every id across two dataset versions as
    * `added` (new only), `removed` (old only), `changed` (both, content
    * digest differs), or `unchanged`. Content equality is an md5 digest
    * of `contentCols` in order, so the diff shuffles (id, 16-byte digest)
    * — never the content itself; one full outer equi-join on the id. The
    * incremental-pipeline primitive: feed `added ∪ changed` downstream
    * instead of recomputing the corpus.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame = {
    // length-prefixed tokens, 'N' for NULL, '|'-joined: a bare
    // separator-concat has two collision classes — concat_ws SKIPS null
    // columns, so ("x", NULL) vs (NULL, "x") digest identically, and a
    // separator embedded in the data realigns columns. The length
    // prefix makes the encoding injective regardless of content
    // (("ab","c") -> "2:ab|1:c" != ("a","bc") -> "1:a|2:bc"); 'N' is
    // distinct from every real token (those start with a digit). Plain
    // VARCHAR pieces, so the DuckDB oracle computes the same digest.
    def token(c: String) = {
      val s = col(c).cast("string")
      when(s.isNull, lit("N"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }
    def digested(df: DataFrame, name: String) = df.select(col(idCol),
      md5(concat_ws("|", contentCols.map(token): _*)).as(name))
    digested(oldDf, "old_digest")
      .join(digested(newDf, "new_digest"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_digest").isNull, "added")
          .when(col("new_digest").isNull, "removed")
          .when(col("old_digest") =!= col("new_digest"), "changed")
          .otherwise("unchanged").as("change"))
  }

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

  /** Equi-width histogram of `valueCol` per group over the GLOBAL
    * [min, max] range (shared bins keep groups comparable):
    * (group, bin, bin_lo, bin_hi, n). One tiny min/max aggregate (two
    * doubles to the driver), then a single map-side-combined groupBy on
    * (group, bin) — the profiling pass that sizes quality thresholds
    * and spots distribution drift between sources. Empty bins are
    * omitted (join a `sequence` grid at the call site to densify).
    * Bin arithmetic is one subtract/divide/floor chain on doubles —
    * correctly-rounded IEEE ops, so bin assignment is engine-portable.
    */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
      bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    // NULL values carry no bin: floor(NULL) is NULL and least() skips
    // nulls, which would silently park them in the top bin — drop them
    // up front (and the min/max head() row is null on an all-null or
    // empty input, so bail to an empty frame of the right shape). The
    // filter tests the CAST value: a non-numeric string is just as null
    // after cast("double") as a true NULL. Non-finite doubles are
    // dropped the same way: one ±Inf poisons lo/hi so every finite
    // value lands in bin 0, and NaN propagates NaN bin edges — the
    // same silent-garbage class as the null parking.
    val cd = col(valueCol).cast("double")
    val valued = df.filter(cd.isNotNull && !isnan(cd) &&
      cd =!= Double.PositiveInfinity && cd =!= Double.NegativeInfinity)
    val mm = valued.agg(min(col(valueCol).cast("double")),
      max(col(valueCol).cast("double"))).head()
    if (mm.isNullAt(0))
      return valued.groupBy(col(groupCol), lit(0L).as("bin"))
        .agg(count(lit(1)).as("n"))
        .select(col(groupCol), col("bin"), lit(0d).as("bin_lo"),
          lit(0d).as("bin_hi"), col("n"))
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val width = (hi - lo) / bins
    val bin =
      if (hi <= lo) lit(0L)
      else least(lit(bins - 1L),
        floor((col(valueCol).cast("double") - lit(lo)) / lit(hi - lo)
          * lit(bins)).cast("long"))
    valued.groupBy(col(groupCol), bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col(groupCol), col("bin"),
        round(lit(lo) + col("bin") * lit(width), 6).as("bin_lo"),
        round(lit(lo) + (col("bin") + 1) * lit(width), 6).as("bin_hi"),
        col("n"))
  }

  /** One-pass column profiler: (col_name, n_rows, n_nulls, n_distinct,
    * min_val, max_val) for every named column — the schema-drift /
    * data-quality gate a pipeline runs on each new dump before
    * processing it. ONE aggregate over the input (Catalyst plans the
    * multi-column distinct via a single expand), then a literal unpivot
    * of the finished row; min/max are computed in the column's own type
    * and rendered to string after. Exact distincts — swap
    * `approx_count_distinct` at extreme cardinality.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
      countDistinct(col(c)).as(s"__distinct_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    row.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))): _*)).as("p"))
      .select("p.*")
  }

  /** Skew-salted equi-join: when `bigKey` is heavily skewed (a handful of
    * hot keys hold most rows), a plain hash join sends each hot key to
    * ONE reducer — the straggler that decides the stage's wall clock at
    * 100 TB. Salting spreads every key over `salts` sub-partitions: the
    * big side gets a deterministic per-row salt (hash of the full row),
    * the small side is replicated once per salt value, and the join runs
    * on (key, salt). Each big row matches exactly its own salted copy of
    * the small row, so the result is EXACTLY the plain join — only the
    * partitioning changes. Cost: small side × `salts` (keep it
    * broadcast-small or salts modest).
    *
    * AQE's skew-join splitting handles sort-merge skew adaptively; this
    * explicit form is for when the skew is known and the plan must be
    * deterministic (or the join is hash-partitioned by a later stage
    * that AQE won't rewrite).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // hash() rejects MapType anywhere in a column's type — serialize
    // such columns through to_json for the salt (the record schema's
    // labels/computed_labels maps would otherwise make this throw).
    // Deterministic row-content salt; NB byte-identical duplicate rows
    // share a salt, so skew made of EXACT duplicates stays on one task.
    def hasMap(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val saltSrc = big.schema.fields.map(f =>
      if (hasMap(f.dataType)) to_json(col(f.name)) else col(f.name))
    val saltedBig = big.withColumn("__salt",
      pmod(hash(saltSrc: _*), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // frame-qualified key refs: unqualified col(...) is ambiguous the
    // moment both sides name their key identically
    saltedBig
      .join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
          saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }

  /** Apply a change-data-capture log to a snapshot: the incremental
    * materialization primitive behind [[snapshotDiff]] — given a base
    * dataset and a changelog of (`idCol`, `seqCol`, `opCol` ∈
    * upsert|delete, payload columns), produce the next snapshot.
    * The LATEST change per id wins (`seqCol` descending, exactly-once
    * MERGE semantics); `delete` removes the row, `upsert`
    * inserts-or-replaces it, untouched base rows pass through.
    *
    * Scale shape: one window over the changelog (keyed by id — the
    * changelog is normally ≪ base) and ONE full-outer equi-join on the
    * id; payload columns ride the join once, nothing is re-read or
    * re-derived from base history. This is the operation that turns the
    * 100-TB "recompute the corpus" anti-pattern into "join yesterday's
    * snapshot with today's 10-GB delta".
    */
  def applyChanges(base: DataFrame, changes: DataFrame, idCol: String,
      seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == idCol)
    // op as the tiebreak on equal seq ('delete' < 'upsert' asc, so
    // delete wins): row_number over a non-total order would resolve
    // same-seq changes nondeterministically across runs/retries —
    // the snapshot would randomly contain or drop the id
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(seqCol).desc, col(opCol).asc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(Seq(col(idCol), col(opCol).as("__op")) ++
        payload.map(c => col(c).as(s"__c_$c")): _*)
    base.join(latest, Seq(idCol), "full_outer")
      .where(col("__op").isNull || col("__op") =!= "delete")
      .select(Seq(col(idCol)) ++ payload.map { c =>
        when(col("__op") === "upsert", col(s"__c_$c"))
          .otherwise(col(c)).as(c)
      }: _*)
  }

  /** Bloom-pruned equi-join: build a compact Bloom filter of the SMALL
    * side's keys (distributed `stat.bloomFilter` — a treeAggregate, the
    * driver only ever holds the fixed-size bit array), broadcast it, and
    * drop non-matching big-side rows MAP-SIDE before the exact join.
    * False positives survive the pre-filter but the exact equi-join
    * eliminates them, so the result is identical to the plain join — the
    * filter only changes how many rows reach the shuffle.
    *
    * This is the explicit form of Spark's runtime Bloom optimization
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), for when the
    * pruning must be guaranteed rather than cost-based — e.g. a 100-TB
    * fact scan joining a 10-GB dim too big to broadcast exactly, where
    * shipping the non-matching 99% of fact rows to the shuffle is the
    * whole cost. `expectedItems`/`fpp` size the filter (~1.2 bytes/key
    * at 3%). The membership probe compiles to Spark's own
    * `BloomFilterMightContain` codegen expression over xxhash64-hashed
    * keys — the identical probe shape the cost-based runtime filter
    * injects (`InjectRuntimeFilter`), so it stays inside whole-stage
    * codegen instead of crossing a deserializing UDF per row. The
    * 64-bit pre-hash adds ~n/2^64 to the effective fpp — noise next to
    * any practical filter sizing.
    *
    * The serialized filter rides the plan as a literal, which every
    * explain/UI string renders in hex — fine at the sizes Spark's own
    * runtime filter allows itself (`runtime.bloomFilter.maxNumBits`,
    * 8 MB), a driver hazard far past it. Past [[LiteralProbeMaxBytes]]
    * the probe falls back to a broadcast predicate over the same hash
    * column: torrent-distributed once per executor, nothing embedded in
    * the plan, one non-codegen boundary — the right trade for a
    * 100M-key filter.
    */
  /** Predicted serialized-filter bound for the plan-literal probe — the
    * same 8 MB Spark caps its injected runtime bloom filters at. */
  val LiteralProbeMaxBytes: Long = 8L << 20

  def bloomPrunedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long, fpp: Double = 0.03,
      literalProbeMaxBytes: Long = LiteralProbeMaxBytes): DataFrame = {
    // hash in a common key form: an integral key as long on both sides,
    // a string key as-is — a silent cast-to-null here would DROP valid
    // rows, not just lose pruning
    import org.apache.spark.sql.types.{BinaryType, ByteType, IntegerType, LongType, ShortType, StringType}
    val keyForm: Column => Column = big.schema(bigKey).dataType match {
      case LongType | IntegerType | ShortType | ByteType => _.cast("long")
      case StringType => identity
      case other => throw new IllegalArgumentException(
        s"bloomPrunedJoin key must be integral or string, got $other")
    }
    // the filter holds xxhash64 of the keys (never-null longs), built
    // distributed: the driver only ever sees the fixed-size bit array
    val bloom = small.select(xxhash64(keyForm(col(smallKey))).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    // a big-side NULL key hashes to the xxhash64 seed and may pass the
    // pre-filter; the exact equi-join drops it, as it dropped false
    // positives already
    val bigHash = xxhash64(keyForm(col(bigKey)))
    val probe = if (bloom.bitSize() / 8 <= literalProbeMaxBytes) {
      import org.apache.spark.sql.GraftColumnBridge
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      val ser = {
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos)
        bos.toByteArray
      }
      GraftColumnBridge.column(BloomFilterMightContain(
        Literal(ser, BinaryType),
        GraftColumnBridge.expression(bigHash)))
    } else {
      val bc = big.sparkSession.sparkContext.broadcast(bloom)
      udf((h: Long) => bc.value.mightContainLong(h)).apply(bigHash)
    }
    val pruned = big.filter(probe)
    pruned.join(small, pruned(bigKey) === small(smallKey))
  }

  /** Per-source dataset card: the one-pass summary panel a curation run
    * publishes next to each training mix — volume (docs/chars/tokens),
    * language spread, and exact-duplicate mass, per `source`:
    * (source, n_docs, n_langs, total_chars, total_tokens, dup_docs,
    * uniq_pct). `dup_docs` counts documents whose md5 digest appears
    * more than once WITHIN the source (the per-source duplication signal
    * [[Dedup]] gates on).
    *
    * Scale shape: two aggregation passes over compact columns — (1)
    * groupBy (source, digest) on 16-byte digests for the dup mass, then
    * re-grouped to source; (2) groupBy source over (lang, n_chars,
    * token-count) with map-side combine; joined on the source key (a
    * handful of rows — AQE broadcasts). Text is tokenized once,
    * digested once, never shuffled. */
  def datasetCard(docs: DataFrame): DataFrame = {
    val dups = docs
      .groupBy(col("source"), md5(col("text")).as("digest"))
      .agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_docs"))
    docs.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"),
        sum(TextAnalysis.tokenCount(col("text")).cast("bigint"))
          .as("total_tokens"))
      .join(dups, "source")
      .select(col("source"), col("n_docs"), col("n_langs"),
        col("total_chars"), col("total_tokens"), col("dup_docs"),
        round((col("n_docs") - col("dup_docs")).cast("double") * 100.0 /
          col("n_docs"), 6).as("uniq_pct"))
  }

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
