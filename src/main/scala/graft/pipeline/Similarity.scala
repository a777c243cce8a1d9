package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), scale-first:
  *
  *  - brute-force cosine top-k: the exact baseline. The query set is
  *    `broadcast()` (it is small by construction), so the big side streams
  *    map-only — no shuffle of the corpus; the only shuffle is the final
  *    per-query top-k window over `corpus × |queries|` rows.
  *  - LSH (random hyperplanes): 2^planes sign-buckets; corpus is bucketed
  *    once (map-only), queries probe their own bucket plus all buckets at
  *    Hamming distance 1 — recall/latency tunable with `planes`. At 100 TB
  *    the bucketed corpus would be written bucketed-by-signature so query
  *    probes become partition-pruned scans.
  *
  * Dot products use `aggregate(zip_with(...))` over doubles — built-in,
  * codegen'd, sequential-fold order (bit-exact reproducible).
  */
object Similarity {

  /** Σ aᵢ·bᵢ over two float/double-array columns, accumulated in double.
    * Native left-fold kernel — bit-identical to the
    * `aggregate(zip_with(...))` HOF formulation (same IEEE order) but
    * ~10x cheaper: HOFs evaluate interpreted with per-element boxing,
    * and this runs once per candidate PAIR. */
  def dot(a: Column, b: Column): Column = DedupExprs.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalize the embedding column (unit vectors make cosine a plain
    * dot product downstream — one multiply saved per candidate pair at
    * query time, which is where ANN spends its cycles). Map-only; the
    * norm is the [[dot]] left-fold, so normalized components are
    * bit-reproducible. Zero vectors pass through unchanged (flagged).
    */
  def normalizeEmbeddings(corpus: DataFrame,
      vecCol: String = "embedding"): DataFrame =
    // the norm is STAGED as a pinned column and referenced by attribute:
    // inlining the fold-dot inside the transform lambda re-evaluated it
    // per ELEMENT — O(d^2) per row for an O(d) job (r19 plan audit; the
    // pin keeps CollapseProject from re-inlining it)
    corpus
      .withColumn("norm", DedupExprs.evalOnce(norm(col(vecCol))))
      .withColumn(vecCol,
        when(col("norm") > 0,
          transform(col(vecCol), x => x.cast("double") / col("norm")))
          .otherwise(transform(col(vecCol), x => x.cast("double"))))
      .withColumn("zero_vec", col("norm") === 0)

  /** Symmetric int8 quantization per vector: `q_i = floor(x_i * 127 /
    * amax + 0.5)` with `amax = max |x_i|` — 4x smaller candidate scans
    * for ANN at 100 TB (the refine step re-reads full precision for the
    * shortlist only). `floor(+0.5)` not `round`: identical on every
    * engine, no half-even ambiguity. Map-only; `scale` inverts the
    * quantization. Zero vectors quantize to zeros with scale 0.
    */
  def quantizeInt8(corpus: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    // amax staged as a pinned column (same O(d^2) trap as
    // [[normalizeEmbeddings]]: the aggregate inlined in the transform
    // lambda re-ran per element — d=64 made that 4096 ops/row)
    val amax = aggregate(col(vecCol), lit(0.0d),
      (acc, x) => greatest(acc, abs(x.cast("double"))))
    corpus
      .withColumn("__amax", DedupExprs.evalOnce(amax))
      .withColumn("scale",
        when(col("__amax") > 0, col("__amax") / 127.0d).otherwise(0.0d))
      .withColumn("qvec", when(col("__amax") > 0,
          transform(col(vecCol), x =>
            floor(x.cast("double") * lit(127.0d) / col("__amax") + 0.5d)
              .cast("int")))
        .otherwise(transform(col(vecCol), x => lit(0))))
      .drop("__amax")
  }

  /** Exact cosine top-k per query vector.
    * @param queries (qid, qvec) frame — must be small (broadcast side).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms precomputed per side: 1 dot per pair instead of 3
    val joined = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
        norm(col(vecCol)).as("nnorm"))
      .crossJoin(broadcast(queries.select(col("qid"), col("qvec"),
        norm(col("qvec")).as("qnorm"))))
      .filter(col("nid") =!= col("qid"))
      .withColumn("sim", dot(col("nvec"), col("qvec")) / (col("nnorm") * col("qnorm")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** Quantized brute-force top-k with full-precision refine: the
    * candidate scan runs on int8 vectors (integer dot per pair — 4x less
    * memory traffic, the term that dominates a 100-TB scan), keeps a
    * `refine`-deep shortlist per query, then re-scores ONLY the
    * shortlist with the exact double dot. With `refine` modestly above
    * `k` the exact top-k survives any quantization reordering near the
    * cut (spec measures recall 1.0 at refine = 3k on the test corpus).
    * Same scale contract as [[bruteForceTopK]]: queries broadcast,
    * corpus streams map-only, shuffles are the two per-query windows
    * over shortlist-sized rows.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      refine: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(refine >= k, "refine depth must cover k")
    val qc = quantizeInt8(corpus, vecCol)
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"),
        col("qvec").as("nq"), col("scale").as("nscale"))
    val qq = quantizeInt8(queries.select(col("qid"), col("qvec").as("qv_f")),
        "qv_f")
      .select(col("qid"), col("qv_f"), col("qvec").as("qq_v"),
        col("scale").as("qscale"))
    val intDot = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")),
        lit(0L), (acc, x) => acc + x)
    val shortlist = qc
      .crossJoin(broadcast(qq))
      .filter(col("nid") =!= col("qid"))
      // int dot * the two scales ≈ the real dot; norms rescale identically
      // for every candidate of a query, so ordering needs no norms
      .withColumn("qsim",
        intDot(col("nq"), col("qq_v")).cast("double") *
          col("nscale") * col("qscale"))
      .withColumn("qrank", row_number().over(
        Window.partitionBy("qid").orderBy(col("qsim").desc, col("nid"))))
      .filter(col("qrank") <= refine)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    shortlist
      .withColumn("sim", dot(col("nvec"), col("qv_f")) /
        (norm(col("nvec")) * norm(col("qv_f"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** Hard-negative mining for contrastive training: per anchor vector,
    * the top-k most-similar corpus vectors carrying a DIFFERENT label —
    * the near-miss negatives a contrastive objective learns most from
    * (easy negatives are uninformative; same-label hits are positives,
    * not negatives). Same scale contract as [[bruteForceTopK]]: the
    * anchor set is broadcast (small by construction), the corpus streams
    * map-only with one fold-dot per pair, and the only shuffle is the
    * per-anchor top-k window — the shape the scale audit already signed
    * off for the brute baseline. Ties break on candidate id. */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val joined = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
        col(labelCol).as("neg_label"), norm(col(vecCol)).as("nnorm"))
      .crossJoin(broadcast(anchors.select(col("qid"), col("qvec"),
        col("qlabel"), norm(col("qvec")).as("qnorm"))))
      .filter(col("nid") =!= col("qid") && col("neg_label") =!= col("qlabel"))
      .withColumn("sim",
        dot(col("nvec"), col("qvec")) / (col("nnorm") * col("qnorm")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("neg_label"), col("rank"),
        round(col("sim"), 6).as("sim"))
  }

  /** Deterministic hyperplane matrix, md5-derived per (plane, dim) cell
    * via [[DedupRuntime.h60]] — regenerable by any engine from the same
    * formula (the DuckDB oracle recomputes it inline), unlike a wrapping
    * LCG stream. Uniform in [-1, 1). */
  private def hyperplanes(planes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim)((i, d) =>
      DedupRuntime.h60(s"graft:lsh:$i:$d").toDouble / (1L << 59).toDouble - 1.0)

  /** Sign-bucket signature of a vector under `planes` hyperplanes. */
  def lshSignature(vec: Column, planes: Int, dim: Int): Column = {
    val hp = hyperplanes(planes, dim)
    val bits = hp.zipWithIndex.map { case (h, i) =>
      val planeLit = array(h.map(lit(_)): _*)
      when(dot(vec, planeLit) > 0.0, 1 << i).otherwise(0)
    }
    bits.reduce(_ + _).cast("int")
  }

  /** LSH-bucketed ANN: probe own bucket + Hamming-1 neighbors.
    * Returns the same schema as [[bruteForceTopK]] (approximate recall). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 8, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // bucket pinned: the bucket-join's inferred isnotnull filter
    // otherwise inlines the whole planes-dot signature and every corpus
    // row pays it twice (Filter + Project, r19 before-plans)
    val bucketed = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      DedupExprs.evalOnce(lshSignature(col(vecCol), planes, dim)).as("bucket"))
    // query probes: own bucket + flip each bit once. The signature is
    // staged as a column FIRST — inlining it into each of the planes+1
    // probe elements replicates the (planes x dim)-literal hyperplane
    // tree that many times and codegen time dominates the query
    val probes = queries
      .select(col("qid"), col("qvec"),
        lshSignature(col("qvec"), planes, dim).as("__sig"))
      .select(col("qid"), col("qvec"),
        explode(array(col("__sig") +: (0 until planes).map(i =>
          col("__sig").bitwiseXOR(lit(1 << i))): _*)).as("bucket"))
    val joined = bucketed.join(broadcast(probes), "bucket")
      .filter(col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("nvec"), col("qvec")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** IVF (inverted-file) ANN: the corpus is assigned once to its nearest
    * of `k` centroids (map-only; at scale you'd write bucketed-by-centroid
    * so probes prune partitions), queries probe the `nprobe` nearest
    * centroids and rank exactly within them. Centroids are a deterministic
    * sample of the corpus refined by one k-means (Lloyd) step — enough
    * structure for probing without iterative training.
    */
  /** Centroids as ONE literal array<struct<ci,n,cv>> so scoring is a
    * single transform+aggregate expression (16 separate dot expressions
    * made codegen compile time dominate the query at small scale). */
  private def centroidLit(cents: Array[Array[Double]]): Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      call_function("named_struct",
        lit("ci"), lit(i),
        lit("n"), lit(math.sqrt(c.map(x => x * x).sum)),
        lit("cv"), array(c.map(lit(_)): _*))
    }: _*)

  private def centroidScores(vec: Column, cents: Array[Array[Double]]): Column =
    transform(centroidLit(cents), c =>
      call_function("named_struct",
        lit("s"), dot(vec, c("cv")) / c("n"), lit("ci"), c("ci")))

  /** Nearest-centroid id by cosine against driver-side centroids. */
  private def assignCentroid(vec: Column, cents: Array[Array[Double]]): Column =
    array_max(centroidScores(vec, cents))("ci")

  /** One Lloyd refinement step over a BOUNDED deterministic training
    * sample — the first `trainN` corpus vectors in md5-of-id order (the
    * [[seedCentroids]] formula extended), selected via orderBy+limit
    * (TakeOrderedAndProject: each task keeps its top-N, no full sort).
    * The per-(centroid,dim) mean is a left fold over the VALUE-SORTED
    * member contributions, so the result is bit-deterministic regardless
    * of partitioning — any engine folding the same sorted list reproduces
    * it exactly (the DuckDB oracle does). Because the fold's input is the
    * sample, the per-cell `collect_list` array is `<= trainN` elements no
    * matter the corpus size — a 100 TB corpus trains on the same bounded
    * sample, as IVF trainers do; only the map-only assignment pass ever
    * touches the full corpus.
    *
    * Returns (refined centroids, observed training row count) — the count
    * is the EXECUTED input row count of the training aggregation
    * (CollectMetrics above the limit), specs pin it to `trainN`. Empty
    * centroids keep their seed vector. */
  private[graft] def refineCentroids(corpus: DataFrame,
      seeds: Array[Array[Double]], trainN: Int,
      idCol: String, vecCol: String): (Array[Array[Double]], Long) = {
    val dims = seeds(0).length
    val obs = org.apache.spark.sql.Observation()
    val sample = corpus
      .select(col(idCol).as("sid"), col(vecCol).as("sv"))
      .orderBy(conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
        .cast("long"), col("sid"))
      .limit(trainN)
      .observe(obs, count(lit(1)).as("train_rows"))
    // one Lloyd step: per-(centroid, dim) mean via posexplode. The
    // repartition is a deliberate pipeline boundary: without it the
    // Generate (explode) re-evaluates the centroid-assignment expression
    // once per exploded element (dims x the work).
    val sums = sample
      .select(assignCentroid(col("sv"), seeds).as("c"), col("sv").as("v"))
      .transform(graft.core.Partitioning.pinned(_, col("c")))
      .select(col("c"),
        posexplode(transform(col("v"), _.cast("double"))).as(Seq("d", "x")))
      .groupBy("c", "d")
      .agg(aggregate(sort_array(collect_list(col("x"))), lit(0.0),
          (acc, x) => acc + x).as("sum"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2) / r.getLong(3))
      .toMap
    val refined = seeds.indices.map { ci =>
      val c = Array.tabulate(dims)(d => sums.getOrElse((ci, d), seeds(ci)(d)))
      if (sums.contains((ci, 0))) c else seeds(ci)
    }.toArray
    (refined, obs.get("train_rows").asInstanceOf[Long])
  }

  /** Deterministic seed sample: the first `nCentroids` corpus vectors in
    * md5-of-id order (a formula any engine reproduces, unlike an
    * engine-native hash). Driver-bounded: nCentroids rows. */
  private def seedCentroids(corpus: DataFrame, nCentroids: Int,
      idCol: String, vecCol: String): Array[Array[Double]] = corpus
    .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    .orderBy(conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long"), col("cid"))
    .limit(nCentroids).collect()
    .map(_.getSeq[Float](1).map(_.toDouble).toArray)

  /** @param refine run one sample-trained Lloyd step over the seed
    *        centroids (better-balanced lists) — see [[refineCentroids]].
    *  @param trainSampleSize bound on the Lloyd training sample;
    *        `<= 0` means the default `2 * nCentroids * dims`. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      refine: Boolean = true, trainSampleSize: Int = 0): DataFrame = {
    val seeds = seedCentroids(corpus, nCentroids, idCol, vecCol)
    val refined: Array[Array[Double]] = if (!refine) seeds else {
      val trainN = if (trainSampleSize > 0) trainSampleSize
                   else 2 * nCentroids * seeds(0).length
      refineCentroids(corpus, seeds, trainN, idCol, vecCol)._1
    }
    // bucket pinned — same inferred-isnotnull double evaluation as
    // [[lshTopK]], but over the full nCentroids-literal scoring tree
    val bucketed = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      DedupExprs.evalOnce(assignCentroid(col(vecCol), refined)).as("bucket"))
    // query probes: the nprobe highest-scoring centroids
    val centArr = centroidScores(col("qvec"), refined)
    val probes = queries.select(col("qid"), col("qvec"),
      explode(slice(reverse(array_sort(centArr)), 1, nprobe)("ci")).as("bucket"))
    val joined = bucketed.join(broadcast(probes), "bucket")
      .filter(col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("nvec"), col("qvec")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** Exact cosine near-duplicate pairs inside an explicit grouping column
    * (bounded cross join per group; deterministic, oracle-checkable). */
  def cosineDupPairsByGroup(corpus: DataFrame, groupCol: String,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding", maxGroupSize: Int = 1000,
      planes: Int = 8, dim: Int = 64, maxBucketSize: Int = 1000,
      capName: String = "embed_group"): DataFrame = {
    // nrm pinned ([[DedupExprs.evalOnce]]): the join-constraint
    // isnotnull filter otherwise inlines the sqrt-dot and every row
    // pays the norm twice (Filter + Project, r19 before-plans)
    val d = corpus.select(col(groupCol).as("g"), col(idCol).as("id"),
      col(vecCol).as("vec"), DedupExprs.evalOnce(norm(col(vecCol))).as("nrm"))
    // BOUNDED-GROUP contract, same shape as Dedup.groupedJaccardPairs:
    // the all-pairs join is quadratic in group size (a fixed group key
    // over a 10× corpus costs 100× — measured, SCALE.md sf1 probe), so
    // groups beyond `maxGroupSize` route through group-scoped LSH
    // sign-bucket blocking ([[embeddingDupPairs]] machinery) with the
    // same exact cosine verification, marked `capped = true`: pairs the
    // hyperplane curve catches still surface, low-similarity pairs are
    // traded for the quadratic bound. Output: (id_a, id_b, sim, capped).
    //
    // adaptive plan-time routing — see [[Dedup.splitByGroupSize]]
    val (small, big0) = Dedup.splitByGroupSize(d, maxGroupSize)
    val a = small.as("a"); val b = small.as("b")
    // sim pinned: unpinned, Catalyst pushed `sim >= t` into the join
    // condition AHEAD of the cheap id ordering and re-evaluated the
    // fold-dot in the projection — two dots per cross pair instead of
    // one per id-ordered pair (r19 before-plans)
    val exact = a.join(b, col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        DedupExprs.evalOnce(dot(col("a.vec"), col("b.vec")) /
          (col("a.nrm") * col("b.nrm"))).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("sim"), 6).as("sim"), lit(false).as("capped"))
    if (big0.isEmpty) return exact
    val big = big0.get
      .withColumn("bucket", lshSignature(col("vec"), planes, dim))
    val cand = Dedup.observeBucketCap(
        big.select(col("g"), col("bucket"), col("id"))
          .groupBy("g", "bucket")
          .agg(collect_list(col("id")).as("grp")),
        capName, maxBucketSize)
      .filter(size(col("grp")).between(2, maxBucketSize))
      .select(explode(expr(
        """filter(
             flatten(transform(grp, (x, i) ->
               transform(slice(grp, i + 2, size(grp)), y ->
                 struct(least(x, y) as a, greatest(x, y) as b)))),
             p -> p.a < p.b)""")).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
    // join candidates against the oversized-group slice, not the whole
    // corpus: the operator only promises per-group pairing, so if idCol
    // is not globally unique a d-wide join could match a vector from a
    // different group or fan out duplicate rows
    val vecs = big.select(col("id"), col("vec"), col("nrm"))
    val blocked = cand
      .join(vecs.select(col("id").as("id_a"), col("vec").as("va"),
        col("nrm").as("na")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vb"),
        col("nrm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        DedupExprs.evalOnce(dot(col("va"), col("vb")) /
          (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("sim"), 6).as("sim"), lit(true).as("capped"))
    exact.unionByName(blocked)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    * the corpus by nearest md5-seeded centroid (the [[ivfTopK]] seed
    * assignment — no training pass), find within-cluster cosine
    * near-dup pairs, and keep one representative per near-dup relation
    * by MIN-ID retention: a vector is dropped iff it pairs at
    * `threshold`-or-above with a smaller id in its cluster. (The paper
    * keeps the member closest to the centroid; min-id keeps the
    * retention decision local to a pair — no per-cluster argmin pass —
    * and deterministic under any execution order. Divergence
    * documented here.) Output: one row per vector — (vec_id, cluster,
    * keep).
    *
    * Scale shape: the clustering is one broadcast-literal map pass;
    * pair generation reuses [[cosineDupPairsByGroup]]'s bounded-group
    * contract (oversized clusters route through LSH blocking, capped
    * and observable), so a degenerate mega-cluster can't go quadratic;
    * the keep decision is one anti-join against the dropped-id set. */
  def semanticDedup(corpus: DataFrame, threshold: Double = 0.95,
      nCentroids: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding", maxGroupSize: Int = 1000,
      planes: Int = 8, dim: Int = 64,
      capName: String = "semdedup"): DataFrame = {
    val seeds = seedCentroids(corpus, nCentroids, idCol, vecCol)
    val assigned = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("cluster",
        DedupExprs.evalOnce(assignCentroid(col("vec"), seeds)))
    val pairs = cosineDupPairsByGroup(assigned, "cluster", threshold,
      idCol = "id", vecCol = "vec", maxGroupSize = maxGroupSize,
      planes = planes, dim = dim, capName = capName)
    val drops = pairs.select(col("id_b").as("id")).distinct()
      .withColumn("__drop", lit(1))
    assigned.select(col("id"), col("cluster"))
      .join(drops, Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster").cast("long").as("cluster"),
        col("__drop").isNull.as("keep"))
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets (all pairs in a
    * bucket with cosine ≥ threshold). Complements [[Dedup]].
    *
    * Candidate pairs come from id-only bucket groups bounded by
    * `maxBucketSize` — the same hot-bucket guard as
    * [[Dedup.minhashPairs]]/[[Dedup.simhashPairs]]. A dominant embedding
    * cluster (common in real corpora: boilerplate, near-zero vectors)
    * lands in one sign-bucket; an unbounded self-join there is quadratic.
    * Buckets over the bound are dropped whole. Only (id, bucket) rows
    * travel through the candidate shuffle; vectors join back for the
    * cosine verification over the (small) candidate set only. */
  def embeddingDupPairs(corpus: DataFrame, threshold: Double = 0.95,
      planes: Int = 8, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Int = 1000, capName: String = "embed_lsh"): DataFrame = {
    // nrm pinned — see [[cosineDupPairsByGroup]]; without it the
    // join-constraint isnotnull filter re-evaluates the sqrt-dot per row
    val bucketed = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      DedupExprs.evalOnce(norm(col(vecCol))).as("nrm"),
      lshSignature(col(vecCol), planes, dim).as("bucket"))
    val byBucket = Dedup.observeBucketCap(
        bucketed.select(col("id"), col("bucket"))
          .groupBy("bucket")
          .agg(collect_list(col("id")).as("grp")),
        capName, maxBucketSize)
      .filter(size(col("grp")).between(2, maxBucketSize))
    // normalize each unordered pair to (min, max) — collect_list order is
    // arbitrary (see Dedup.minhashPairs)
    val pairs = byBucket.select(explode(expr(
      """filter(
           flatten(transform(grp, (x, i) ->
             transform(slice(grp, i + 2, size(grp)), y ->
               struct(least(x, y) as a, greatest(x, y) as b)))),
           p -> p.a < p.b)""")).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
    val vecs = bucketed.select(col("id"), col("vec"), col("nrm"))
    pairs
      .join(vecs.select(col("id").as("id_a"), col("vec").as("va"),
        col("nrm").as("na")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vb"),
        col("nrm").as("nb")), "id_b")
      // sim pinned: one fold-dot per candidate, after the joins, with
      // the threshold filter above it (see [[cosineDupPairsByGroup]])
      .select(col("id_a"), col("id_b"),
        DedupExprs.evalOnce(dot(col("va"), col("vb")) /
          (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }
}
