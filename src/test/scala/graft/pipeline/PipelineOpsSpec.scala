package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness evidence for the operators without SQL oracles:
  * MinHash+LSH recall on planted near-duplicates, SimHash Hamming
  * properties, LSH-ANN recall vs brute force, multimodal plumbing.
  */
class PipelineOpsSpec extends AnyFunSuite with SparkTestBase {

  private val words = Vector("spark", "query", "row", "data", "filter",
    "merge", "sort", "batch", "join", "scan", "table", "window", "hash",
    "key", "order", "group", "value", "stream", "fast", "slow")

  private def synthText(seed: Int, n: Int = 60): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
  }

  /** Corrupt ~`frac` of the tokens (near-duplicate generator). */
  private def corrupt(text: String, frac: Double, seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    text.split(" ").map { w =>
      if (rnd.nextDouble() < frac) words(rnd.nextInt(words.size)) else w
    }.mkString(" ")
  }

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("minhash LSH finds planted near-duplicates, skips distinct docs") {
    val originals = (0 until 30).map(i => synthText(i))
    // plant near-dups of docs 0..4 (ids 30..34), 5% token corruption
    val nearDups = (0 until 5).map(i => corrupt(originals(i), 0.05, 100 + i))
    val df = docsDf(originals ++ nearDups)
    val pairs = Dedup.minhashPairs(df, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 5)
      assert(pairs.contains((i.toLong, (30 + i).toLong)),
        s"planted near-dup pair ($i, ${30 + i}) not found: $pairs")
    // no false positives among unrelated docs (verified-Jaccard guarantees)
    assert(pairs.forall { case (a, b) => b - a == 30 },
      s"unexpected pairs: $pairs")
  }

  test("simhash: identical docs distance 0; near-dups close; distinct far") {
    import spark.implicits._
    val base = synthText(1, 80)
    val df = Seq(
      (0L, base), (1L, base), (2L, corrupt(base, 0.05, 7)),
      (3L, synthText(99, 80)))
      .toDF("doc_id", "text")
    val fp = df.select(col("doc_id"), Dedup.simhash64(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
    assert(ham(0, 1) == 0)
    assert(ham(0, 2) < ham(0, 3),
      s"near-dup ${ham(0, 2)} should beat unrelated ${ham(0, 3)}")
    val pairs = Dedup.simhashPairs(df, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("LSH ANN recall vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, 10, planes = 6)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // random embeddings have no cluster structure, so bucket recall is
    // inherently modest; planted near-identical vectors below show the
    // high-similarity regime where LSH is actually used
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.15, s"LSH recall $recall too low")
    import spark.implicits._
    val planted = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => x * 1.001f).as("embedding"),
        col("label"))
    val emb2 = emb.unionByName(planted)
    val q2 = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val found = Similarity.lshTopK(emb2, q2, 1, planes = 6)
      .filter(col("nid") === col("qid") + 100000L).count()
    assert(found >= 8, s"only $found/10 planted near-identical neighbors found")
    // exact top-1 similarity ordering sanity
    val top = Similarity.bruteForceTopK(emb, queries, 1).collect()
    assert(top.forall(_.getDouble(3) <= 1.000001))
  }

  test("IVF ANN: planted near-identical vectors found via centroid probes") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planted = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => x * 1.001f).as("embedding"),
        col("label"))
    val emb2 = emb.unionByName(planted)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val found = Similarity.ivfTopK(emb2, queries, 1, nCentroids = 8, nprobe = 2)
      .filter(col("nid") === col("qid") + 100000L).count()
    assert(found >= 9, s"only $found/10 planted neighbors found via IVF")
    // general recall vs brute force
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, 10, nCentroids = 8, nprobe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall > 0.3, s"IVF recall $recall too low")
  }

  test("IVF Lloyd refine trains on a bounded deterministic sample") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val seeds = emb.orderBy("vec_id").limit(4).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    // the training aggregation's EXECUTED input row count (CollectMetrics
    // above the limit) is pinned to the sample bound: 500-row corpus,
    // bound 100 -> exactly 100 rows feed the per-cell fold
    val (c100, n100) =
      Similarity.refineCentroids(emb, seeds, 100, "vec_id", "embedding")
    assert(n100 == 100L, s"training rows $n100 != sample bound 100")
    // sample selection formula = first trainN in md5-of-id order: refining
    // over a pre-limited frame built with the same formula is bit-identical
    val top100 = emb.orderBy(
        conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10)
          .cast("long"), col("vec_id")).limit(100)
    val (c100b, _) =
      Similarity.refineCentroids(top100, seeds, 100, "vec_id", "embedding")
    assert(c100.map(_.toSeq).toSeq == c100b.map(_.toSeq).toSeq,
      "sample-trained centroids must equal the explicit md5-top-100 fold")
    // a bound >= corpus size degenerates to the full-corpus fold (this is
    // why the sf-test oracles are unchanged: 2*16*64 = 2048 >= 2000 rows)
    val (_, nAll) =
      Similarity.refineCentroids(emb, seeds, 100000, "vec_id", "embedding")
    assert(nAll == emb.count(), "unbounded sample must cover the corpus")
  }

  test("embeddingDupPairs drops hot buckets over maxBucketSize") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val v1 = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    val v2 = v1.map(-_) // opposite sign on every plane → different bucket
    // 10 identical vectors = one hot sign-bucket (45 potential pairs)
    val hot = (0L until 10L).map(i => (i, v1))
    val good = Seq((100L, v2), (101L, v2.map(x => x * 1.001f)))
    val df = (hot ++ good).toDF("vec_id", "embedding")
    val bounded = Similarity.embeddingDupPairs(df, threshold = 0.9,
        maxBucketSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bounded == Set((100L, 101L)),
      s"hot-bucket pairs must be dropped, got $bounded")
    val unbounded = Similarity.embeddingDupPairs(df, threshold = 0.9,
        maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unbounded.size == 45 + 1,
      s"expected all 46 pairs under a loose bound, got ${unbounded.size}")
  }

  test("pipeline plan shapes: shuffle budgets hold") {
    // exchange-count ceilings over a non-foldable source: a refactor that
    // sneaks in an extra corpus-wide shuffle fails here before it costs
    // anything at scale
    val docs = spark.range(100).select(col("id").as("doc_id"),
      concat_ws(" ", lit("alpha"), concat(lit("w"), pmod(col("id"), lit(7))),
        lit("beta")).as("text"))
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
    assert(exchanges(TextAnalysis.invertedIndex(docs)) <= 2,
      "inverted index: tf agg + term agg only")
    assert(exchanges(Dedup.paragraphDedup(docs)) <= 3,
      "paragraph dedup: digest count + count join + doc regroup only")
    assert(exchanges(TextAnalysis.qualityFilter(docs)) == 0,
      "quality filter must stay map-only")
    assert(exchanges(TextAnalysis.withRepetition(docs)) == 0 &&
      exchanges(TextAnalysis.withQuality(docs)) == 0,
      "signal passes must stay map-only")
  }

  test("paragraph dedup: boilerplate removed everywhere, rare paragraphs kept") {
    import spark.implicits._
    val boiler = "subscribe now"
    val df = (0 until 5).map { i =>
      (i.toLong, s"unique body $i\n\n$boiler" +
        (if (i == 0) "\n\nrare footer" else ""))
    }.toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(df, maxOccurrences = 5)
      .orderBy("doc_id").collect()
    // boilerplate appears 5x (>= 5) → removed from every doc
    assert(out.forall(r => r.getLong(r.fieldIndex("n_removed")) == 1L))
    assert(out(0).getLong(out(0).fieldIndex("n_paragraphs")) == 3L)
    // kept text of doc 0 = unique body + rare footer, in order
    val expected0 = java.security.MessageDigest.getInstance("MD5")
      .digest("unique body 0\n\nrare footer".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0).getString(out(0).fieldIndex("kept_md5")) == expected0)
    // empty-text docs yield no row
    assert(Dedup.paragraphDedup(Seq((9L, "")).toDF("doc_id", "text")).count() == 0)
  }

  test("sequence packing: exact prefix sums across partitions, straddling packs") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val docs = (0 until 500).map(i => (i.toLong, rng.nextInt(40) + 1L))
      .toDF("doc_id", "n_tokens")
      .repartition(13) // scramble: the scan must re-establish global order
    val out = Packing.packSequences(docs, budget = 64)
      .orderBy("doc_id").collect()
    var expect = 0L
    for (r <- out) {
      assert(r.getLong(r.fieldIndex("start")) == expect,
        s"prefix sum broke at doc ${r.getLong(0)}")
      assert(r.getLong(r.fieldIndex("pack_id")) == expect / 64)
      assert(r.getLong(r.fieldIndex("offset")) == expect % 64)
      expect += r.getLong(r.fieldIndex("n_tokens"))
    }
    // no global-order window in the plan (the single-partition trap)
    val plan = Packing.packSequences(docs, budget = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"must not use a window scan:\n$plan")
  }

  test("jaccard pairs: oversized groups fall back to minhash blocking (capped)") {
    import spark.implicits._
    val df = (0 until 8).map(i =>
        (i.toLong, if (i < 6) "big" else "ok", "same words here every time"))
      .toDF("doc_id", "g", "text")
    val out = Dedup.groupedJaccardPairs(df, "g",
      threshold = 0.1, maxGroupSize = 3).collect()
    val capped = out.filter(_.getBoolean(3))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = out.filter(!_.getBoolean(3))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 6-doc group exceeds the bound → the blocked path still yields
    // all 15 identical-text pairs (identical sigs share every bucket),
    // marked capped = true; the 2-doc group pairs exactly, uncapped
    assert(capped == (for { a <- 0 until 6; b <- a + 1 until 6 }
      yield (a.toLong, b.toLong)).toSet, s"got $capped")
    assert(exact == Set((6L, 7L)), s"got $exact")
    // under the default bound both groups pair freely: C(6,2) + C(2,2)
    val free = Dedup.groupedJaccardPairs(df, "g", threshold = 0.1).collect()
    assert(free.length == 16 && free.forall(!_.getBoolean(3)))
  }

  test("jaccard pairs: a 1001-doc group still yields its planted dup pair") {
    import spark.implicits._
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = (0 until 1001).map { i =>
      val text =
        if (i == 1000) base + " theta"
        else if (i == 999) base + " iota"
        else s"unique token stream number $i with filler ${i * 7} ${i * 13}"
      (i.toLong, "all", text)
    }.toDF("doc_id", "g", "text")
    // 1001 > default maxGroupSize=1000 → whole group takes the blocked
    // path; the planted near-dup pair (jaccard 20/22 ≈ 0.91, inside the
    // fallback's 8×8 S-curve) must survive it
    val out = Dedup.groupedJaccardPairs(docs, "g", threshold = 0.5).collect()
    assert(out.exists(r => r.getLong(0) == 999L && r.getLong(1) == 1000L
      && r.getBoolean(3)), s"planted pair lost: ${out.mkString(", ")}")
  }

  test("embed pairs: oversized groups fall back to LSH blocking (capped)") {
    import spark.implicits._
    def v(seed: Int) = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextGaussian().toFloat)
    }
    // 30-vector group over a cap of 10: the planted identical-vector dup
    // shares its sign bucket by construction and must survive the
    // blocked path; the small group pairs exactly, uncapped
    val df = ((0 until 28).map(i => (i.toLong, "big", v(i))) ++
      Seq((100L, "big", v(999)), (101L, "big", v(999)),
        (200L, "ok", v(5)), (201L, "ok", v(5))))
      .toDF("vec_id", "g", "embedding")
    val out = Similarity.cosineDupPairsByGroup(df, "g", threshold = 0.99,
      maxGroupSize = 10, planes = 4, dim = 8).collect()
    val capped = out.filter(_.getBoolean(3))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = out.filter(!_.getBoolean(3))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((100L, 101L)),
      s"planted dup must survive blocking: $capped")
    assert(exact == Set((200L, 201L)), s"got $exact")
  }

  test("hot-bucket caps are observable: dropped counts on planted input") {
    import spark.implicits._
    // 150 identical docs share every band bucket → 16 oversized buckets
    // of 150 under a cap of 100; the near-dup pair stays in tiny buckets
    val docs = ((0 until 150).map(i =>
        (i.toLong, "all the same words in every single one of these")) ++
      Seq((150L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (151L, "alpha beta gamma delta epsilon zeta eta theta iota lambda")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, threshold = 0.3, maxBucketSize = 100)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((150L, 151L)),
      s"identical-doc pairs capped away, near-dup pair survives: $got")
    val diag = Dedup.capDiagnostics(pairs)
    assert(diag.get("minhash").contains((16L, 16L * 150L, 150L)),
      s"cap diagnostics: $diag")
    // uncapped run reports zero drops (and the observation costs no jobs)
    val free = Dedup.minhashPairs(docs, threshold = 0.3)
    free.collect()
    val freeDiag = Dedup.capDiagnostics(free)
    assert(freeDiag("minhash")._1 == 0L && freeDiag("minhash")._3 == 150L)
    // simhash + embedding-LSH carry the same observation
    val sp = Dedup.simhashPairs(docs, maxBucketSize = 100)
    sp.collect()
    assert(Dedup.capDiagnostics(sp)("simhash")._1 >= 1L)
    // 120 identical vectors drop (one hot bucket over the cap of 50);
    // the opposite-sign dup pair survives, keeping the result non-empty
    // (a fully-empty result lets AQE prune the unexecuted metrics stage
    // — see the capDiagnostics scaladoc)
    val emb = ((0 until 120).map(i => (i.toLong, Array.fill(8)(0.5f))) ++
      Seq((200L, Array.fill(8)(-0.5f)), (201L, Array.fill(8)(-0.5f))))
      .toDF("vec_id", "embedding")
    val ep = Similarity.embeddingDupPairs(emb, planes = 4, dim = 8,
      maxBucketSize = 50)
    assert(ep.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((200L, 201L)))
    assert(Dedup.capDiagnostics(ep)("embed_lsh") == ((1L, 120L, 120L)),
      s"got ${Dedup.capDiagnostics(ep)}")
  }

  test("incremental dedup: exact digest, overlap scoring, keep filter") {
    import spark.implicits._
    val prev = Seq((0L, "alpha beta gamma delta epsilon"),
      (1L, "one two three four five six")).toDF("doc_id", "text")
    val nw = Seq(
      (10L, "alpha beta gamma delta epsilon"), // exact copy of prev 0
      (11L, "alpha beta gamma delta zeta"),    // shares 2 of 3 shingles
      (12L, "totally different words in here") // no overlap
      ).toDF("doc_id", "text")
      .union(Seq((13L, "")).toDF("doc_id", "text")) // shingle-less
    val out = Dedup.incrementalDedup(nw, prev, threshold = 0.5).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out(10L)._1 && !out(10L)._5, s"exact dup dropped: ${out(10L)}")
    assert(!out(11L)._1 && out(11L)._2 == 3L && out(11L)._3 == 2L
      && !out(11L)._5, s"near dup dropped on overlap: ${out(11L)}")
    assert(!out(12L)._1 && out(12L)._3 == 0L && out(12L)._5)
    assert(out(13L) == ((false, 0L, 0L, 0.0, true)),
      s"empty doc kept on digest alone: ${out(13L)}")
  }

  test("duplicated ngram fraction: cross-doc shared shingles only") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b c d"), // shingles: (a b c), (b c d)
      (1L, "a b c e"), // shares (a b c) with doc 0
      (2L, "x y z w"), // all unique
      (3L, ""))        // no shingle → no row
      .toDF("doc_id", "text")
    val out = Dedup.duplicatedNgramFraction(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((2L, 1L, 0.5)), s"got ${out(0L)}")
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 0L, 0.0)))
    assert(!out.contains(3L))
  }

  test("weighted mix: per-source rates, unknown drops, samples nest") {
    import spark.implicits._
    val df = (0 until 4000).map(i => (i.toLong, s"s${i % 4}"))
      .toDF("doc_id", "source")
    val by = Sampling.weightedMix(df,
        Map("s0" -> 4L, "s1" -> 2L, "s2" -> 1L), keyCol = "source")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by("s0") == 1000L, "max-weight source passes whole")
    assert(by("s1") > 380L && by("s1") < 620L, s"~50%: ${by("s1")}")
    assert(by("s2") > 150L && by("s2") < 350L, s"~25%: ${by("s2")}")
    assert(!by.contains("s3"), "unweighted source drops")
    // hash-keyed thresholds nest: weight 1-of-4 ⊂ weight 2-of-4
    def ids(w: Long) = Sampling.weightedMix(df,
        Map("s1" -> w, "pad" -> 4L), keyCol = "source")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(1L).subsetOf(ids(2L)))
  }

  test("semantic dedup: min-id retention inside clusters, singletons keep") {
    import spark.implicits._
    def v(seed: Int) = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextGaussian().toFloat)
    }
    // ids 100/101 duplicate id 7's vector: all three share a cluster and
    // pair at cosine 1.0 → min-id retention keeps 7, drops 100 and 101
    val df = ((0 until 30).map(i => (i.toLong, v(i))) ++
      Seq((100L, v(7)), (101L, v(7))))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(df, threshold = 0.999,
        nCentroids = 4, dim = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.size == 32)
    assert(out(7L)._2 && !out(100L)._2 && !out(101L)._2,
      s"min-id keeps 7, drops its dups: $out")
    assert(out(7L)._1 == out(100L)._1 && out(7L)._1 == out(101L)._1,
      "identical vectors share a cluster")
    assert(out.count(!_._2._2) == 2, s"only the planted dups drop: $out")
  }

  test("oov rate: topK cut with count-desc term-asc tie-break") {
    import spark.implicits._
    // counts: aa 4, bb 2, zz 2, cc 1 → top-2 = {aa, bb} (bb beats zz on
    // the term-asc tie-break)
    val df = Seq((0L, "aa aa aa bb"), (1L, "aa bb cc"), (2L, "zz zz"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(df, topK = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((4L, 0L, 0.0)), s"got ${out(0L)}")
    assert(out(1L) == ((3L, 1L, 0.333333)))
    assert(out(2L) == ((2L, 2L, 1.0)))
  }

  test("split assignment: disjoint, exhaustive, deterministic, ~weights") {
    import spark.implicits._
    val df = (0 until 5000).map(i => Tuple1(i.toLong)).toDF("doc_id")
    val splits = Seq("train" -> 8L, "val" -> 1L, "test" -> 1L)
    val out = Sampling.assignSplits(df, splits)
    val by = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by.values.sum == 5000L, "every row gets exactly one split")
    assert(by("train") > 3800L && by("train") < 4200L, s"~80%: $by")
    assert(by("val") > 350L && by("val") < 650L, s"~10%: $by")
    // deterministic: re-evaluation yields the identical assignment
    val a = out.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Sampling.assignSplits(df, splits).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("new operator plans: map-only mixing/splitting, broadcast scoring") {
    import spark.implicits._
    val df = (0 until 100).map(i =>
        (i.toLong, s"s${i % 4}", s"some text tokens number $i here"))
      .toDF("doc_id", "source", "text")
    // weightedMix and assignSplits must stay shuffle-free (map-only)
    val mix = Sampling.weightedMix(df.select("doc_id", "source"),
      Map("s0" -> 2L, "s1" -> 1L), keyCol = "source")
    assert(!mix.queryExecution.executedPlan.toString.contains("Exchange"),
      "weightedMix must not shuffle")
    val split = Sampling.assignSplits(df, Seq("a" -> 1L, "b" -> 1L))
    assert(!split.queryExecution.executedPlan.toString.contains("Exchange"),
      "assignSplits must not shuffle")
    // the vocabulary / previous-snapshot sides must come back broadcast
    assert(TextAnalysis.oovRate(df).queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "oovRate vocab join must broadcast")
    val inc = Dedup.incrementalDedup(
      df.filter(col("doc_id") % 2 === 0), df.filter(col("doc_id") % 2 === 1))
    assert(inc.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "incrementalDedup joins must broadcast")
  }

  test("inverted index: hot-term posting truncation is observable") {
    import spark.implicits._
    // "hot" appears in all 5 docs; cap postings at 3 → 2 cut from it.
    // "rare" stays under the cap → zero drops reported, row unflagged.
    val docs = (0 until 5).map(i =>
        (i.toLong, if (i < 2) s"hot rare$i" else "hot"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, maxPostings = 3)
    val rows = out.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(rows("hot") == ((5L, true)), s"got $rows")
    assert(!rows("rare0")._2)
    val diag = Dedup.capDiagnostics(out)
    // 1 truncated term, 5-3=2 postings cut, max df 5
    assert(diag.get("inverted_index").contains((1L, 2L, 5L)), s"got $diag")
  }

  test("capName disambiguates two capped operators composed in one plan") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "some entirely unrelated stream of filler words"))
      .toDF("doc_id", "text")
    // CollectMetrics names must be unique per plan: two instances of the
    // same operator under ONE action need distinct capName overrides
    val both = Dedup.minhashPairs(docs, threshold = 0.3, capName = "mh_a")
      .unionByName(Dedup.minhashPairs(docs, threshold = 0.9, capName = "mh_b"))
    both.collect()
    val diag = Dedup.capDiagnostics(both)
    assert(diag.contains("mh_a") && diag.contains("mh_b"), s"got $diag")
    // with the default fixed name, two DIFFERENT plans clash at analysis
    // (unionByName analyzes eagerly, so the construction itself throws)
    intercept[org.apache.spark.sql.AnalysisException] {
      Dedup.minhashPairs(docs, threshold = 0.3)
        .unionByName(Dedup.minhashPairs(docs, threshold = 0.9))
        .collect()
    }
  }

  test("multimodal feature extraction plumbing: schema, determinism, batching") {
    import spark.implicits._
    val df = Seq(
      (1L, Array[Byte](1, 2, 3)), (2L, Array[Byte](9, 9)),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val out = Multimodal.extractFeatures(df)
    assert(out.schema("features").dataType == Multimodal.featureSchema)
    val rows = out.orderBy("id").collect()
    val f1 = rows(0).getStruct(rows(0).fieldIndex("features"))
    assert(f1.getInt(f1.fieldIndex("byte_size")) == 3)
    assert(f1.getInt(f1.fieldIndex("width")) >= 64)
    // deterministic across runs (compare the features struct)
    def feats(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getStruct(2).toString).toSeq
    val again = Multimodal.extractFeatures(df).orderBy("id").collect()
    assert(feats(rows) == feats(again))
    // null payload flows through the fallback (no codec claims 0 bytes)
    val f3 = rows(2).getStruct(rows(2).fieldIndex("features"))
    assert(f3.getInt(f3.fieldIndex("byte_size")) == 0)
    assert(!f3.getBoolean(f3.fieldIndex("decode_ok")))
    // frame sampling emits bounded per-record rows
    val frames = Multimodal.sampleFrames(df.filter(col("id") === 1L), everyNth = 1, maxFrames = 2)
    assert(frames.count() == 2)
  }

  test("multimodal real ImageIO decode: dimensions, channels, fallback") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.synthImage("png", 17, 9)),
      (2L, Multimodal.synthImage("bmp", 33, 21)),
      (3L, Multimodal.synthImage("jpg", 5, 7)),
      (4L, "definitely not an image payload".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = Multimodal.extractFeatures(df).orderBy("id").collect()
    def f(i: Int) = out(i).getStruct(out(i).fieldIndex("features"))
    for ((i, w, h) <- Seq((0, 17, 9), (1, 33, 21), (2, 5, 7))) {
      assert(f(i).getBoolean(f(i).fieldIndex("decode_ok")), s"row $i must decode")
      assert(f(i).getInt(f(i).fieldIndex("width")) == w)
      assert(f(i).getInt(f(i).fieldIndex("height")) == h)
      assert(f(i).getInt(f(i).fieldIndex("channels")) == 3)
    }
    assert(!f(3).getBoolean(f(3).fieldIndex("decode_ok")))
    // fallback keeps the deterministic hash-derived pseudo-dimensions
    assert(f(3).getInt(f(3).fieldIndex("width")) >= 64)
    // corrupt container (valid PNG magic, truncated body) → opaque, no throw
    val corrupt = Multimodal.synthImage("png", 17, 9).take(20)
    assert(!Multimodal.decode(corrupt).getBoolean(5))
  }

  test("multimodal resize: integer-exact downscale; pass-through cases") {
    // 40x20 → maxDim 16 → 16x8 (integer math), re-decoded for real
    val resized = Multimodal.resizeImage(Multimodal.synthImage("png", 40, 20), 16)
    val d = Multimodal.decode(resized)
    assert(d.getInt(0) == 16 && d.getInt(1) == 8 && d.getBoolean(5))
    // extreme aspect ratio clamps to 1, never 0
    val thin = Multimodal.decode(
      Multimodal.resizeImage(Multimodal.synthImage("png", 100, 2), 16))
    assert(thin.getInt(0) == 16 && thin.getInt(1) == 1)
    // already small and opaque payloads pass through untouched
    val small = Multimodal.synthImage("png", 8, 8)
    assert(Multimodal.resizeImage(small, 16).sameElements(small))
    val opaque = "not an image".getBytes("UTF-8")
    assert(Multimodal.resizeImage(opaque, 16).sameElements(opaque))
  }

  test("multimodal resizeFeatures: decode-once ≡ resize-then-extract") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.synthImage("png", 40, 20)),   // needs downscale
      (2L, Multimodal.synthImage("png", 8, 8)),     // within bounds
      (3L, Multimodal.synthImage("bmp", 100, 2)),   // extreme aspect ratio
      (4L, "not an image at all".getBytes("UTF-8")), // opaque
      (5L, Array.empty[Byte]))                      // empty
      .toDF("id", "payload")
    val staged = Multimodal.resizeFeatures(df, maxDim = 16)
      .orderBy("id").collect()
    // the naive two-decode composition the kernel replaces
    val naive = Multimodal.extractFeatures(
        df.select(col("id"), udf((p: Array[Byte]) =>
          Multimodal.resizeImage(p, 16)).apply(col("payload")).as("payload")))
      .orderBy("id").collect()
    for (i <- staged.indices) {
      val sf = staged(i).getStruct(staged(i).fieldIndex("features"))
      val nf = naive(i).getStruct(naive(i).fieldIndex("features"))
      assert(sf == nf, s"row $i: staged $sf != naive $nf")
      assert(staged(i).getAs[Array[Byte]]("resized")
        .sameElements(naive(i).getAs[Array[Byte]]("payload")),
        s"row $i: resized bytes differ")
    }
  }

  test("multimodal audio: WAV metadata decode, opaque fallback") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.synthWav(16000, 2, 300)),
      (2L, Multimodal.synthWav(8000, 1, 101)),
      (3L, "definitely not audio".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = Multimodal.extractAudio(df).orderBy("id").collect()
    def a(i: Int) = out(i).getStruct(out(i).fieldIndex("audio"))
    assert(a(0).getInt(0) == 16000 && a(0).getInt(1) == 2 &&
      a(0).getInt(2) == 16 && a(0).getLong(3) == 300L && a(0).getBoolean(4))
    assert(a(1).getInt(0) == 8000 && a(1).getInt(1) == 1 &&
      a(1).getLong(3) == 101L)
    assert(!a(2).getBoolean(4) && a(2).isNullAt(0))
  }

  test("audio decode terminates on corrupt chunk sizes; data-before-fmt ok") {
    import java.nio.{ByteBuffer, ByteOrder}
    // WAV with a chunk-size field of 0xFFFFFFF8: as a truncated Int the
    // walk step is exactly 0 — must terminate (decode_ok=false), not hang
    val evilWav = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(16)
      .put("WAVE".getBytes("US-ASCII"))
      .put("junk".getBytes("US-ASCII")).putInt(0xFFFFFFF8).array()
    assert(!Multimodal.decodeAudio(evilWav).getBoolean(4))
    // AIFF with size 0xFFFFFFF7 (step would be -1 in Int arithmetic)
    val evilAiff = ByteBuffer.allocate(24).order(ByteOrder.BIG_ENDIAN)
      .put("FORM".getBytes("US-ASCII")).putInt(16)
      .put("AIFF".getBytes("US-ASCII"))
      .put("junk".getBytes("US-ASCII")).putInt(0xFFFFFFF7).array()
    assert(!Multimodal.decodeAudio(evilAiff).getBoolean(4))
    // WAV whose data chunk precedes fmt still decodes (frames computed
    // after the walk once both chunks are known)
    val good = Multimodal.synthWav(16000, 2, 300)
    val fmtLen = 16 + 8 // "fmt " + size + body
    val dataFirst = ByteBuffer.allocate(good.length)
      .put(good, 0, 12)                                  // RIFF header
      .put(good, 12 + fmtLen, good.length - 12 - fmtLen) // data chunk
      .put(good, 12, fmtLen)                             // fmt chunk last
      .array()
    val r = Multimodal.decodeAudio(dataFirst)
    assert(r.getBoolean(4) && r.getInt(0) == 16000 && r.getInt(1) == 2 &&
      r.getLong(3) == 300L, s"data-before-fmt: $r")
  }

  test("text analysis metrics on edge cases") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "   "), (3L, "the cat. and dog!"),
      (4L, "das der und die")).toDF("doc_id", "text")
    val q = TextAnalysis.withQuality(df).orderBy("doc_id").collect()
    assert(q(0).getInt(q(0).fieldIndex("n_tokens")) == 0)
    assert(q(1).getInt(q(1).fieldIndex("n_tokens")) == 0)
    assert(q(2).getInt(q(2).fieldIndex("n_tokens")) == 4)
    val langs = df.select(col("doc_id"), TextAnalysis.langGuess(col("text")).as("l"))
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(langs(2) == "en" && langs(3) == "de")
  }

  test("repetition signals: loops score high, varied text low, empties zero") {
    import spark.implicits._
    val df = Seq(
      (1L, "buy now buy now buy now buy now"), // pure 2-token loop
      (2L, "one two three four five six seven eight"), // all distinct
      (3L, ""), (4L, "solo")).toDF("doc_id", "text")
    val r = TextAnalysis.withRepetition(df).orderBy("doc_id").collect()
    def d(i: Int, f: String) = r(i).getDouble(r(i).fieldIndex(f))
    // loop doc: "buy" appears 4/8; 2-grams 7 total, 2 distinct
    assert(d(0, "top_word_ratio") == 0.5)
    assert(d(0, "dup_2gram_ratio") > 0.7 && d(0, "frac_distinct_words") == 0.25)
    // varied doc: zero repetition anywhere
    assert(d(1, "top_word_ratio") == 0.125 && d(1, "dup_2gram_ratio") == 0.0)
    assert(d(1, "frac_distinct_words") == 1.0)
    // empty / single-token docs: no n-grams, ratios well-defined
    assert(d(2, "top_word_ratio") == 0.0 && d(2, "dup_3gram_ratio") == 0.0)
    assert(d(3, "dup_2gram_ratio") == 0.0 && d(3, "frac_distinct_words") == 1.0)
    // plan pin: the native kernel runs ONCE per row (staged projection —
    // CollapseProject must not inline it into each of the 5 derived
    // columns), and the old interpreted HOF pipeline is gone
    val plan = TextAnalysis.withRepetition(
        spark.range(4).withColumn("text",
          concat(lit("a b "), col("id").cast("string"))))
      .queryExecution.executedPlan.toString
    assert("graft_repetition_stats".r.findAllIn(plan).size == 1,
      s"kernel must appear exactly once in the plan:\n$plan")
    assert(!plan.contains("array_distinct"), "HOF pipeline must be gone")
  }

  test("repetition kernel differential fuzz vs the HOF twin (200 docs)") {
    import spark.implicits._
    // the interpreted HOF pipeline the native kernel replaced — kept here
    // as the semantic reference (mode frequency; k-gram dup ratios)
    def hofTwin(df: org.apache.spark.sql.DataFrame) = {
      val toks = TextAnalysis.tokens(col("text"))
      val n = size(toks)
      val topCount = array_max(transform(array_distinct(toks),
        w => size(filter(toks, x => x === w))))
      def ngrams(k: Int) =
        when(n < k, array().cast("array<string>")).otherwise(
          transform(sequence(lit(0), n - k), i =>
            array_join(slice(toks, i + 1, lit(k)), " ")))
      def dupRatio(g: org.apache.spark.sql.Column) =
        when(size(g) === 0, lit(0.0)).otherwise(
          (size(g) - size(array_distinct(g))).cast("double") / size(g))
      df.select(col("doc_id"), n.cast("long").as("n_tokens"),
        round(when(n === 0, lit(0.0)).otherwise(topCount.cast("double") / n), 6)
          .as("top_word_ratio"),
        round(dupRatio(ngrams(2)), 6).as("dup_2gram_ratio"),
        round(dupRatio(ngrams(3)), 6).as("dup_3gram_ratio"),
        round(when(n === 0, lit(0.0))
          .otherwise(size(array_distinct(toks)).cast("double") / n), 6)
          .as("frac_distinct_words"))
    }
    val rng = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "loop", "x1")
    val docs = (0 until 200).map { i =>
      val n = rng.nextInt(40)
      val seps = Vector(" ", "  ", "\t", "\n")
      val body = Seq.fill(n)(vocab(rng.nextInt(vocab.size)))
        .mkString(seps(rng.nextInt(seps.size)))
      // leading/trailing space sometimes — the trim-spaces-only edge
      val pad = if (rng.nextBoolean()) "  " else ""
      (i.toLong, pad + body + (if (rng.nextBoolean()) " " else ""))
    }.toDF("doc_id", "text")
    val cols = Seq("doc_id", "n_tokens", "top_word_ratio", "dup_2gram_ratio",
      "dup_3gram_ratio", "frac_distinct_words")
    val kernel = TextAnalysis.withRepetition(docs)
      .select(cols.map(col): _*).orderBy("doc_id").collect().toSeq
    val twin = hofTwin(docs).orderBy("doc_id").collect().toSeq
    for ((k, t) <- kernel.zip(twin))
      assert(k == t, s"kernel/HOF divergence: $k vs $t")
  }

  test("html extraction: blocks dropped, tags stripped, entities decoded") {
    import spark.implicits._
    val df = Seq(
      (1L, "<html><head><script>if (a < b) alert('x');</script></head>" +
        "<body><h1>Title</h1><p>Hello   <b>world</b></p>" +
        "<!-- hidden --><style>p{}</style>&amp; more &lt;ok&gt;</body></html>"),
      (2L, "plain text, no markup"),
      (3L, "")).toDF("doc_id", "text")
    val out = df.select(TextAnalysis.htmlToText(col("text")).as("t"))
      .collect().map(_.getString(0))
    assert(out(0) == "Title Hello world & more <ok>", s"got '${out(0)}'")
    assert(out(1) == "plain text, no markup")
    assert(out(2) == "")
  }

  test("url host: scheme-flexible, lower-cased, stops at /?#; junk empty") {
    import spark.implicits._
    val got = Seq("https://WWW.Example.COM/path?q=1",
      "http://a.b:8080/x", "ftp://Host/", "not a url", "")
      .toDF("u").select(TextAnalysis.urlHost(col("u")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("www.example.com", "a.b:8080", "host", "", ""))
  }

  test("quality filter: clean doc keeps, each rule fires with its reason") {
    import spark.implicits._
    // 60 tokens, all 2-grams distinct, stopwords interleaved: passes all
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val clean = (0 until 30)
      .flatMap(i => Seq(stops(i % 8), s"word$i")).mkString(" ")
    val df = Seq(
      (1L, clean),                              // passes every rule
      (2L, "short text"),                       // n_tokens
      (3L, ("buy now " * 40).trim))             // repetition rules fire
      .toDF("doc_id", "text")
    val r = TextAnalysis.qualityFilter(df).orderBy("doc_id").collect()
    def row(i: Int) = (r(i).getBoolean(r(i).fieldIndex("keep")),
      r(i).getString(r(i).fieldIndex("reasons")))
    assert(row(0) == ((true, "")), s"clean doc: ${row(0)}")
    assert(!row(1)._1 && row(1)._2.contains("n_tokens"))
    assert(!row(2)._1 && row(2)._2.contains("top_word_ratio") &&
      row(2)._2.contains("dup_2gram") && row(2)._2.contains("dup_3gram"))
    // reason order is fixed regardless of which rules fire
    assert(row(2)._2.indexOf("top_word_ratio") < row(2)._2.indexOf("dup_2gram"))
  }

  test("pii scrub: emails/ips/phones replaced and counted, clean text kept") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b+c@test.org and d@e.io, host 10.0.255.7, tel 555-010-1234"),
      (2L, "version 1.2 costs 3.50 at 12:30"), // decimals must NOT match
      (3L, ""),
      (4L, "call (555) 010-1234 or +1 555.010.1234, ssn 123-45-6789"),
      (5L, "bad ips 999.300.1.2 and 256.1.1.1 stay")).toDF("doc_id", "text")
    val r = TextAnalysis.scrubPii(df).orderBy("doc_id").collect()
    def row(i: Int) = (r(i).getLong(r(i).fieldIndex("n_emails")),
      r(i).getLong(r(i).fieldIndex("n_ips")),
      r(i).getLong(r(i).fieldIndex("n_ssns")),
      r(i).getLong(r(i).fieldIndex("n_phones")),
      r(i).getString(r(i).fieldIndex("scrubbed")))
    assert(row(0) == ((2L, 1L, 0L, 1L,
      "mail [EMAIL] and [EMAIL], host [IP], tel [PHONE]")))
    assert(row(1) == ((0L, 0L, 0L, 0L, "version 1.2 costs 3.50 at 12:30")))
    assert(row(2) == ((0L, 0L, 0L, 0L, "")))
    // parenthesized + international phones; SSN is its own category
    assert(row(3) == ((0L, 0L, 1L, 2L, "call [PHONE] or [PHONE], ssn [SSN]")))
    // octet-invalid addresses are NOT redacted
    assert(row(4) == ((0L, 0L, 0L, 0L, "bad ips 999.300.1.2 and 256.1.1.1 stay")))
  }

  test("decontaminate: copied doc flagged, clean doc scored, joins agree") {
    import spark.implicits._
    val evalDoc = synthText(500, 40)
    val bench = Seq((1000L, evalDoc)).toDF("doc_id", "text")
    val train = docsDf(Seq(
      evalDoc,                    // verbatim leak → overlap 1.0
      corrupt(evalDoc, 0.1, 42),  // near-copy → high overlap
      synthText(777, 40),         // unrelated
      ""))                        // empty → dropped (no shingles)
    val out = Dedup.decontaminate(train, bench, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out.size == 3, s"empty doc must drop: $out")
    assert(out(0L)._3 == 1.0 && out(0L)._4, s"verbatim copy: ${out(0L)}")
    assert(out(1L)._3 > 0.5 && out(1L)._4, s"near-copy: ${out(1L)}")
    assert(out(2L)._3 < 0.3 && !out(2L)._4, s"unrelated: ${out(2L)}")
    assert(out.values.forall(v => v._2 <= v._1), "matched <= ngrams")
    // the shuffle-join fallback computes the identical result
    val noBc = Dedup.decontaminate(train, bench, threshold = 0.5,
        broadcastBenchmark = false)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(noBc == out)
  }

  test("dupClusters: chains close transitively, singletons self-label") {
    import spark.implicits._
    // docs 0..11; component A = chain 0-1-2-3 (diameter 3, exercises
    // multi-round propagation), component B = triangle 5-6-7,
    // component C = long path 8-9-10-11; 4 is a singleton
    val docs = (0L to 11L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L),
      (5L, 7L), (8L, 9L), (9L, 10L), (10L, 11L)).toDF("a", "b")
    val got = Dedup.dupClusters(docs, pairs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val expect = Seq(
      (0L, 0L, true), (1L, 0L, false), (2L, 0L, false), (3L, 0L, false),
      (4L, 4L, true),
      (5L, 5L, true), (6L, 5L, false), (7L, 5L, false),
      (8L, 8L, true), (9L, 8L, false), (10L, 8L, false), (11L, 8L, false))
    assert(got.toSeq == expect)
    // the distributed-rounds path (forced via maxDriverEdges = 0) reaches
    // the identical fixpoint as the driver union-find
    val distributed = Dedup.dupClusters(docs, pairs, maxDriverEdges = 0L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(distributed.toSeq == expect)
    // empty pair list → everything is its own canonical cluster
    val solo = Dedup.dupClusters(docs, pairs.limit(0))
    assert(solo.filter(col("doc_id") =!= col("cluster_id")).isEmpty)
  }

  test("token budget fill: quota reached, crossing doc kept, budgets nest") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, if (i % 2 == 0) "en" else "de", 10L))
      .toDF("doc_id", "lang", "n_tokens")
    val got = Sampling.byTokenBudget(df, "lang", "n_tokens", budget = 95)
      .collect()
    // 10-token docs, budget 95: 9 docs have cum < 95 (0..80), the 10th
    // starts at 90 < 95 → kept (crossing doc included) = 10 per stratum
    assert(got.count(_.getString(1) == "en") == 10)
    assert(got.count(_.getString(1) == "de") == 10)
    assert(got.forall(r => r.getLong(r.fieldIndex("cum_tokens")) < 95))
    // smaller budget selects a subset (same hash order)
    val small = Sampling.byTokenBudget(df, "lang", "n_tokens", budget = 45)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = got.map(_.getLong(0)).toSet
    assert(small.subsetOf(big) && small.size == 10)
  }

  test("sampling: nested rates, exact-k per stratum, deterministic") {
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val r01 = Sampling.sampleByRate(df, 0.1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val r03 = Sampling.sampleByRate(df, 0.3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(r01.subsetOf(r03), "hash-threshold samples must nest")
    assert(r03.size > r01.size && r01.nonEmpty)
    // realized fraction is binomial around the rate
    assert(math.abs(r03.size / 400.0 - 0.3) < 0.12)
    val strat = Sampling.stratifiedExactK(df, "lang", k = 7)
    val byLang = strat.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 7L, "de" -> 7L))
    // rank is 1..k by hash order and stable across runs
    val ranks = strat.filter(col("lang") === "en")
      .orderBy("rank").select("rank").collect().map(_.getLong(0)).toSeq
    assert(ranks == (1L to 7L))
    assert(strat.orderBy("lang", "rank").collect().toSeq ==
      Sampling.stratifiedExactK(df, "lang", k = 7)
        .orderBy("lang", "rank").collect().toSeq)
    // k larger than the stratum returns the whole stratum
    val tiny = Seq((1L, "fr"), (2L, "fr")).toDF("doc_id", "lang")
    assert(Sampling.stratifiedExactK(tiny, "lang", k = 10).count() == 2)
  }

  test("chunking: coverage, overlap, tail window, single-split plan") {
    import spark.implicits._
    val doc = (1 to 50).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "one two"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkByTokens(df, chunkSize = 32, stride = 16)
    val rows = out.orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1: 50 tokens -> ceil(18/16)+1 = 3 chunks at offsets 0/16/32
    val d1 = rows.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(d1.map(_._3).toSeq == Seq(32L, 32L, 18L), "tail window clips")
    assert(d1(0)._4.startsWith("t1 t2 ") && d1(1)._4.startsWith("t17 ") &&
      d1(2)._4.startsWith("t33 "))
    // every token is covered; overlap tokens appear in both windows
    assert(d1.flatMap(_._4.split(" ")).toSet == (1 to 50).map(i => s"t$i").toSet)
    // short doc -> one chunk; empty doc -> none
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 2L, "one two")))
    assert(!rows.exists(_._1 == 3L))
    // the Generate-re-evaluation guard: the document is tokenized at most
    // once (a LocalRelation folds it to zero) — never once per chunk
    val plan = out.queryExecution.optimizedPlan.toString
    assert("split\\(".r.findAllIn(plan).size <= 1,
      s"split leaked above the Generate (re-tokenize per chunk):\n$plan")
  }

  test("tfidf: tf/df exact, rank favors rare terms, term-asc tiebreak") {
    import spark.implicits._
    val df = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry banana"),
      (3L, "cherry dates!  Dates")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // doc 1: apple tf=2 df=1 beats banana tf=1 df=2 and cherry tf=1 df=3
    assert(out.filter(_._1 == 1L).toSeq ==
      Seq((1L, "apple", 2L, 1L, 1L), (1L, "banana", 1L, 2L, 2L)))
    // doc 3: punctuation/case fold into the same term
    assert(out.filter(_._1 == 3L).head ==
      ((3L, "dates", 2L, 1L, 1L)))
    // equal (tf, df) scores tie exactly → term ascending breaks it
    val tie = TextAnalysis.tfidfTopTerms(
      Seq((1L, "zeta alpha"), (2L, "unrelated")).toDF("doc_id", "text"), k = 2)
      .filter(col("doc_id") === 1L).orderBy("rank").collect()
      .map(_.getString(1)).toSeq
    assert(tie == Seq("alpha", "zeta"))
  }

  test("span removal: shared + self-repeated spans stripped, clean kept") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon" // 5 tokens, in docs 0+1
    val df = Seq(
      (0L, s"one two $shared three four"),
      (1L, s"$shared five six seven eight nine"),
      // self-repetition: the same 4-gram twice inside ONE doc
      (2L, "p q r s HELLO WORLD BIG DEAL mid HELLO WORLD BIG DEAL tail"),
      (3L, "totally distinct tokens nothing here repeats at all"),
      (4L, "")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(df, k = 4).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    // docs 0/1: exactly the 5 shared tokens go (both 4-grams of the
    // shared span are duplicated; the surrounding grams are unique)
    assert(out(0) == ((0L, 9L, 5L, "one two three four")))
    assert(out(1) == ((1L, 10L, 5L, "five six seven eight nine")))
    // doc 2: both occurrences of the self-repeated 4-gram are stripped
    assert(out(2) == ((2L, 14L, 8L, "p q r s mid tail")))
    // doc 3 untouched, doc 4 empty in/out
    assert(out(3) == ((3L, 8L, 0L, "totally distinct tokens nothing here repeats at all")))
    assert(out(4) == ((4L, 0L, 0L, "")))
    // a doc shorter than k produces no grams and survives whole
    val short = Dedup.removeDuplicatedSpans(
      Seq((0L, "a b c"), (1L, "a b c")).toDF("doc_id", "text"), k = 4)
      .orderBy("doc_id").collect()
    assert(short.map(_.getString(3)).toSeq == Seq("a b c", "a b c"))
  }

  test("lm perplexity: add-one bigram LM, hand-computed") {
    import spark.implicits._
    // bigrams: doc0 (a,b)(b,a)(a,b), doc1 (a,b) → c(a,b)=3, c(b,a)=1;
    // prefix counts a=3, b=1; vocab = bigram participants {a,b}, V=2
    // ("c" appears only in a single-token doc → no vocab mass)
    val df = Seq((0L, "a b a b"), (1L, "a b"), (2L, "c"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmPerplexity(df).orderBy("doc_id").collect()
    // P(b|a) = (3+1)/(3+2) = 0.8; P(a|b) = (1+1)/(1+2) = 2/3
    // doc0: nll = 2(-ln .8) + (-ln 2/3) = 0.851746, avg .2839, ppl 1.33
    // doc1: avg = -ln .8 = 0.2231, ppl = 1/0.8 = 1.25 exactly
    assert(out(0).getLong(1) == 3 && out(0).getDouble(2) == 0.2839 &&
      out(0).getDouble(3) == 1.33)
    assert(out(1).getLong(1) == 1 && out(1).getDouble(2) == 0.2231 &&
      out(1).getDouble(3) == 1.25)
    // <2 tokens: zero bigrams, NULL scores
    for (i <- 2 to 3)
      assert(out(i).getLong(1) == 0 && out(i).isNullAt(2) && out(i).isNullAt(3))
  }

  test("span removal + lm perplexity plans: no cartesian, cache reused") {
    import spark.implicits._
    val df = (0 until 200).map(i =>
        (i.toLong, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11} x$i"))
      .toDF("doc_id", "text")
    val span = Dedup.removeDuplicatedSpans(df, k = 4)
    val spanPlan = span.queryExecution.executedPlan.toString
    assert(!spanPlan.contains("CartesianProduct"),
      "span removal must never go all-pairs")
    // the duplicated-hash set and the covered-positions frame are the
    // small sides by construction — both joins must build on them
    assert("BroadcastHashJoin".r.findAllIn(spanPlan).size >= 2,
      "span removal joins must broadcast the small sides")
    val lm = TextAnalysis.lmPerplexity(df)
    val lmPlan = lm.queryExecution.executedPlan.toString
    assert(!lmPlan.contains("CartesianProduct"),
      "lm scoring must never go all-pairs")
    // the persisted distinct-bigram table feeds both the count join and
    // the prefix-count derivation — the cache must be hit twice, not the
    // text re-tokenized a third time
    assert("InMemoryTableScan".r.findAllIn(lmPlan).size >= 2,
      "bigram-count cache must back both scoring inputs")
  }

  test("line dedup within doc: first occurrence kept in order, map-only") {
    import spark.implicits._
    val df = Seq(
      (0L, "nav\nbody one\nnav\nbody two\nnav"),
      (1L, "a\n\na\nb"), // empty lines dropped before dedup
      (2L, "unique only"),
      (3L, "")).toDF("doc_id", "text")
    val out = Dedup.lineDedupWithinDoc(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((5L, 2L, "nav\nbody one\nbody two")))
    assert(out(1) == ((3L, 1L, "a\nb")))
    assert(out(2) == ((1L, 0L, "unique only")))
    assert(out(3) == ((0L, 0L, "")))
    // map-only contract: no exchange anywhere in the plan
    assert(!Dedup.lineDedupWithinDoc(df).queryExecution.executedPlan
      .toString.contains("Exchange"), "line dedup must not shuffle")
  }

  test("source dup rate: cross-source copies count against both sources") {
    import spark.implicits._
    val df = Seq(
      (0L, "sA", "copied text"), (1L, "sB", "copied text"), // cross-source pair
      (2L, "sA", "own text a"), (3L, "sA", "own text b"),
      (4L, "sB", "own text c"),
      (5L, "sC", "clean one"), (6L, "sC", "clean two"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.sourceDupRate(df, maxDupRate = 0.4).orderBy("source")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(out(0) == (("sA", 3L, 1L, 0.333333, true)))
    assert(out(1) == (("sB", 2L, 1L, 0.5, false)))
    assert(out(2) == (("sC", 2L, 0L, 0.0, true)))
  }

  test("length trim: corpus-quantile band cuts both outlier tails") {
    import spark.implicits._
    val df = ((1 to 10) :+ 100).zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" ")) }.toDF("doc_id", "text")
    val out = TextAnalysis.lengthTrim(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // n=11: p5 at rank 0.5 → 1.5, p95 at rank 9.5 → (10+100)/2 = 55;
    // the 1-token and 100-token docs fall outside the band
    assert(out.map(_._2).toSeq == (2L to 10L))
  }

  test("hard negatives: nearest different-label only, same-label excluded") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.01f), 0), // nearest overall — but same label
      (2L, Array(0.9f, 0.1f), 1),
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(0.8f, 0.2f), 2)).toDF("vec_id", "embedding", "label")
    val anchors = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val out = Similarity.hardNegatives(emb, anchors, 3).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getInt(3)))
    // ranked by cosine among labels != 0: 2 (.9939), 4 (.9701), 3 (0.0);
    // vec 1 (same label) must not appear despite being the nearest
    assert(out.toSeq == Seq((2L, 1, 1), (4L, 2, 2), (3L, 1, 3)))
    assert(!out.map(_._1).contains(1L))
  }

  test("embedding normalize/quantize: unit norms, bounded round-trip") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(3.0f, 4.0f)), // norm 5
      (2L, Array(0.0f, 0.0f)), // zero vector
      (3L, Array(-1.27f, 0.635f))).toDF("vec_id", "embedding")
    val nrm = Similarity.normalizeEmbeddings(emb).orderBy("vec_id")
      .collect()
    assert(nrm(0).getDouble(2) == 5.0 && !nrm(0).getBoolean(3))
    assert(nrm(0).getSeq[Double](1) == Seq(0.6, 0.8))
    assert(nrm(1).getBoolean(3) && nrm(1).getSeq[Double](1) == Seq(0.0, 0.0))
    val renorm = Similarity.normalizeEmbeddings(
      Similarity.normalizeEmbeddings(emb).drop("norm", "zero_vec"))
      .filter(col("vec_id") === 1).select("norm").as[Double].collect().head
    assert(math.abs(renorm - 1.0) < 1e-12, "normalized vectors are unit")

    val q = Similarity.quantizeInt8(emb).orderBy("vec_id").collect()
    val s0 = q(0).getDouble(2)
    val qv0 = q(0).getSeq[Int](3)
    assert(qv0 == Seq(95, 127), s"3/4 scaled by 127/4: $qv0")
    // round-trip error bounded by half a quantization step
    Seq(3.0, 4.0).zip(qv0).foreach { case (x, qi) =>
      assert(math.abs(qi * s0 - x) <= s0 / 2 + 1e-12) }
    assert(q(1).getDouble(2) == 0.0 && q(1).getSeq[Int](3) == Seq(0, 0))
    assert(q(2).getSeq[Int](3) == Seq(-127, 64), "negative + half-up")
  }

  test("quantizedTopK: int8 scan + refine recovers the exact top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def results(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.orderBy("qid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val exact = results(Similarity.bruteForceTopK(emb, queries, k = 5))
    val quant = results(Similarity.quantizedTopK(emb, queries, k = 5,
      refine = 15))
    val recall = exact.keys.toSeq.map { q =>
      quant(q).toSet.intersect(exact(q).toSet).size.toDouble / 5 }.sum / 5
    assert(recall == 1.0, s"refine=3k must recover the exact top-5: " +
      exact.keys.map(q => s"$q: ${exact(q)} vs ${quant(q)}").mkString("; "))
    assert(exact == quant, "refine re-scores exactly, so order matches too")
  }

  test("clusterKeep: highest quality survives per cluster, not min id") {
    import spark.implicits._
    val docs = Seq(
      (1L, 10L), (2L, 99L), (3L, 50L), // one cluster: 2 wins on quality
      (4L, 7L), (5L, 7L), // tie → lower id (4) wins
      (6L, 1L)).toDF("doc_id", "n_chars") // singleton keeps itself
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val out = Dedup.clusterKeep(docs, pairs, col("n_chars"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (4L, 4L, true), (5L, 4L, false), (6L, 6L, true)))
  }

  test("normalizeUrl: case/www/port/utm/fragment canonicalization") {
    import spark.implicits._
    val cases = Seq(
      "HTTPS://WWW.Ex.COM:443/a?utm_source=x&id=1#frag" ->
        "https://ex.com/a?id=1",
      "http://Ex.com:80/a/" -> "http://ex.com/a/",
      "https://ex.com:8443/a" -> "https://ex.com:8443/a", // non-default kept
      "https://ex.com/?utm_a=1&utm_b=2" -> "https://ex.com/",
      "https://ex.com/p?UTM_SOURCE=x" -> "https://ex.com/p", // case-insens
      "not a url" -> "not a url")
    val got = cases.map(_._1).toDF("url")
      .select(TextAnalysis.normalizeUrl(col("url"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2),
      got.zip(cases).filter { case (g, (_, e)) => g != e }.mkString(", "))
  }

  test("urlDedup: normalized grouping, min-id keep") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://WWW.ex.com/a"), (2L, "https://ex.com:443/a"),
      (3L, "https://ex.com/b")).toDF("doc_id", "url")
    val out = TextAnalysis.urlDedup(df, col("url"), "doc_id")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (1L, "https://ex.com/a", true), (2L, "https://ex.com/a", false),
      (3L, "https://ex.com/b", true)))
  }
}
