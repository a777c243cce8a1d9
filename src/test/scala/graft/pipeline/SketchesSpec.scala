package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SpaceSaving heavy-hitters: exact regime (capacity ≥ distinct), lossy
  * regime guarantees (overestimate bounded by err, true heavy hitter
  * survives), and merge correctness across many partitions; plus the PMI
  * collocation, BM25, and dataset-card operators built beside it.
  */
class SketchesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // Zipf-ish stream: term i appears (50 - i) * i-th weight times
  private def skewed(nTerms: Int, base: Int): Seq[String] =
    (0 until nTerms).flatMap(i => Seq.fill(base * (nTerms - i))(s"t$i"))

  test("exact regime: capacity >= distinct reproduces exact counts, err 0") {
    val df = skewed(20, 3).toDF("term").withColumn("g", lit("all"))
      .repartition(8)
    val hh = Sketches.heavyHittersPerGroup(df, "g", col("term"),
      capacity = 64, k = 20).collect()
    assert(hh.length == 20)
    assert(hh.forall(_.getAs[Long]("err") == 0L))
    val exact = skewed(20, 3).groupBy(identity).view.mapValues(_.size).toMap
    hh.foreach { r =>
      assert(r.getAs[Long]("count") == exact(r.getAs[String]("term")))
    }
    // rank order = count desc, term asc
    val ranked = hh.sortBy(_.getAs[Long]("rank"))
    assert(ranked.map(_.getAs[String]("term")).head == "t0")
  }

  test("lossy regime: counts overestimate by at most err; top term survives") {
    // 200 distinct, capacity 32: heavy head + long noise tail
    val head = Seq.fill(500)("hot") ++ Seq.fill(300)("warm")
    val tail = (0 until 200).flatMap(i => Seq.fill(2)(s"noise$i"))
    val df = (head ++ tail).toDF("term").withColumn("g", lit("all"))
      .repartition(6)
    val hh = Sketches.heavyHittersPerGroup(df, "g", col("term"),
      capacity = 32, k = 5).collect()
    val byTerm = hh.map(r => r.getAs[String]("term") ->
      (r.getAs[Long]("count"), r.getAs[Long]("err"))).toMap
    assert(byTerm.contains("hot"), s"hot missing from ${byTerm.keys}")
    val (c, e) = byTerm("hot")
    assert(c >= 500, "SpaceSaving counts never underestimate")
    assert(c - e <= 500, "overestimate must be bounded by err")
    // rank 1 must be the true heavy hitter: its guaranteed lower bound
    // (500) exceeds every other term's possible count
    val top = hh.minBy(_.getAs[Long]("rank"))
    assert(top.getAs[String]("term") == "hot")
  }

  test("array input form matches the per-token form exactly") {
    val data = skewed(25, 2).zipWithIndex
      .map { case (t, i) => (s"g${i % 2}", t) }
    val perToken = Sketches.heavyHittersPerGroup(
      data.toDF("g", "term").repartition(8), "g", col("term"), 64, 10)
    // same tokens regrouped into arrays of 5
    val arrs = data.grouped(5).toSeq.flatMap { chunk =>
      chunk.groupBy(_._1).map { case (g, ts) => (g, ts.map(_._2)) }
    }
    val perArr = Sketches.heavyHittersPerGroupArr(
      arrs.toDF("g", "terms").repartition(8), "g", col("terms"), 64, 10)
    def set(df: org.apache.spark.sql.DataFrame) =
      df.select("g", "term", "count", "rank").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(set(perToken) == set(perArr))
  }

  test("array form treats a null terms array as absence (no task kill)") {
    val rows = Seq(("g0", Seq("x", "x", "y")), ("g0", null),
      ("g1", null)).toDF("g", "terms")
    val out = Sketches.heavyHittersPerGroupArr(rows, "g", col("terms"), 8, 5)
      .select("g", "term", "count").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(("g0", "x", 2L), ("g0", "y", 1L)))
  }

  test("merge: per-group sketches agree with single-partition run") {
    val data = skewed(30, 2).zipWithIndex
      .map { case (t, i) => (s"g${i % 3}", t) }
    val wide = data.toDF("g", "term").repartition(16)
    val narrow = data.toDF("g", "term").coalesce(1)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.heavyHittersPerGroup(df, "g", col("term"),
        capacity = 64, k = 10)
        .select("g", "term", "count", "rank").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(run(wide) == run(narrow))
  }

  test("property: SpaceSaving bounds hold on random skewed streams") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // Zipf-ish random stream over 120 terms, capacity 24 → heavy loss
      val stream = Seq.fill(3000)(s"t${(math.pow(rnd.nextDouble(), 3) * 120).toInt}")
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val hh = Sketches.heavyHittersPerGroup(
        stream.toDF("term").withColumn("g", lit("all")).repartition(7),
        "g", col("term"), capacity = 24, k = 24).collect()
      hh.foreach { r =>
        val (t, c, e) = (r.getAs[String]("term"), r.getAs[Long]("count"),
          r.getAs[Long]("err"))
        val true_ = truth.getOrElse(t, 0L)
        assert(c >= true_, s"seed $seed: $t underestimated ($c < ${true_})")
        assert(c - e <= true_, s"seed $seed: $t overestimate beyond err")
      }
    }
  }

  test("countMin: never underestimates, merges across partitions, reproducible") {
    val (depth, width) = (4, 64)
    val agg = udaf(new Sketches.CountMinAgg(depth, width),
      org.apache.spark.sql.Encoders.STRING)
    val stream = skewed(50, 4) // 50 distinct, counts 4..200
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def sketch(parts: Int): Array[Long] =
      stream.toDF("term").repartition(parts)
        .agg(agg(col("term")).as("cm")).head().getSeq[Long](0).toArray
    val m = sketch(9)
    val n = stream.size
    val overs = truth.toSeq.map { case (t, c) =>
      val est = Sketches.CountMin.estimate(m, t, depth, width)
      assert(est >= c, s"$t underestimated")
      est - c
    }
    // the ε = 2N/width bound is per-query probabilistic (1 − 2^−depth);
    // assert it holds for the vast majority, not every single term
    val withinBound = overs.count(_ <= 2L * n / width)
    assert(withinBound >= (truth.size * 9) / 10,
      s"only $withinBound/${truth.size} within the ε bound")
    // merge-independence: different partitionings give the same matrix
    assert(m.toSeq == sketch(1).toSeq)
  }

  test("pmiBigrams ranks a planted collocation first") {
    // "foo bar" always adjacent (strong association); other tokens random
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (0 until 40).map { i =>
      val noise = Seq.fill(30)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, (noise.take(15) ++ Seq("foo", "bar") ++ noise.drop(15))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val top = TextAnalysis.pmiBigrams(docs, minCount = 5, k = 5)
      .orderBy("rank").collect()
    assert(top.head.getAs[String]("w1") == "foo")
    assert(top.head.getAs[String]("w2") == "bar")
    assert(top.head.getAs[Long]("c_ab") == 40L)
  }

  test("bm25 ranks docs with more query-term mass higher") {
    val docs = Seq(
      (1L, "spark join window spark join window spark"), // dense match
      (2L, "spark filter filter filter filter filter filter"), // one term
      (3L, "table scan merge sort batch stream key value"), // no match
      (4L, "spark join table scan merge sort")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bm25TopDocs(docs, Seq("spark", "join", "window"),
      k = 10).orderBy("rank").collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq.head == 1L)
    assert(!r.map(_.getAs[Long]("doc_id")).contains(3L))
    assert(r.head.getAs[Long]("matched") == 3L)
  }

  test("bloomPrunedJoin equals the plain join even with a high-FP filter") {
    val big = (0L until 2000L).map(i => (i % 500, s"row$i"))
      .toDF("k", "payload").repartition(8)
    val small = Seq((10L, "a"), (20L, "b"), (30L, "c"), (999L, "d"))
      .toDF("sk", "dim") // 999 matches nothing on the big side's 0..499
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "dim").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val exact = canon(big.join(small, col("k") === col("sk")))
    // fpp 0.5: false positives all but guaranteed — the exact join must
    // still eliminate every one of them
    val pruned = canon(Analytics.bloomPrunedJoin(big, small, "k", "sk",
      expectedItems = 10L, fpp = 0.5))
    assert(pruned == exact)
    assert(exact.size == 12, "3 matching keys x 4 rows each")
    // string keys probe as strings (a silent cast-to-long would null out
    // every key and drop all rows)
    val bigS = (0 until 100).map(i => (s"key${i % 10}", i.toLong))
      .toDF("k", "v")
    val smallS = Seq(("key3", "x"), ("key7", "y")).toDF("sk", "dim")
    val joinedS = Analytics.bloomPrunedJoin(bigS, smallS, "k", "sk",
      expectedItems = 10L).count()
    assert(joinedS == 20L, s"got $joinedS")
    // same-named keys on both sides must not be ambiguous
    val sameName = Analytics.bloomPrunedJoin(bigS,
      smallS.withColumnRenamed("sk", "k").withColumnRenamed("dim", "d2"),
      "k", "k", expectedItems = 10L).count()
    assert(sameName == 20L)
    // the default probe is Spark's codegen might_contain (no UDF in the
    // plan); past the literal bound it falls back to a broadcast
    // predicate with identical results. Plan-asserted on a Range input —
    // over a LocalRelation the optimizer's ConvertToLocalRelation
    // EVALUATES the filter at plan time (same rows, no Filter node).
    val bigR = spark.range(2000).select((col("id") % 500).as("k"),
      col("id").as("payload"))
    val nativePlan = Analytics.bloomPrunedJoin(bigR, small, "k", "sk",
      expectedItems = 10L).queryExecution.executedPlan.toString
    assert(nativePlan.contains("might_contain"), nativePlan.take(500))
    assert(!nativePlan.contains("UDF"), nativePlan.take(500))
    val viaBroadcast = canon(Analytics.bloomPrunedJoin(big, small, "k",
      "sk", expectedItems = 10L, fpp = 0.03, literalProbeMaxBytes = 0L))
    assert(viaBroadcast == exact)
  }

  test("datasetCard reports volume and exact-dup mass per source") {
    val docs = Seq(
      (1L, "alpha beta", "en", "s1", 10L),
      (2L, "alpha beta", "en", "s1", 10L), // dup pair within s1
      (3L, "gamma delta", "de", "s1", 11L),
      (4L, "alpha beta", "en", "s2", 10L) // same text, other source: not a dup there
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val card = Analytics.datasetCard(docs).orderBy("source").collect()
    val s1 = card(0)
    assert(s1.getAs[String]("source") == "s1")
    assert(s1.getAs[Long]("n_docs") == 3L)
    assert(s1.getAs[Long]("n_langs") == 2L)
    assert(s1.getAs[Long]("dup_docs") == 2L)
    assert(s1.getAs[Long]("total_tokens") == 6L)
    val s2 = card(1)
    assert(s2.getAs[Long]("dup_docs") == 0L)
    assert(s2.getAs[Double]("uniq_pct") == 100.0)
  }
}
