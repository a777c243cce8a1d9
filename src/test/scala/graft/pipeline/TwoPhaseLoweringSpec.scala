package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential proof that the two-phase lowerings of the per-group
  * serial shapes (top-k, exact-k sampling, token-budget running sum,
  * percentile normalization) compute EXACTLY what their naive
  * whole-group window formulations compute — on data engineered to
  * cross many chunks, tie on keys, and concentrate in one hot group
  * (the low-cardinality case the lowerings exist for).
  */
class TwoPhaseLoweringSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // one mega-group ("hot": 600 rows), two small groups; colliding scores
  private def docs: DataFrame = (0 until 700).map { i =>
    val g = if (i < 600) "hot" else if (i < 650) "warm" else "cold"
    (i.toLong, g, (i % 37).toDouble, (i * 13 % 97).toLong)
  }.toDF("doc_id", "source", "score", "n_tokens")

  test("topKPerGroup: two-phase == naive window, at several chunk counts") {
    val naive = {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("score").desc, col("doc_id").asc)
      docs.withColumn("rank", row_number().over(w)).where(col("rank") <= 7)
    }
    val exp = naive.collect().map(r => (r.getLong(0), r.getInt(4))).toSet
    for (nChunks <- Seq(1, 3, 64)) {
      val got = Analytics.topKPerGroup(docs, "source", "score", "doc_id",
          k = 7, nChunks = nChunks, naiveMaxRows = 0)
        .collect().map(r => (r.getLong(0), r.getInt(4))).toSet
      assert(got == exp, s"topK mismatch at nChunks=$nChunks")
    }
    // adaptive default picks the naive branch at this scale — same rows
    val adaptive = Analytics.topKPerGroup(docs, "source", "score", "doc_id",
        k = 7)
      .collect().map(r => (r.getLong(0), r.getInt(4))).toSet
    assert(adaptive == exp)
  }

  test("stratifiedExactK: two-phase == naive, ranks identical") {
    val naive = {
      val w = Window.partitionBy(col("source"))
        .orderBy(Sampling.hash60(col("doc_id"), "graft:sample"), col("doc_id"))
      docs.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 9)
    }
    val exp = naive.select("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (nChunks <- Seq(1, 5, 64)) {
      val got = Sampling.stratifiedExactK(docs, "source", k = 9,
          nChunks = nChunks, naiveMaxRows = 0)
        .select("doc_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == exp, s"exactK mismatch at nChunks=$nChunks")
    }
    val adaptive = Sampling.stratifiedExactK(docs, "source", k = 9)
      .select("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(adaptive == exp)
  }

  test("byTokenBudget: chunked running sum == naive, including cum_tokens") {
    val naive = {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("__h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.withColumn("__h", Sampling.hash60(col("doc_id"), "graft:sample"))
        .withColumn("cum_tokens",
          coalesce(sum(col("n_tokens")).over(w), lit(0L)).cast("long"))
        .filter(col("cum_tokens") < 2000L)
        .drop("__h")
    }
    val exp = naive.select("doc_id", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (nChunks <- Seq(1, 4, 64)) {
      val got = Sampling.byTokenBudget(docs, "source", "n_tokens",
          budget = 2000L, nChunks = nChunks, naiveMaxRows = 0)
        .select("doc_id", "cum_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == exp, s"tokenBudget mismatch at nChunks=$nChunks")
    }
    val adaptive = Sampling.byTokenBudget(docs, "source", "n_tokens",
        budget = 2000L)
      .select("doc_id", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(adaptive == exp)
  }

  test("byTokenBudget: fractional token counts are order-independent " +
      "(decimal sums, both branches)") {
    // doubles whose naive sequential sum vs chunked reordered sum would
    // differ in double arithmetic; decimal partial sums make the budget
    // boundary exact in both branches
    val frac = (0 until 400).map { i =>
      (i.toLong, "hot", 0.0, 0.1 + (i % 7) * 0.3)
    }.toDF("doc_id", "source", "score", "n_tokens")
    def run(naiveMaxRows: Long, nChunks: Int) =
      Sampling.byTokenBudget(frac, "source", "n_tokens", budget = 150L,
          nChunks = nChunks, naiveMaxRows = naiveMaxRows)
        .select("doc_id", "cum_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = run(Long.MaxValue, 64)
    assert(naive.nonEmpty)
    for (nChunks <- Seq(1, 4, 64))
      assert(run(0, nChunks) == naive, s"fractional mismatch at $nChunks")
  }

  test("percentileNormalize: two-phase == percent_rank, ties included") {
    // duplicate full (score, tie) keys: percent_rank gives tied rows the
    // SAME value — the lowering must too
    val dup = docs.withColumn("tie", col("doc_id") % 50) // forced key ties
    val naive = {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("score"), col("tie"))
      dup.withColumn("norm_score", round(percent_rank().over(w), 6))
    }
    val exp = naive.select("doc_id", "norm_score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val got = TextAnalysis.percentileNormalize(dup, "source", "score", "tie",
        naiveMaxRows = 0)
      .select("doc_id", "norm_score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == exp)
    // adaptive default picks the naive branch at this scale — same values
    val adaptive = TextAnalysis.percentileNormalize(dup, "source", "score",
        "tie")
      .select("doc_id", "norm_score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(adaptive == exp)
    // single-row source: percent_rank = 0.0, no NaN from 0/0
    val one = Seq((1L, "solo", 5.0, 0L)).toDF("doc_id", "source", "score", "n_tokens")
    val sv = TextAnalysis.percentileNormalize(one, "source", "score", "doc_id")
      .select("norm_score").head().getDouble(0)
    assert(sv == 0.0)
  }

  test("null group keys survive: a window treats NULL as its own partition") {
    // a bare-column equi-join in a lowering would silently drop the
    // null-stratum rows a per-group window keeps
    val d = Seq((1L, Some("a"), 1.0, 10L), (2L, None, 2.0, 20L),
      (3L, None, 3.0, 30L), (4L, Some("a"), 4.0, 40L))
      .toDF("doc_id", "source", "score", "n_tokens")
    val tb = Sampling.byTokenBudget(d, "source", "n_tokens", budget = 100L)
      .select("doc_id", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tb.keySet == Set(1L, 2L, 3L, 4L),
      s"null-stratum rows must not vanish: $tb")
    val pn = TextAnalysis.percentileNormalize(d, "source", "score", "doc_id")
      .select("doc_id", "norm_score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(pn.keySet == Set(1L, 2L, 3L, 4L))
    assert(pn(2L) == 0.0 && pn(3L) == 1.0,
      s"null source ranks within its own partition: $pn")
  }

  test("reserved helper columns in the input are refused, not clobbered") {
    val bad = docs.withColumn("__chunk", lit(1))
    val e = intercept[IllegalArgumentException] {
      Analytics.topKPerGroup(bad, "source", "score", "doc_id", 3)
    }
    assert(e.getMessage.contains("__chunk"))
    val bad2 = docs.withColumn("__k", lit(1))
    intercept[IllegalArgumentException] {
      Sampling.byTokenBudget(bad2, "source", "n_tokens", 10L)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.percentileNormalize(
        docs.withColumn("__pid", lit(1)), "source", "score", "doc_id")
    }
  }

  test("plans: past the adaptive threshold, no whole-group window " +
      "survives in any lowering") {
    def specs(d: DataFrame): Seq[String] =
      "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
        .findAllMatchIn(d.queryExecution.executedPlan.toString)
        .map(_.group(1)).toSeq
    // topK/exactK/tokenBudget: the window over the RAW rows must carry
    // the chunk; only the bounded-survivor / tiny-offset windows may key
    // on the group alone. naiveMaxRows = 0 stands in for "a group
    // exceeded the probe bound" — the branch condition is identical.
    val tk = specs(Analytics.topKPerGroup(docs, "source", "score", "doc_id",
      5, naiveMaxRows = 0))
    assert(tk.exists(_.contains("__chunk")), s"topK: $tk")
    val ek = specs(Sampling.stratifiedExactK(docs, "source", 5,
      naiveMaxRows = 0))
    assert(ek.exists(_.contains("__chunk")), s"exactK: $ek")
    val tb = specs(Sampling.byTokenBudget(docs, "source", "n_tokens", 100L,
      naiveMaxRows = 0))
    assert(tb.exists(_.contains("__chunk")), s"tokenBudget: $tb")
    val pn = specs(TextAnalysis.percentileNormalize(docs, "source", "score",
      "doc_id", naiveMaxRows = 0))
    assert(pn.exists(_.contains("__pid")), s"percentileNormalize: $pn")
    // and below the threshold the adaptive default plans the plain
    // single window — no chunk/pid routing, no boundary pass
    val tkN = specs(Analytics.topKPerGroup(docs, "source", "score", "doc_id", 5))
    assert(tkN.nonEmpty && tkN.forall(s =>
      !s.contains("__chunk") && !s.contains("__pid")), s"topK naive: $tkN")
    val pnN = specs(TextAnalysis.percentileNormalize(docs, "source", "score",
      "doc_id"))
    assert(pnN.nonEmpty && pnN.forall(s =>
      !s.contains("__pid") && !s.contains("__chunk")),
      s"percentileNormalize naive: $pnN")
    // the PROBE itself flips the branch: a bound under the hot group's
    // 600 rows plans chunked without forcing
    val tkP = specs(Analytics.topKPerGroup(docs, "source", "score", "doc_id",
      5, naiveMaxRows = 100))
    assert(tkP.exists(_.contains("__chunk")), s"topK probe: $tkP")
  }

  test("probe is stats-gated: an over-budget input goes chunked unprobed; " +
      "hints skip the probe entirely (verdict r12 #1)") {
    // docs' hot group (600 rows) is UNDER naiveMaxRows=1000, so the exact
    // probe would answer "naive". With the byte budget forced below the
    // input's size estimate the switch must answer "chunked" WITHOUT
    // consulting the data — proving no probe scan ran (the only code
    // path returning true here is the stats gate; the budget also salts
    // the memo tag, so the two calls can't share a verdict).
    assert(TwoPhase.useChunked(docs, Seq(col("source")), naiveMaxRows = 1000,
      probeByteBudget = 1L), "over-budget input must take chunked unprobed")
    assert(!TwoPhase.useChunked(docs, Seq(col("source")), naiveMaxRows = 1000),
      "under the default budget the exact probe decides")
    // caller hints resolve with no probe job: Naive on a frame whose hot
    // group EXCEEDS any sane bound, Chunked on a tiny one
    assert(!TwoPhase.useChunked(docs, Seq(col("source")),
      TwoPhase.ProbeHint.Naive, probeByteBudget = 1L),
      "Naive hint must skip both the stats gate and the probe")
    assert(TwoPhase.useChunked(docs.limit(1), Seq(col("source")),
      TwoPhase.ProbeHint.Chunked))
    // gapFill's custom probe reuses the same statsBytes gate (constant
    // budget there); sanity-pin the estimate is a real positive number
    assert(TwoPhase.statsBytes(docs) > 0L)
  }

  test("memo re-probes when data grows in place under an identical plan " +
      "(verdict r12 #2)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-twophase-grow").toString
    spark.range(5).select(lit("g").as("k"), col("id").as("v"))
      .write.mode("append").parquet(dir)
    def rd = spark.read.parquet(dir)
    assert(!TwoPhase.useChunked(rd, Seq(col("k")), naiveMaxRows = 10),
      "5-row group fits the bound")
    // append past the bound: the canonical plan of a fresh read over the
    // same path is IDENTICAL (InMemoryFileIndex compares by rootPaths),
    // so only the data fingerprint in the memo key forces the re-probe
    spark.range(20).select(lit("g").as("k"), (col("id") + 5).as("v"))
      .write.mode("append").parquet(dir)
    assert(TwoPhase.useChunked(rd, Seq(col("k")), naiveMaxRows = 10),
      "stale naive verdict survived in-place growth — the one-task " +
        "serialization hazard the chunked branch exists to remove")
  }
}
