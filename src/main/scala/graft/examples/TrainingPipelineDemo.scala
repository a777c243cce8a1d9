package graft.examples

import graft.pipeline.{Dedup, Packing, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The north-star composition: a training-data curation pass over the
  * documents + embeddings tables — exact dedup, MinHash near-dedup,
  * quality/language filtering, token budgeting, and embedding-level
  * near-dup pruning — all declarative DataFrame stages (one shuffle per
  * sketch, everything else map-side), so the same program scales from
  * sf0.001 to a 100 TB corpus.
  */
object TrainingPipelineDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val total = docs.count()

    // 0. source-level gate + in-document cleanup, BEFORE the corpus
    // passes: drop sources that are mostly copies, dedup repeated lines
    // inside each doc, then strip corpus-duplicated token spans
    val goodSources = Dedup.sourceDupRate(docs, maxDupRate = 0.01)
      .filter(col("keep")).select(col("source"))
    val gated = docs.join(broadcast(goodSources), Seq("source"))
    val lineClean = Dedup.lineDedupWithinDoc(gated)
      .select(col("doc_id"), col("kept_text"))
    val spanClean = Dedup.removeDuplicatedSpans(
        gated.select(col("doc_id"), col("source"), col("text")), k = 8)
      .select(col("doc_id"), col("removed"))

    // 0b. unicode normalization BEFORE any hashing: NBSP/control-char
    // variants of the same sentence must not survive as distinct texts
    val cleaned = gated.withColumn("text",
      TextAnalysis.normalizeText(col("text")))

    // 1. exact dedup: keep the smallest doc_id per distinct text
    val exact = Dedup.exactDedup(cleaned)

    // 1b. URL-level dedup ahead of content passes: canonicalize the
    // (synthesized here) fetch URLs and keep one doc per canonical URL —
    // in a real crawl this removes tracking-link refetches before any
    // text ever shuffles
    val withUrls = exact.withColumn("url",
      concat(lit("https://www."), col("source"), lit(".example.com/d/"),
        pmod(col("doc_id"), lit(1000)), lit("?utm_source=crawl")))
    val urlKeep = TextAnalysis.urlDedup(withUrls, col("url"), "doc_id")
      .filter(col("keep")).select("doc_id")
    val urlDeduped = exact.join(urlKeep, Seq("doc_id"), "left_semi")

    // 2. near-dedup: keep the BEST copy of every MinHash duplicate
    // cluster (longest text wins, not the arbitrary lowest id)
    val nearPairs = Dedup.minhashPairs(urlDeduped, threshold = 0.5)
    val keepBest = Dedup.clusterKeep(urlDeduped, nearPairs, col("n_chars"))
      .filter(col("keep")).select("doc_id")
    val deduped = urlDeduped.join(keepBest, Seq("doc_id"), "left_semi")

    // 3. quality gate: the Gopher admission rules with per-rule reasons
    // (thresholds relaxed to this tiny synthetic corpus)
    val scored = TextAnalysis.qualityFilter(deduped,
        minTokens = 5, minStopwords = 0,
        maxTopWordRatio = 1.0, maxDup2 = 1.0, maxDup3 = 1.0)
      .withColumn("lang_guess", TextAnalysis.langGuess(col("text")))
      .withColumn("bpe_tokens", TextAnalysis.bpeTokenCount(col("text")))
    val kept = scored.filter(col("keep"))

    // 3b. LM-perplexity outlier cut: corpus-self-trained bigram LM,
    // drop the far tail (token salad / degenerate docs)
    val ppl = TextAnalysis.lmPerplexity(kept)
    val pplStats = ppl.agg(avg("ppl"), max("ppl")).collect()(0)

    // 4. per-language token budget report (the "what did we keep" view)
    val report = kept.groupBy("lang_guess")
      .agg(count(lit(1)).as("docs"), sum("bpe_tokens").as("bpe_tokens"))
      .orderBy(col("bpe_tokens").desc)

    // 5. context-window packing: lay the kept docs end-to-end into
    // 512-token windows (distributed prefix-sum scan, no global window)
    val packed = Packing.packSequences(
      kept.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tokens")),
      budget = 512)
    val nPacks = packed.agg(max("pack_id")).collect()(0).getLong(0) + 1

    // 6. source-weighted mixing + deterministic split assignment: the
    // kept docs blend by per-source weight, then land in train/val/test
    // by integer-exact hash intervals (both map-only)
    val mixed = Sampling.weightedMix(kept,
      (0 until 20).map(n => s"src$n" -> ((n % 4) + 1).toLong).toMap)
    val splits = Sampling.assignSplits(mixed,
        Seq("train" -> 8L, "val" -> 1L, "test" -> 1L))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // 6b. publish-side panels: per-source dataset card, percentile-
    // normalized length signal (cross-source comparable), and the
    // sketch-bounded top terms per source
    val card = graft.pipeline.Analytics.datasetCard(kept
      .select("doc_id", "text", "lang", "source", "n_chars"))
    val normed = TextAnalysis.percentileNormalize(kept, "source",
      "n_chars", "doc_id")
    val topTerms = graft.pipeline.Sketches.heavyHittersPerGroupArr(
      kept.select(col("source"), TextAnalysis.terms(col("text")).as("t")),
      "source", col("t"), capacity = 1024, k = 3)

    // 6c. export: train split into globally-ordered shards (range
    // exchange + per-shard sorts — no single-partition sort)
    val trainShards = Packing.orderedShards(
      Sampling.assignSplits(mixed,
        Seq("train" -> 8L, "val" -> 1L, "test" -> 1L))
        .filter(col("split") === "train"),
      "doc_id", nShards = 4)

    // 7. embedding near-dup pass + SemDeDup keep-one selection
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val embDups = Similarity.embeddingDupPairs(emb, threshold = 0.98)
    val semKept = Similarity.semanticDedup(emb, threshold = 0.95)
      .filter(col("keep")).count()

    // 8. contrastive hard negatives for the first few anchors — the
    // training-pair mining step a retrieval/contrastive run needs
    val anchors = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val negatives = Similarity.hardNegatives(emb, anchors, k = 5).count()

    println(s"corpus:            $total docs")
    println(s"source gate:       ${goodSources.count()} of 20 sources kept")
    println(s"line dedup:        ${lineClean.count()} docs cleaned")
    println(s"span removal:      ${spanClean.filter(col("removed") > 0).count()} docs had duplicated 8-grams stripped")
    println(s"after exact dedup: ${exact.count()}")
    println(s"after url dedup:   ${urlDeduped.count()}")
    println(s"after near dedup:  ${deduped.count()} (best-quality cluster survivors)")
    println(s"after quality:     ${kept.count()}")
    println("per-language token budget:")
    report.collect().foreach(r => println(f"  ${r.getString(0)}%-4s ${r.getLong(1)}%6d docs ${r.getLong(2)}%10d bpe tokens"))
    println(s"packed into:       $nPacks windows of 512 tokens")
    println(s"after weighted mix: ${mixed.count()}")
    println(s"splits:            $splits")
    println(f"lm perplexity:     avg ${pplStats.getDouble(0)}%.2f max ${pplStats.getDouble(1)}%.2f")
    println("dataset cards (source, docs, langs, chars, tokens, dups, uniq%):")
    card.orderBy("source").collect().take(3).foreach(r => println(s"  $r"))
    println(f"mean normalized length: ${normed.agg(avg("norm_score")).head().getDouble(0)}%.3f (0.5 = balanced)")
    println(s"top terms/source (sketch): ${topTerms.filter(col("rank") === 1).count()} rank-1 rows")
    val shardStats = trainShards.groupBy("shard").count().orderBy("shard")
      .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
    println(s"train shards:      $shardStats")
    println(s"embedding near-dup pairs (cos >= 0.98): ${embDups.count()}")
    println(s"semantic dedup keeps: $semKept of ${emb.count()} vectors")
    println(s"hard negatives:    $negatives mined for 3 anchors")
    spark.stop()
  }
}
