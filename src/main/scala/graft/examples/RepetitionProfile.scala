package graft.examples

import graft.pipeline.{DedupExprs, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B timing of the repetition-signal pass (dev tool): the retired
  * interpreted-HOF pipeline (O(tokens × distinct) with per-element
  * boxing) vs the native one-pass counting kernel
  * ([[graft.pipeline.DedupRuntime.repetitionStats]]). Synthetic docs are
  * sized by args: `RepetitionProfile [nDocs] [tokensPerDoc]` — the gap
  * widens quadratically with document length, which is the point.
  */
object RepetitionProfile {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(2000)
    val perDoc = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~200-word realized vocabulary → thousands of distinct tokens per
    // doc at perDoc=2000, the regime where the HOF's O(n × distinct)
    // inner loop hurt
    val docs = spark.range(nDocs)
      .withColumn("text", array_join(transform(
        sequence(lit(0), lit(perDoc - 1)),
        i => concat(lit("w"), pmod(xxhash64(col("id") * perDoc + i), lit(200)))),
        " "))
      .cache()
    docs.count()

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs  ($r)")
    }

    val toks = TextAnalysis.tokens(col("text"))
    val n = size(toks)
    val hofTop = array_max(transform(array_distinct(toks),
      w => size(filter(toks, x => x === w))))
    t("HOF top-word count")(
      docs.select(sum(hofTop)).collect()(0).getLong(0))
    t("kernel (all 7 stats)")(
      docs.select(sum(DedupExprs.repetitionStats(col("text"))
        .getField("top_count"))).collect()(0).getLong(0))
    t("full withRepetition")(
      docs.transform(TextAnalysis.withRepetition(_))
        .agg(sum("n_tokens")).collect()(0).getLong(0))
    spark.stop()
  }
}
