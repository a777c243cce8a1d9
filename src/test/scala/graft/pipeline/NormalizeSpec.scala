package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unicode text normalization and per-source percentile normalization. */
class NormalizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("normalizeText strips controls, maps unicode spaces, collapses runs") {
    val zwsp = "\u200B"; val nbsp = "\u00A0"
    val ideo = "\u3000"; val em = "\u2003"; val narrow = "\u202F"
    val bel = "\u0007"; val del = "\u007F"
    val cases = Seq(
      (s" hello${zwsp}world${ideo}x", "hello world x"),
      (s"ab${bel}c${del}d", "abcd"), // control chars vanish entirely
      ("  a \t\n b  ", "a b"),
      (s"${nbsp}wide${em}narrow${narrow}end", "wide narrow end"),
      ("", ""))
    val out = cases.map(_._1).toDF("t")
      .select(TextAnalysis.normalizeText(col("t")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(out == cases.map(_._2))
  }

  test("percentileNormalize: exact rational ranks per source") {
    val df = Seq(
      (1L, "s1", 10L), (2L, "s1", 30L), (3L, "s1", 20L), // ranks 0, 1, .5
      (4L, "s2", 5L), (5L, "s2", 5L), (6L, "s2", 7L) // tie broken by id
    ).toDF("doc_id", "source", "n_chars")
    val out = TextAnalysis
      .percentileNormalize(df, "source", "n_chars", "doc_id")
      .select("doc_id", "norm_score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out(1L) == 0.0 && out(2L) == 1.0 && out(3L) == 0.5)
    assert(out(4L) == 0.0 && out(5L) == 0.5 && out(6L) == 1.0)
  }
}
