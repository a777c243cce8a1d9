package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The opt-in MinHash banding dial ([[Dedup.minhashPairsTuned]]):
  * defaults untouched, conf keys honored, and the 8×8 vs 16×4
  * recall/cost trade quantified on planted near-duplicates.
  *
  * Key structural property under test: with the SAME 64-hash signature,
  * an 8-row band is two adjacent 4-row bands concatenated — a pair
  * bucketed together at 8×8 must also collide at 16×4, so the tuned
  * candidate (and thus verified) set is a deterministic SUBSET. The
  * trade is therefore pure: fewer bands never ADD pairs, only drop
  * marginal ones, while hot buckets shrink. */
class MinhashBandingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** ~30 deterministic words; the twin replaces ONE word, killing 3 of
    * 28 3-shingles — shingle-Jaccard ≈ 0.8, above the 0.5 threshold on
    * the part of the S-curve where 16×4 detects near-always and 8×8
    * most of the time (p(0.8) = 1-(1-0.8^8)^8 ≈ 0.77). */
  private def corpus(nPlanted: Int): Seq[(String, String)] = {
    def words(seed: Int): IndexedSeq[String] =
      (0 until 30).map(w => s"w${(seed * 31 + w * 7) % 97}_$w")
    val planted = (0 until nPlanted).flatMap { i =>
      val base = words(i)
      val twin = base.updated(15, "MUT1")
      Seq((f"doc$i%03d_a", base.mkString(" ")),
        (f"doc$i%03d_b", twin.mkString(" ")))
    }
    // unrelated filler so buckets aren't trivially tiny
    val filler = (0 until 50).map(i =>
      (f"fill$i%03d", (0 until 30).map(w => s"f${i}_$w").mkString(" ")))
    planted ++ filler
  }

  test("unset conf = exact default behavior; conf keys change banding") {
    val docs = corpus(20).toDF("doc_id", "text")
    val default = Dedup.minhashPairs(docs).collect().toSet
    val tuned = Dedup.minhashPairsTuned(docs).collect().toSet
    assert(tuned == default, "unset conf keys must resolve to 64×16")
  }

  test("8×8 banding: deterministic subset of 16×4, quantified recall trade") {
    val nPlanted = 40
    val docs = corpus(nPlanted).toDF("doc_id", "text").cache()
    val isPlantedPair = (a: String, b: String) =>
      a.endsWith("_a") && b == a.stripSuffix("_a") + "_b"

    val pairs16 = Dedup.minhashPairs(docs, bands = 16)
      .select("a", "b").as[(String, String)].collect().toSet
    spark.conf.set("spark.graft.minhash.bands", "8")
    val pairs8 = try Dedup.minhashPairsTuned(docs)
      .select("a", "b").as[(String, String)].collect().toSet
    finally spark.conf.unset("spark.graft.minhash.bands")

    // subset: a longer band match implies both 4-row halves matched
    assert(pairs8.subsetOf(pairs16),
      s"8x8 emitted pairs 16x4 did not: ${pairs8 -- pairs16}")

    val recall16 = pairs16.count(p => isPlantedPair(p._1, p._2)) / nPlanted.toDouble
    val recall8 = pairs8.count(p => isPlantedPair(p._1, p._2)) / nPlanted.toDouble
    // 16×4 at s≈0.8: detection ≈ 1-(1-0.8^4)^16 ≈ 1.0; 8×8: ≈ 0.77.
    // Wide safety margins — the corpus is deterministic, but the
    // planted similarity varies a little per doc.
    assert(recall16 >= 0.9, s"16x4 recall $recall16")
    assert(recall8 >= 0.4, s"8x8 recall $recall8 — the dial should still catch most")
    assert(recall8 <= recall16, "fewer bands can only lose recall")
    info(f"planted-dup recall: 16x4 = $recall16%.2f, 8x8 = $recall8%.2f " +
      f"(pairs: ${pairs16.size} -> ${pairs8.size})")
  }
}
