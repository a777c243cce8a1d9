package graft

import org.scalatest.funsuite.AnyFunSuite

/** Global plan audit: every driver-contract query must plan without an
  * unbounded pairwise node. A CartesianProduct anywhere, or a
  * BroadcastNestedLoopJoin outside the operators that broadcast a small
  * side BY DESIGN, is exactly the class of plan that melts at 100 TB —
  * this sweep catches a regression the per-operator specs might miss
  * (e.g. a refactor that silently drops an equi-join key).
  */
class PlanSweepSpec extends AnyFunSuite with SparkTestBase {

  /** Operators whose plan legitimately carries a broadcast nested-loop:
    * a deliberately tiny broadcast side (query/anchor sets, benchmark
    * shingles) against a streaming corpus — linear in the corpus, the
    * documented brute-force baseline or broadcast-overlap shape.
    */
  private val broadcastNlByDesign = Set(
    "q_ann_brute", "q_hard_negatives", "q_decontaminate", "q_ivf_refined",
    "q_quantized_ann", // broadcast query set over the int8 candidate scan
    "q_tfidf", // tfidf: 1-ROW broadcast (corpus doc count) as a scalar
    "q_pmi_bigrams", // 1-ROW broadcast (total bigram count) as a scalar
    "q_bm25", // 1-ROW broadcast (N, avgdl) as scalars
    "q_wau_sliding") // 1-ROW broadcast (max observed period) as a scalar

  test("no driver query plans an unbounded cartesian / nested loop") {
    val dir = "/root/testdata/sf0.001"
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val nlj = plan.contains("BroadcastNestedLoopJoin") &&
          !broadcastNlByDesign(name)
        if (cartesian || nlj)
          Some(s"$name: ${if (cartesian) "CartesianProduct" else "BroadcastNestedLoopJoin"}")
        else None
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
