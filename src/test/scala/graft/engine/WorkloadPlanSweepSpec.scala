package graft.engine

import graft.SparkTestBase
import graft.core.Records
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** Plan sweep over the STORE WORKLOAD family (the w_* bench shape:
  * write / read-payload / update-labels / conditional-remove). The
  * query sweep (PlanSweepSpec) audits SparkEntry.queries; the mutation
  * paths build their plans INSIDE BucketStore and execute them as side
  * effects, so the only way to audit them is to record every plan the
  * session actually runs during a workload and assert the same
  * invariant: no CartesianProduct, no BroadcastNestedLoopJoin — the
  * nodes that melt first at 100 TB if a refactor drops an equi-join key
  * from the conflict check / label merge / remove rewrite.
  */
class WorkloadPlanSweepSpec extends AnyFunSuite with SparkTestBase {

  test("store workload executes no cartesian / nested-loop plan") {
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        plans.add((funcName, qe.executedPlan.toString))
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val records = Records.fromEvents(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      val storeDir =
        java.nio.file.Files.createTempDirectory("graft-plansweep").toString
      val store = new BucketStore(spark, storeDir)
      // the full w_* sequence from Bench, including the conflict-checked
      // write path (Error mode joins the batch against the store bounds)
      store.write(records)
      store.write(records, onConflict = BucketStore.Conflict.Skip)
      val n = QueryEngine.query(store.table(), QuerySpec())
        .agg(sum(length(col("payload")))).collect()(0).getLong(0)
      assert(n > 0)
      store.updateLabels(QuerySpec(), set = Map("key" -> "value2")): Unit
      store.removeQuery(QuerySpec(when = Some("""{"$each_n": 2}"""))): Unit
      // listener delivery is async on the shared bus: poll until the
      // captured set covers every action above AND stops growing for a
      // full second — a bare stability check could exit on a stalled bus
      // with a partial set and false-green the sweep. The workload runs
      // ≥ 6 distinct SQL executions (2 writes, conflict-check aggregates,
      // the payload sum, update, remove), so a floor of 6 plans is a
      // hard prerequisite, bounded by a 60 s bail-out.
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var last = -1
      var same = 0
      while ((plans.size() < 6 || same < 5) && System.nanoTime() < deadline) {
        Thread.sleep(200)
        val now = plans.size()
        if (now == last) same += 1 else { same = 0; last = now }
      }
    } finally spark.listenerManager.unregister(listener)

    assert(plans.size() >= 6,
      s"listener captured only ${plans.size()} plans — bus did not drain")
    val failures = plans.toArray(Array.empty[(String, String)]).toSeq
      .flatMap { case (fn, plan) =>
        val cartesian = plan.contains("CartesianProduct")
        val nlj = plan.contains("BroadcastNestedLoopJoin")
        if (cartesian || nlj)
          Some(s"$fn: ${if (cartesian) "CartesianProduct" else "BroadcastNestedLoopJoin"}")
        else None
      }
    assert(failures.isEmpty,
      s"workload plans must stay equi-keyed:\n${failures.mkString("\n")}")
  }
}
