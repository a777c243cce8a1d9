package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The AQE-proof co-location helper: column-only repartition is
  * REPARTITION_BY_COL, which adaptive execution coalesces by BYTES — a
  * tiny many-group shuffle collapses to ONE task, serializing
  * dynamic-partition writes (measured 189 s for a 10k-entry write vs
  * ~10 s at 32 tasks) and chunked kernels. `pinned` must hold the
  * session's shuffle-partition count regardless of byte size. */
class PartitioningSpec extends AnyFunSuite with SparkTestBase {

  test("pinned keeps the full partition count where AQE would coalesce") {
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(n > 1) // the premise: local sessions run 32, not 1
    val tiny = spark.range(1000)
      .select(concat(lit("e"), col("id")).as("entry"), col("id"))
    // control: the coalescible shape really does collapse on tiny bytes
    val coalesced = tiny.repartition(col("entry")).rdd.getNumPartitions
    assert(coalesced < n,
      s"expected AQE to coalesce the control below $n, got $coalesced " +
        "(if this fails, AQE semantics changed and pinned may be droppable)")
    assert(Partitioning.pinned(tiny, col("entry")).rdd.getNumPartitions == n)
  }

  test("pinned keeps hash co-location: one group never splits") {
    val df = spark.range(10000)
      .select((col("id") % 97).as("g"), col("id"))
    val parts = Partitioning.pinned(df, col("g"))
      .select(spark_partition_id().as("p"), col("g"))
      .groupBy("g").agg(countDistinct("p").as("np"))
      .agg(max("np")).collect()(0).getLong(0)
    assert(parts == 1L)
  }

  test("pinnedByRange keeps the count and the range order") {
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val tiny = spark.range(1000).select(col("id"))
    val ranged = Partitioning.pinnedByRange(tiny, col("id"))
    assert(ranged.rdd.getNumPartitions == n)
    // range property: partition ids are monotone in the sort key, so the
    // max of partition p never exceeds the min of partition p+1
    val bounds = ranged
      .select(spark_partition_id().as("p"), col("id"))
      .groupBy("p").agg(min("id").as("lo"), max("id").as("hi"))
      .orderBy("p").collect()
    bounds.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(1))
      case _           =>
    }
  }
}
