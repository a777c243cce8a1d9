package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: bit interleave correctness and the data-skipping
  * property — files (partitions) cover small bounding boxes on BOTH
  * ordered columns, where a single-column sort leaves the other column's
  * per-file range at ~100%.
  */
class LayoutSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits (a even positions, b odd)") {
    val r = Seq((3L, 1L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 2).as("z"))
      .head().getLong(0)
    // a=11₂ → positions 0,2; b=01₂ → position 1 set, 3 clear → 0111₂
    assert(r == 7L)
    val r2 = Seq((0L, 3L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 2).as("z"))
      .head().getLong(0)
    assert(r2 == 10L) // b bits at positions 1 and 3 → 1010₂
  }

  test("withZValue: null coordinates yield null Z, empty input no NPE") {
    val df = Seq((Some(1.0), Some(2.0)), (None, Some(5.0)),
      (Some(9.0), None)).toDF("a", "b")
    val z = Layout.withZValue(df, "a", "b", 4, "z")
      .select("z").collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(z(0).isDefined)
    assert(z(1).isEmpty && z(2).isEmpty,
      "a null coordinate must not be parked in the top grid cell")
    val empty = Layout.withZValue(
      Seq.empty[(Option[Double], Option[Double])].toDF("a", "b"), "a", "b", 4, "z")
    assert(empty.count() == 0)
    // a coordinate that CASTS to null (non-numeric string) must also
    // yield a null Z, not the top grid corner
    val strs = Seq(("1", "2"), ("n/a", "5")).toDF("a", "b")
    val zs = Layout.withZValue(strs, "a", "b", 4, "z").select("z")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(zs(0).isDefined && zs(1).isEmpty, s"cast-null coordinate: ${zs.toSeq}")
  }

  test("bucketed tables join with no shuffle exchange, same results") {
    val a = (0 until 2000).map(i => (i.toLong % 400, s"a$i")).toDF("k", "va")
    val b = (0 until 1000).map(i => (i.toLong % 400, s"b$i")).toDF("k", "vb")
    Layout.writeBucketed(a, "bkt_a", "k", 8)
    Layout.writeBucketed(b, "bkt_b", "k", 8)
    // force the sort-merge path (tiny test tables would broadcast and
    // mask the bucketing; at fact-table scale SMJ is what actually runs)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-located bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan expected:\n$plan")
      // parity with the plain (shuffling) join
      val expected = a.join(b, "k").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE bkt_a"); spark.sql("DROP TABLE bkt_b")
    }
  }

  test("z-ordered partitions bound BOTH columns; x-sort leaves y unbounded") {
    // deterministic pseudo-uniform grid: x and y decorrelated
    val n = 20000
    val df = (0 until n).map { i =>
      (((i * 7919) % n).toLong, ((i * 104729) % n).toLong)
    }.toDF("x", "y").repartition(16)
    def meanBoxSides(laid: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val boxes = laid
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
        .collect()
      (boxes.map(_.getAs[Long]("dx")).sum.toDouble / boxes.length / n,
        boxes.map(_.getAs[Long]("dy")).sum.toDouble / boxes.length / n)
    }
    val (zx, zy) = meanBoxSides(Layout.zOrdered(df, "x", "y", nFiles = 16))
    val (sx, sy) = meanBoxSides(
      df.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    // single-column sort: x perfectly pruned, y files span ~everything
    assert(sx < 0.10, s"x-sorted x-side $sx")
    assert(sy > 0.90, s"x-sorted y-side $sy")
    // z-order: BOTH sides bounded well below the full range — with 16
    // files a perfect 4x4 Z-tiling gives 0.25 per side
    assert(zx < 0.45, s"z-ordered x-side $zx")
    assert(zy < 0.45, s"z-ordered y-side $zy")
  }
}
