package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental-pipeline primitives: CDC merge (latest-wins apply of a
  * changelog onto a snapshot), globally-ordered shard export, and the
  * active-users panel aggregate.
  */
class IncrementalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("applyChanges: latest change per id wins; delete/upsert/insert/pass-through") {
    val base = Seq((1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L))
      .toDF("id", "text", "n")
    val changes = Seq(
      (1L, 1L, "delete", null.asInstanceOf[String], 0L), // delete 1...
      (1L, 2L, "upsert", "one-v2", 11L), // ...then resurrect (seq 2 wins)
      (2L, 5L, "delete", null.asInstanceOf[String], 0L), // delete 2 (latest)
      (2L, 4L, "upsert", "two-v2", 21L), // stale upsert, loses to seq 5
      (9L, 1L, "upsert", "nine", 90L) // brand-new id
    ).toDF("id", "seq", "op", "text", "n")
    val out = Analytics.applyChanges(base, changes, "id", "seq", "op")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, "one-v2", 11L), (3L, "three", 30L),
      (9L, "nine", 90L)))
  }

  test("orderedShards: total order across shards, sorted within each") {
    val df = (0 until 1000).map(i => ((i * 7919) % 1000L, s"p$i"))
      .toDF("key", "payload").repartition(13)
    val shards = Packing.orderedShards(df, "key", 4)
      .select("shard", "key").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(shards.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // every key in shard i < every key in shard i+1
    val bounds = shards.groupBy(_._1).view
      .mapValues(ks => (ks.map(_._2).min, ks.map(_._2).max)).toMap
    for (i <- 0L until 3L)
      assert(bounds(i)._2 <= bounds(i + 1)._1,
        s"shard $i max ${bounds(i)._2} > shard ${i + 1} min ${bounds(i + 1)._1}")
    assert(shards.length == 1000)
  }

  test("orderedShardsExact: rank-derived shards are a pure function of " +
      "the data") {
    val df = (0 until 1000).map(i => ((i * 7919) % 97L, i.toLong))
      .toDF("key", "id").repartition(13) // heavy key ties → tieBreak decides
    val out = Packing.orderedShardsExact(df, "key", "id", 4)
      .select("key", "id", "rank", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // rank is exactly row_number over (key, id): compare to a local sort
    val expRank = out.sortBy(x => (x._1, x._2)).zipWithIndex
      .map { case ((k, id, _, _), i) => (k, id) -> (i + 1).toLong }.toMap
    assert(out.forall { case (k, id, rank, _) => rank == expRank((k, id)) })
    // shard = ((rank-1)*4) div 1000 — 4 shards of exactly 250
    assert(out.forall { case (_, _, rank, shard) =>
      shard == (rank - 1) * 4 / 1000 })
    val sizes = out.groupBy(_._4).view.mapValues(_.size).toMap
    assert(sizes == Map(0L -> 250, 1L -> 250, 2L -> 250, 3L -> 250))
    // determinism across a different physical partitioning
    val out2 = Packing.orderedShardsExact(df.repartition(3), "key", "id", 4)
      .select("id", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out2 == out.map(x => (x._2, x._4)).toSet)
    // reserved helper columns refused
    intercept[IllegalArgumentException] {
      Packing.orderedShardsExact(df.withColumn("__pid", lit(1)), "key",
        "id", 4)
    }
  }

  test("histogram: shared global bins, extremes clamped into end bins") {
    val df = Seq(("a", 0.0), ("a", 5.0), ("a", 10.0), ("b", 10.0),
      ("b", 2.4), ("b", 2.6)).toDF("g", "v")
    val out = Analytics.histogram(df, "g", "v", bins = 4)
      .orderBy("g", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
    // range [0,10], width 2.5: a → bins 0,2(5.0),3(10 clamps); b → 0(2.4),1(2.6),3
    assert(out == Seq(("a", 0L, 1L), ("a", 2L, 1L), ("a", 3L, 1L),
      ("b", 0L, 1L), ("b", 1L, 1L), ("b", 3L, 1L)))
  }

  test("histogram: null values are excluded, all-null input yields empty") {
    val df = Seq(("a", Some(0.0)), ("a", Some(10.0)), ("a", None),
      ("b", None)).toDF("g", "v")
    val out = Analytics.histogram(df, "g", "v", bins = 2)
      .orderBy("g", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
    // nulls must NOT land in the top bin; group b (all null) vanishes
    assert(out == Seq(("a", 0L, 1L), ("a", 1L, 1L)))
    val empty = Analytics.histogram(
      Seq.empty[(String, Option[Double])].toDF("g", "v"), "g", "v", 4)
    assert(empty.count() == 0) // no NPE on the min/max head row
    // values that CAST to null (non-numeric strings) are excluded too —
    // and an all-uncastable input yields empty, not one bogus row/group
    val strs = Seq(("a", "1"), ("a", "2"), ("a", "x")).toDF("g", "v")
    val sOut = Analytics.histogram(strs, "g", "v", bins = 2)
      .orderBy("bin").collect().map(r => (r.getLong(1), r.getLong(4))).toSeq
    assert(sOut == Seq((0L, 1L), (1L, 1L)), s"cast-null parked in a bin: $sOut")
    val allBad = Analytics.histogram(
      Seq(("a", "x"), ("b", "y")).toDF("g", "v"), "g", "v", 2)
    assert(allBad.count() == 0)
  }

  test("profile: one-pass null/distinct/min/max per column") {
    val df = Seq((1L, Some("x")), (2L, None), (3L, Some("a")))
      .toDF("id", "s")
    val out = Analytics.profile(df, Seq("id", "s")).orderBy("col_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSeq
    assert(out == Seq(("id", 3L, 0L, 3L, "1", "3"),
      ("s", 3L, 1L, 2L, "a", "x")))
  }

  test("applyChanges: equal-seq changes resolve deterministically (delete wins the tie)") {
    val base = Seq((1L, "one")).toDF("id", "text")
    val changes = Seq(
      (1L, 7L, "upsert", "one-v2"),
      (1L, 7L, "delete", null.asInstanceOf[String])
    ).toDF("id", "seq", "op", "text")
    // without a tiebreak the winner depended on partitioning/retries —
    // the snapshot randomly contained or dropped the id (review r15)
    (1 to 5).foreach { _ =>
      val out = Analytics.applyChanges(base, changes, "id", "seq", "op")
      assert(out.count() == 0, "delete must win an equal-seq tie, every run")
    }
  }

  test("snapshotDiff: null-shifted and separator-embedded content is 'changed', not 'unchanged'") {
    // concat_ws skips nulls: ("x", null) vs (null, "x") used to digest
    // identically, as did ("pq", null-ish) column realignments;
    // the length-prefixed token encoding is injective (review r15)
    val old = Seq((1L, "x", null.asInstanceOf[String]), (2L, "a|b", "c"))
      .toDF("id", "c1", "c2")
    val nw = Seq((1L, null.asInstanceOf[String], "x"), (2L, "a", "b|c"))
      .toDF("id", "c1", "c2")
    val out = Analytics.snapshotDiff(old, nw, "id", Seq("c1", "c2"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(1L -> "changed", 2L -> "changed"), s"got $out")
  }

  test("saltedJoin: map-typed columns salt through to_json instead of throwing") {
    val big = Seq((1L, "k1"), (2L, "k2"))
      .toDF("id", "k")
      .withColumn("labels", map(lit("a"), col("k"))) // records-shaped map col
    val small = Seq(("k1", 10L), ("k2", 20L)).toDF("sk", "dim")
    val out = Analytics.saltedJoin(big, small, "k", "sk", salts = 4)
      .select("id", "dim").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 20L)))
  }

  test("histogram: non-finite values are dropped like nulls, not binned") {
    val df = Seq(("t", 1.0), ("t", 2.0), ("t", Double.PositiveInfinity),
      ("t", Double.NaN), ("t", 3.0)).toDF("g", "v")
    val out = Analytics.histogram(df, "g", "v", bins = 2)
      .orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    // one Inf used to make hi=Inf → every finite value in bin 0 with
    // garbage edges; now bins span the finite range [1, 3] (boundary
    // value 2.0 belongs to the upper bin, max clamps into the last bin)
    assert(out.toSeq == Seq((0L, 1.0, 2.0, 1L), (1L, 2.0, 3.0, 2L)), s"got ${out.toSeq}")
  }

  test("saltedJoin: exact parity with the plain join; hot key spread over salts") {
    // extreme skew: one key holds 90% of the rows
    val big = ((0 until 900).map(i => ("hot", s"r$i")) ++
      (0 until 100).map(i => (s"cold$i", s"c$i")))
      .toDF("k", "payload").repartition(8)
    val small = (Seq("hot") ++ (0 until 100).map(i => s"cold$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("sk", "dim")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "dim").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val plain = canon(big.join(small, col("k") === col("sk")))
    val salted = Analytics.saltedJoin(big, small, "k", "sk", salts = 8)
    assert(canon(salted) == plain)
    assert(plain.size == 1000)
    // the hot key's rows really do carry multiple distinct salts (spread)
    val spread = big.withColumn("__salt",
        pmod(hash(big.columns.map(col): _*), lit(8)))
      .where(col("k") === "hot")
      .select(countDistinct("__salt")).head().getLong(0)
    assert(spread >= 6, s"hot key spread over only $spread salts")
    // same-named keys on both sides must not be ambiguous
    val sameName = Analytics.saltedJoin(big,
      small.withColumnRenamed("sk", "k").withColumnRenamed("dim", "d2"),
      "k", "k", salts = 4)
    assert(sameName.count() == 1000)
  }

  test("slidingActiveUsers: trailing windows, trimmed at the data edge") {
    val S = 1000000L; val day = 86400L * S
    // user 1 on day 0; user 2 on day 1; user 1 again on day 3 (last day)
    val events = Seq((1L, 0L), (2L, day + S), (1L, 3 * day + S))
      .map { case (u, ts) => (u, ts, 100L, "click", 1.0, "{}") }
      .toDF("user_id", "ts_us", "event_id", "event_type", "value", "props")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("event_id"), col("event_type"), col("value"), col("props"))
    val out = TimeSeries.slidingActiveUsers(events, day, nPeriods = 3)
      .orderBy("window_end").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // windows (trailing 3 days, ending at observed-or-earlier periods):
    // end d0: {1}; end d1: {1,2}; end d2: {1,2}; end d3: {2 (d1), 1 (d3)}
    assert(out == Seq((0L, 1L), (day, 2L), (2 * day, 2L), (3 * day, 2L)))
  }

  test("activeUsers: exact distinct per period") {
    val S = 1000000L
    val day = 86400L * S
    val events = Seq(
      (1L, 0L), (1L, 10 * S), (2L, 20 * S), // day 0: users {1,2}, 3 events
      (1L, day + S), (3L, day + 2 * S), (3L, day + 3 * S), (2L, day + 4 * S)
    ).map { case (u, ts) => (u, ts, 100L, "click", 1.0, "{}") }
      .toDF("user_id", "ts_us", "event_id", "event_type", "value", "props")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("event_id"), col("event_type"), col("value"), col("props"))
    val out = TimeSeries.activeUsers(events, day).orderBy("period_ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((0L, 2L, 3L), (day, 3L, 4L)))
  }
}
