package graft.stream

import graft.SparkTestBase
import graft.core.Records
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming stateful operators: state persists across micro-batches via
  * flatMapGroupsWithState — the debounce must continue where the previous
  * trigger left off, per entry. */
class StatefulStreamSpec extends AnyFunSuite with SparkTestBase {

  private def writeBatch(dir: String, rows: Seq[(String, Long, String)]): Unit = {
    import scala.jdk.CollectionConverters._
    val data = rows.map { case (entry, ts, v) =>
      Row("b", entry, ts, Map("v" -> v), Map.empty[String, String],
        "", Records.State.Finished, Array[Byte]())
    }.asJava
    spark.createDataFrame(data, Records.schema)
      .write.mode("append").parquet(dir)
  }

  test("each_t debounce state persists across micro-batches per entry") {
    val src = Files.createTempDirectory("sfs-src").toString
    val ck = Files.createTempDirectory("sfs-ck").toString
    val out = Files.createTempDirectory("sfs-out").toString
    def run(): Unit = {
      val stream = spark.readStream.schema(Records.schema).parquet(src)
      StatefulStream.eachT(stream, intervalSec = 0.002) // 2ms
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    // batch 1: ts 0..3ms each 1ms → emits 2000 (0 arms, 2000 passes)
    writeBatch(src, Seq(("e", 0L, "a"), ("e", 1000L, "a"), ("e", 2000L, "a"),
      ("e", 3000L, "a")))
    run()
    def got(): Seq[Long] = spark.read.parquet(out)
      .select("ts").collect().map(_.getLong(0)).toSeq.sorted
    assert(got() == Seq(2000L))
    // batch 2 continues the SAME state: last emitted 2000 → 4ms passes,
    // 5ms too close to 4ms
    writeBatch(src, Seq(("e", 4000L, "a"), ("e", 5000L, "a")))
    run()
    assert(got() == Seq(2000L, 4000L))
    // a different entry has independent state
    writeBatch(src, Seq(("f", 100L, "a"), ("f", 2100L, "a")))
    run()
    val byEntry = spark.read.parquet(out).select("entry", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(byEntry == Set(("e", 2000L), ("e", 4000L), ("f", 2100L)))
  }

  test("gate stream opens on rising edge and honors the window") {
    val src = Files.createTempDirectory("sfg-src").toString
    val ck = Files.createTempDirectory("sfg-ck").toString
    val out = Files.createTempDirectory("sfg-out").toString
    writeBatch(src, Seq(
      ("e", 0L, "1"), ("e", 1000L, "1"), ("e", 2000L, "1"),
      ("e", 3000L, "0"), ("e", 4000L, "1")))
    val stream = spark.readStream.schema(Records.schema).parquet(src)
    StatefulStream.gate(stream, durationUs = 2000L,
        try_element_at(col("labels"), lit("v")) === "1")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // rising edge at 0 → open until 2000 exclusive: 0, 1000 emitted;
    // 2000 hits deadline (reset latch), 3000 input false clears latch,
    // 4000 rising edge → open again
    val got = spark.read.parquet(out).select("ts").collect()
      .map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(0L, 1000L, 4000L))
  }

  test("streaming near-dup: corrupted copies drop per entry, cross-batch") {
    import scala.jdk.CollectionConverters._
    val src = Files.createTempDirectory("snd-src").toString
    val ck = Files.createTempDirectory("snd-ck").toString
    val out = Files.createTempDirectory("snd-out").toString
    val words = Vector("spark", "query", "row", "data", "filter", "merge",
      "sort", "batch", "join", "scan", "table", "window", "hash", "key")
    def synth(seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      Seq.fill(80)(words(rnd.nextInt(words.size))).mkString(" ")
    }
    def corrupt(text: String, seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      text.split(" ").map(w =>
        if (rnd.nextDouble() < 0.03) words(rnd.nextInt(words.size)) else w)
        .mkString(" ")
    }
    def writeTexts(rows: Seq[(String, Long, String)]): Unit = {
      val data = rows.map { case (entry, ts, body) =>
        Row("b", entry, ts, Map.empty[String, String],
          Map.empty[String, String], "", Records.State.Finished,
          body.getBytes("UTF-8"))
      }.asJava
      spark.createDataFrame(data, Records.schema)
        .write.mode("append").parquet(src)
    }
    def run(): Unit = {
      val stream = spark.readStream.schema(Records.schema).parquet(src)
      StatefulStream.dedupNearMinhash(stream,
          decode(col("payload"), "UTF-8"), simThreshold = 0.6)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    val base = synth(1); val other = synth(99)
    // batch 1: base survives; its 3%-corrupted copy drops; a distinct
    // doc survives; empty text passes (never a near-dup)
    writeTexts(Seq(("e", 1000L, base), ("e", 2000L, corrupt(base, 7)),
      ("e", 3000L, other), ("e", 3500L, "")))
    run()
    def got(): Seq[Long] = spark.read.parquet(out)
      .select("ts").collect().map(_.getLong(0)).toSeq.sorted
    assert(got() == Seq(1000L, 3000L, 3500L),
      "near-copy dropped, distinct + empty kept")
    // batch 2: the history survived the micro-batch boundary — another
    // corrupted copy still drops; same text in ANOTHER entry survives
    // (state is per entry)
    writeTexts(Seq(("e", 4000L, corrupt(base, 11)), ("f", 5000L, base)))
    run()
    assert(got() == Seq(1000L, 3000L, 3500L, 5000L),
      "cross-batch near-dup dropped; other entry independent")
  }

  test("streaming exact dedup drops cross-batch duplicates, min-ts wins") {
    import scala.jdk.CollectionConverters._
    val src = Files.createTempDirectory("sdd-src").toString
    val ck = Files.createTempDirectory("sdd-ck").toString
    val out = Files.createTempDirectory("sdd-out").toString
    def writePayloads(rows: Seq[(Long, String)]): Unit = {
      val data = rows.map { case (ts, body) =>
        Row("b", "e", ts, Map.empty[String, String],
          Map.empty[String, String], "", Records.State.Finished,
          body.getBytes("UTF-8"))
      }.asJava
      spark.createDataFrame(data, Records.schema)
        .write.mode("append").parquet(src)
    }
    def run(): Unit = {
      val stream = spark.readStream.schema(Records.schema).parquet(src)
      StatefulStream.dedupExact(stream)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    // batch 1: two distinct payloads + an in-batch dup (min ts must win)
    writePayloads(Seq((2000L, "alpha"), (1000L, "alpha"), (3000L, "beta")))
    run()
    def got(): Seq[Long] = spark.read.parquet(out)
      .select("ts").collect().map(_.getLong(0)).toSeq.sorted
    assert(got() == Seq(1000L, 3000L), "in-batch dup keeps the min ts")
    // batch 2: a cross-batch dup of "alpha" drops, a new payload passes —
    // the seen-digest state survived the micro-batch boundary
    writePayloads(Seq((4000L, "alpha"), (5000L, "gamma")))
    run()
    assert(got() == Seq(1000L, 3000L, 5000L))
  }

  test("streaming curation: quality gate + exact + near-dup compose multi-hop") {
    // the batch curation stack as a two-hop streaming pipeline (Spark
    // allows one flatMapGroupsWithState per query, so stateful stages
    // chain through an intermediate sink — the medallion shape):
    //   hop 1: stateless quality gate (token floor) → streaming exact dedup
    //   hop 2: streaming near-dup suppression over hop 1's output
    import scala.jdk.CollectionConverters._
    import graft.pipeline.TextAnalysis
    val src = Files.createTempDirectory("cur-src").toString
    val mid = Files.createTempDirectory("cur-mid").toString
    val out = Files.createTempDirectory("cur-out").toString
    val ck1 = Files.createTempDirectory("cur-ck1").toString
    val ck2 = Files.createTempDirectory("cur-ck2").toString
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi")
    def synth(seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      Seq.fill(60)(words(rnd.nextInt(words.size))).mkString(" ")
    }
    def corrupt(text: String, seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      text.split(" ").map(w =>
        if (rnd.nextDouble() < 0.03) words(rnd.nextInt(words.size)) else w)
        .mkString(" ")
    }
    def writeTexts(rows: Seq[(Long, String)]): Unit = {
      val data = rows.map { case (ts, body) =>
        Row("b", "docs", ts, Map.empty[String, String],
          Map.empty[String, String], "", Records.State.Finished,
          body.getBytes("UTF-8"))
      }.asJava
      spark.createDataFrame(data, Records.schema)
        .write.mode("append").parquet(src)
    }
    def run(): Unit = {
      val text = decode(col("payload"), "UTF-8")
      val hop1 = spark.readStream.schema(Records.schema).parquet(src)
        .filter(TextAnalysis.tokenCount(text) >= 5) // stateless gate
      StatefulStream.dedupExact(hop1)
        .writeStream.format("parquet")
        .option("path", mid).option("checkpointLocation", ck1)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      val hop2 = spark.readStream.schema(Records.schema).parquet(mid)
      StatefulStream.dedupNearMinhash(hop2,
          decode(col("payload"), "UTF-8"), simThreshold = 0.6)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck2)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    val a = synth(1); val b = synth(99); val c = synth(50)
    // batch 1: junk gated, exact copy of A dropped at hop 1, near-copy
    // of A dropped at hop 2, A + B survive
    writeTexts(Seq((1000L, a), (1500L, "too short"), (2000L, a),
      (2500L, corrupt(a, 7)), (3000L, b)))
    run()
    def got(): Seq[Long] = spark.read.parquet(out)
      .select("ts").collect().map(_.getLong(0)).toSeq.sorted
    assert(got() == Seq(1000L, 3000L),
      "gate + exact + near dedup in one pass")
    // batch 2: both state stores survived the boundary — a cross-batch
    // exact copy and a cross-batch near-copy drop; fresh C survives
    writeTexts(Seq((4000L, a), (5000L, corrupt(b, 11)), (6000L, c)))
    run()
    assert(got() == Seq(1000L, 3000L, 6000L),
      "cross-batch state held in both hops")
  }

  test("streaming anomalies: causal moments persist across micro-batches") {
    val src = Files.createTempDirectory("an-src").toString
    val ck = Files.createTempDirectory("an-ck").toString
    val out = Files.createTempDirectory("an-out").toString
    def writeEvents(rows: Seq[(Long, Long, String, Double)]): Unit = {
      import spark.implicits._
      rows.toDF("event_id", "ts_us", "key", "value")
        .write.mode("append").parquet(src)
    }
    def run(): Unit = {
      val stream = spark.readStream
        .schema("event_id LONG, ts_us LONG, key STRING, value DOUBLE")
        .parquet(src)
      StatefulStream.anomalies(stream, "key", "ts_us", "value", "event_id",
          nSigma = 3.0, minHistory = 10)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    // batch 1: 10 calm readings (alternating 9.9/10.1) train the moments;
    // nothing can flag inside the training window
    writeEvents((0 until 10).map(i =>
      (i.toLong, i * 1000L, "k", if (i % 2 == 0) 9.9 else 10.1)))
    run()
    def flagged(): Seq[Long] = spark.read.parquet(out)
      .select("event_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(flagged().isEmpty, "training window must not flag")
    // batch 2: the state store carried n=10 across the restart — a calm
    // reading passes, a 100.0 spike sits far beyond 3σ (σ ≈ 0.105) and
    // flags; the spike then joins the moments, so a SECOND spike of the
    // same size still flags (σ grew but not enough) while calm stays calm
    writeEvents(Seq((10L, 10000L, "k", 10.0), (11L, 11000L, "k", 100.0)))
    run()
    assert(flagged() == Seq(11L), "spike must flag against carried moments")
    writeEvents(Seq((12L, 12000L, "k", 10.0), (13L, 13000L, "k", 100.0),
      (14L, 14000L, "k", 10.0)))
    run()
    assert(flagged() == Seq(11L, 13L),
      "second spike flags; calm readings never do")
    // an unseen key has no moments: silent regardless of value
    writeEvents(Seq((15L, 15000L, "fresh", 1e9)))
    run()
    assert(flagged() == Seq(11L, 13L), "unseen key cannot flag")
  }

  test("silence alerts: entry going quiet past watermark fires once, re-arms") {
    val src = Files.createTempDirectory("sa-src").toString
    val ck = Files.createTempDirectory("sa-ck").toString
    val out = Files.createTempDirectory("sa-out").toString
    def run(): Unit = {
      val stream = spark.readStream.schema(Records.schema).parquet(src)
        .withColumn("__event_ts", timestamp_micros(col("ts")))
        .withWatermark("__event_ts", "5 seconds")
      StatefulStream.silenceAlerts(stream, silenceUs = 30000000L) // 30 s
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    def alerts(): Seq[(String, Long)] = spark.read.parquet(out)
      .select("entry", "last_ts_us").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    val S = 1000000L
    // e last seen 10s; f keeps the stream alive at 100s → watermark 95s
    // passes e's 40s deadline: e alerts (in the trailing no-data batch);
    // f's deadline (130s) is still ahead
    writeBatch(src, Seq(("e", 0L, "a"), ("e", 10 * S, "a"),
      ("f", 100 * S, "a")))
    run()
    assert(alerts() == Seq(("e", 10 * S)), s"got ${alerts()}")
    // e recovers at 200s (re-armed), f's 130s deadline passes → f alerts
    writeBatch(src, Seq(("e", 200 * S, "a")))
    run()
    assert(alerts() == Seq(("e", 10 * S), ("f", 100 * S)))
    // stream advances to 300s: e's new 230s deadline passes → e alerts
    // AGAIN (one alert per outage, not per entry lifetime)
    writeBatch(src, Seq(("g", 300 * S, "a")))
    run()
    assert(alerts() == Seq(("e", 10 * S), ("e", 200 * S), ("f", 100 * S)))
  }

  test("trendingTerms: per-window sketch ranks emit once the window closes") {
    import spark.implicits._
    val src = Files.createTempDirectory("tt-src").toString
    val ck = Files.createTempDirectory("tt-ck").toString
    val out = Files.createTempDirectory("tt-out").toString
    def writeTerms(rows: Seq[(Long, String)]): Unit =
      rows.toDF("ts", "term").write.mode("append").parquet(src)
    def run(): Unit = {
      val stream = spark.readStream.schema("ts BIGINT, term STRING")
        .parquet(src)
        .withColumn("__event_ts", timestamp_micros(col("ts")))
        .withWatermark("__event_ts", "5 seconds")
      StatefulStream.trendingTerms(stream, windowUs = 60000000L,
          capacity = 64, k = 2)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    def got(): Seq[(Long, String, Long, Long)] = spark.read.parquet(out)
      .select("window_start_us", "term", "count", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    val S = 1000000L
    // window [0,60s): hot×3, warm×2, cold×1 — split across TWO batches,
    // so the ranking must come from merged cross-batch sketch state
    writeTerms(Seq((1 * S, "hot"), (2 * S, "warm"), (3 * S, "hot")))
    run()
    assert(got().isEmpty, "window still open: nothing may emit")
    writeTerms(Seq((10 * S, "hot"), (11 * S, "warm"), (12 * S, "cold")))
    run()
    assert(got().isEmpty)
    // an event at 120s pushes the watermark past 60s → window 0 closes
    // with exactly its top-2, exact counts (capacity ≥ vocab)
    writeTerms(Seq((120 * S, "later")))
    run()
    assert(got() == Seq((0L, "hot", 3L, 1L), (0L, "warm", 2L, 2L)),
      s"got ${got()}")
  }

  test("activeUsersWindows: exact distinct per window, emits on close") {
    import spark.implicits._
    val src = Files.createTempDirectory("au-src").toString
    val ck = Files.createTempDirectory("au-ck").toString
    val out = Files.createTempDirectory("au-out").toString
    def writeUsers(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("ts", "user_id").write.mode("append").parquet(src)
    def run(): Unit = {
      val stream = spark.readStream.schema("ts BIGINT, user_id BIGINT")
        .parquet(src)
        .withColumn("__event_ts", timestamp_micros(col("ts")))
        .withWatermark("__event_ts", "5 seconds")
      StatefulStream.activeUsersWindows(stream, windowUs = 60000000L)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    val S = 1000000L
    // window [0,60s): users {7,8} over 2 batches with repeats
    writeUsers(Seq((1 * S, 7L), (2 * S, 8L), (3 * S, 7L)))
    run()
    writeUsers(Seq((10 * S, 8L), (120 * S, 9L))) // 120s closes window 0
    run()
    val got = spark.read.parquet(out)
      .select("window_start_us", "active_users", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == Seq((0L, 2L, 4L)), s"got $got")
  }

  test("attributionJoin: stream-stream join pairs clicks with purchases in lag") {
    import spark.implicits._
    val clickSrc = Files.createTempDirectory("aj-c").toString
    val purchSrc = Files.createTempDirectory("aj-p").toString
    val ck = Files.createTempDirectory("aj-ck").toString
    val out = Files.createTempDirectory("aj-out").toString
    def write(dir: String, rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("user_id", "event_id", "ts_us")
        .select(col("user_id"), col("event_id"),
          timestamp_micros(col("ts_us")).as("ts"))
        .write.mode("append").parquet(dir)
    def run(): Unit = {
      def stream(dir: String) = spark.readStream
        .schema("user_id BIGINT, event_id BIGINT, ts TIMESTAMP").parquet(dir)
        .withWatermark("ts", "10 seconds")
      graft.pipeline.TimeSeries
        .attributionJoin(stream(clickSrc), stream(purchSrc), "30 seconds")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    val S = 1000000L
    // user 1: click 10s, purchases at 20s (in lag) and 50s (out of lag);
    // user 2: purchase 15s with no prior click — never joins
    write(clickSrc, Seq((1L, 100L, 10 * S)))
    write(purchSrc, Seq((1L, 200L, 20 * S), (1L, 201L, 50 * S),
      (2L, 202L, 15 * S)))
    run()
    val got = spark.read.parquet(out)
      .select("user_id", "click_id", "purchase_id", "lag_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(got == Seq((1L, 100L, 200L, 10 * S)), s"got $got")
  }

  test("rollupWindows streaming: buckets close as the watermark passes") {
    import org.apache.spark.sql.DataFrame
    val src = Files.createTempDirectory("rw-src").toString
    val ck = Files.createTempDirectory("rw-ck").toString
    val out = Files.createTempDirectory("rw-out").toString
    def writeEvents(rows: Seq[(Long, String, Double)]): Unit = {
      import spark.implicits._
      rows.toDF("ts_us", "event_type", "value")
        .select(timestamp_micros(col("ts_us")).as("ts"), col("event_type"),
          col("value"))
        .write.mode("append").parquet(src)
    }
    def run(): Unit = {
      val stream = spark.readStream
        .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
        .parquet(src)
        .withWatermark("ts", "10 seconds")
      graft.pipeline.TimeSeries.rollupWindows(stream, col("ts"), "30 seconds")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    val S = 1000000L
    // bucket [0,30s) gets two events; an event at 100s pushes the
    // watermark to 90s, closing it within the run
    writeEvents(Seq((5 * S, "a", 1.0), (10 * S, "a", 2.0), (100 * S, "a", 4.0)))
    run()
    val rows = spark.read.parquet(out)
      .select("bucket_ts", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((0L, 2L, 3.0)),
      s"only the closed bucket emits, got ${rows.toSeq}")
  }
}
