package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** fromEvents mapping invariants — in particular the (entry, ts) collision
  * nudge that upholds ts-as-record-ID (storage.proto:38). */
class RecordsSpec extends AnyFunSuite with SparkTestBase {

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField("ts", LongType))) // nanos, like the driver's parquet

  private def eventsDf(rows: Seq[(Long, String, Long)]) = {
    import scala.jdk.CollectionConverters._
    val data = rows.map { case (id, typ, tsNs) =>
      Row(id, 1L, typ, 1.0, "{}", tsNs)
    }.asJava
    spark.createDataFrame(data, eventsSchema)
  }

  test("(entry, ts) collisions are nudged deterministically by event_id") {
    // three events in the same microsecond of the same entry + one clean
    val df = Records.fromEvents(eventsDf(Seq(
      (30L, "click", 1000000999L), // same µs (ts DIV 1000 = 1000000)
      (10L, "click", 1000000001L),
      (20L, "click", 1000000500L),
      (40L, "view", 1000000001L)))) // other entry: unaffected
    val rows = df.orderBy("entry", "ts").collect()
      .map(r => (r.getString(r.fieldIndex("entry")), r.getLong(r.fieldIndex("ts")),
        r.getMap[String, String](r.fieldIndex("labels"))("event_id")))
    assert(rows.toSeq == Seq(
      ("events/click", 1000000L, "10"), // row_number 1 → +0
      ("events/click", 1000001L, "20"), // ordered by event_id → +1
      ("events/click", 1000002L, "30"), // → +2
      ("events/view", 1000000L, "40")))
    // ts unique per entry after the nudge
    assert(df.select("entry", "ts").distinct().count() == df.count())
  }

  test("collision-free events keep their exact truncated µs ts") {
    val df = Records.fromEvents(eventsDf(Seq(
      (1L, "click", 5000999L), (2L, "click", 7000001L))))
    assert(df.select("ts").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(5000L, 7000L))
  }

  test("eventTsUs reads all three driver ts encodings identically") {
    import org.apache.spark.sql.functions.expr
    val base = eventsDf(Seq((1L, "click", 5000999L)))
    // ns-as-long (legacy nanosAsLong), LTZ, and NTZ (the current driver
    // encoding) must all yield the same µs record id: 5000999 ns → 5000 µs
    val asLtz = base.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    val asNtz = asLtz.withColumn("ts", expr("cast(ts as timestamp_ntz)"))
    for (df <- Seq(base, asLtz, asNtz)) {
      val us = df.select(Records.eventTsUs(df).as("us")).collect()(0).getLong(0)
      assert(us == 5000L, s"got $us for ${df.schema("ts").dataType}")
    }
    // and fromEvents works end-to-end over the NTZ encoding
    assert(Records.fromEvents(asNtz).count() == 1)
  }

  test("a perturbed events schema fails loudly with the missing columns named") {
    val bad = eventsDf(Seq((1L, "click", 1L)))
      .withColumnRenamed("user_id", "uid")
      .drop("props")
    val e = intercept[IllegalArgumentException](Records.fromEvents(bad))
    assert(e.getMessage.contains("user_id"))
    assert(e.getMessage.contains("props"))
    assert(e.getMessage.contains("expected"))
  }

  test("a non-timestamp ts type fails loudly") {
    import org.apache.spark.sql.functions.col
    val bad = eventsDf(Seq((1L, "click", 1L)))
      .withColumn("ts", col("ts").cast(StringType))
    val e = intercept[IllegalArgumentException](Records.fromEvents(bad))
    assert(e.getMessage.contains("events.ts"))
  }
}
