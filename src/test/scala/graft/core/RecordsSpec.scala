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
}
