package graft.core

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical record model (SURVEY §1.2): one row per record, columnar
  * Parquet instead of the reference's row-oriented block files
  * (storage.proto:25-45). `ts` stays LONG µs — the record's primary key
  * within an entry — and is only converted to a timestamp inside date
  * operators.
  */
object Records {

  object State {
    val Started = 0
    val Finished = 1
    val Errored = 2
    val Invalid = 3
  }

  val schema: StructType = StructType(Seq(
    StructField("bucket", StringType, nullable = false),
    StructField("entry", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("labels", MapType(StringType, StringType), nullable = true),
    StructField("computed_labels", MapType(StringType, StringType), nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("state", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Map the driver's `events` table into the record model: the event
    * timestamp is the record id (µs), low-cardinality columns fold into the
    * labels map, `props` (a JSON string) becomes the payload, and the
    * event type becomes a path-shaped entry name (`events/<type>`) so entry
    * globs and multi-entry merge are exercised.
    *
    * Events can collide on (entry, ts); the record model requires ts unique
    * per entry (storage.proto:38 "timestamp works as ID"), so collisions are
    * disambiguated by event_id ordering via a deterministic µs nudge
    * (`ts + row_number - 1` within the colliding group). The nudge resolves
    * first-order collisions only — a nudged ts landing on another record's
    * ts is not re-resolved (none exist in the generated data); write-time
    * conflict checks (BucketStore Conflict.Error) remain the backstop.
    */
  /** Columns `fromEvents` requires of the driver's events table. Checked
    * up-front so a driver-side data refresh that renames or drops a column
    * fails with a message naming the gap, not an opaque resolution error
    * deep in the plan.
    */
  private val eventsRequired = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  def requireEventsSchema(events: DataFrame): Unit = {
    val present = events.schema.fieldNames.toSet
    val missing = eventsRequired.filterNot(present)
    require(
      missing.isEmpty,
      s"events table is missing required column(s) ${missing.mkString(", ")}; " +
        s"expected [${eventsRequired.mkString(", ")}], found [${events.schema.fieldNames.mkString(", ")}]")
    val tsType = events.schema("ts").dataType
    require(
      tsType == LongType || tsType == TimestampNTZType || tsType.isInstanceOf[TimestampType.type],
      s"events.ts must be a long (ns) or timestamp column, found $tsType")
  }

  def fromEvents(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireEventsSchema(events)
    val tsUs = eventTsUs(events)
    val entryCol = concat(lit("events/"), col("event_type"))
    val w = Window.partitionBy(entryCol, tsUs).orderBy(col("event_id"))
    val nudged = tsUs + row_number().over(w).cast("long") - lit(1L)
    events.select(
      lit("default").as("bucket"),
      entryCol.as("entry"),
      nudged.as("ts"),
      map(
        lit("event_id"), col("event_id").cast("string"),
        lit("user_id"), col("user_id").cast("string"),
        lit("type"), col("event_type"),
        lit("value"), col("value").cast("string"),
        lit("props"), col("props")).as("labels"),
      map().cast("map<string,string>").as("computed_labels"),
      lit("application/json").as("content_type"),
      lit(State.Finished).as("state"),
      encode(col("props"), "UTF-8").as("payload"))
  }

  /** Typed record for `Dataset[Record]` use where compile-time field
    * checks help (custom per-partition logic, streaming state functions).
    * The engine itself stays `DataFrame`-based: the condition language is
    * inherently dynamic over the labels map. */
  final case class Record(
      bucket: String, entry: String, ts: Long,
      labels: Map[String, String], computed_labels: Map[String, String],
      content_type: String, state: Int, payload: Array[Byte])

  def typed(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Dataset[Record] = {
    import df.sparkSession.implicits._
    df.as[Record]
  }

  /** µs timestamp column from the raw events table, tolerant of every
    * physical encoding the driver has shipped: TIMESTAMP(NANOS) read as a
    * nanosecond LONG (`spark.sql.legacy.parquet.nanosAsLong=true` — set in
    * every session this library creates), timestamp-with-timezone
    * (TimestampType), and timestamp-without-timezone (TIMESTAMP_NTZ, the
    * current `timestamp[us]` encoding). The NTZ→LTZ cast is exact because
    * the session timezone is pinned UTC in SparkEntry.session.
    */
  def eventTsUs(events: DataFrame): Column =
    events.schema("ts").dataType match {
      case LongType => expr("ts DIV 1000")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case _ => unix_micros(col("ts"))
    }
}
