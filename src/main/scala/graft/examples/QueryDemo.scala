package graft.examples

import graft.core.Records
import graft.engine.{QueryEngine, QuerySpec}
import org.apache.spark.sql.SparkSession

/** Library usage demo: events table → record model → condition-engine
  * queries. Run: `sbt "runMain graft.examples.QueryDemo"`.
  */
object QueryDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val records = Records.fromEvents(spark.read.parquet(s"$sf/events.parquet"))
    println(s"records: ${records.count()}")

    val q1 = QueryEngine.query(records, QuerySpec(
      start = Some(1704067200000000L), // 2024-01-01
      stop = Some(1704672000000000L),  // 2024-01-08
      entries = Some(Seq("events/*", "!events/error")),
      when = Some("""{"&value": {"$gt": 100}, "&user_id": {"$lt": 8}}""")))
    println("q1 (range + globs + label conds):")
    q1.show(5, truncate = false)
    println(s"q1 rows: ${q1.count()}")

    val q2 = QueryEngine.query(records, QuerySpec(
      when = Some("""{"$in": ["&type", "purchase", "click"], "$each_n": 10}""")))
    println(s"q2 (in + each_n 10) rows: ${q2.count()}")

    val q3 = QueryEngine.query(records, QuerySpec(
      when = Some("""{"#ctx_before": 2, "#select_labels": ["value", "event_id"], "&value": {"$gt": 190}}""")))
    println("q3 (ctx_before + select_labels):")
    q3.show(6, truncate = false)

    val (survivors, removed) = QueryEngine.remove(records,
      QuerySpec(when = Some("""{"$each_n": 2}""")))
    println(s"remove each_n=2: removed=$removed survivors=${survivors.count()}")

    println("q1 plan:")
    QueryEngine.matching(records, QuerySpec(
      start = Some(1704067200000000L), stop = Some(1704672000000000L),
      when = Some("""{"&value": {"$gt": 100}}"""))).explain("formatted")

    // storage engine round trip: ingest → query → ext pipeline → delete
    val storeDir = java.nio.file.Files.createTempDirectory("graft-demo-store")
    val store = new graft.engine.BucketStore(spark, storeDir.toString)
    store.write(records)
    println(s"store rows: ${store.table().count()}")
    val viaStore = QueryEngine.query(store.table(), QuerySpec(
      entries = Some(Seq("events/click")),
      when = Some("""{"#ext": {"json_extract": {"fields": ["k"]}},
                      "&value": {"$gt": 250}}""")))
    println("store query + ext pipeline (@k extracted from payload):")
    viaStore.select("ts", "computed_labels").show(3, truncate = false)
    println("store query plan (partition pruning on entry + dt):")
    QueryEngine.matching(store.table(), QuerySpec(
      entries = Some(Seq("events/click")),
      start = Some(1704067200000000L), stop = Some(1704672000000000L)))
      .explain("formatted")

    val removedN = store.removeQuery(QuerySpec(when = Some("""{"$each_n": 4}""")))
    println(s"store removeQuery each_n=4: removed=$removedN left=${store.table().count()}")
    val evicted = store.enforceFifoQuota("default", store.bucketSizeBytes("default") / 2)
    println(s"fifo quota evicted $evicted day-partitions; left=${store.table().count()}")
    spark.stop()
  }
}
