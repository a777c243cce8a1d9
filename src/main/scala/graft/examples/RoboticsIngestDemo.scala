package graft.examples

import graft.engine.{BucketStore, QueryEngine, QuerySpec}
import graft.sources.Mcap
import graft.stream.{Streaming, Zenoh, ZenohBridge}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Robotics ingest composition: Zenoh-shaped pub/sub samples and an MCAP
  * log land in the same bucket store, get queried with the condition
  * language (incl. an `#ext` pipeline over the JSON payloads), answer
  * zenoh get() selectors, and replicate a topic subtree to a second
  * store — the robotics-side analog of CrawlIngestDemo's WARC pipeline.
  */
object RoboticsIngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-robotics-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val store = new BucketStore(spark, Files.createTempDirectory("robots").toString)

    // ---- Zenoh write path: samples → fixed bucket, keyexpr = entry
    val transport = new InMemoryTransport
    val bridge = new ZenohBridge(store,
      Zenoh.Config(enabled = true, bucket = "zenoh",
        subKeyexprs = Some("factory/**"), queryKeyexprs = Some("**")),
      transport)
    require(bridge.start().isDefined)
    for (i <- 0 until 200) {
      transport.publish(Zenoh.Sample(s"factory/line1/imu", payload =
        s"""{"ax": ${i % 10}.${i % 100}, "temp": ${20 + i % 8}}""".getBytes,
        attachment = Some(s"""{"robot": "r${i % 4}"}""".getBytes),
        timestampUs = Some(1000000L + i * 1000L), contentType = "application/json"))
      transport.publish(Zenoh.Sample(s"factory/line2/camera", payload =
        Array.fill[Byte](64)((i % 97).toByte),
        timestampUs = Some(1000000L + i * 1000L)))
      transport.publish(Zenoh.Sample(s"office/hvac", payload = "x".getBytes,
        timestampUs = Some(i.toLong + 1))) // outside factory/** → dropped
    }
    bridge.flush()
    println("per-entry counts after zenoh ingest:")
    store.table().groupBy("bucket", "entry").count().orderBy("entry").show(false)

    // ---- MCAP log of the same robot fleet → bucket "mcap"
    val mcapBytes = Mcap.synthMcap(
      (0 until 100).map(i => ("/arm/joint_states", i.toLong,
        2000000000L + i * 1000000L, s"""{"effort": ${i % 50}}""".getBytes)),
      compression = Some("zstd"), jsonTopics = Set("/arm/joint_states"))
    val mcapDir = Files.createTempDirectory("mcap")
    Files.write(mcapDir.resolve("fleet.mcap"), mcapBytes)
    store.write(Mcap.fromMessages(
      Mcap.read(spark, mcapDir.toString), bucket = "mcap"))
    println(s"mcap records: ${store.table().filter(col("bucket") === "mcap").count()}")

    // ---- condition-language query with an #ext pipeline over payloads
    val hotArms = QueryEngine.query(store.table(), QuerySpec(
      bucket = Some("mcap"), entries = Some(Seq("arm/**")),
      when = Some(
        """{"#ext": [{"json_extract": {"fields": ["effort"]}},
                     {"payload_stats": {}, "when": {"@effort": {"$gte": 45}}}]}""")))
    println(s"high-effort joint states: ${hotArms.count()}")

    // ---- zenoh read path: get() selectors against the store
    val lastImu = transport.get(Zenoh.Query("factory/line1/imu",
      params = Map("last" -> "true")))
    println(s"last imu sample ts=${lastImu.head.timestampUs} " +
      s"labels=${lastImu.head.labels}")
    val robot2 = transport.get(Zenoh.Query("factory/line1/imu",
      attachment = Some("""{"when": {"&robot": {"$eq": "r2"}}}""".getBytes)))
    println(s"robot r2 samples: ${robot2.size}")

    // ---- replicate the line1 subtree to a second store, strict when
    val dst = new BucketStore(spark, Files.createTempDirectory("robots-dst").toString)
    val q = Streaming.replicate(store, dst,
      Streaming.ReplicationSettings(
        entries = Some(Seq("factory/line1/**")),
        when = Some("""{"$in": ["&robot", "r0", "r1"]}"""),
        srcBucket = Some("zenoh"), dstBucket = "mirror", dstPrefix = "edge/"),
      checkpoint = Files.createTempDirectory("ckpt").toString)
    q.foreach(_.awaitTermination())
    println("replicated (line1, robots r0/r1, prefixed):")
    dst.table().groupBy("entry").count().show(false)

    spark.stop()
  }

  /** Minimal in-process transport (same shape as the spec's). */
  final class InMemoryTransport extends Zenoh.Transport {
    private var subs = List.empty[(String, Zenoh.Sample => Unit)]
    private var queryables = List.empty[(String, Zenoh.Query => Iterator[Zenoh.Reply])]
    def subscribe(kx: String)(h: Zenoh.Sample => Unit): AutoCloseable = {
      subs ::= (kx, h); () => ()
    }
    def queryable(kx: String)(h: Zenoh.Query => Iterator[Zenoh.Reply]): AutoCloseable = {
      queryables ::= (kx, h); () => ()
    }
    def publish(s: Zenoh.Sample): Unit = subs.foreach(_._2(s))
    def get(q: Zenoh.Query): Seq[Zenoh.Reply] = queryables.flatMap(_._2(q).toSeq)
  }
}
