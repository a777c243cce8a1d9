package graft.stream

import graft.SparkTestBase
import graft.engine.BucketStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Zenoh-shaped ingest/query seam over an in-memory transport
  * (api/zenoh/subscriber.rs, api/zenoh/queryable.rs, cfg/zenoh.rs). The
  * transport trait is the only unimplementable piece in this build; every
  * mapping rule it feeds is exercised here.
  */
class ZenohBridgeSpec extends AnyFunSuite with SparkTestBase {

  import Zenoh._

  /** Drives handlers directly: publish() fans a sample to subscribers,
    * get() routes a selector to the queryable. */
  private final class InMemoryTransport extends Transport {
    private var subs = List.empty[(String, Sample => Unit)]
    private var queryables = List.empty[(String, Query => Seq[Reply])]
    def subscribe(kx: String)(h: Sample => Unit): AutoCloseable = {
      subs ::= (kx, h); () => subs = subs.filterNot(_._2 eq h)
    }
    def queryable(kx: String)(h: Query => Seq[Reply]): AutoCloseable = {
      queryables ::= (kx, h); () => queryables = queryables.filterNot(_._2 eq h)
    }
    def publish(s: Sample): Unit = subs.foreach(_._2(s))
    def get(q: Query): Seq[Reply] = queryables.flatMap(_._2(q))
    def subscriberCount: Int = subs.size
  }

  private def newStore() =
    new BucketStore(spark, Files.createTempDirectory("graft-zenoh").toString)

  private def bridge(store: BucketStore, t: Transport,
      config: Config = Config(enabled = true, subKeyexprs = Some("**"),
        queryKeyexprs = Some("**")),
      warns: StringBuilder = new StringBuilder) =
    new ZenohBridge(store, config, t, flushEvery = 1024,
      nowUs = () => 7777000L, onWarn = m => { warns.append(m).append('\n'); () })

  test("disabled config starts nothing (api/zenoh.rs spawn_runtime)") {
    val t = new InMemoryTransport
    val b = new ZenohBridge(newStore(), Config(enabled = false), t)
    assert(b.start().isEmpty)
    assert(t.subscriberCount == 0)
  }

  test("samples land in the fixed bucket with keyexpr as entry name") {
    val store = newStore()
    val t = new InMemoryTransport
    val b = bridge(store, t, Config(enabled = true, bucket = "robots",
      subKeyexprs = Some("**")))
    assert(b.start().isDefined)
    t.publish(Sample("/factory/line1/cam", "frame-1".getBytes,
      timestampUs = Some(1000L), contentType = "image/jpeg"))
    t.publish(Sample("sensor/imu", "a".getBytes)) // no ts → injected clock
    b.flush()
    val rows = store.table().orderBy("ts")
      .select("bucket", "entry", "ts", "content_type").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("robots", "factory/line1/cam", 1000L), ("robots", "sensor/imu", 7777000L)))
    assert(rows(0).getString(3) == "image/jpeg")
  }

  test("attachment labels: decode, source-label override, invalid degrade") {
    val store = newStore()
    val t = new InMemoryTransport
    val warns = new StringBuilder
    val b = bridge(store, t, warns = warns)
    b.start()
    t.publish(Sample("e", "p1".getBytes, timestampUs = Some(1L),
      attachment = Some("""{"sensor": "imu", "unit": "m/s^2", "n": 3}""".getBytes),
      sourceLabels = Map("sensor" -> "override")))
    t.publish(Sample("e", "p2".getBytes, timestampUs = Some(2L),
      attachment = Some("not-json".getBytes))) // invalid → warn, still lands
    b.flush()
    val rows = store.table().orderBy("ts").collect()
    val l1 = rows(0).getAs[Map[String, String]]("labels")
    assert(l1 == Map("sensor" -> "override", "unit" -> "m/s^2", "n" -> "3"))
    val l2 = rows(1).getAs[Map[String, String]]("labels")
    assert(l2.isEmpty)
    assert(warns.toString.contains("failed to decode labels"))
  }

  test("keys outside the subscribed pattern are dropped (pattern.rs grammar)") {
    val store = newStore()
    val t = new InMemoryTransport
    val warns = new StringBuilder
    val b = bridge(store, t, Config(enabled = true,
      subKeyexprs = Some("factory/**")), warns)
    b.start()
    t.publish(Sample("factory/line1/cam", "in".getBytes, timestampUs = Some(1L)))
    t.publish(Sample("office/desk", "out".getBytes, timestampUs = Some(2L)))
    b.flush()
    assert(store.table().select("entry").collect().map(_.getString(0)).toSeq ==
      Seq("factory/line1/cam"))
    assert(warns.toString.contains("outside subscribed"))
  }

  test("duplicate (entry, ts) replays skip instead of failing the batch") {
    val store = newStore()
    val t = new InMemoryTransport
    val b = bridge(store, t)
    b.start()
    t.publish(Sample("e", "v1".getBytes, timestampUs = Some(5L)))
    b.flush()
    t.publish(Sample("e", "v2".getBytes, timestampUs = Some(5L))) // replay
    t.publish(Sample("e", "v3".getBytes, timestampUs = Some(6L)))
    b.flush()
    val rows = store.table().orderBy("ts").collect()
      .map(r => (r.getLong(r.fieldIndex("ts")), new String(r.getAs[Array[Byte]]("payload"))))
    assert(rows.toSeq == Seq((5L, "v1"), (6L, "v3")))
  }

  test("queryable: ts param, last param, and when-attachment query") {
    val store = newStore()
    val t = new InMemoryTransport
    val b = bridge(store, t)
    b.start()
    for (i <- 1 to 5)
      t.publish(Sample("sensor/imu", s"r$i".getBytes, timestampUs = Some(i.toLong),
        attachment = Some(s"""{"score": "$i"}""".getBytes)))
    b.flush()
    // ts → exactly that record (queryable.rs parse_timestamp)
    val byTs = t.get(Query("sensor/imu", params = Map("ts" -> "3")))
    assert(byTs.map(r => new String(r.payload)) == Seq("r3"))
    assert(byTs.head.labels == Map("score" -> "3"))
    // last → latest record (queryable.rs parse_last)
    val last = t.get(Query("/sensor/imu/", params = Map("last" -> "true")))
    assert(last.map(_.timestampUs) == Seq(5L))
    // range + when from the attachment ({"when": ...}, attachments.rs)
    val q = t.get(Query("sensor/imu",
      params = Map("start" -> "1", "stop" -> "5", "strict" -> "true"),
      attachment = Some("""{"when": {"&score": {"$gte": 2}}}""".getBytes)))
    assert(q.map(_.timestampUs).sorted == Seq(2L, 3L, 4L))
    // bad params are invalid-parameter errors
    intercept[IllegalArgumentException] {
      t.get(Query("sensor/imu", params = Map("ts" -> "abc")))
    }
  }

  test("config env parsing + inline credential materialization (cfg/zenoh.rs)") {
    val cfg = Config.fromEnv(Map(
      "RS_ZENOH_ENABLED" -> "true",
      "RS_ZENOH_BUCKET" -> "b1",
      "RS_ZENOH_SUB_KEYEXPRS" -> "factory/**",
      "RS_ZENOH_AUTH_DICTIONARY" -> "user:pass"))
    assert(cfg == Config(enabled = true, bucket = "b1",
      subKeyexprs = Some("factory/**"), authDictionary = Some("user:pass")))
    assert(Config.fromEnv(Map.empty) == Config()) // disabled, bucket "zenoh"
    val files = Zenoh.materializeCredentials(cfg)
    assert(files.keySet == Set("usrpwd_dictionary"))
    assert(Files.readString(files("usrpwd_dictionary")) == "user:pass")
  }
}
