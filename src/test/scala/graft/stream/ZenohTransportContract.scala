package graft.stream

import graft.SparkTestBase
import graft.engine.BucketStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** TCK for [[Zenoh.Transport]] implementations.
  *
  * The bridge implements everything behind the transport seam
  * (ZenohBridge.scala); the native zenoh binding is the one piece a
  * zero-egress build cannot link. This contract writes down what a
  * drop-in binding must provide so a real deployment can certify itself:
  * extend [[ZenohTransportContract]], implement [[ZenohTransportHarness]]
  * for the binding (for a real zenoh session, `publish`/`get` come from a
  * SECOND session acting as the remote peer), and the full battery —
  * delivery, undeclare, keyexpr→entry mapping, attachment encoding, and
  * the selector grammar of api/zenoh/queryable.rs:149-215 — runs against
  * it end-to-end through the bridge and the store.
  *
  * [[InMemoryZenohTransportContractSpec]] instantiates the kit over the
  * in-memory transport, which both keeps the contract itself green in CI
  * and serves as the reference harness implementation.
  */
trait ZenohTransportHarness {
  /** Display name for test labels. */
  def name: String
  /** A fresh transport instance (one per test). */
  def newTransport(): Zenoh.Transport
  /** Publish a sample as a remote peer would (must reach subscribers
    * whose key expression matches). */
  def publish(t: Zenoh.Transport, s: Zenoh.Sample): Unit
  /** Issue a get() as a remote peer would, collecting the replies. */
  def get(t: Zenoh.Transport, q: Zenoh.Query): Seq[Zenoh.Reply]
}

abstract class ZenohTransportContract extends AnyFunSuite with SparkTestBase {

  import Zenoh._

  def harness: ZenohTransportHarness

  private def newStore() =
    new BucketStore(spark, Files.createTempDirectory("graft-zenoh-tck").toString)

  private def newBridge(t: Transport,
      config: Config = Config(enabled = true, subKeyexprs = Some("**"),
        queryKeyexprs = Some("**"))) = {
    val store = newStore()
    (store, new ZenohBridge(store, config, t, flushEvery = 1024,
      nowUs = () => 999000L, onWarn = _ => ()))
  }

  private def sample(key: String, payload: String, ts: Long,
      labels: Map[String, String] = Map.empty): Sample =
    Sample(key, payload.getBytes(StandardCharsets.UTF_8),
      attachment = if (labels.isEmpty) None else Some(serializeLabels(labels)),
      timestampUs = Some(ts))

  test(s"[${harness.name}] delivery: published samples land as records") {
    val t = harness.newTransport()
    val (store, b) = newBridge(t)
    val closer = b.start().get
    harness.publish(t, sample("robot/lidar", "p1", 1000L))
    harness.publish(t, sample("robot/lidar", "p2", 2000L))
    closer.close() // close flushes
    val rows = store.table().orderBy("ts").collect()
    assert(rows.map(_.getAs[Long]("ts")).toSeq == Seq(1000L, 2000L))
    assert(rows.map(r => new String(r.getAs[Array[Byte]]("payload"))).toSeq
      == Seq("p1", "p2"))
    assert(rows.forall(_.getAs[String]("entry") == "robot/lidar"))
    assert(rows.forall(_.getAs[String]("bucket") == "zenoh"))
  }

  test(s"[${harness.name}] undeclare: after close, samples no longer land") {
    val t = harness.newTransport()
    val (store, b) = newBridge(t)
    val closer = b.start().get
    harness.publish(t, sample("a", "kept", 10L))
    closer.close()
    harness.publish(t, sample("a", "dropped", 20L))
    b.flush()
    val rows = store.table().collect()
    assert(rows.length == 1 &&
      new String(rows(0).getAs[Array[Byte]]("payload")) == "kept")
  }

  test(s"[${harness.name}] keyexpr→entry: slashes trimmed (subscriber.rs:47)") {
    val t = harness.newTransport()
    val (store, b) = newBridge(t)
    val closer = b.start().get
    harness.publish(t, sample("/deep/path/", "x", 1L))
    closer.close()
    assert(store.table().collect().map(_.getAs[String]("entry")).toSeq
      == Seq("deep/path"))
  }

  test(s"[${harness.name}] attachment encoding: labels round-trip both directions") {
    val t = harness.newTransport()
    val (store, b) = newBridge(t)
    val closer = b.start().get
    harness.publish(t,
      sample("s1", "x", 100L, labels = Map("unit" -> "mm", "seq" -> "7")))
    b.flush()
    // write side: attachment decoded into the label map
    val row = store.table().collect()(0)
    assert(row.getAs[Map[String, String]]("labels")
      == Map("unit" -> "mm", "seq" -> "7"))
    // read side: labels ride back on the reply, re-serializable to the
    // identical canonical attachment bytes
    val replies = harness.get(t, Query("s1", params = Map("ts" -> "100")))
    assert(replies.map(_.labels) == Seq(Map("unit" -> "mm", "seq" -> "7")))
    assert(new String(serializeLabels(replies.head.labels)) ==
      """{"seq":"7","unit":"mm"}""")
    closer.close()
  }

  test(s"[${harness.name}] selector grammar: ts / last / range / limit / when") {
    val t = harness.newTransport()
    val (store, b) = newBridge(t)
    val closer = b.start().get
    for (i <- 1 to 5)
      harness.publish(t, sample("e", s"p$i", i * 100L,
        labels = Map("i" -> i.toString)))
    b.flush()
    def bodies(rs: Seq[Reply]) = rs.map(r => new String(r.payload))
    // ts → exactly that record (queryable.rs:149-157)
    assert(bodies(harness.get(t, Query("e", Map("ts" -> "300")))) == Seq("p3"))
    assert(harness.get(t, Query("e", Map("ts" -> "999"))).isEmpty)
    // last=true → newest; last=false → plain query (queryable.rs:159-167)
    assert(bodies(harness.get(t, Query("e", Map("last" -> "true")))) == Seq("p5"))
    assert(bodies(harness.get(t, Query("e", Map("last" -> "false"))))
      == Seq("p1", "p2", "p3", "p4", "p5"))
    // [start, stop): inclusive start, exclusive stop (queryable.rs:199-215)
    assert(bodies(harness.get(t,
      Query("e", Map("start" -> "200", "stop" -> "400")))) == Seq("p2", "p3"))
    // limit caps the reply count after ts-ordering
    assert(bodies(harness.get(t, Query("e", Map("limit" -> "2"))))
      == Seq("p1", "p2"))
    // when-attachment condition (attachments.rs:16-27)
    val when = """{"when": {"$gte": [{"$cast": ["&i", "int"]}, 4]}}"""
      .getBytes(StandardCharsets.UTF_8)
    assert(bodies(harness.get(t, Query("e", attachment = Some(when))))
      == Seq("p4", "p5"))
    // replies report ts in ascending record order with the query's keyexpr
    val all = harness.get(t, Query("e"))
    assert(all.map(_.timestampUs) == (1 to 5).map(_ * 100L))
    assert(all.forall(_.keyExpr == "e"))
    closer.close()
  }

  test(s"[${harness.name}] selector grammar: invalid ts/last values are errors") {
    val t = harness.newTransport()
    val (_, b) = newBridge(t)
    val closer = b.start().get
    intercept[IllegalArgumentException] {
      harness.get(t, Query("e", Map("ts" -> "not-a-number")))
    }
    intercept[IllegalArgumentException] {
      harness.get(t, Query("e", Map("last" -> "not-a-bool")))
    }
    closer.close()
  }

  test(s"[${harness.name}] namespace re-check: keys outside the subscription drop") {
    val t = harness.newTransport()
    val (store, b) = newBridge(t,
      Config(enabled = true, subKeyexprs = Some("robot/**")))
    val closer = b.start().get
    // a misbehaving transport that delivers outside its subscription must
    // not be able to write outside the subscribed namespace
    harness.publish(t, sample("robot/a", "in", 1L))
    harness.publish(t, sample("other/b", "out", 2L))
    closer.close()
    assert(store.table().collect().map(_.getAs[String]("entry")).toSeq
      == Seq("robot/a"))
  }
}

/** The contract instantiated over the in-memory transport: keeps the TCK
  * green in CI and documents the harness shape for a real binding. */
class InMemoryZenohTransportContractSpec extends ZenohTransportContract {

  private final class InMemoryTransport extends Zenoh.Transport {
    private var subs = List.empty[(String, Zenoh.Sample => Unit)]
    private var queryables =
      List.empty[(String, Zenoh.Query => Iterator[Zenoh.Reply])]
    def subscribe(kx: String)(h: Zenoh.Sample => Unit): AutoCloseable = {
      subs ::= (kx, h); () => subs = subs.filterNot(_._2 eq h)
    }
    def queryable(kx: String)(h: Zenoh.Query => Iterator[Zenoh.Reply]): AutoCloseable = {
      queryables ::= (kx, h); () => queryables = queryables.filterNot(_._2 eq h)
    }
    def publish(s: Zenoh.Sample): Unit = subs.foreach(_._2(s))
    def get(q: Zenoh.Query): Seq[Zenoh.Reply] = queryables.flatMap(_._2(q).toSeq)
  }

  // lazy: the contract superclass registers its tests (and reads
  // harness.name) during ITS constructor, before subclass vals init
  override lazy val harness: ZenohTransportHarness = new ZenohTransportHarness {
    def name = "in-memory"
    def newTransport(): Zenoh.Transport = new InMemoryTransport
    def publish(t: Zenoh.Transport, s: Zenoh.Sample): Unit =
      t.asInstanceOf[InMemoryTransport].publish(s)
    def get(t: Zenoh.Transport, q: Zenoh.Query): Seq[Zenoh.Reply] =
      t.asInstanceOf[InMemoryTransport].get(q)
  }
}
