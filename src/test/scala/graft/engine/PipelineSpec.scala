package graft.engine

import graft.SparkTestBase
import graft.core.Records
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Extension-pipeline analog + query registry + links. */
class PipelineSpec extends AnyFunSuite with SparkTestBase {

  private def recordsDf(rows: Seq[(String, Long, Map[String, String], String)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val data = rows.map { case (entry, ts, labels, payload) =>
      Row("b", entry, ts, labels, Map.empty[String, String],
        "application/json", Records.State.Finished, payload.getBytes)
    }.asJava
    spark.createDataFrame(data, Records.schema)
  }

  test("#ext json_extract feeds @computed refs in a later step's when") {
    val df = recordsDf(Seq(
      ("e", 1L, Map.empty, """{"z": 130}"""),
      ("e", 2L, Map.empty, """{"z": 10}""")))
    // step 1 extracts @z; step 2's when gates on it (strict), mirroring
    // ext_repository.rs test_pipeline_step_when_applies_before_next_step
    val when =
      """{"#ext": [
           {"json_extract": {"fields": ["z"]}},
           {"payload_stats": {}, "when": {"@z": {"$gte": 124}}}
         ]}"""
    val out = QueryEngine.query(df, QuerySpec(when = Some(when))).collect()
    assert(out.length == 1)
    assert(out(0).getLong(out(0).fieldIndex("ts")) == 1L)
    val computed = out(0).getMap[String, String](out(0).fieldIndex("computed_labels"))
    assert(computed("z") == "130")
    assert(computed.contains("size") && computed.contains("crc32"))
  }

  test("split_lines produces one record per payload line with @line") {
    val df = recordsDf(Seq(("e", 1L, Map.empty, "a\nbb\nccc")))
    val when = """{"#ext": {"split_lines": {}}}"""
    val out = QueryEngine.query(df, QuerySpec(when = Some(when)))
      .select(col("computed_labels")("line"), col("payload").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("0", "a"), ("1", "bb"), ("2", "ccc")))
  }

  test("unknown extension and multi-extension steps are rejected") {
    val df = recordsDf(Seq(("e", 1L, Map.empty, "x")))
    intercept[graft.cond.CondError] {
      QueryEngine.query(df, QuerySpec(
        when = Some("""{"#ext": {"nope": {}}}"""))).collect()
    }
    intercept[graft.cond.CondError] {
      Processors.parseStep("""{"a": {}, "b": {}}""")
    }
  }

  test("query registry: ids increase, cursor pages, TTL evicts") {
    val df = recordsDf((1 to 25).map(i => ("e", i.toLong, Map.empty[String, String], "p")))
    val reg = new QueryRegistry()
    val id1 = reg.open(() => df, QuerySpec())
    val id2 = reg.open(() => df, QuerySpec(), ttlMs = 1L)
    assert(id2 > id1) // monotonic ids (query_test.py:7-39)
    val page1 = reg.fetch(id1, 10).get
    val page2 = reg.fetch(id1, 10).get
    val page3 = reg.fetch(id1, 10).get
    assert(page1.size == 10 && page2.size == 10 && page3.size == 5)
    assert(reg.fetch(id1, 10).get.isEmpty) // exhausted → NoContent
    Thread.sleep(5)
    assert(reg.fetch(id2, 1).isEmpty) // TTL expired (base.rs:52-92)
  }

  test("query registry: cursor floods with pathological TTLs stay bounded") {
    val df = recordsDf(Seq(("e", 1L, Map.empty[String, String], "p")))
    // pathological client: huge TTL, never fetches, never closes. Each
    // open compiles a plan (~10 ms), so the flood is sized at 10x the
    // cap. Opens past the cap are REJECTED — never evict live cursors:
    // LRU eviction would let the flood (freshest lastAccess) kill OTHER
    // clients' valid cursors mid-drain (ADVICE r14 medium).
    val reg = new QueryRegistry(maxCursors = 64)
    val results = (1 to 640).map(_ => scala.util.Try(
      reg.open(() => df, QuerySpec(), ttlMs = Long.MaxValue / 2)))
    assert(reg.size == 64, s"registry holds ${reg.size}")
    assert(results.take(64).forall(_.isSuccess), "first 64 opens admitted")
    assert(results.drop(64).forall(r => r.isFailure &&
      r.failed.get.isInstanceOf[QueryRegistry.TooManyQueriesException]),
      "opens at the cap must be rejected, not displace live cursors")
    // the EARLIEST cursors survive the flood — the victim's query drains
    assert(reg.fetch(results.head.get, 1).isDefined)
    // expired cursors are actually freed on the next open/fetch sweep
    val reg2 = new QueryRegistry(maxCursors = 1000)
    (1 to 50).foreach(_ => reg2.open(() => df, QuerySpec(), ttlMs = 1L))
    Thread.sleep(5)
    reg2.open(() => df, QuerySpec()): Unit
    assert(reg2.size == 1, s"expired cursors not freed: ${reg2.size}")
    // ...and an at-cap open succeeds once an expired cursor frees a slot
    val reg4 = new QueryRegistry(maxCursors = 2)
    reg4.open(() => df, QuerySpec(), ttlMs = Long.MaxValue / 2): Unit
    reg4.open(() => df, QuerySpec(), ttlMs = 1L): Unit
    Thread.sleep(5)
    reg4.open(() => df, QuerySpec()): Unit // expired slot swept, admitted
    assert(reg4.size == 2)
    // CONCURRENT floods cannot overshoot: the check-then-put runs under
    // the cap lock (a race here was a review finding — n threads at
    // size == cap-1 could all pass the check and land cap+n-1)
    val reg3 = new QueryRegistry(maxCursors = 16)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    val admitted = new java.util.concurrent.atomic.AtomicInteger(0)
    try {
      val futs = (1 to 8).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = (1 to 25).foreach { _ =>
            try { reg3.open(() => df, QuerySpec(), ttlMs = Long.MaxValue / 2); admitted.incrementAndGet() }
            catch { case _: QueryRegistry.TooManyQueriesException => () }
            peak.getAndAccumulate(reg3.size, math.max)
          }
        })
      }
      futs.foreach(_.get())
    } finally pool.shutdown()
    assert(peak.get() <= 16, s"concurrent opens overshot the cap: ${peak.get()}")
    assert(admitted.get() == 16, s"exactly cap admissions, got ${admitted.get()}")
    assert(reg3.size == 16)
  }

  test("query registry: expiry racing an in-flight fetch is clean — no deadlock, next fetch is None") {
    val df = recordsDf((1 to 8).map(i => ("e", i.toLong, Map.empty[String, String], "p")))
    val reg = new QueryRegistry(maxCursors = 4)
    val id = reg.open(() => df, QuerySpec(), ttlMs = 1500L)
    // first fetch drains some rows and refreshes lastAccess (TTL is wide
    // enough that plan compilation before this fetch can't expire it)
    assert(reg.fetch(id, 2).get.size == 2)
    Thread.sleep(1800) // cursor expires while idle
    // a sweep triggered by ANOTHER open frees the slot concurrently with
    // this fetch — fetch must fail cleanly (None), never deadlock
    reg.open(() => df, QuerySpec()): Unit
    assert(reg.fetch(id, 2).isEmpty, "expired cursor's fetch returns None")
    assert(reg.size == 1)
  }

  test("query registry: cursor removed MID-fetch — in-flight fetch completes, next is None") {
    // the truly concurrent interleaving behind the scaladoc contract
    // (QueryRegistry.scala fetch): a fetch blocked inside a partition
    // pull holds the cursor's monitor; removal (expiry sweep or close —
    // both are a bare map remove that never takes that monitor) must
    // still proceed, the blocked fetch must complete against its own
    // iterator, and the NEXT fetch must return None. close() drives the
    // removal here because it is timing-free; a short-TTL sweep races
    // the fetch thread's own startup on a loaded JVM (observed flake).
    // Gate UDF: local mode runs executor tasks in this JVM, so static
    // latches pause the pull mid-flight.
    import java.util.concurrent.TimeUnit
    val df = recordsDf((1 to 4).map(i => ("e", i.toLong, Map.empty[String, String], "p")))
    // fresh latches per run (suite re-run / retry harness in one JVM);
    // the UDF dereferences through the companion at CALL time so it
    // always sees this run's latches
    PipelineSpec.fetchEntered.set(new java.util.concurrent.CountDownLatch(1))
    PipelineSpec.fetchRelease.set(new java.util.concurrent.CountDownLatch(1))
    val entered = PipelineSpec.fetchEntered.get
    val gate = udf { (ts: Long) =>
      PipelineSpec.fetchEntered.get.countDown()
      PipelineSpec.fetchRelease.get.await(90, TimeUnit.SECONDS)
      ts
    }
    val gated = df.withColumn("ts", gate(col("ts")))
    val reg = new QueryRegistry()
    // open must NOT touch the gate: iterator materialization is
    // deferred to first fetch (eager toLocalIterator under AQE ran the
    // upstream shuffle INSIDE open — this spec caught it)
    val id = reg.open(() => gated, QuerySpec())
    assert(entered.getCount == 1, "open must not execute the plan")
    @volatile var fetched: Option[Seq[Row]] = None
    @volatile var fetchErr: Throwable = null
    val t = new Thread(() => {
      try fetched = reg.fetch(id, 10)
      catch { case e: Throwable => fetchErr = e }
    }, "inflight-fetch")
    t.start()
    assert(entered.await(90, TimeUnit.SECONDS), "fetch never reached the gate")
    reg.close(id) // removal while the fetch is blocked in the pull
    assert(reg.size == 0, "removal must proceed despite the in-flight fetch")
    PipelineSpec.fetchRelease.get.countDown()
    t.join(90000)
    assert(!t.isAlive, "in-flight fetch deadlocked against the removal")
    if (fetchErr != null) fail(s"in-flight fetch threw: $fetchErr", fetchErr)
    assert(fetched.exists(_.size == 4), s"in-flight fetch must complete with its rows, got $fetched")
    assert(reg.fetch(id, 1).isEmpty, "post-removal fetch returns None")
  }

  test("query links round-trip, reject tamper and expiry") {
    val spec = QuerySpec(start = Some(10L), stop = Some(99L),
      when = Some("""{"&a": {"$gt": 1}}"""), entries = Some(Seq("e*")))
    val token = QueryLinks.sign(spec, recordEntry = "e1", recordTs = 42L,
      expiresAtMs = System.currentTimeMillis() + 60000, secret = "s3cret")
    val decoded = QueryLinks.verify(token, "s3cret").get
    assert(decoded.spec.copy(when = None) == spec.copy(when = None))
    assert(decoded.spec.when.contains("""{"&a":{"$gt":1}}""")) // canonical form
    // the strict record identity survives the round trip (PR-1334)
    assert(decoded.recordEntry == "e1" && decoded.recordTs == 42L)
    assert(QueryLinks.verify(token + "x", "s3cret").isEmpty)
    assert(QueryLinks.verify(token, "wrong").isEmpty)
    val expired = QueryLinks.sign(spec, "e1", 42L,
      System.currentTimeMillis() - 1, "s3cret")
    assert(QueryLinks.verify(expired, "s3cret").isEmpty)
  }
}

object PipelineSpec {
  /** Latches for the mid-fetch sweep spec — static because the gate UDF
    * executes in executor task threads of the same local JVM. Held in
    * AtomicReferences the test REINITIALIZES at its start: CountDownLatch
    * is single-use, so a bare static latch makes the test non-rerunnable
    * in one JVM (second run finds it already counted down / spent). */
  val fetchEntered = new java.util.concurrent.atomic.AtomicReference(
    new java.util.concurrent.CountDownLatch(1))
  val fetchRelease = new java.util.concurrent.atomic.AtomicReference(
    new java.util.concurrent.CountDownLatch(1))
}
