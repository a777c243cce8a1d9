package graft.engine

import graft.SparkTestBase
import graft.engine.BucketStore.{FoldRec, FoldReq}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Cross-request write coalescing: concurrent serving writes fold into
  * one store mutation with serial per-request semantics (the SCALE.md
  * r17 per-mutation-Spark-job amortization lever). */
class WriteCoalescerSpec extends AnyFunSuite with SparkTestBase {

  private def newStore(): BucketStore =
    new BucketStore(spark, Files.createTempDirectory("graft-coal").toString)

  private def rec(entry: String, ts: Long, payload: String = "x") =
    FoldRec(entry, ts, Map("k" -> "v"), "text/plain", payload.getBytes("UTF-8"))

  test("uncontended write degenerates to the old path: full conflict map") {
    val store = newStore()
    val c = new MutationCoalescer(store, store.writeFolded)
    assert(c.submit(FoldReq("b", Seq(rec("e", 1), rec("e", 2)))) == Set.empty)
    // overlap → rejected set names exactly the existing ts, rest lands
    assert(c.submit(FoldReq("b", Seq(rec("e", 2, "new"), rec("e", 3)))) == Set(("e", 2L)))
    val rows = store.table().select("ts", "payload").collect()
      .map(r => r.getLong(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8"))
      .toMap
    assert(rows == Map(1L -> "x", 2L -> "x", 3L -> "x"),
      "conflicting record keeps its ORIGINAL payload")
    assert(c.foldedBatches.get() == 2 && c.foldedRequests.get() == 2)
  }

  test("contended writes fold into ONE mutation; every request resolves " +
      "with its own conflict map and all records land") {
    val store = newStore()
    store.writeBatch("b", "e1", Seq((100L, Map.empty[String, String],
      "pre".getBytes("UTF-8"))))
    val c = new MutationCoalescer(store, store.writeFolded)
    val base = c.foldedBatches.get()
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Set[(String, Long)]]()
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        // t0 collides with the pre-existing ts=100 on e1; others disjoint
        val entry = if (t == 0) "e1" else s"x$t"
        results.put(t, c.submit(FoldReq("b", Seq(rec(entry, 100), rec(entry, 200 + t)))))
      })
    }
    // hold the store lock so all four writers queue up behind it —
    // releasing it makes exactly one of them the leader for all four
    store.mutating {
      threads.foreach(_.start())
      val deadline = System.nanoTime() + 10e9.toLong
      while (c.queuedCount < 4 && System.nanoTime() < deadline)
        Thread.sleep(5)
      assert(c.queuedCount == 4, "writers must queue while the lock is held")
    }
    threads.foreach(_.join(30000))
    assert(results.get(0) == Set(("e1", 100L)), "store-existing ts rejected")
    for (t <- 1 until 4)
      assert(results.get(t) == Set.empty[(String, Long)], s"writer $t clean")
    assert(c.foldedBatches.get() - base == 1,
      s"4 contended writes must share ONE mutation, got ${c.foldedBatches.get() - base}")
    assert(c.foldedRequests.get() == 4)
    // every record visible after return: read-your-write holds
    assert(store.table().count() == 1 + 4 + 3) // pre + four 2xx minus one reject
  }

  test("writeFolded: serial semantics inside a fold — cross-request " +
      "keep-first, per-request HARD quota, failure isolation") {
    val store = newStore()
    // same (entry, ts) from two folded requests: first in queue order
    // wins, second gets its per-record rejection — exactly serial
    val r1 = store.writeFolded(Seq(
      FoldReq("b", Seq(rec("e", 1, "first"))),
      FoldReq("b", Seq(rec("e", 1, "second"), rec("e", 2)))))
    assert(r1 == Seq(Right(Set.empty[(String, Long)]), Right(Set(("e", 1L)))))
    val kept = store.table().filter("ts = 1").select("payload").collect()
    assert(new String(kept(0).getAs[Array[Byte]](0), "UTF-8") == "first")
    // HARD quota: request admission is cumulative IN ORDER — a fold
    // where req A fits and A+B exceeds must admit A and reject only B
    store.putBucketSettings("q",
      BucketStore.BucketSettings(quotaType = Some("HARD"),
        quotaSize = Some(store.bucketSizeBytes("q") + 12)))
    val r2 = store.writeFolded(Seq(
      FoldReq("q", Seq(rec("e", 1, "0123456789"))), // 10 bytes, fits
      FoldReq("q", Seq(rec("e", 2, "0123456789"))))) // would exceed
    assert(r2(0) == Right(Set.empty[(String, Long)]))
    assert(r2(1).isLeft &&
      r2(1).left.exists(_.getMessage.contains("Quota of 'q' exceeded")))
    assert(store.table().filter("bucket = 'q'").count() == 1)
  }

  test("multi-entry requests fold too (the io v2 wire shape): rejection " +
      "keys carry the entry") {
    val store = newStore()
    store.writeBatch("b", "e2", Seq((5L, Map.empty[String, String],
      "pre".getBytes("UTF-8"))))
    val r = store.writeFolded(Seq(FoldReq("b", Seq(
      rec("e1", 5), rec("e2", 5), rec("e3", 7)))))
    assert(r == Seq(Right(Set(("e2", 5L)))),
      "only the existing (entry, ts) pair is rejected, same ts elsewhere lands")
    assert(store.table().filter("bucket = 'b'").count() == 3) // pre + e1@5 + e3@7
  }

  test("updateLabelsFolded: per-request match counts; cross-request " +
      "deltas on one key compose in queue order") {
    val store = newStore()
    store.writeBatch("b", "e", Seq(
      (1L, Map("k" -> "v"), "a".getBytes), (2L, Map("k" -> "v"), "b".getBytes)))
    val r = store.updateLabelsFolded(Seq(
      // req 0: sets k2 on both records, one miss (ts=9)
      ("b", Seq(("e", 1L, Map("k2" -> "x"), Set.empty[String]),
        ("e", 2L, Map("k2" -> "x"), Set.empty[String]),
        ("e", 9L, Map("k2" -> "x"), Set.empty[String]))),
      // req 1: later delta on ts=1 removes k2 and sets k3 — composes
      // AFTER req 0's (serial order)
      ("b", Seq(("e", 1L, Map("k3" -> "y"), Set("k2"))))))
    assert(r == Seq(Right(Set(("e", 1L), ("e", 2L))), Right(Set(("e", 1L)))),
      "per-request matched keys — ts=9 missing from req 0's set (its 404)")
    val labels1 = store.table().filter("ts = 1")
      .select("labels").collect()(0).getAs[Map[String, String]](0)
    assert(labels1 == Map("k" -> "v", "k3" -> "y"),
      "req 1's remove lands AFTER req 0's set")
    val labels2 = store.table().filter("ts = 2")
      .select("labels").collect()(0).getAs[Map[String, String]](0)
    assert(labels2 == Map("k" -> "v", "k2" -> "x"))
  }

  test("removeFolded: keep-first — a key removed by an earlier request " +
      "reports missing to later ones") {
    val store = newStore()
    store.writeBatch("b", "e", Seq(
      (1L, Map.empty[String, String], "a".getBytes),
      (2L, Map.empty[String, String], "b".getBytes)))
    val r = store.removeFolded(Seq(
      ("b", Seq(("e", 1L), ("e", 9L))), // removes 1, misses 9
      ("b", Seq(("e", 1L), ("e", 2L))))) // 1 already claimed, removes 2
    assert(r(0) == Right(Map(("e", 1L) -> true, ("e", 9L) -> false)))
    assert(r(1) == Right(Map(("e", 1L) -> false, ("e", 2L) -> true)),
      "serially the second DELETE would 404 on ts=1")
    assert(store.table().filter("bucket = 'b'").count() == 0)
  }

  test("read-only store: submit refuses BEFORE enqueueing — a replica " +
      "must not leak a Pending per rejected mutation") {
    val dir = Files.createTempDirectory("graft-coal-ro").toString
    new BucketStore(spark, dir).close() // primary creates the tree, releases
    val replica = new BucketStore(spark, dir, readOnly = true)
    val c = new MutationCoalescer(replica, replica.writeFolded)
    for (i <- 0 until 8)
      assertThrows[BucketStore.ReadOnlyStoreException](
        c.submit(FoldReq("b", Seq(rec("e", i.toLong)))))
    assert(c.queuedCount == 0,
      "rejected mutations must leave nothing queued (unbounded growth " +
        "on a replica receiving retried writes)")
    assert(c.foldedBatches.get() == 0 && c.foldedRequests.get() == 0)
  }

  test("misaligned process (fewer results than requests) fails the " +
      "unresolved request instead of NPE-ing or hanging it") {
    val store = newStore()
    // a broken folded-impl: always returns ONE result regardless of
    // batch size
    val broken = new MutationCoalescer[Int, Int](store,
      reqs => Seq(Right(reqs.head)))
    assert(broken.submit(7) == 7, "aligned single request still works")
    // force a 2-request fold: hold the store lock while both queue
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Either[Throwable, Int]]()
    val threads = (0 until 2).map { t =>
      new Thread(() => results.put(t,
        try Right(broken.submit(t)) catch { case e: Throwable => Left(e) }))
    }
    store.mutating {
      threads.foreach(_.start())
      val deadline = System.nanoTime() + 10e9.toLong
      while (broken.queuedCount < 2 && System.nanoTime() < deadline)
        Thread.sleep(5)
      assert(broken.queuedCount == 2)
    }
    threads.foreach(_.join(30000))
    assert(!threads.exists(_.isAlive), "no requester may hang")
    val outcomes = (0 until 2).map(results.get)
    assert(outcomes.count(_.isRight) == 1, "the aligned head resolves")
    assert(outcomes.exists {
      case Left(e: IllegalStateException) =>
        e.getMessage.contains("fewer results than requests")
      case _ => false
    }, s"the unresolved tail must fail explicitly, got $outcomes")
  }
}
