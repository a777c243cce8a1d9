package graft.engine

import graft.SparkTestBase
import graft.core.Records
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The advisory cross-process single-writer guard (VERDICT r15 #6): the
  * reference engine is single-owner by construction (one process owns
  * the data dir, storage/engine.rs); graft enforces the same contract
  * with a heartbeat lease on `root/_writer.lock`. A second PROCESS is
  * simulated by planting a foreign lock file — same-process instances
  * legitimately attach (the long-standing spec/demo pattern). */
class WriterLockSpec extends AnyFunSuite with SparkTestBase {

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def plantForeignLock(root: String, ageMs: Long): java.io.File = {
    val dir = new java.io.File(root); dir.mkdirs()
    val f = new java.io.File(dir, WriterLock.LockFile)
    val w = new java.io.FileWriter(f)
    try w.write(s"""{"owner":"foreign-${java.util.UUID.randomUUID()}","pid":1,"host":"other","acquired_ms":1}""")
    finally w.close()
    assert(f.setLastModified(System.currentTimeMillis() - ageMs))
    f
  }

  private def oneRecord(ts: Long) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(Seq(Row("b", "e", ts, Map.empty[String, String],
      Map.empty[String, String], "", Records.State.Finished, "p".getBytes)).asJava,
      Records.schema)
  }

  test("foreign LIVE holder: open fails fast with a clear error") {
    val root = Files.createTempDirectory("graft-wl").toString
    plantForeignLock(root, ageMs = 0)
    val e = intercept[IllegalStateException](new BucketStore(spark, root))
    assert(e.getMessage.contains("another live writer process"), e.getMessage)
    assert(e.getMessage.contains(root))
  }

  test("foreign STALE holder: takeover succeeds and the store mutates normally") {
    val root = Files.createTempDirectory("graft-wl").toString
    val prev = WriterLock.staleMs
    WriterLock.staleMs = 500L
    try {
      plantForeignLock(root, ageMs = 5000)
      val store = new BucketStore(spark, root)
      try {
        assert(WriterLock.heldFor(root, hconf), "takeover must register ownership")
        store.write(oneRecord(1L))
        assert(store.table().count() == 1L)
        val owner = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(root, WriterLock.LockFile)), "UTF-8")
        assert(owner.contains(WriterLock.processOwnerId),
          s"lock file must now carry OUR owner id, got $owner")
      } finally store.close()
    } finally WriterLock.staleMs = prev
  }

  test("same-process instances attach; last close releases the lock file") {
    val root = Files.createTempDirectory("graft-wl").toString
    val s1 = new BucketStore(spark, root)
    val s2 = new BucketStore(spark, root) // attach, not conflict
    s1.write(oneRecord(1L))
    assert(s2.table().count() == 1L)
    s1.close()
    assert(WriterLock.heldFor(root, hconf),
      "one reference remains: the lock must stay held")
    assert(new java.io.File(root, WriterLock.LockFile).exists())
    s2.close()
    assert(!WriterLock.heldFor(root, hconf))
    assert(!new java.io.File(root, WriterLock.LockFile).exists(),
      "last close deletes the lock file — a successor process starts instantly")
    // reacquirable after full release
    val s3 = new BucketStore(spark, root)
    try assert(s3.table().count() == 1L) finally s3.close()
  }

  test("heartbeat keeps the held lock fresh — a peer never sees it stale") {
    val root = Files.createTempDirectory("graft-wl").toString
    val prev = WriterLock.staleMs
    WriterLock.staleMs = 1200L // heartbeat every 300 ms
    try {
      val store = new BucketStore(spark, root)
      try {
        val f = new java.io.File(root, WriterLock.LockFile)
        Thread.sleep(WriterLock.staleMs + 600)
        val age = System.currentTimeMillis() - f.lastModified()
        assert(age <= WriterLock.staleMs,
          s"heartbeat must keep mtime fresher than staleMs; age=$age ms")
      } finally store.close()
    } finally WriterLock.staleMs = prev
  }

  test("RS_LOCK_FILE_* knobs: disabled skips locking; a bounded wait " +
      "rides out a holder that releases; proceed takes over on timeout") {
    val saved = (WriterLock.enabled, WriterLock.acquireTimeoutMs,
      WriterLock.pollingMs, WriterLock.proceedOnTimeout, WriterLock.staleMs)
    try {
      // RS_LOCK_FILE_ENABLED=false: a foreign LIVE lock is ignored
      WriterLock.configure(Map("RS_LOCK_FILE_ENABLED" -> "false"))
      val root1 = Files.createTempDirectory("graft-wl-off").toString
      plantForeignLock(root1, ageMs = 0)
      val s1 = new BucketStore(spark, root1) // must not throw
      s1.write(oneRecord(1L)); s1.close()
      WriterLock.configure(Map("RS_LOCK_FILE_ENABLED" -> "true"))
      // a bounded wait (timeout 10 s, poll 1 s): holder releases mid-wait
      WriterLock.configure(Map("RS_LOCK_FILE_TIMEOUT" -> "10",
        "RS_LOCK_FILE_POLLING_INTERVAL" -> "1"))
      val root2 = Files.createTempDirectory("graft-wl-wait").toString
      val lockFile = plantForeignLock(root2, ageMs = 0)
      val releaser = new Thread(() => { Thread.sleep(1500); lockFile.delete(): Unit })
      releaser.start()
      val t0 = System.nanoTime()
      val s2 = new BucketStore(spark, root2) // waits ~1.5 s, then claims
      val waited = (System.nanoTime() - t0) / 1e6
      assert(waited >= 900, s"must have polled, waited only $waited ms")
      s2.close(); releaser.join()
      // proceed: timeout expires against a live holder -> forcible claim
      WriterLock.configure(Map("RS_LOCK_FILE_TIMEOUT" -> "1",
        "RS_LOCK_FILE_POLLING_INTERVAL" -> "1",
        "RS_LOCK_FILE_FAILURE_ACTION" -> "proceed"))
      val root3 = Files.createTempDirectory("graft-wl-proceed").toString
      plantForeignLock(root3, ageMs = 0)
      val s3 = new BucketStore(spark, root3) // proceeds after ~1 s
      s3.write(oneRecord(1L)); s3.close()
      // invalid failure action rejects like the reference's panic
      intercept[IllegalArgumentException](
        WriterLock.configure(Map("RS_LOCK_FILE_FAILURE_ACTION" -> "explode")))
    } finally {
      WriterLock.enabled = saved._1
      WriterLock.acquireTimeoutMs = saved._2
      WriterLock.pollingMs = saved._3
      WriterLock.proceedOnTimeout = saved._4
      WriterLock.staleMs = saved._5
    }
  }

  test("lock file is invisible to the data path") {
    val root = Files.createTempDirectory("graft-wl").toString
    val store = new BucketStore(spark, root)
    try {
      store.write(oneRecord(7L))
      assert(store.table().count() == 1L) // underscore file never scanned
      assert(store.removeQuery(QuerySpec()) == 1L)
      assert(store.tableOrEmpty().count() == 0L)
    } finally store.close()
  }
}
