package graft.lifecycle

import graft.SparkTestBase
import graft.core.Records
import graft.engine.BucketStore
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}

/** Lifecycle policy passes (lifecycle_task.rs:25-90) — delete/compress with
  * older-than + when gating, dry-run, and codec verification. */
class LifecycleSpec extends AnyFunSuite with SparkTestBase {

  private val day = 86400000000L

  private def newStore(): BucketStore =
    new BucketStore(spark, Files.createTempDirectory("graft-lc").toString)

  /** Compressible-but-not-trivial payload: patterned words, varying. */
  private def payload(i: Int): Array[Byte] = {
    val words = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
    val sb = new StringBuilder
    var x = i * 2654435761L
    for (_ <- 0 until 4000) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(words(((x >>> 33) % words.length).toInt)).append(' ')
        .append(x % 97).append(' ')
    }
    sb.toString.getBytes
  }

  private def recordsDf(n: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = (0 until n).map { i =>
      Row("b", "e", i * day / 4, Map("i" -> i.toString),
        Map.empty[String, String], "", Records.State.Finished, payload(i))
    }.asJava
    spark.createDataFrame(rows, Records.schema)
  }

  private def dirSize(root: String): Long = {
    def walk(p: Path): Long = {
      val s = java.nio.file.Files.list(p)
      try s.toArray.map {
        case f: Path if Files.isDirectory(f) => walk(f)
        case f: Path => Files.size(f)
      }.sum
      finally s.close()
    }
    walk(Paths.get(root))
  }

  test("delete policy removes only old matching records; dry-run counts") {
    val store = newStore()
    store.write(recordsDf(16))
    val now = 16 * day / 4
    val dry = Lifecycle.apply(store,
      Lifecycle.Policy(olderThanUs = 2 * day, action = Lifecycle.Action.Delete,
        dryRun = true), nowUs = now)
    assert(!dry.applied && dry.matched > 0)
    assert(store.table().count() == 16, "dry run touches nothing")
    val res = Lifecycle.apply(store,
      Lifecycle.Policy(olderThanUs = 2 * day, action = Lifecycle.Action.Delete,
        when = Some("""{"$eq": [{"$rem": [{"$cast": ["&i", "int"]}, 2]}, 0]}""")),
      nowUs = now)
    assert(res.applied && res.matched == dry.matched / 2)
    assert(store.table().count() == 16 - res.matched)
  }

  test("compress policy rewrites with zstd; level actually changes size") {
    def compressedSize(level: Int): Long = {
      val store = newStore()
      store.write(recordsDf(12))
      val res = Lifecycle.apply(store,
        Lifecycle.Policy(olderThanUs = 0L,
          action = Lifecycle.Action.Compress("zstd", level)),
        nowUs = 100 * day)
      assert(res.applied && res.matched == 12)
      assert(store.table().count() == 12, "compress preserves all rows")
      // codec took effect: spark names data files with the codec extension
      val files = java.nio.file.Files.walk(Paths.get(store.root))
      val names = try files.toArray.map(_.toString).filter(_.endsWith(".parquet"))
        finally files.close()
      assert(names.nonEmpty && names.forall(_.contains(".zstd.")),
        s"expected zstd parquet files, got: ${names.take(3).mkString(",")}")
      dirSize(store.root)
    }
    val lo = compressedSize(1)
    val hi = compressedSize(19)
    assert(hi < lo,
      s"zstd level 19 ($hi B) should beat level 1 ($lo B) — level option not applied?")
  }

  test("readConsistent reader racing a compress retries, never fails (ADVICE r12)") {
    // the compaction rewrite must land inside the store's rewrite-epoch
    // window (staged rename swap), so a racing reader settles on the
    // before- or after-state instead of erroring on a renamed-away file
    val store = newStore()
    store.write(recordsDf(8))
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    @volatile var done = false
    val reader = Future {
      val seen = Seq.newBuilder[Long]
      while (!done) seen += store.readConsistent(store.table().count())
      seen.result()
    }
    try
      for (level <- Seq(3, 9, 3)) {
        val res = Lifecycle.apply(store,
          Lifecycle.Policy(olderThanUs = 0L,
            action = Lifecycle.Action.Compress("zstd", level)),
          nowUs = 100 * day)
        assert(res.applied && res.matched == 8)
      }
    finally done = true
    val counts = Await.result(reader, 180.seconds)
    assert(counts.nonEmpty && counts.forall(_ == 8L),
      s"reads racing compaction must always see all rows: ${counts.distinct}")
  }
}
