package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

/** JSONL ingest: permissive parse with a corrupt-record side channel —
  * bad lines are counted and attributed, never job-fatal, never silent. */
class JsonlSpec extends AnyFunSuite with SparkTestBase {

  private val schema = StructType.fromDDL(
    "doc_id BIGINT, text STRING, lang STRING")

  private def writeGz(dir: String, name: String, lines: Seq[String]): Unit = {
    val out = new GZIPOutputStream(
      Files.newOutputStream(Paths.get(dir, name)))
    out.write(lines.mkString("\n").getBytes("UTF-8"))
    out.close()
  }

  test("clean lines parse, broken lines land in the damage report") {
    val dir = Files.createTempDirectory("jsonl").toString
    writeGz(dir, "a.jsonl.gz", Seq(
      """{"doc_id": 1, "text": "hello", "lang": "en"}""",
      """{"doc_id": 2, "text": "welt", "lang": "de"}""",
      """{"doc_id": 3, "text": "truncat""", // cut mid-string
      """not json at all"""))
    writeGz(dir, "b.jsonl.gz", Seq(
      """{"doc_id": 4, "text": "ok", "lang": "en"}"""))
    val (clean, report) = Jsonl.readWithReport(spark, dir, schema)
    val docs = clean.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(docs == Set((1L, "hello"), (2L, "welt"), (4L, "ok")))
    assert(!clean.columns.contains(Jsonl.CorruptCol))
    assert(clean.columns.contains("src_file"))
    val rep = report.collect()
    assert(rep.length == 1, "only file a has damage")
    assert(rep(0).getAs[String]("src_file").endsWith("a.jsonl.gz"))
    assert(rep(0).getAs[Long]("bad_lines") == 2L)
    assert(rep(0).getAs[String]("sample").nonEmpty)
  }

  test("streaming ingest: same permissive contract over readStream") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("jsonl-s").toString
    val ck = Files.createTempDirectory("jsonl-s-ck").toString
    val outClean = Files.createTempDirectory("jsonl-s-out").toString
    writeGz(dir, "a.jsonl.gz", Seq(
      """{"doc_id": 1, "text": "hello", "lang": "en"}""",
      """broken line"""))
    val stream = Jsonl.readStream(spark, dir, schema)
    // clean rows flow to the sink; damage is counted per micro-batch
    var badSeen = 0L
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        badSeen += batch.filter(col(Jsonl.CorruptCol).isNotNull).count()
        batch.filter(col(Jsonl.CorruptCol).isNull)
          .drop(Jsonl.CorruptCol)
          .write.mode("append").parquet(outClean)
        ()
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val clean = spark.read.parquet(outClean)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(clean == Seq(1L))
    assert(badSeen == 1L)
  }

  test("readWithReport: no corpus cache, and parity with the native read") {
    val dir = Files.createTempDirectory("jsonl3").toString
    writeGz(dir, "d.jsonl.gz", Seq(
      """{"doc_id": 1, "text": "a", "lang": "en"}""",
      "", // blank line: native json source skips it — so must we
      "   ",
      """garbage}{""",
      """{"doc_id": 2, "text": "b", "lang": "de"}"""))
    val (clean, report) = Jsonl.readWithReport(spark, dir, schema)
    // 100-TB contract: the damage report must not require caching the
    // corpus — neither branch may contain an InMemoryRelation
    for (df <- Seq(clean, report)) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("InMemoryRelation"),
        s"readWithReport must not persist the ingest:\n$plan")
    }
    // clean branch ≡ native read's clean rows (same parser, same lines)
    import org.apache.spark.sql.functions.col
    val native = Jsonl.read(spark, dir, schema)
      .filter(col(Jsonl.CorruptCol).isNull).drop(Jsonl.CorruptCol)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "text", "lang").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows(clean) == rows(native))
    assert(rows(clean) == Set((1L, "a", "en"), (2L, "b", "de")))
    val rep = report.collect()
    assert(rep.length == 1 && rep(0).getAs[Long]("bad_lines") == 1L)
    assert(rep(0).getAs[String]("sample") == "garbage}{")
  }

  test("root-array lines explode per element; element damage attributed") {
    val dir = Files.createTempDirectory("jsonl4").toString
    writeGz(dir, "e.jsonl.gz", Seq(
      """{"doc_id": 1, "text": "obj", "lang": "en"}""",
      """[{"doc_id": 2, "text": "a1", "lang": "de"}, {"doc_id": 3, "text": "a2", "lang": "fr"}]""",
      """[{"doc_id": "BAD", "text": "x", "lang": "en"}, {"doc_id": 4, "text": "ok", "lang": "en"}]""",
      """BROKEN[{{"""))
    val (clean, report) = Jsonl.readWithReport(spark, dir, schema)
    // no silent row loss: every intact element becomes a clean row (a
    // bare struct from_json would keep only the FIRST array element)
    val ids = clean.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L, 4L), s"array elements lost: $ids")
    val rep = report.collect()
    assert(rep.length == 1)
    // the broken element's own text + the broken line both counted
    assert(rep(0).getAs[Long]("bad_lines") == 2L)
  }

  test("type-mismatched fields are damage too, not silent nulls") {
    val dir = Files.createTempDirectory("jsonl2").toString
    writeGz(dir, "c.jsonl.gz", Seq(
      """{"doc_id": "NOT_A_NUMBER", "text": "x", "lang": "en"}""",
      """{"doc_id": 9, "text": "y", "lang": "en"}"""))
    val (clean, report) = Jsonl.readWithReport(spark, dir, schema)
    assert(clean.count() == 1)
    assert(report.collect().head.getAs[Long]("bad_lines") == 1L)
  }
}
