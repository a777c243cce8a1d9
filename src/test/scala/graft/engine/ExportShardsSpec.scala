package graft.engine

import graft.SparkTestBase
import graft.core.Records
import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** Bulk shard export (VERDICT r15 #7): the 100-TB bulk-read path. The
  * cursor surface drains through the driver (toLocalIterator — the
  * reference's paged-fetch parity); exportShards writes ordered parquet
  * shards executor-side and returns only the manifest. */
class ExportShardsSpec extends AnyFunSuite with SparkTestBase {

  private def recordsDf(rows: Seq[(String, Long, Map[String, String])]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val data = rows.map { case (entry, ts, labels) =>
      Row("b", entry, ts, labels, Map.empty[String, String],
        "", Records.State.Finished, s"payload-$ts".getBytes)
    }.asJava
    spark.createDataFrame(data, Records.schema)
  }

  test("exportShards writes totally ordered shards with a faithful manifest") {
    val store = new BucketStore(spark, Files.createTempDirectory("graft-exp").toString)
    // 3 entries interleaved over 300 timestamps
    store.write(recordsDf(for (ts <- 1L to 300L; e <- Seq("e1", "e2", "e3"))
      yield (e, ts * 10 + e.last.toLong - 'e'.toLong, Map("v" -> ts.toString))))
    val out = Files.createTempDirectory("graft-exp-out").toString + "/run1"
    val manifest = store.exportShards(
      QuerySpec(when = Some("""{"$gt": [{"$cast": ["&v", "int"]}, 50]}""")), out, nShards = 4)

    val expected = 250 * 3 // v in 51..300 over 3 entries
    assert(manifest.map(_.rows).sum == expected,
      s"manifest total must equal the query's row count, got $manifest")
    // shard ts ranges are totally ordered (ties can only touch at bounds)
    for (Seq(a, b) <- manifest.sliding(2) if manifest.size > 1)
      assert(a.maxTs <= b.minTs, s"shard $a overlaps $b")
    // written tree: per-shard rows match the manifest; rows sorted inside
    val back = spark.read.parquet(out)
    val byShard = back
      .groupBy(org.apache.spark.sql.functions.col("shard").cast("long")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(manifest.map(s => s.shard -> s.rows).toMap == byShard)
    for (s <- manifest) {
      val rows = back.filter(org.apache.spark.sql.functions.col("shard") === s.shard)
        .select("ts", "entry").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.sameElements(rows.sortBy(identity)),
        s"shard ${s.shard} must be sorted by (ts, entry)")
      assert(rows.head._1 == s.minTs && rows.last._1 == s.maxTs)
    }
    // and the export equals the cursor-order query, end to end
    val viaQuery = QueryEngine.query(store.table(),
      QuerySpec(when = Some("""{"$gt": [{"$cast": ["&v", "int"]}, 50]}""")))
      .select("ts", "entry").collect().map(r => (r.getLong(0), r.getString(1)))
    val viaExport = manifest.sortBy(_.shard).flatMap { s =>
      back.filter(org.apache.spark.sql.functions.col("shard") === s.shard)
        .select("ts", "entry").collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(identity)
    }
    assert(viaExport.sameElements(viaQuery))
  }

  test("re-export to the same path never mixes runs; empty export returns an empty manifest") {
    val store = new BucketStore(spark, Files.createTempDirectory("graft-exp3").toString)
    store.write(recordsDf((1L to 100L).map(ts => ("e", ts, Map.empty[String, String]))))
    val out = Files.createTempDirectory("graft-exp3-out").toString + "/run"
    assert(store.exportShards(QuerySpec(), out, nShards = 8).map(_.rows).sum == 100L)
    // second, NARROWER export to the same path: under dynamic partition
    // overwrite the first run's extra shard dirs would survive — the
    // pre-delete must leave ONLY the new run
    val m2 = store.exportShards(QuerySpec(start = Some(90L)), out, nShards = 8)
    assert(m2.map(_.rows).sum == 11L, s"stale shards leaked into $m2")
    assert(spark.read.parquet(out).count() == 11L)
    // zero-row export: legitimate, returns empty manifest (no crash)
    assert(store.exportShards(QuerySpec(start = Some(10000L)), out).isEmpty)
  }

  test("HTTP export endpoint: disabled by default, jailed to the export root, returns the manifest") {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val store = new BucketStore(spark, Files.createTempDirectory("graft-exp2").toString)
    store.write(recordsDf((1L to 40L).map(ts => ("e", ts, Map.empty[String, String]))))
    val client = HttpClient.newHttpClient()
    def post(port: Int, path: String, body: String): HttpResponse[Array[Byte]] =
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/api/v1$path"))
        .method("POST", HttpRequest.BodyPublishers.ofString(body))
        .header("Authorization", "Bearer tok").build(),
        HttpResponse.BodyHandlers.ofByteArray())

    // default server: no export root → 403
    val off = new HttpApi(store, apiToken = "tok")
    off.start()
    try assert(post(off.boundPort, "/io/b/export",
      """{"path": "x"}""").statusCode() == 403)
    finally off.stop()

    val exportRoot = Files.createTempDirectory("graft-exp-root").toString
    val api = new HttpApi(store, apiToken = "tok", exportRoot = Some(exportRoot))
    api.start()
    try {
      val p = api.boundPort
      assert(post(p, "/io/b/export", """{"path": "/abs"}""").statusCode() == 422)
      assert(post(p, "/io/b/export", """{"path": "a/../b"}""").statusCode() == 422)
      assert(post(p, "/io/b/export", """{"path": "."}""").statusCode() == 422)
      assert(post(p, "/io/b/export", """{"path": "a//b"}""").statusCode() == 422)
      assert(post(p, "/io/b/export", """{}""").statusCode() == 422)
      val r = post(p, "/io/b/export",
        """{"path": "runs/r1", "shards": 3, "start": 11}""")
      assert(r.statusCode() == 200, new String(r.body(), "UTF-8"))
      val j = org.json4s.jackson.JsonMethods.parse(new String(r.body(), "UTF-8"))
      assert((j \ "total_rows").extract[Long] == 30L) // ts 11..40
      assert((j \ "path").extract[String].startsWith(exportRoot))
      val shards = (j \ "shards").extract[List[org.json4s.JValue]]
      assert(shards.nonEmpty && shards.size <= 3)
      // the data really landed under the jail
      assert(spark.read.parquet(s"$exportRoot/runs/r1").count() == 30L)
      // exports are immutable runs: an existing path 409s without
      // overwrite, replaces with it (read-scoped clients must not
      // silently clobber each other's trees)
      assert(post(p, "/io/b/export",
        """{"path": "runs/r1", "shards": 3}""").statusCode() == 409)
      val r2 = post(p, "/io/b/export",
        """{"path": "runs/r1", "shards": 2, "start": 31, "overwrite": true}""")
      assert(r2.statusCode() == 200, new String(r2.body(), "UTF-8"))
      assert(spark.read.parquet(s"$exportRoot/runs/r1").count() == 10L)
    } finally api.stop()
  }
}
