package graft.sources

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

class WarcSpec extends AnyFunSuite with SparkTestBase {

  private def writeWarc(dir: String, name: String, bytes: Array[Byte],
      gzip: Boolean = false): Unit = {
    val p = Paths.get(dir, name)
    if (gzip) {
      val out = new java.io.ByteArrayOutputStream()
      val g = new GZIPOutputStream(out)
      g.write(bytes); g.close()
      Files.write(p, out.toByteArray)
    } else Files.write(p, bytes)
  }

  test("WARC parse: responses split HTTP envelope; other types kept raw") {
    val dir = Files.createTempDirectory("warc").toString
    val html = "<html>hello corpus</html>".getBytes("UTF-8")
    val bytes = Warc.synthWarc(Seq(
      ("warcinfo", "", "software: graft-test\r\n".getBytes("UTF-8")),
      ("request", "http://example.com/",
        "GET / HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes("ISO-8859-1")),
      ("response", "http://example.com/",
        Warc.synthHttp(200, "text/html; charset=utf-8", html)),
      ("response", "http://example.com/missing",
        Warc.synthHttp(404, "text/plain", "gone".getBytes("UTF-8")))))
    writeWarc(dir, "seg-00000.warc", bytes)
    // identical content in a gzipped segment must parse identically
    writeWarc(dir, "seg-00001.warc.gz", bytes, gzip = true)

    val all = Warc.read(spark, s"$dir/*").collect()
    assert(all.length == 8, s"4 records x 2 files, got ${all.length}")

    val resp = Warc.readResponses(spark, s"$dir/seg-00000.warc")
      .orderBy("record_id").collect()
    assert(resp.length == 2)
    val ok = resp(0)
    assert(ok.getString(ok.fieldIndex("target_uri")) == "http://example.com/")
    assert(ok.getInt(ok.fieldIndex("http_status")) == 200)
    assert(ok.getString(ok.fieldIndex("content_type"))
      .startsWith("text/html"))
    assert(new String(ok.getAs[Array[Byte]]("payload"), "UTF-8")
      == "<html>hello corpus</html>", "payload is the HTTP body only")
    assert(resp(1).getInt(resp(1).fieldIndex("http_status")) == 404)
    // non-response records keep their raw body and a null http_status
    val info = all.filter(_.getString(2) == "warcinfo").head
    assert(info.isNullAt(info.fieldIndex("http_status")))
    assert(new String(info.getAs[Array[Byte]]("payload"), "UTF-8")
      .startsWith("software:"))
  }

  test("truncated segment keeps the parsed prefix instead of failing") {
    val dir = Files.createTempDirectory("warc-trunc").toString
    val whole = Warc.synthWarc(Seq(
      ("response", "http://a/", Warc.synthHttp(200, "text/plain",
        "first".getBytes("UTF-8"))),
      ("response", "http://b/", Warc.synthHttp(200, "text/plain",
        "second".getBytes("UTF-8")))))
    // cut mid-way through the second record's body
    writeWarc(dir, "trunc.warc", whole.take(whole.length - 10))
    val rows = Warc.readResponses(spark, s"$dir/trunc.warc").collect()
    assert(rows.length == 1, "only the complete first record survives")
    assert(new String(rows(0).getAs[Array[Byte]]("payload"), "UTF-8")
      == "first")
  }
}
