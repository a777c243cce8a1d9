package graft.examples

import graft.pipeline.TextAnalysis
import graft.sources.Warc
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** End-to-end crawl ingest (dev demo): synthesize WARC segments, parse
  * responses, extract text from the HTML, run the Gopher admission
  * filter — the first mile of a Common Crawl-style pipeline. */
object CrawlIngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // two synthetic segments: usable pages, a spam page, a non-200
    val dir = Files.createTempDirectory("crawl").toString
    def page(body: String) = Warc.synthHttp(200, "text/html",
      s"<html><body><p>$body</p><script>junk()</script></body></html>"
        .getBytes("UTF-8"))
    val segA = Warc.synthWarc(Seq(
      ("response", "http://a.example/1", page(
        ("the quick brown fox jumps over a lazy dog and " * 8) +
          "it is of great value to all of the readers in this corpus")),
      ("response", "http://a.example/2", page("buy now " * 60)),
      ("request", "http://a.example/2",
        "GET /2 HTTP/1.1\r\n\r\n".getBytes("ISO-8859-1"))))
    val segB = Warc.synthWarc(Seq(
      ("response", "http://b.example/gone",
        Warc.synthHttp(404, "text/plain", "gone".getBytes("UTF-8")))))
    Files.write(Paths.get(dir, "seg-a.warc"), segA)
    Files.write(Paths.get(dir, "seg-b.warc"), segB)

    val pages = Warc.readResponses(spark, s"$dir/*")
      .filter(col("http_status") === 200 &&
        col("content_type").startsWith("text/html"))
      .select(col("target_uri"),
        TextAnalysis.htmlToText(decode(col("payload"), "UTF-8")).as("text"))
    val admitted = TextAnalysis.qualityFilter(pages,
        minTokens = 20, minStopwords = 1)
      .select("target_uri", "keep", "reasons", "n_tokens")
    println("crawl admission results:")
    admitted.collect().foreach(r => println(
      f"  ${r.getString(0)}%-22s keep=${r.getBoolean(1)}%-5s " +
        f"n_tokens=${r.getLong(3)}%3d reasons='${r.getString(2)}'"))
    spark.stop()
  }
}
