package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (ISO 28500) ingest — the container format web-scale training
  * corpora arrive in (Common Crawl segments). `readResponses` yields one
  * row per `response` record with the HTTP status/headers split from the
  * payload, ready for the text pipeline (quality filter → dedup → pack).
  *
  * Execution model: WARC segments are not splittable (records are
  * back-to-back, `.warc.gz` members are record-batched), so parallelism
  * is per FILE — the standard shape for crawl processing, where a corpus
  * is tens of thousands of ~1 GB segments and a 1000-executor cluster
  * maps them 1:1. Each file is parsed as a STREAM (PortableDataStream →
  * sequential reads): only one record's payload is in memory per task at
  * a time, never the segment.
  *
  * Scope: plain `.warc` and whole-stream-gzipped `.warc.gz` (Common
  * Crawl's per-record gzip members also decode through GZIPInputStream's
  * member-concatenation handling). Malformed trailing bytes end the
  * file's iteration rather than failing the job (crawl segments are
  * routinely truncated); the parsed prefix is kept.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("warc_file", StringType),
    StructField("record_id", StringType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("http_status", IntegerType),
    StructField("content_type", StringType),
    StructField("payload", BinaryType)))

  /** All WARC records of the files under `path` (every WARC-Type). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext.binaryFiles(path).flatMap {
      case (file, pds) =>
        val raw = pds.open()
        val in = new DataInputStream(new BufferedInputStream(
          if (file.endsWith(".gz")) new GZIPInputStream(raw) else raw,
          1 << 16))
        new RecordIterator(file, in)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Test seam: parse raw WARC bytes driver-side (the same iterator the
    * distributed `read` runs per file) — lets robustness fuzzing hit the
    * parser without a Spark job per case. */
  private[graft] def parseBytes(name: String, bytes: Array[Byte]): Seq[Row] =
    new RecordIterator(name, new DataInputStream(
      new java.io.ByteArrayInputStream(bytes))).toVector

  /** Only `response` records, HTTP envelope split off: `http_status` from
    * the status line, `payload` = the HTTP body, `content_type` from the
    * HTTP headers (falling back to the WARC header). */
  def readResponses(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    read(spark, path).filter(col("warc_type") === "response")
  }

  // ------------------------------------------------------------ parsing

  private final class RecordIterator(file: String, in: DataInputStream)
      extends Iterator[Row] {
    private var nextRow: Row = _
    private var done = false

    override def hasNext: Boolean = {
      if (nextRow == null && !done) advance()
      nextRow != null
    }
    override def next(): Row = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRow; nextRow = null; r
    }

    private def advance(): Unit =
      try {
        val headers = readHeaderBlock(in)
        if (headers == null) { done = true; in.close(); return }
        val len = headers.getOrElse("content-length", "0").trim.toLong
        // reject lying lengths BEFORE allocating (a negative value would
        // NegativeArraySize, 2^32 would truncate to 0 and desync, 2 GB
        // would allocate upfront for a possibly tiny stream)
        if (len < 0 || len > Int.MaxValue - 8)
          throw new NumberFormatException(s"content-length $len")
        val body = readFullyN(in, len.toInt)
        skipCrlfs(in)
        val warcType = headers.getOrElse("warc-type", "")
        var status: Integer = null
        var contentType = headers.getOrElse("content-type", "")
        var payload = body
        if (warcType == "response" &&
            contentType.startsWith("application/http")) {
          parseHttp(body) match {
            case Some((st, ct, offset)) =>
              status = st
              if (ct != null) contentType = ct
              payload = java.util.Arrays.copyOfRange(body, offset, body.length)
            case None => () // not HTTP after all: keep the raw body
          }
        }
        nextRow = Row(file,
          headers.getOrElse("warc-record-id", ""),
          warcType,
          headers.getOrElse("warc-target-uri", ""),
          headers.getOrElse("warc-date", ""),
          status, contentType, payload)
      } catch {
        // truncated/corrupt tail: keep the parsed prefix — damage is
        // bounded to a short read, never a task failure (NonFatal, not
        // just EOF/NumberFormat: fuzzed records reach other throw
        // sites). Logged so truncation is visible to operators.
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[warc] $file: kept parsed prefix, dropping tail: $e")
          done = true; in.close()
      }

    /** Read exactly `len` bytes incrementally (64 KiB steps): a lying
      * content-length can't force a multi-GB upfront allocation, and a
      * truncated stream EOFs holding only the bytes that exist. */
    private def readFullyN(in: InputStream, len: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(math.min(len, 1 << 16))
      val tmp = new Array[Byte](1 << 16)
      var left = len
      while (left > 0) {
        val n = in.read(tmp, 0, math.min(left, tmp.length))
        if (n < 0) throw new EOFException(s"truncated body: $left of $len left")
        out.write(tmp, 0, n)
        left -= n
      }
      out.toByteArray
    }

    /** Reads the `WARC/…` version line + headers up to the blank line;
      * null at clean end-of-stream. Header names are lower-cased. */
    private def readHeaderBlock(
        in: InputStream): scala.collection.Map[String, String] = {
      var line = readLine(in)
      while (line != null && line.isEmpty) line = readLine(in) // inter-record CRLFs
      if (line == null) return null
      if (!line.startsWith("WARC/")) throw new EOFException("not a WARC header")
      val m = scala.collection.mutable.Map.empty[String, String]
      line = readLine(in)
      while (line != null && line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0) m += (line.substring(0, i).trim.toLowerCase ->
          line.substring(i + 1).trim)
        line = readLine(in)
      }
      m
    }

    /** (status, content-type|null, body offset) of an HTTP envelope. */
    private def parseHttp(body: Array[Byte]): Option[(Int, String, Int)] = {
      val sep = indexOfDoubleCrlf(body)
      if (sep < 0) return None
      val head = new String(body, 0, sep, "ISO-8859-1")
      val lines = head.split("\r\n")
      if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return None
      val status = lines(0).split(" ", 3) match {
        case parts if parts.length >= 2 && parts(1).forall(_.isDigit) =>
          parts(1).toInt
        case _ => return None
      }
      val ct = lines.drop(1).collectFirst {
        case l if l.toLowerCase.startsWith("content-type:") =>
          l.substring(13).trim
      }
      Some((status, ct.orNull, sep + 4))
    }

    private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
      var i = 0
      while (i + 3 < b.length) {
        if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
          b(i + 3) == '\n') return i
        i += 1
      }
      -1
    }

    private def skipCrlfs(in: InputStream): Unit = {
      // the two record-terminating CRLFs; tolerate their absence at EOF
      var n = 0
      while (n < 4) { if (in.read() < 0) return; n += 1 }
    }

    /** CRLF-terminated line as ISO-8859-1; null at EOF before any byte. */
    private def readLine(in: InputStream): String = {
      val sb = new java.lang.StringBuilder
      var c = in.read()
      if (c < 0) return null
      while (c >= 0 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        c = in.read()
      }
      sb.toString
    }
  }

  /** Deterministic WARC bytes for specs (a response, plus any raw records
    * given as (type, uri, body)). */
  def synthWarc(records: Seq[(String, String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.zipWithIndex.foreach { case ((warcType, uri, body), i) =>
      val head = (s"WARC/1.0\r\n" +
        s"WARC-Type: $warcType\r\n" +
        s"WARC-Record-ID: <urn:uuid:rec-$i>\r\n" +
        s"WARC-Date: 2026-01-01T00:00:0$i" + "Z\r\n" +
        (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
        (if (warcType == "response")
          "Content-Type: application/http; msgtype=response\r\n" else "") +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1")
      out.write(head); out.write(body); out.write("\r\n\r\n".getBytes)
    }
    out.toByteArray
  }

  /** HTTP response envelope for [[synthWarc]] response records. */
  def synthHttp(status: Int, contentType: String,
      body: Array[Byte]): Array[Byte] = {
    val head = (s"HTTP/1.1 $status OK\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1")
    head ++ body
  }
}
