package graft.sources

import graft.engine.BatchWire
import graft.pipeline.Multimodal
import org.scalatest.funsuite.AnyFunSuite

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Robustness fuzz over every hand-rolled byte/string parser (VERDICT r14
  * #4): the r14 WAV hang came from ONE adversarial size field, and the
  * same class of parser exists for images, MCAP, WARC and the batch wire.
  * Deterministic corpus (fixed seed): truncations at every stride,
  * bit-flips, and 32-bit size-field extremes. The property is NOT
  * correctness — it is bounded time + graceful degradation:
  *
  *  - payload decoders (image/audio) return `decode_ok = false`, never
  *    throw, never hang;
  *  - container sources (MCAP/WARC) keep the parsed prefix, never throw,
  *    never hang, never allocate from a lying length field;
  *  - wire-header parsers throw IllegalArgumentException (→ 422) or
  *    return — nothing else.
  *
  * No SparkSession: every parser is exercised through its driver-side
  * seam, so the whole corpus (thousands of cases) runs in seconds. Each
  * case is bounded by a watchdog — a hang fails the suite instead of
  * wedging it.
  */
class DecoderFuzzSpec extends AnyFunSuite {

  private implicit val ec: ExecutionContext = ExecutionContext.global

  /** One fuzz case under a watchdog; a TimeoutException = a hang. */
  private def bounded[T](label: String)(f: => T): T =
    try Await.result(Future(f), 30.seconds)
    catch {
      case e: java.util.concurrent.TimeoutException =>
        fail(s"$label: parser hung (watchdog)", e)
    }

  private val SizeExtremes =
    Seq(0xFFFFFFFFL, 0x7FFFFFFFL, 0x80000000L, 0xFFFFFFF8L, 0x00000000L)

  /** Deterministic mutants of `base`: truncations (16 strides), single
    * byte flips (64), and 4-byte little+big-endian size-extreme
    * overwrites at random aligned offsets (64). */
  private def mutants(base: Array[Byte], seed: Long): Iterator[(String, Array[Byte])] = {
    val rnd = new scala.util.Random(seed)
    val truncs = (0 to 16).iterator.map { i =>
      val n = math.min(base.length, i * math.max(1, base.length / 16))
      (s"trunc:$n", java.util.Arrays.copyOf(base, n))
    }
    val flips = Iterator.tabulate(64) { i =>
      val b = base.clone()
      if (b.nonEmpty) {
        val p = rnd.nextInt(b.length)
        b(p) = (b(p) ^ (1 << rnd.nextInt(8))).toByte
      }
      (s"flip:$i", b)
    }
    val sizes = Iterator.tabulate(64) { i =>
      val b = base.clone()
      if (b.length >= 4) {
        val p = rnd.nextInt(b.length - 3)
        val v = SizeExtremes(rnd.nextInt(SizeExtremes.length))
        if (i % 2 == 0) { // LE
          b(p) = v.toByte; b(p + 1) = (v >> 8).toByte
          b(p + 2) = (v >> 16).toByte; b(p + 3) = (v >> 24).toByte
        } else { // BE
          b(p) = (v >> 24).toByte; b(p + 1) = (v >> 16).toByte
          b(p + 2) = (v >> 8).toByte; b(p + 3) = v.toByte
        }
      }
      (s"size:$i", b)
    }
    truncs ++ flips ++ sizes
  }

  // ---------------------------------------------------------- corpora

  private def u16be(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def u32be(v: Long) = Array[Byte](
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  /** Minimal AIFF with a valid COMM (8000 Hz, 1 ch, 16 bit, 100 frames). */
  private def synthAiff(): Array[Byte] = {
    val rate = 8000L
    // 80-bit extended float: rate = mant * 2^(exp - 16383 - 63)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(rate) // floor(log2)
    val exp = 16383 + e
    val mant = BigInt(rate) << (63 - e)
    val comm = "COMM".getBytes("US-ASCII") ++ u32be(18) ++
      u16be(1) ++ u32be(100L) ++ u16be(16) ++
      u16be(exp) ++ u32be((mant >> 32).toLong) ++ u32be((mant & 0xffffffffL).toLong)
    val form = "AIFF".getBytes("US-ASCII") ++ comm
    "FORM".getBytes("US-ASCII") ++ u32be(form.length.toLong) ++ form
  }

  /** Minimal AU (encoding 3 = 16-bit linear PCM, 8000 Hz, 1 ch). */
  private def synthAu(): Array[Byte] =
    ".snd".getBytes("US-ASCII") ++ u32be(24) ++ u32be(200) ++
      u32be(3) ++ u32be(8000) ++ u32be(1) ++ Array.fill[Byte](16)(0)

  private val audioCorpus: Seq[(String, Array[Byte])] = Seq(
    "wav" -> Multimodal.synthWav(8000, 1, 128),
    "aiff" -> synthAiff(),
    "au" -> synthAu())

  private val imageCorpus: Seq[(String, Array[Byte])] = Seq(
    "png" -> Multimodal.synthImage("png", 13, 9),
    "bmp" -> Multimodal.synthImage("bmp", 9, 13),
    "jpg" -> Multimodal.synthImage("jpg", 16, 16))

  private def warcBytes(): Array[Byte] = Warc.synthWarc(Seq(
    ("response", "http://example.test/a", Warc.synthHttp(200,
      "text/html", "<html>fuzz</html>".getBytes("UTF-8"))),
    ("request", "http://example.test/a", "GET / HTTP/1.1".getBytes("UTF-8"))))

  private def mcapBytes(compression: Option[String]): Array[Byte] =
    Mcap.synthMcap(Seq(
      ("/imu/data", 1L, 1000000L, """{"x":1}""".getBytes("UTF-8")),
      ("/cam/raw", 2L, 2000000L, Array.fill[Byte](64)(7))),
      compression = compression, jsonTopics = Set("/imu/data"))

  // ------------------------------------------------------------ specs

  test("sanity: unmutated corpora decode with decode_ok / full row counts") {
    for ((name, bytes) <- audioCorpus)
      assert(Multimodal.decodeAudio(bytes).getBoolean(4), s"audio $name")
    for ((name, bytes) <- imageCorpus)
      assert(Multimodal.decode(bytes).getBoolean(5), s"image $name")
    assert(Warc.parseBytes("w", warcBytes()).size == 2)
    assert(Mcap.parseBytes("m", mcapBytes(None)).size == 2)
    assert(Mcap.parseBytes("m", mcapBytes(Some("zstd"))).size == 2)
  }

  test("audio decode: mutants never throw or hang; invalid → decode_ok=false") {
    for ((name, base) <- audioCorpus; (m, bytes) <- mutants(base, seed = 0xA11D10L))
      bounded(s"audio/$name/$m") {
        val row = Multimodal.decodeAudio(bytes)
        assert(row.size == 5) // decode_ok true or clean false — never a throw
      }
  }

  test("image decode: mutants never throw or hang; header dims are bounded before raster alloc") {
    for ((name, base) <- imageCorpus; (m, bytes) <- mutants(base, seed = 0x1443EL))
      bounded(s"image/$name/$m") {
        val row = Multimodal.decode(bytes)
        assert(row.size == 6)
      }
    // targeted: a PNG IHDR declaring ~2^30 x 2^30 pixels must be rejected
    // by the header check (opaque fallback), not alloc a 10^18-px raster
    val png = Multimodal.synthImage("png", 4, 4)
    val forged = png.clone()
    // IHDR width/height live at fixed offsets 16..23 in a baseline PNG
    for (o <- 16 until 24) forged(o) = 0x40.toByte
    bounded("image/png/insane-dims") {
      val row = Multimodal.decode(forged)
      assert(!row.getBoolean(5), "insane declared dims must fall back to opaque")
    }
  }

  test("MCAP parse: mutants never throw or hang; prefix rows only, no lying-length allocs") {
    for (comp <- Seq(None, Some("zstd"), Some("lz4"));
        (m, bytes) <- mutants(mcapBytes(comp), seed = 0x3CA9L))
      bounded(s"mcap/${comp.getOrElse("raw")}/$m") {
        val rows = Mcap.parseBytes("m", bytes)
        assert(rows.size <= 2) // never invents records
      }
  }

  test("WARC parse: mutants never throw or hang; prefix rows only") {
    for ((m, bytes) <- mutants(warcBytes(), seed = 0x3A9CL))
      bounded(s"warc/$m") {
        val rows = Warc.parseBytes("w", bytes)
        assert(rows.size <= 2)
      }
    // targeted: a content-length of 2^32 used to truncate to 0 and
    // desync; 2 GB used to allocate upfront; negative used to throw out
    // of the iterator. All must degrade to a short read.
    for (cl <- Seq("4294967296", "2147483647", "-1", "999999999999999999999"))
      bounded(s"warc/content-length:$cl") {
        val doc = ("WARC/1.0\r\nWARC-Type: metadata\r\n" +
          s"Content-Length: $cl\r\n\r\nshort").getBytes("ISO-8859-1")
        assert(Warc.parseBytes("w", doc).isEmpty)
      }
  }

  test("batch wire headers: mutants throw IllegalArgumentException or return — nothing else") {
    val rnd = new scala.util.Random(0xB17EL)
    val valid = Seq(
      "100,text/plain,a=1,b=\"x, y\"",
      "0,,k=v",
      "42,application/json")
    val cases = valid.flatMap { v =>
      (0 until 64).map { _ =>
        val b = v.toCharArray
        val p = rnd.nextInt(b.length)
        b(p) = (rnd.nextInt(94) + 33).toChar
        new String(b)
      }
    } ++ (0 until 64).map(_ =>
      (0 until rnd.nextInt(40)).map(_ => (rnd.nextInt(94) + 33).toChar).mkString)
    for (c <- cases) {
      bounded(s"wire/header/${c.take(20)}") {
        try { BatchWire.parseBatchedHeader(c); () }
        catch { case _: IllegalArgumentException => () }
      }
      bounded(s"wire/name/${c.take(20)}") {
        try { BatchWire.parseBatchedHeaderName("x-reduct-" + c); () }
        catch { case _: IllegalArgumentException => () }
      }
      bounded(s"wire/delta/${c.take(20)}") {
        try { BatchWire.parseLabelDelta(c, Some(Seq("a", "b"))); () }
        catch { case _: IllegalArgumentException => () }
      }
    }
  }
}
