package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.control.NonFatal

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches (the Scala analog of a `mapInPandas` batch pipeline).
  *
  * The decode step is REAL: [[decode]] runs the payload through the JDK's
  * own ImageIO codecs (PNG / JPEG / BMP / GIF — all present in a
  * zero-egress build), emitting the decoded raster's width / height /
  * channel count with `decode_ok = true`. Payloads no installed codec
  * claims (audio containers, custom formats, corrupt files) fall back to
  * deterministic hash-derived pseudo-dimensions with `decode_ok = false`,
  * so every modality batches through one pipeline and downstream grouping
  * stays total.
  *
  * Scale notes: payloads never shuffle — feature extraction is map-only;
  * `repartitionByBytes` right-sizes partitions first so one partition's
  * batch of blobs fits executor memory (the knob a 10 MB-record corpus
  * needs, mirroring the reference's io batching, cfg/io.rs:18-47).
  */
object Multimodal {

  // ImageIO's default decode path spools through a temp file on the
  // executor's local disk; in-memory streams are faster and avoid temp-dir
  // contention across 32 concurrent tasks.
  ImageIO.setUseCache(false)

  val featureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("feature_hash", LongType),
    StructField("byte_size", IntegerType),
    StructField("decode_ok", BooleanType)))

  /** Stable 64-bit polynomial byte hash — the grouping feature for
    * payloads, and the seed for fallback pseudo-dimensions. */
  def byteHash(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    h
  }

  /** Raster-size admission bound: 64 MP ≈ 192 MB for a 3-band byte
    * raster. A corrupt/forged header declaring absurd dimensions must be
    * rejected BEFORE the decoder allocates the raster — on an untrusted
    * 100 TB corpus one such payload per partition would OOM executors.
    * Real corpora sit orders of magnitude below this. */
  private val MaxImagePixels = 64L * 1024 * 1024

  /** ImageIO decode with a header-first dimension check: the reader
    * parses width/height from the container header (no raster alloc),
    * insane declared dims → null (opaque fallback), then the bounded
    * raster decodes. Null for undecodable/empty payloads. */
  private def readImageBounded(payload: Array[Byte]): BufferedImage = {
    if (payload.length == 0) return null
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val r = readers.next()
        try {
          r.setInput(iis)
          val w = r.getWidth(0).toLong
          val h = r.getHeight(0).toLong
          if (w <= 0 || h <= 0 || w * h > MaxImagePixels) null
          else r.read(0)
        } finally r.dispose()
      } finally iis.close()
    } catch { case NonFatal(_) => null } // corrupt container: treat as opaque
  }

  /** Decode one payload: real ImageIO decode when a codec claims the
    * bytes, hash-derived fallback (decode_ok = false) otherwise. The
    * fallback dimensions are a deterministic function of the bytes so
    * opaque-payload pipelines stay reproducible end-to-end. */
  def decode(payload: Array[Byte]): Row = {
    val h = byteHash(payload)
    val img = readImageBounded(payload)
    if (img == null) {
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 10, 1024).toInt
      Row(w, ht, 3, h, payload.length, false)
    } else {
      Row(img.getWidth, img.getHeight, img.getRaster.getNumBands,
        h, payload.length, true)
    }
  }

  /** Deterministic synthetic image: a w×h gradient raster encoded by the
    * JDK's `format` writer (png/bmp/jpg). The JDK encoders are
    * bit-deterministic for a fixed raster (spec-pinned), so tests and
    * oracles can predict [[decode]]'s output from (format, w, h) alone. */
  def synthImage(format: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Real aspect-preserving downscale via Graphics2D, re-encoded with the
    * JDK's `format` writer. The target dimensions use INTEGER arithmetic
    * — nw = max(1, w·maxDim / max(w,h)) — so an oracle can predict the
    * decoded output dims exactly. Opaque payloads and images already
    * within `maxDim` pass through unchanged. */
  def resizeImage(payload: Array[Byte], maxDim: Int,
      format: String = "png"): Array[Byte] = {
    val img = readImageBounded(payload)
    if (img == null) return payload
    val w = img.getWidth; val h = img.getHeight
    val m = math.max(w, h)
    if (m <= maxDim) return payload
    val nw = math.max(1, w * maxDim / m)
    val nh = math.max(1, h * maxDim / m)
    val dst = new BufferedImage(nw, nh, BufferedImage.TYPE_3BYTE_BGR)
    val g = dst.createGraphics()
    try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(dst, format, bos)
    bos.toByteArray
  }

  /** Decode-once resize + features: one ImageIO decode per row feeds BOTH
    * the Graphics2D downscale and the features struct. Composing
    * [[resizeImage]] then [[extractFeatures]] decodes every payload twice
    * (once to resize, once to describe the re-encoded result); this
    * staged kernel reads the output dimensions off the destination raster
    * before encoding, so the result is bit-identical to the naive
    * composition (the JDK encoders are deterministic for a fixed raster)
    * at one decode less per row. Appends `resized` (binary) and
    * `features` (describing the RESIZED payload). Map-only, no shuffle. */
  def resizeFeatures(df: DataFrame, maxDim: Int, format: String = "png",
      payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema
      .add("resized", BinaryType).add("features", featureSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val payload =
          if (row.isNullAt(idx)) Array.empty[Byte]
          else row.getAs[Array[Byte]](idx)
        val (resized, feat) = resizeAndDescribe(payload, maxDim, format)
        Row.fromSeq(row.toSeq :+ resized :+ feat)
      }
    }(Encoders.row(schema))
  }

  /** Single-decode kernel behind [[resizeFeatures]]. */
  def resizeAndDescribe(payload: Array[Byte], maxDim: Int,
      format: String): (Array[Byte], Row) = {
    val img = readImageBounded(payload)
    if (img == null) { // opaque: pass through, hash-derived pseudo-dims
      val h = byteHash(payload)
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 10, 1024).toInt
      return (payload, Row(w, ht, 3, h, payload.length, false))
    }
    val w = img.getWidth; val h = img.getHeight
    val m = math.max(w, h)
    if (m <= maxDim)
      return (payload, Row(w, h, img.getRaster.getNumBands,
        byteHash(payload), payload.length, true))
    val nw = math.max(1, w * maxDim / m)
    val nh = math.max(1, h * maxDim / m)
    val dst = new BufferedImage(nw, nh, BufferedImage.TYPE_3BYTE_BGR)
    val g = dst.createGraphics()
    try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(dst, format, bos)
    val bytes = bos.toByteArray
    (bytes, Row(nw, nh, dst.getRaster.getNumBands,
      byteHash(bytes), bytes.length, true))
  }

  // ------------------------------------------------------------- audio

  val audioSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_frames", LongType),
    StructField("decode_ok", BooleanType)))

  /** Real audio-container header parse (WAV / AIFF / AU — the same
    * container surface javax.sound's file-format readers cover for these
    * types): sample rate / channels / bit depth / frame count with
    * `decode_ok = true`; unrecognized payloads → all-null metadata,
    * decode_ok = false. Header-only — the PCM body is never buffered.
    * Hand-rolled rather than AudioSystem.getAudioFileFormat: the JDK's
    * provider registry serializes lookups on a global lock, which makes
    * a 32-thread decode stage SLOWER than one thread (measured 0.5 s →
    * 2.0 s on the sf0.1 bench when the stage was parallelized). */
  def decodeAudio(payload: Array[Byte]): Row =
    try {
      def u16le(o: Int) = ((payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8))
      def u32le(o: Int): Long = (u16le(o).toLong | (u16le(o + 2).toLong << 16))
      def u16be(o: Int) = (((payload(o) & 0xff) << 8) | (payload(o + 1) & 0xff))
      def u32be(o: Int): Long = ((u16be(o).toLong << 16) | u16be(o + 2).toLong)
      def tag(o: Int) = new String(payload, o, 4, "US-ASCII")
      if (payload.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE") {
        // chunk walk: "fmt " carries channels/rate/block-align/bits,
        // "data" carries the payload size → frames = size / blockAlign
        var o = 12
        var rate, channels, bits, blockAlign = -1
        var dataSz = -1L
        while (o + 8 <= payload.length) {
          val id = tag(o); val sz = u32le(o + 4)
          if (id == "fmt " && o + 24 <= payload.length) {
            channels = u16le(o + 10); rate = u32le(o + 12).toInt
            blockAlign = u16le(o + 20); bits = u16le(o + 22)
          } else if (id == "data") dataSz = sz // fmt may follow data
          // step in Long: a 32-bit size near 0xFFFFFFF8 truncated to Int
          // makes the step 0/negative and the walk never terminates
          val next = o.toLong + 8L + sz + (sz & 1L) // word-aligned, >= o+8
          o = if (next > payload.length) payload.length else next.toInt
        }
        val frames = if (blockAlign > 0 && dataSz >= 0) dataSz / blockAlign else -1L
        require(rate > 0 && channels > 0 && bits > 0 && frames >= 0)
        Row(rate, channels, bits, frames, true)
      } else if (payload.length >= 12 && tag(0) == "FORM" &&
          (tag(8) == "AIFF" || tag(8) == "AIFC")) {
        // COMM chunk: channels(2) frames(4) bits(2) rate(80-bit extended)
        var o = 12
        while (o + 8 <= payload.length) {
          val id = tag(o); val sz = u32be(o + 4)
          if (id == "COMM" && o + 26 <= payload.length) {
            val channels = u16be(o + 8)
            val frames = u32be(o + 10)
            val bits = u16be(o + 14)
            val exp = u16be(o + 16) & 0x7fff
            val mantHi = u32be(o + 18); val mantLo = u32be(o + 22)
            val mant = (mantHi.toDouble * 4294967296.0) + mantLo.toDouble
            val rate = (mant * math.pow(2.0, exp - 16383 - 63)).round.toInt
            require(rate > 0 && channels > 0 && bits > 0)
            return Row(rate, channels, bits, frames, true)
          }
          val next = o.toLong + 8L + sz + (sz & 1L) // Long step: see WAV walk
          o = if (next > payload.length) payload.length else next.toInt
        }
        throw new IllegalArgumentException("no COMM chunk")
      } else if (payload.length >= 24 && tag(0) == ".snd") {
        val dataSize = u32be(8)
        val enc = u32be(12).toInt
        val rate = u32be(16).toInt
        val channels = u32be(20).toInt
        val bytesPer = enc match {
          case 1 | 2 => 1; case 3 => 2; case 4 => 3; case 5 => 4
          case other => throw new IllegalArgumentException(s"au enc $other")
        }
        val bits = if (enc == 1) 8 else bytesPer * 8
        require(rate > 0 && channels > 0)
        Row(rate, channels, bits, dataSize / (bytesPer.toLong * channels), true)
      } else throw new IllegalArgumentException("unknown container")
    } catch { case NonFatal(_) => Row(null, null, null, null, false) }

  /** Deterministic synthetic 16-bit little-endian PCM WAV — canonical
    * 44-byte RIFF header, no javax.sound (same global-lock rationale as
    * [[decodeAudio]]; specs and oracles predict [[decodeAudio]]'s output
    * from the parameters). */
  def synthWav(rateHz: Int, channels: Int, nFrames: Int): Array[Byte] = {
    val dataLen = 2 * channels * nFrames
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(rateHz)
      .putInt(rateHz * 2 * channels)       // byte rate
      .putShort((2 * channels).toShort)    // block align
      .putShort(16)                        // bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < dataLen) { out.put((i * 31).toByte); i += 1 }
    out.array()
  }

  /** Batch audio metadata extraction; appends an `audio` struct.
    * Map-only, mirrors [[extractFeatures]]. */
  def extractAudio(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema.add("audio", audioSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val payload =
          if (row.isNullAt(idx)) Array.empty[Byte]
          else row.getAs[Array[Byte]](idx)
        Row.fromSeq(row.toSeq :+ decodeAudio(payload))
      }
    }(Encoders.row(schema))
  }

  /** Right-size partitions so each holds ~`targetBytes` of payload. */
  def repartitionByBytes(df: DataFrame, payloadCol: String,
      targetBytes: Long = 128L << 20): DataFrame = {
    val total = df.agg(sum(length(col(payloadCol)))).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val parts = math.max(1, (total / targetBytes).toInt)
    df.repartition(parts)
  }

  /** Batch feature extraction over a binary column; appends a `features`
    * struct. Map-only (no shuffle); preserves all input columns. */
  def extractFeatures(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema.add("features", featureSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val payload =
          if (row.isNullAt(idx)) Array.empty[Byte]
          else row.getAs[Array[Byte]](idx)
        Row.fromSeq(row.toSeq :+ decode(payload))
      }
    }(Encoders.row(schema))
  }

  /** Deterministic frame sampling plumbing for "video" payloads: emits one
    * row per sampled frame index. */
  def sampleFrames(df: DataFrame, payloadCol: String = "payload",
      everyNth: Int = 10, maxFrames: Int = 8): DataFrame = {
    val nFrames = least(
      (length(col(payloadCol)) / everyNth + 1).cast("int"), lit(maxFrames))
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))))
      .withColumn("frame_offset", col("frame_idx") * everyNth)
  }
}
