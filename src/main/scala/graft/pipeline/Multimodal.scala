package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches (the Scala analog of a `mapInPandas` batch pipeline).
  *
  * The Spark-side plumbing — schema, batching, partition sizing — is real;
  * the actual media decode is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic fake dimensions/features
  * from the bytes so the pipeline is testable end-to-end. Swap
  * `decodeStub` for a real decoder (JavaCV etc.) at the marked point.
  *
  * Scale notes: payloads never shuffle — feature extraction is map-only;
  * `repartitionByBytes` right-sizes partitions first so one partition's
  * batch of blobs fits executor memory (the knob a 10 MB-record corpus
  * needs, mirroring the reference's io batching, cfg/io.rs:18-47).
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("feature_hash", LongType),
    StructField("byte_size", IntegerType)))

  /** ==== STUB ==== deterministic fake decode: real implementation would
    * decode the container format here. Dimensions derive from a stable
    * byte hash so tests are reproducible. */
  def decodeStub(payload: Array[Byte]): Row = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >> 10, 1024).toInt
    Row(w, ht, 3, h, payload.length)
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
        // ==== STUB ==== real decoder call-site
        Row.fromSeq(row.toSeq :+ decodeStub(payload))
      }
    }(Encoders.row(schema))
  }

  /** Deterministic frame sampling plumbing for "video" payloads: emits one
    * row per sampled frame index (decode stubbed). */
  def sampleFrames(df: DataFrame, payloadCol: String = "payload",
      everyNth: Int = 10, maxFrames: Int = 8): DataFrame = {
    val nFrames = least(
      (length(col(payloadCol)) / everyNth + 1).cast("int"), lit(maxFrames))
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))))
      .withColumn("frame_offset", col("frame_idx") * everyNth)
  }
}
