package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) document ingest — the de-facto
  * interchange format for web-scale text dumps (one JSON object per
  * line, usually .jsonl.gz). The 100-TB reality is that some lines are
  * ALWAYS broken (truncated uploads, encoding damage, half-written
  * shards), and a single bad line must neither kill the job (FAILFAST)
  * nor silently vanish (DROPMALFORMED): ingest runs PERMISSIVE with a
  * corrupt-record side channel so damage is counted, sampled, and
  * attributable to its source file before the clean rows flow on.
  *
  * Spark's native json reader does the heavy lifting (distributed,
  * pushdown-friendly, .gz-transparent); this wrapper pins the
  * ingest-robustness contract: explicit schema (no inference pass over
  * 100 TB), `_corrupt_record` + `input_file_name` retained.
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, "string")

  /** Read with an explicit schema; malformed lines survive as rows with
    * only `_corrupt_record` + `src_file` set. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .withColumn("src_file", input_file_name())

  /** The same permissive contract over a STREAM of arriving dump files:
    * identical reader wiring, so batch and continuous ingest cannot
    * drift apart. Split clean rows from damage per micro-batch in
    * `foreachBatch` (see JsonlSpec's streaming case). */
  def readStream(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.readStream
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .withColumn("src_file", input_file_name())

  /** Split an ingest into (clean rows, damage report): the report is one
    * row per source file with its bad-line count and a deterministic
    * sample of the damage (min by content — stable across retries, no
    * `first()` nondeterminism). */
  def readWithReport(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val all = read(spark, path, schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clean = all.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val report = all.filter(col(CorruptCol).isNotNull)
      .groupBy(col("src_file"))
      .agg(count(lit(1)).as("bad_lines"),
        min(col(CorruptCol)).as("sample"))
    (clean, report)
  }
}
