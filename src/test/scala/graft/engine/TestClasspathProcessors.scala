package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s.JValue

/** Test-classpath `RecordProcessor` providers, registered through
  * `META-INF/services/graft.engine.RecordProcessor` (test resources) —
  * they stand in for a third-party extension jar and exist only to prove
  * the ServiceLoader discovery path (the analog of the reference's
  * `.so` loading, ext/ext_repository/load.rs).
  */
final class UppercasePayloadProcessor extends RecordProcessor {
  val name = "test_upper"
  def process(df: DataFrame, config: JValue): DataFrame =
    df.withColumn("payload", encode(upper(col("payload").cast("string")), "UTF-8"))
}

/** Deliberately collides with the builtin `split_lines` name: discovery
  * must NOT shadow builtins. Transforms nothing, so if it ever won the
  * name the spec's split assertion would fail. */
final class ShadowingSplitLines extends RecordProcessor {
  val name = "split_lines"
  def process(df: DataFrame, config: JValue): DataFrame = df
}

/** NOT registered in the test-resources services file — only an
  * RS_EXT_PATH jar's own `META-INF/services` entry discovers it
  * (Processors.loadExtensionsFrom spec). */
final class ExtPathOnlyProcessor extends RecordProcessor {
  val name = "test_ext_path_only"
  def process(df: DataFrame, config: JValue): DataFrame = df
}
