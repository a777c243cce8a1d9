package graft.engine

import graft.SparkTestBase
import graft.core.Records
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ServiceLoader-discovered `#ext` processors (the analog of the
  * reference's runtime-loaded `.so` IoExtensions,
  * ext/ext_repository/load.rs): a processor on the classpath is usable by
  * name through the `#ext` directive without being compiled into graft.
  */
class ServiceLoaderExtensionSpec extends AnyFunSuite with SparkTestBase {

  private def recordsDf(rows: Seq[(String, Long, String)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val data = rows.map { case (entry, ts, payload) =>
      Row("b", entry, ts, Map.empty[String, String], Map.empty[String, String],
        "text/plain", Records.State.Finished, payload.getBytes)
    }.asJava
    spark.createDataFrame(data, Records.schema)
  }

  test("a classpath-registered processor is discovered and usable via #ext") {
    assert(Processors.discovered.contains("test_upper"))
    val df = recordsDf(Seq(("e", 1L, "hello"), ("e", 2L, "world")))
    val out = QueryEngine.query(df,
      QuerySpec(when = Some("""{"#ext": {"test_upper": {}}}""")))
      .select(col("payload").cast("string")).collect().map(_.getString(0)).toSeq
    assert(out == Seq("HELLO", "WORLD"))
  }

  test("RS_EXT_PATH jars feed the registry (ext_repository.rs analog)") {
    assert(!Processors.registry.contains("test_ext_path_only"),
      "the ext-path-only provider must not be classpath-registered")
    // a real extension jar: its services file names the provider class
    // (resolved parent-first — the jar only has to carry the metadata
    // here, which is exactly what ServiceLoader reads from it)
    val dir = java.nio.file.Files.createTempDirectory("graft-ext-path")
    val jar = dir.resolve("ext.jar")
    val out = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(jar))
    out.putNextEntry(new java.util.zip.ZipEntry(
      "META-INF/services/graft.engine.RecordProcessor"))
    out.write("graft.engine.ExtPathOnlyProcessor".getBytes("UTF-8"))
    out.closeEntry()
    out.close()
    assert(Processors.loadExtensionsFrom(dir.toString) == 1)
    assert(Processors.registry.contains("test_ext_path_only"))
    // an empty/missing dir is a clean zero, not an error
    assert(Processors.loadExtensionsFrom(
      dir.resolve("nothing-here").toString) == 0)
  }

  test("discovered processors never shadow builtins of the same name") {
    // the test classpath registers a no-op provider named split_lines;
    // the registry must still resolve the builtin (which splits rows)
    assert(Processors.discovered.contains("split_lines"))
    assert(Processors.registry("split_lines") eq Processors.SplitLines)
    val df = recordsDf(Seq(("e", 1L, "a\nb")))
    val out = QueryEngine.query(df,
      QuerySpec(when = Some("""{"#ext": {"split_lines": {}}}"""))).collect()
    assert(out.length == 2) // builtin behavior, not the shadowing no-op
  }

  test("pipelines can mix discovered and builtin steps") {
    val df = recordsDf(Seq(("e", 1L, "x\ny")))
    val out = QueryEngine.query(df, QuerySpec(when = Some(
      """{"#ext": [{"split_lines": {}}, {"test_upper": {}}]}""")))
      .select(col("payload").cast("string")).collect().map(_.getString(0)).toSeq
    assert(out == Seq("X", "Y"))
  }

  test("re-produced computed-label keys overwrite (later step wins), never crash") {
    // two payload_stats steps produce the same keys; Spark's default
    // mapKeyDedupPolicy=EXCEPTION would throw DUPLICATE_MAP_KEY on a
    // bare map_concat — the merge must drop-then-concat
    val df = recordsDf(Seq(("e", 1L, "hello")))
    val out = QueryEngine.query(df, QuerySpec(when = Some(
      """{"#ext": [{"payload_stats": {}}, {"payload_stats": {}}]}""")))
      .select(element_at(col("computed_labels"), "size")).collect()
    assert(out.length == 1 && out(0).getString(0) == "5")
    // json_extract with a repeated field must not build a dup-keyed map
    val df2 = recordsDf(Seq(("e", 1L, """{"k": "v"}""")))
    val out2 = QueryEngine.query(df2, QuerySpec(when = Some(
      """{"#ext": {"json_extract": {"fields": ["k", "k"]}}}""")))
      .select(element_at(col("computed_labels"), "k")).collect()
    assert(out2(0).getString(0) == "v")
  }

  test("json_extract with an empty fields array is a no-op, not an analysis error") {
    val df = recordsDf(Seq(("e", 1L, "x")))
    val out = QueryEngine.query(df, QuerySpec(when = Some(
      """{"#ext": {"json_extract": {"fields": []}}}""")))
    assert(out.count() == 1)
  }

  test("split_lines keeps NULL-payload records instead of silently dropping them") {
    import scala.jdk.CollectionConverters._
    val data = Seq(
      Row("b", "e", 1L, Map.empty[String, String], Map.empty[String, String],
        "text/plain", Records.State.Finished, null),
      Row("b", "e", 2L, Map.empty[String, String], Map.empty[String, String],
        "text/plain", Records.State.Finished, "a\nb".getBytes)).asJava
    val df = spark.createDataFrame(data, Records.schema)
    val out = QueryEngine.query(df, QuerySpec(when = Some(
      """{"#ext": {"split_lines": {}}}""")))
      .select(col("ts"), col("payload").cast("string")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, ""), (2L, "a"), (2L, "b")), s"got $out")
  }
}
