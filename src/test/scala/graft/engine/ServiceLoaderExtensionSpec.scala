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
}
