package graft

import graft.core.Records
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface: the condition language via graft_when / graft_parse_value. */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("graft_when evaluates the condition language from spark.sql") {
    GraftExtensions.register(spark)
    import scala.jdk.CollectionConverters._
    val data = Seq(
      Row("b", "e", 1L, Map("score" -> "5"), Map.empty[String, String], "", 1, Array[Byte]()),
      Row("b", "e", 2L, Map("score" -> "15"), Map.empty[String, String], "", 1, Array[Byte]()),
      Row("b", "e", 3L, Map.empty[String, String], Map.empty[String, String], "", 1, Array[Byte]())).asJava
    spark.createDataFrame(data, Records.schema).createOrReplaceTempView("recs")
    val got = spark.sql(
      """SELECT ts FROM recs
         WHERE graft_when('{"&score": {"$gt": 10}}', ts, labels, computed_labels)""")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L))
    // parse_value exposes the dynamic typing struct
    val k = spark.sql("SELECT graft_parse_value('3.5').k").collect()(0).getInt(0)
    assert(k == 2) // float kind
    // stateful operators are rejected with a clear error
    val e = intercept[Exception] {
      spark.sql("""SELECT graft_when('{"$each_n": 2}', ts, labels, computed_labels) FROM recs""").collect()
    }
    assert(e.getMessage.contains("stateful") || e.getCause != null)
  }
}
