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

  test("sketch kernels are callable from spark.sql") {
    GraftExtensions.register(spark)
    // simhash of identical texts is identical; of different texts differs
    val fp = spark.sql(
      """SELECT graft_simhash64('alpha beta gamma') AS a,
                graft_simhash64('alpha beta gamma') AS b,
                graft_simhash64('delta epsilon zeta') AS c""").collect()(0)
    assert(fp.getLong(0) == fp.getLong(1) && fp.getLong(0) != fp.getLong(2))
    // the SQL minhash signature matches the Scala-API pipeline's
    val viaSql = spark.sql(
      """SELECT graft_minhash_sig(graft_shingle_hashes('a b c d e', 3), 8)
           AS sig""").collect()(0).getSeq[Long](0)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaApi = Seq("a b c d e").toDF("text")
      .select(graft.pipeline.DedupExprs.minhashSig(
        graft.pipeline.DedupExprs.shingleHash60(col("text"), 3), 8).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(viaSql == viaApi)
    // dot product + sorted intersect
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                graft_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L))
                  AS i""").collect()(0)
    assert(r.getDouble(0) == 11.0 && r.getInt(1) == 2)
    // the one-pass repetition kernel returns its stats struct
    val rep = spark.sql(
      """SELECT graft_repetition_stats('buy now buy now').n_tokens AS n,
                graft_repetition_stats('buy now buy now').top_count AS t,
                graft_repetition_stats('buy now buy now').d_2grams AS g"""
      ).collect()(0)
    assert(rep.getLong(0) == 4L && rep.getLong(1) == 2L && rep.getLong(2) == 2L)
  }

  test("normalization and z-value are callable from spark.sql") {
    GraftExtensions.register(spark)
    val n = spark.sql(
      "SELECT graft_normalize(concat(chr(160), 'a  b', chr(9))) AS n")
      .collect()(0).getString(0)
    assert(n == "a b")
    // interleave truth table: a=3 (bits 0,2), b=1 (bit 1) → 0111₂ = 7
    val z = spark.sql("SELECT graft_zvalue(3L, 1L, 2) AS z")
      .collect()(0).getLong(0)
    assert(z == 7L)
    // SQL == Scala API on a non-trivial pair
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaApi = Seq((12345L, 54321L)).toDF("a", "b")
      .select(graft.pipeline.Layout.zValue(col("a"), col("b"), 16).as("z"))
      .head().getLong(0)
    val viaSql = spark.sql("SELECT graft_zvalue(12345L, 54321L, 16) AS z")
      .head().getLong(0)
    assert(viaApi == viaSql)
  }

  test("graft_zvalue rejects bits outside [1,31], matching Layout.zValue") {
    GraftExtensions.register(spark)
    for (bad <- Seq(0, -1, 32, 64)) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT graft_zvalue(1L, 2L, $bad)").collect()
      }
      assert(e.getMessage.contains("[1,31]"),
        s"bits=$bad must raise the range error, got: ${e.getMessage}")
    }
  }
}
