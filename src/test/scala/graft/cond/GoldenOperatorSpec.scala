package graft.cond

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's per-operator golden table (condition/parser.rs:699-812),
  * evaluated BOTH through the row interpreter and through the Catalyst
  * compiler — the two execution paths must agree with the reference.
  * Fixture context: ts=0, labels={label: "10"} (parser.rs:820-825).
  */
class GoldenOperatorSpec extends AnyFunSuite with SparkTestBase {

  private val ctx = Ctx(0L, Map("label" -> "10"))

  // (operator, operands-json, expected-value-literal-as-json)
  private val cases: Seq[(String, String, String)] = Seq(
    ("$each_n", "[1]", "true"),
    ("$each_t", "[1]", "false"),
    ("$gate", "[\"10s\", true]", "true"),
    ("$limit", "[1]", "true"),
    ("$add", "[1, 2.0]", "3.0"),
    ("$sub", "[1, 2]", "-1"),
    ("$mult", "[2, 3]", "6"),
    ("$div", "[3, 2]", "1.5"),
    ("$div_num", "[3, 2]", "1"),
    ("$rem", "[-10, 6]", "-4"),
    ("$abs", "[-10]", "10"),
    ("$and", "[true, false]", "false"),
    ("$all_of", "[true, false]", "false"),
    ("$or", "[true, false]", "true"),
    ("$any_of", "[true, false]", "true"),
    ("$not", "[true]", "false"),
    ("$none_of", "[true, true]", "false"),
    ("$xor", "[true, true]", "false"),
    ("$one_of", "[true, true]", "false"),
    ("$in", "[\"a\", \"a\", \"b\"]", "true"),
    ("$nin", "[\"a\", \"a\", \"b\"]", "false"),
    ("$eq", "[10, 10]", "true"),
    ("$gt", "[20, 10]", "true"),
    ("$gte", "[20, 10]", "true"),
    ("$lt", "[20, 10]", "false"),
    ("$lte", "[20, 10]", "false"),
    ("$ne", "[-10, 10]", "true"),
    ("$second", "[1704067200123456]", "0"),
    ("$second", "[1704067200123456, \"Europe/Berlin\"]", "0"),
    ("$minute", "[1704067200123456]", "0"),
    ("$minute", "[1704067200123456, \"Europe/Berlin\"]", "0"),
    ("$hour", "[1704067200123456]", "0"),
    ("$hour", "[1704067200123456, \"Europe/Berlin\"]", "1"),
    ("$day", "[1704067200123456]", "1"),
    ("$day", "[1704067200123456, \"America/New_York\"]", "31"),
    ("$month", "[1704067200123456]", "1"),
    ("$month", "[1704067200123456, \"America/New_York\"]", "12"),
    ("$year", "[1704067200123456]", "2024"),
    ("$year", "[1704067200123456, \"America/New_York\"]", "2023"),
    ("$weekday", "[1704067200123456]", "0"),
    ("$weekday", "[1704067200123456, \"America/New_York\"]", "6"),
    ("$contains", "[\"abc\", \"b\"]", "true"),
    ("$starts_with", "[\"abc\", \"ab\"]", "true"),
    ("$ends_with", "[\"abc\", \"bc\"]", "true"),
    ("$exists", "[\"label\"]", "true"),
    ("$has", "[\"label\"]", "true"),
    ("$cast", "[10.0, \"int\"]", "true && {\"$eq\": [{\"$cast\": [10.0, \"int\"]}, 10]}" ), // handled below
    ("$ref", "[\"label\"]", "10"),
    ("$timestamp", "[]", "0"),
    ("$id", "[]", "0"))

  private def conditionJson(op: String, operands: String, expected: String): String =
    if (op == "$cast") """{"$eq":[10, {"$cast": [10.0, "int"]}]}"""
    else s"""{"$$eq":[$expected, {"$op": $operands }]}"""

  test("interpreter matches the reference golden table") {
    for ((op, operands, expected) <- cases) {
      val json = conditionJson(op, operands, expected)
      val parsed = Parser.parse(json)
      val interp = new Interp(parsed.root)
      assert(interp(ctx).asBool, s"$op $operands (interp)")
    }
  }

  test("catalyst compiler matches the reference golden table (pure ops)") {
    val schema = StructType(Seq(
      StructField("ts", LongType),
      StructField("labels", MapType(StringType, StringType)),
      StructField("computed_labels", MapType(StringType, StringType))))
    val df = spark.createDataFrame(
      java.util.List.of(Row(0L, Map("label" -> "10"), Map.empty[String, String])),
      schema)
    val cols = CondCompiler.Cols(col("ts"), col("labels"), col("computed_labels"))
    for ((op, operands, expected) <- cases if !Node.isStateful(
        Parser.parse(conditionJson(op, operands, expected)).root)) {
      val parsed = Parser.parse(conditionJson(op, operands, expected))
      val pred = CondCompiler.compilePredicate(parsed.root, cols)
      val n = df.filter(pred).count()
      assert(n == 1L, s"$op $operands (compiled)")
    }
  }

  test("fixture condition examples (FIXTURES.md §3)") {
    def evalB(json: String, c: Ctx = ctx): Boolean =
      new Interp(Parser.parse(json).root)(c).asBool
    assert(evalB("""{"$and": [true, {"$gt": [20, 10]}]}"""))
    assert(evalB("""{"&label": {"$gt": 5}}""", Ctx(0, Map("label" -> "20"))))
    assert(evalB("""{"$eq": ["1h", 3600000000]}""")) // duration literal
    assert(evalB("""{"$eq": [{"$rem": [-10, 6]}, -4]}"""))
    assert(evalB("""{"$eq": [{"$div": [3, 2]}, 1.5]}"""))
    assert(evalB("""{"$eq": [{"$div_num": [3, 2]}, 1]}"""))
    assert(evalB("""{"$eq": [{"$hour": [1704067200123456, "Europe/Berlin"]}, 1]}"""))
    // strict error fixture
    assertThrows[CondError](
      evalB("""{"$gt": [1, "&NOT_EXIST"]}"""))
    // $$-escape and unknown-$ literal
    assert(evalB("""{"&dollar": {"$eq": "$$abc"}}""",
      Ctx(0, Map("dollar" -> "$abc"))))
    assertThrows[CondError](Parser.parse("""{"$eq": ["$bogus", 1]}"""))
  }

  test("object syntax, implicit and, directives extraction") {
    val parsed = Parser.parse(
      """{"#ctx_before": 2, "&label": {"$gt": 5}, "$limit": [100]}""")
    assert(parsed.directives.single("#ctx_before").contains(Value.IntV(2)))
    parsed.root match {
      case Node.Op("$and", children) => assert(children.size == 2)
      case other => fail(s"unexpected root $other")
    }
    // duplicate object keys: later value wins (serde_json preserve_order)
    val dup = Parser.parse("""{"$eq": [1, 1], "$eq": [1, 2]}""")
    assert(!new Interp(dup.root)(Ctx(0, Map.empty)).asBool)
    // duration directive value
    val d2 = Parser.parse("""{"#ctx_after": "1s"}""")
    assert(d2.directives.single("#ctx_after").contains(Value.DurV(1000000L)))
    assertThrows[CondError](Parser.parse("""{"#bogus": 1}"""))
  }
}
