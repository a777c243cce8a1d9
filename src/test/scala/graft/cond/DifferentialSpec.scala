package graft.cond

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzzing: the Catalyst-compiled path and the row
  * interpreter must produce the same matching set for any *pure* condition
  * tree over any labels. The interpreter is pinned to the reference by the
  * golden tables, so this transitively pins the compiled path — it has
  * already caught real bugs (Kleene-vs-sequential error propagation in
  * `$or`, Spark NaN ordering, Java vs Rust float Display).
  */
class DifferentialSpec extends AnyFunSuite with SparkTestBase {

  private val labelNames = Seq("a", "b", "c")

  private val genLeaf: Gen[Node] = Gen.oneOf(
    Gen.oneOf(labelNames).map(Node.LabelRef(_)),
    Gen.chooseNum(-20L, 20L).map(v => Node.Const(Value.IntV(v))),
    Gen.chooseNum(-5.0, 5.0).map(v => Node.Const(Value.FloatV(v))),
    Gen.oneOf("x", "7", "true", "-3.5", "").map(v => Node.Const(Value.StrV(v))),
    Gen.oneOf(true, false).map(v => Node.Const(Value.BoolV(v))),
    Gen.const(Node.Op("$timestamp", Nil)))

  private def genTree(depth: Int): Gen[Node] =
    if (depth == 0) genLeaf
    else Gen.frequency(
      2 -> genLeaf,
      3 -> (for {
        op <- Gen.oneOf("$eq", "$ne", "$gt", "$gte", "$lt", "$lte")
        l <- genTree(depth - 1); r <- genTree(depth - 1)
      } yield Node.Op(op, List(l, r))),
      2 -> (for {
        op <- Gen.oneOf("$add", "$sub", "$mult", "$div", "$div_num", "$rem")
        l <- genTree(depth - 1); r <- genTree(depth - 1)
      } yield Node.Op(op, List(l, r))),
      2 -> (for {
        op <- Gen.oneOf("$and", "$or", "$not", "$xor", "$in", "$nin")
        n <- Gen.chooseNum(2, 3)
        cs <- Gen.listOfN(n, genTree(depth - 1))
      } yield Node.Op(op, cs)),
      1 -> (for {
        op <- Gen.oneOf("$contains", "$starts_with", "$ends_with")
        l <- genTree(depth - 1); r <- genTree(depth - 1)
      } yield Node.Op(op, List(l, r))),
      1 -> (for {
        c <- genTree(depth - 1)
        t <- Gen.oneOf("bool", "int", "float", "string", "duration")
      } yield Node.Op("$cast", List(c, Node.Const(Value.StrV(t))))),
      1 -> genTree(depth - 1).map(c => Node.Op("$abs", List(c))),
      1 -> (for {
        h <- Gen.oneOf("$hour", "$day", "$weekday", "$month", "$minute",
          "$second", "$year")
        // tz operand: absent, valid, strictly-invalid (ZoneId.of rejects
        // "EST" and "Bogus/Zone" -> per-record error -> false on both
        // paths), or label-driven (often a non-string -> error)
        tz <- Gen.oneOf[List[Node]](Nil,
          List(Node.Const(Value.StrV("Europe/Berlin"))),
          List(Node.Const(Value.StrV("UTC"))),
          List(Node.Const(Value.StrV("Bogus/Zone"))),
          List(Node.Const(Value.StrV("EST"))),
          List(Node.LabelRef("a")))
      } yield Node.Op(h, Node.Op("$timestamp", Nil) :: tz)),
      1 -> (for {
        op <- Gen.oneOf("$exists", "$has")
        names <- Gen.nonEmptyListOf(Gen.oneOf(labelNames :+ "zz"))
      } yield Node.Op(op,
        names.take(3).map(n => Node.Const(Value.StrV(n))))),
      1 -> Gen.oneOf(labelNames :+ "zz").map(n =>
        Node.Op("$ref", List(Node.Const(Value.StrV(n))))))

  private val genLabels: Gen[Map[String, String]] = for {
    n <- Gen.chooseNum(0, 3)
    names <- Gen.pick(n, labelNames)
    values <- Gen.listOfN(n, Gen.oneOf(
      "1", "-7", "3.25", "true", "false", "xyz", "", "1e3", "0",
      "9999999999999999999999"))
  } yield names.zip(values).toMap

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("compiled predicate == interpreter verdict on random pure trees") {
    val rows = (0 until 40).map { i =>
      (i.toLong * 1000003L, sample(genLabels, 7000L + i))
    }
    val schema = StructType(Seq(
      StructField("ts", LongType),
      StructField("labels", MapType(StringType, StringType)),
      StructField("computed_labels", MapType(StringType, StringType))))
    val data = new java.util.ArrayList[Row](rows.size)
    rows.foreach { case (ts, l) => data.add(Row(ts, l, Map.empty[String, String])) }
    val df = spark.createDataFrame(data, schema).cache()
    val cols = CondCompiler.Cols(col("ts"), col("labels"), col("computed_labels"))

    var tested = 0
    var seed = 0L
    while (tested < 400) {
      seed += 1
      val tree = sample(genTree(if (seed % 4 == 0) 4 else 3), seed)
      if (!Node.isStateful(tree)) {
        tested += 1
        val interp = new Interp(tree)
        val expected = rows.filter { case (ts, labels) =>
          try interp(Ctx(ts, labels)).asBool
          catch { case _: CondError => false }
        }.map(_._1).toSet
        val pred = CondCompiler.compilePredicate(tree, cols)
        val actual = df.filter(pred).select("ts").collect()
          .map(_.getLong(0)).toSet
        assert(actual == expected,
          s"seed=$seed tree=$tree\nexpected=${expected.toSeq.sorted}\nactual=${actual.toSeq.sorted}")
      }
    }
  }
}
