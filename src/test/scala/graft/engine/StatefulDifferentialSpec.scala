package graft.engine

import graft.SparkTestBase
import graft.cond._
import org.apache.spark.sql.{DataFrame, Row}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzzing for the STATEFUL tree class with two independent
  * executions: trailing constant `$each_n`/`$limit` conjunctions lower to
  * cumulative window arithmetic (QueryEngine.trailingFlag), and the same
  * trees also run on the sequential per-entry interpreter chain
  * (StatefulKernel). The two implementations share no code past the
  * parser, so agreement on random trees pins the subtle part — which rows
  * tick which counters — the same way DifferentialSpec pins the pure
  * compiler against the interpreter.
  */
class StatefulDifferentialSpec extends AnyFunSuite with SparkTestBase {

  private val labelNames = Seq("a", "b")

  private val genLeaf: Gen[Node] = Gen.oneOf(
    Gen.oneOf(labelNames).map(Node.LabelRef(_)),
    Gen.chooseNum(-10L, 10L).map(v => Node.Const(Value.IntV(v))),
    Gen.oneOf("3", "true", "x").map(v => Node.Const(Value.StrV(v))))

  private def genPure(depth: Int): Gen[Node] =
    if (depth == 0) genLeaf
    else Gen.frequency(
      2 -> genLeaf,
      3 -> (for {
        op <- Gen.oneOf("$eq", "$ne", "$gt", "$gte", "$lt", "$lte")
        l <- genPure(depth - 1); r <- genPure(depth - 1)
      } yield Node.Op(op, List(l, r))),
      2 -> (for {
        op <- Gen.oneOf("$and", "$or", "$not")
        n <- Gen.chooseNum(2, 3)
        cs <- Gen.listOfN(n, genPure(depth - 1))
      } yield Node.Op(op, cs)),
      1 -> (for {
        op <- Gen.oneOf("$add", "$rem")
        l <- genPure(depth - 1); r <- genPure(depth - 1)
      } yield Node.Op(op, List(l, r))))

  private val genTrailing: Gen[List[Node.Op]] = for {
    n <- Gen.chooseNum(1, 2)
    ops <- Gen.listOfN(n, Gen.oneOf(
      Gen.chooseNum(1L, 4L).map(k =>
        Node.Op("$each_n", List(Node.Const(Value.IntV(k))))),
      Gen.chooseNum(0L, 5L).map(k =>
        Node.Op("$limit", List(Node.Const(Value.IntV(k)))))))
  } yield ops

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def recordsDf(seed: Long): DataFrame = {
    import scala.jdk.CollectionConverters._
    val labelVals = Seq("1", "-3", "3", "true", "x", "")
    val rows = (0 until 60).map { i =>
      val e = s"e${(seed + i) % 3}"
      val labels = labelNames.zipWithIndex.flatMap { case (n, j) =>
        if ((seed + i + j) % 4 == 0) None
        else Some(n -> labelVals(((seed + i) * (j + 2) % labelVals.size).toInt))
      }.toMap
      Row("b", e, i.toLong * 100L, labels, Map.empty[String, String],
        "", graft.core.Records.State.Finished, Array[Byte]())
    }.asJava
    spark.createDataFrame(rows, graft.core.Records.schema)
  }

  test("window lowering == sequential kernel on random trailing-stateful trees") {
    val df = recordsDf(0L).cache()
    df.count()
    var tested = 0
    var seed = 100L
    while (tested < 60) {
      seed += 1
      val pure = sample(genPure(2), seed)
      if (!Node.isStateful(pure)) {
        val trailing = sample(genTrailing, seed * 31)
        val tree = Node.Op("$and", List(pure) ++ trailing)
        val json = Node.render(tree)
        tested += 1
        val viaWindow = QueryEngine.matching(df,
          QuerySpec(when = Some(json)))
          .select("entry", "ts").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet
        val viaKernel = StatefulKernel.run(df, Parser.parse(json), strict = false)
          .select("entry", "ts").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet
        assert(viaWindow == viaKernel,
          s"seed=$seed when=$json\nwindow=${viaWindow.toSeq.sorted}\nkernel=${viaKernel.toSeq.sorted}")
      }
    }
  }
}
