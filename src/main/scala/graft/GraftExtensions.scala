package graft

import graft.cond.{CondError, Ctx, Interp, Node, Parser, ParseValueExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Session extension registering the condition language as SQL functions,
  * so `spark.sql` users get the engine without the Scala API:
  *
  * {{{
  * spark.sql("""
  *   SELECT * FROM records
  *   WHERE graft_when('{"&score": {"$gt": 10}}', ts, labels, computed_labels)
  * """)
  * }}}
  *
  * The condition JSON must be a string literal: it is parsed and compiled
  * ONCE at analysis time into the same Catalyst expression tree the
  * DataFrame API produces (stateful operators are rejected here — they
  * need per-entry ordered execution, which a scalar predicate cannot
  * express; use QueryEngine for those).
  *
  * Install with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_when"),
      new ExpressionInfo("graft", "graft_when"),
      (children: Seq[Expression]) => buildWhen(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_parse_value"),
      new ExpressionInfo("graft", "graft_parse_value"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => ParseValueExpr(c)
        case _ => throw CondError("graft_parse_value(str) takes one argument")
      }))
    for ((name, builder) <- sketchFunctions)
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
  }
}

object GraftExtensions {

  /** Programmatic registration on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_when",
      (children: Seq[Expression]) => buildWhen(children), "scala_udf")
    reg.createOrReplaceTempFunction("graft_parse_value",
      (children: Seq[Expression]) => ParseValueExpr(children.head), "scala_udf")
    for ((name, builder) <- sketchFunctions)
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw CondError(s"$what must be an integer literal, got $other")
  }

  /** The native sketch kernels as SQL functions — the same codegen'd
    * expressions the pipeline operators use (graft.pipeline.DedupExprs),
    * so `spark.sql` users can build dedup/similarity pipelines without
    * the Scala API. */
  private val sketchFunctions: Seq[(String, Seq[Expression] => Expression)] =
    Seq(
      "graft_simhash64" -> {
        case Seq(text) => graft.pipeline.Simhash60Expr(text)
        case _ => throw CondError("graft_simhash64(text) takes one argument")
      },
      "graft_shingle_hashes" -> {
        case Seq(text, k) =>
          graft.pipeline.ShingleHash60Expr(text, litInt(k, "k"))
        case _ => throw CondError("graft_shingle_hashes(text, k) takes two arguments")
      },
      "graft_minhash_sig" -> {
        case Seq(hashes, n) =>
          graft.pipeline.MinhashSigExpr(hashes, litInt(n, "numHashes"))
        case _ => throw CondError("graft_minhash_sig(hashes, n) takes two arguments")
      },
      "graft_dot" -> {
        case Seq(a, b) => graft.pipeline.DotProductExpr(a, b)
        case _ => throw CondError("graft_dot(a, b) takes two arguments")
      },
      "graft_intersect_count" -> {
        case Seq(a, b) => graft.pipeline.SortedIntersectCountExpr(a, b)
        case _ => throw CondError("graft_intersect_count(a, b) takes two arguments")
      },
      "graft_repetition_stats" -> {
        case Seq(text) => graft.pipeline.RepetitionStatsExpr(text)
        case _ => throw CondError("graft_repetition_stats(text) takes one argument")
      },
      // Column-layer ops rebuilt as raw catalyst trees: the Column →
      // Expression bridge yields an unevaluable ColumnNode wrapper on
      // the SQL-registry path, so the SQL twins construct the SAME
      // operator chain directly (parity pinned in GraftExtensionsSpec)
      "graft_normalize" -> {
        case Seq(text) =>
          import org.apache.spark.sql.catalyst.expressions.{RegExpReplace, StringTrim}
          def s(x: String) = Literal(UTF8String.fromString(x), StringType)
          StringTrim(RegExpReplace(RegExpReplace(RegExpReplace(text,
            s("[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}\\x{7F}]"), s("")),
            s("[\\x{00A0}\\x{2000}-\\x{200B}\\x{202F}\\x{3000}]"), s(" ")),
            s("\\s+"), s(" ")))
        case _ => throw CondError("graft_normalize(text) takes one argument")
      },
      "graft_zvalue" -> {
        case Seq(a0, b0, bitsE) =>
          import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, ShiftLeft, ShiftRightUnsigned}
          import org.apache.spark.sql.types.LongType
          val bits = litInt(bitsE, "bits")
          // Mirror Layout.zValue's require(1..31): bits<=0 would
          // silently return 0 and bits>31 wraps shift amounts mod 64.
          if (bits < 1 || bits > 31)
            throw CondError(s"graft_zvalue bits must be in [1,31], got $bits")
          val a = Cast(a0, LongType)
          val b = Cast(b0, LongType)
          (0 until bits).foldLeft[Expression](Literal(0L)) { (acc, i) =>
            BitwiseOr(BitwiseOr(acc,
              ShiftLeft(BitwiseAnd(ShiftRightUnsigned(a, Literal(i)),
                Literal(1L)), Literal(2 * i))),
              ShiftLeft(BitwiseAnd(ShiftRightUnsigned(b, Literal(i)),
                Literal(1L)), Literal(2 * i + 1)))
          }
        case _ => throw CondError("graft_zvalue(a, b, bits) takes three arguments")
      })

  private[graft] def buildWhen(children: Seq[Expression]): Expression = {
    children match {
      case Seq(condExpr, ts, labels, computed) =>
        val json = condExpr match {
          case Literal(s: UTF8String, _) => s.toString
          case other => throw CondError(
            s"graft_when condition must be a string literal, got $other")
        }
        val parsed = Parser.parse(json)
        if (Node.isStateful(parsed.root))
          throw CondError(
            "graft_when cannot evaluate stateful operators ($each_n/$each_t/$gate/$limit); use QueryEngine")
        GraftWhenExpr(json, ts, labels, computed)
      case _ =>
        throw CondError(
          "graft_when(condJson, ts, labels, computed_labels) takes 4 arguments")
    }
  }
}

/** Row-level `when` evaluation for the SQL surface. Runs the interpreter
  * (non-strict: errors → false). The DataFrame API compiles conditions to
  * native expressions instead; this is the convenience form for ad-hoc
  * SQL, one virtual call per row (CodegenFallback keeps the surrounding
  * operator in whole-stage codegen).
  */
final case class GraftWhenExpr(condJson: String, ts: Expression,
    labels: Expression, computed: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(ts, labels, computed)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  @transient private lazy val interp = new Interp(Parser.parse(condJson).root)

  private def toMap(m: Any): Map[String, String] = m match {
    case null => Map.empty
    case md: MapData =>
      val b = Map.newBuilder[String, String]
      md.foreach(StringType, StringType, (k, v) =>
        if (k != null && v != null)
          b += (k.asInstanceOf[UTF8String].toString ->
            v.asInstanceOf[UTF8String].toString))
      b.result()
    case _ => Map.empty
  }

  override def eval(input: InternalRow): Any = {
    val tsV = ts.eval(input)
    if (tsV == null) return false
    val ctx = Ctx(tsV.asInstanceOf[Long],
      toMap(labels.eval(input)), toMap(computed.eval(input)))
    try interp(ctx).asBool
    catch { case _: CondError => false }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftWhenExpr =
    copy(ts = newChildren(0), labels = newChildren(1), computed = newChildren(2))
}
