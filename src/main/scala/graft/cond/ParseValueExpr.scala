package graft.cond

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[ParseValueExpr]] — shares the exact `Value::parse`
  * semantics with the interpreter (value.rs:51-61): bool → i64 → f64 →
  * string precedence, i64 overflow falling over to float.
  */
object ParseValueRuntime {
  val structType: StructType = StructType(Seq(
    StructField("k", IntegerType, nullable = false),
    StructField("i", LongType, nullable = true),
    StructField("f", DoubleType, nullable = true),
    StructField("s", StringType, nullable = true)))

  def parse(s: UTF8String): InternalRow = Value.parse(s.toString) match {
    case Value.BoolV(b) =>
      new GenericInternalRow(Array[Any](0, if (b) 1L else 0L, null, null))
    case Value.IntV(i) =>
      new GenericInternalRow(Array[Any](1, i, null, null))
    case Value.FloatV(f) =>
      new GenericInternalRow(Array[Any](2, null, f, null))
    case _ =>
      new GenericInternalRow(Array[Any](3, null, null, s))
  }
}

/** `Value::parse` as a native Catalyst expression.
  *
  * Why not built-ins: the equivalent regex + try_cast `when` cascade is
  * correct but ~10 KB of generated Java per use site, and predicate
  * pushdown re-inlines it at every reference — real conditions then
  * overflow the JVM's 64 KB method limit and silently fall out of
  * whole-stage codegen. This expression generates a single static call, so
  * a condition referencing a label N times stays a few hundred bytes and
  * the surrounding filter keeps codegen.
  */
final case class ParseValueExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ParseValueRuntime.structType
  override def prettyName: String = "graft_parse_value"

  override protected def nullSafeEval(input: Any): Any =
    ParseValueRuntime.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.cond.ParseValueRuntime.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): ParseValueExpr =
    copy(child = newChild)
}

object ParseValueExpr {
  /** Column-level entry point used by the compiler. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(ParseValueExpr(GraftColumnBridge.expression(c)))
}
