package graft.core

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that PINS its child to one evaluation site. Marked
  * nondeterministic so the optimizer can neither push filters below the
  * projection computing it (PushDownPredicates requires deterministic
  * project lists), inline it into a join condition, duplicate it via
  * CollapseProject, nor prune-then-repush around it. A nondeterministic
  * MARKER COLUMN is not enough for any of this: column pruning strips an
  * unused marker and the pushdown re-fires (measured, r19 plan audit) —
  * the fence must be the expression carrying the value.
  *
  * The child IS deterministic — this is an optimizer fence, not a
  * semantics change — and codegen delegates straight to the child, so
  * runtime cost is zero. Used wherever the r19 audit found expensive
  * expressions (text-hash kernels, fold dots, label parse structs)
  * silently evaluated 2-12x per row by pushdown/inlining rewrites. */
final case class EvalOnceExpr(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_eval_once"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): EvalOnceExpr =
    copy(child = newChild)
}

object EvalOnce {
  /** [[EvalOnceExpr]] as a Column combinator. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(EvalOnceExpr(GraftColumnBridge.expression(c)))
}
