package graft.cond

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for the dynamic-value operators over the tagged struct encoding.
  *
  * Delegates to the exact [[Value]] methods the interpreter uses (same
  * coercion lattice, same error cases), so the compiled and interpreted
  * paths cannot diverge. Errors (string arithmetic, ÷0, unparsable casts —
  * the reference's unprocessable_entity cases) return null, which the
  * non-strict predicate wrapper treats as false (filters/when.rs:81-95).
  *
  * Why native expressions: composing these semantics out of built-in
  * `when` cascades duplicates each operand subtree ~6× per operator level —
  * nested arithmetic like `(&a * 2 + &b) % 3` overflows the JVM 64KB
  * codegen limit and silently drops the filter out of whole-stage codegen.
  * Each of these generates a single static call instead.
  */
object DynOps {
  import Value._

  def toValue(r: InternalRow): Value = r.getInt(0) match {
    case 0 => BoolV(r.getLong(1) != 0L)
    case 1 => IntV(r.getLong(1))
    case 2 => FloatV(r.getDouble(2))
    case 4 => DurV(r.getLong(1))
    case _ => StrV(r.getUTF8String(3).toString)
  }

  def toRow(v: Value): InternalRow = v match {
    case BoolV(b)  => new GenericInternalRow(Array[Any](0, if (b) 1L else 0L, null, null))
    case IntV(i)   => new GenericInternalRow(Array[Any](1, i, null, null))
    case FloatV(f) => new GenericInternalRow(Array[Any](2, null, f, null))
    case StrV(s)   => new GenericInternalRow(Array[Any](3, null, null, UTF8String.fromString(s)))
    case DurV(us)  => new GenericInternalRow(Array[Any](4, us, null, null))
  }

  /** Binary ops returning a dynamic value; null on evaluation error. */
  def bin(op: String, a: InternalRow, b: InternalRow): InternalRow =
    try {
      val x = toValue(a); val y = toValue(b)
      toRow(op match {
        case "$add"     => x.add(y)
        case "$sub"     => x.sub(y)
        case "$mult"    => x.mult(y)
        case "$div"     => x.div(y)
        case "$div_num" => x.divNum(y)
        case "$rem"     => x.rem(y)
        case "$castdyn" => x.cast(y.show) // dynamic-target $cast
        case other      => throw CondError(s"unknown op $other")
      })
    } catch { case _: CondError => null }

  /** Comparisons; null on evaluation error (never thrown by cmp itself —
    * unordered string/number comparisons are plain false, cmp.rs:40-70). */
  def cmp(op: String, a: InternalRow, b: InternalRow): java.lang.Boolean =
    try {
      val x = toValue(a); val y = toValue(b)
      java.lang.Boolean.valueOf(op match {
        case "$eq"  => x.valueEq(y)
        case "$ne"  => !x.valueEq(y)
        case "$gt"  => x.partialCmp(y).exists(_ > 0)
        case "$gte" => x.partialCmp(y).exists(_ >= 0)
        case "$lt"  => x.partialCmp(y).exists(_ < 0)
        case "$lte" => x.partialCmp(y).exists(_ <= 0)
        case other  => throw CondError(s"unknown op $other")
      })
    } catch { case _: CondError => null }

  /** Unary ops; return type depends on op (see [[DynUnaryExpr]]). */
  def un(op: String, a: InternalRow): AnyRef =
    try {
      val v = toValue(a)
      op match {
        case "abs"      => toRow(v.abs)
        case "truthy"   => java.lang.Boolean.valueOf(v.asBool)
        case "show"     => UTF8String.fromString(v.show)
        case "as_int"   => java.lang.Long.valueOf(v.asInt)
        case "as_float" => java.lang.Double.valueOf(v.asFloat)
        case c if c.startsWith("cast:") => toRow(v.cast(c.substring(5)))
        case other => throw CondError(s"unknown op $other")
      }
    } catch { case _: CondError => null }

  /** Zone-id gate for the date operators: the string itself when it is a
    * valid strict IANA `ZoneId.of` id, else null. Matches the interpreter's
    * validity check (Interp.dateOp), where an invalid tz is a CondError →
    * false in non-strict mode — whereas a raw `from_utc_timestamp` on an
    * invalid zone throws [INVALID_TIMEZONE] even with ANSI off and would
    * kill the whole distributed query. */
  def validZone(tz: UTF8String): UTF8String =
    if (tz == null) null
    else
      try { java.time.ZoneId.of(tz.toString); tz }
      catch { case _: Exception => null }

  // Column-level constructors
  def binCol(op: String, a: Column, b: Column): Column =
    GraftColumnBridge.column(DynBinExpr(op,
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def cmpCol(op: String, a: Column, b: Column): Column =
    GraftColumnBridge.column(DynCmpExpr(op,
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def unCol(op: String, a: Column): Column =
    GraftColumnBridge.column(DynUnaryExpr(op, GraftColumnBridge.expression(a)))
  def validZoneCol(a: Column): Column =
    GraftColumnBridge.column(ValidZoneExpr(GraftColumnBridge.expression(a)))
}

/** String → same string if a strict-valid zone id, else null. */
final case class ValidZoneExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_valid_zone"

  override protected def nullSafeEval(a: Any): Any =
    DynOps.validZone(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.cond.DynOps.validZone($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): ValidZoneExpr =
    copy(child = newChild)
}

/** Arithmetic over two dynamic values → dynamic value. */
final case class DynBinExpr(op: String, left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ParseValueRuntime.structType
  override def nullable: Boolean = true
  override def prettyName: String = s"graft_dyn_$op"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DynOps.bin(op, a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.cond.DynOps.bin("$op", $a, $b);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DynBinExpr =
    copy(left = l, right = r)
}

/** Comparison over two dynamic values → boolean (null = error). */
final case class DynCmpExpr(op: String, left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = s"graft_dyn_$op"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = DynOps.cmp(op, a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
    if (r == null) null else r.booleanValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Boolean ${ev.value}_r = graft.cond.DynOps.cmp("$op", $a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.booleanValue(); }""")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DynCmpExpr =
    copy(left = l, right = r)
}

/** Unary dynamic ops; output type depends on the op. */
final case class DynUnaryExpr(op: String, child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = op match {
    case "truthy"   => BooleanType
    case "show"     => StringType
    case "as_int"   => LongType
    case "as_float" => DoubleType
    case _          => ParseValueRuntime.structType // abs, cast:*
  }
  override def nullable: Boolean = true
  override def prettyName: String = s"graft_dyn_$op"

  override protected def nullSafeEval(a: Any): Any =
    DynOps.un(op, a.asInstanceOf[InternalRow]) match {
      case null => null
      case b: java.lang.Boolean => b.booleanValue()
      case l: java.lang.Long    => l.longValue()
      case d: java.lang.Double  => d.doubleValue()
      case other => other
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val unbox = dataType match {
        case BooleanType => s"((java.lang.Boolean) ${ev.value}_r).booleanValue()"
        case LongType    => s"((java.lang.Long) ${ev.value}_r).longValue()"
        case DoubleType  => s"((java.lang.Double) ${ev.value}_r).doubleValue()"
        case StringType  => s"(org.apache.spark.unsafe.types.UTF8String) ${ev.value}_r"
        case _           => s"(InternalRow) ${ev.value}_r"
      }
      s"""
      Object ${ev.value}_r = graft.cond.DynOps.un("$op", $c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $unbox; }"""
    })

  override protected def withNewChildInternal(newChild: Expression): DynUnaryExpr =
    copy(child = newChild)
}
