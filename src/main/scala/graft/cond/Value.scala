package graft.cond

/** Evaluation error in the condition engine (maps to the reference's
  * `unprocessable_entity` / `not_found` errors). In non-strict mode the
  * enclosing filter absorbs it as `false`; in strict mode it aborts the query.
  *
  * Reference: reductstore/src/storage/query/filters/when.rs:81-95
  */
final case class CondError(msg: String) extends RuntimeException(msg)

/** `$limit` exhausted — cleanly terminates the whole query.
  * Reference: operators/aggregation/limit.rs:30-43 (ErrorCode::Interrupt).
  */
final class InterruptSignal extends RuntimeException("interrupt")

/** Dynamic value model of the condition language.
  *
  * Five variants with lazy string parsing and cross-type coercion, a faithful
  * re-expression of the reference's `Value`
  * (reductstore/src/storage/query/condition/value.rs:33-39 and submodules).
  * Used by the row-level interpreter (stateful operators) and by unit tests;
  * the distributed path compiles the same semantics to Catalyst columns
  * (see [[graft.cond.DynCol]]).
  */
sealed trait Value {
  import Value._

  def isString: Boolean = this.isInstanceOf[StrV]
  def isDuration: Boolean = this.isInstanceOf[DurV]

  /** Truthiness: non-zero / non-empty (value.rs:66-73). */
  def asBool: Boolean = this match {
    case BoolV(b)  => b
    case IntV(i)   => i != 0L
    case DurV(i)   => i != 0L
    case FloatV(f) => f != 0.0
    case StrV(s)   => s.nonEmpty
  }

  /** value.rs:78-97: bool→0/1, float truncates, string must parse as i64. */
  def asInt: Long = this match {
    case BoolV(b)  => if (b) 1L else 0L
    case IntV(i)   => i
    case DurV(i)   => i
    case FloatV(f) => f.toLong
    case StrV(s) =>
      parseI64(s).getOrElse(
        throw CondError(s"Value '$s' could not be parsed as integer"))
  }

  /** value.rs:99-117. */
  def asFloat: Double = this match {
    case BoolV(b)  => if (b) 1.0 else 0.0
    case IntV(i)   => i.toDouble
    case DurV(i)   => i.toDouble
    case FloatV(f) => f
    case StrV(s) =>
      parseF64(s).getOrElse(
        throw CondError(s"Value '$s' could not be parsed as float"))
  }

  /** Rust `Display` (value.rs:131-141): floats use shortest round-trip form
    * without a trailing ".0"; durations use the `1d 2h` format.
    */
  def show: String = this match {
    case BoolV(b)  => if (b) "true" else "false"
    case IntV(i)   => i.toString
    case FloatV(f) => formatRustF64(f)
    case StrV(s)   => s
    case DurV(us)  => formatDuration(us)
  }

  /** PartialEq (value/cmp.rs:6-38): bool/int/float/duration mutually
    * comparable; string equals only string.
    */
  def valueEq(other: Value): Boolean = (this, other) match {
    case (StrV(a), StrV(b)) => a == b
    case (StrV(_), _)       => false
    case (_, StrV(_))       => false
    case (a, b) =>
      if (a.isInstanceOf[FloatV] || b.isInstanceOf[FloatV]) a.asFloat == b.asFloat
      else a.asInt == b.asInt
  }

  /** PartialOrd (value/cmp.rs:40-70): None (unordered) for string vs
    * non-string — every comparison over None is false.
    */
  def partialCmp(other: Value): Option[Int] = (this, other) match {
    case (StrV(a), StrV(b)) => Some(a.compareTo(b))
    case (StrV(_), _)       => None
    case (_, StrV(_))       => None
    case (a, b) =>
      if (a.isInstanceOf[FloatV] || b.isInstanceOf[FloatV]) {
        val (x, y) = (a.asFloat, b.asFloat)
        if (x.isNaN || y.isNaN) None // Rust f64 partial_cmp: NaN is unordered
        else Some(java.lang.Double.compare(x, y))
      } else Some(java.lang.Long.compare(a.asInt, b.asInt))
  }

  /** value/arithmetic/add.rs:26-79: string+string concat, numeric otherwise,
    * float promotes; string+non-string errors.
    */
  def add(other: Value): Value = (this, other) match {
    case (StrV(a), StrV(b)) => StrV(a + b)
    case (a, b) if a.isString || b.isString =>
      throw CondError(arithErr("add", a, b))
    case (a, b) =>
      if (a.isInstanceOf[FloatV] || b.isInstanceOf[FloatV])
        FloatV(a.asFloat + b.asFloat)
      else IntV(a.asInt + b.asInt)
  }

  /** value/arithmetic/sub.rs. */
  def sub(other: Value): Value = (this, other) match {
    case (a, b) if a.isString || b.isString =>
      throw CondError(arithErr("subtract", a, b))
    case (a, b) =>
      if (a.isInstanceOf[FloatV] || b.isInstanceOf[FloatV])
        FloatV(a.asFloat - b.asFloat)
      else IntV(a.asInt - b.asInt)
  }

  /** value/arithmetic/mult.rs. */
  def mult(other: Value): Value = (this, other) match {
    case (a, b) if a.isString || b.isString =>
      throw CondError(arithErr("multiply", a, b))
    case (a, b) =>
      if (a.isInstanceOf[FloatV] || b.isInstanceOf[FloatV])
        FloatV(a.asFloat * b.asFloat)
      else IntV(a.asInt * b.asInt)
  }

  /** `$div` is always float division (value/arithmetic/div.rs:26-46). */
  def div(other: Value): Value = {
    if (this.isString) throw CondError("Cannot divide string")
    if (other.isString) throw CondError("Cannot divide by string")
    val d = other.asFloat
    if (d == 0.0) throw CondError("Cannot divide by zero")
    FloatV(this.asFloat / d)
  }

  /** `$div_num` is integer division (value/arithmetic/div_num.rs:25-45). */
  def divNum(other: Value): Value = {
    if (this.isString) throw CondError("Cannot divide string")
    if (other.isString) throw CondError("Cannot divide by string")
    val d = other.asInt
    if (d == 0L) throw CondError("Cannot divide by zero")
    IntV(this.asInt / d)
  }

  /** Truncated remainder, float-promoting (value/arithmetic/rem.rs:28-66). */
  def rem(other: Value): Value = (this, other) match {
    case (a, b) if a.isString || b.isString =>
      throw CondError("Cannot divide by string")
    case (a, b) =>
      if (a.isInstanceOf[FloatV] || b.isInstanceOf[FloatV])
        FloatV(a.asFloat % b.asFloat)
      else {
        val d = b.asInt
        if (d == 0L) throw CondError("Cannot divide by zero")
        IntV(a.asInt % d)
      }
  }

  /** value/arithmetic/abs.rs: bool→int, int/float/duration keep type. */
  def abs: Value = this match {
    case BoolV(b)  => IntV(if (b) 1L else 0L)
    case IntV(i)   => IntV(math.abs(i))
    case FloatV(f) => FloatV(math.abs(f))
    case DurV(i)   => DurV(math.abs(i))
    case StrV(_) =>
      throw CondError("Cannot calculate absolute value of a string")
  }

  /** `$cast` targets (value/misc/cast.rs:26-35). */
  def cast(typeName: String): Value = typeName match {
    case "bool"     => BoolV(asBool)
    case "int"      => IntV(asInt)
    case "float"    => FloatV(asFloat)
    case "string"   => StrV(show)
    case "duration" => DurV(asInt)
    case other      => throw CondError(s"Unknown type '$other'")
  }
}

object Value {
  final case class BoolV(v: Boolean) extends Value
  final case class IntV(v: Long) extends Value
  final case class FloatV(v: Double) extends Value
  final case class StrV(v: String) extends Value
  /** Microseconds; behaves as Int in arithmetic/comparison. */
  final case class DurV(us: Long) extends Value

  private def arithErr(op: String, a: Value, b: Value): String =
    s"Cannot $op ${kind(a)} and ${kind(b)}"
  private def kind(v: Value): String = v match {
    case _: BoolV  => "boolean"
    case _: IntV   => "integer"
    case _: FloatV => "float"
    case _: StrV   => "string"
    case _: DurV   => "duration"
  }

  private val IntRe = "^[+-]?[0-9]+$".r
  private val FloatRe =
    "^[+-]?(([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?|[iI][nN][fF]([iI][nN][iI][tT][yY])?|[nN][aA][nN])$".r

  /** Rust `"42".parse::<i64>()` — digits only, overflow fails over to float. */
  def parseI64(s: String): Option[Long] =
    if (IntRe.findFirstIn(s).isEmpty) None
    else try Some(java.lang.Long.parseLong(s)) catch { case _: NumberFormatException => None }

  /** Rust `f64::from_str` grammar (incl. inf/NaN, no Java 'd'/'f' suffixes). */
  def parseF64(s: String): Option[Double] =
    if (FloatRe.findFirstIn(s).isEmpty) None
    else {
      val lower = s.toLowerCase
      if (lower.endsWith("inf") || lower.endsWith("infinity"))
        Some(if (lower.startsWith("-")) Double.NegativeInfinity else Double.PositiveInfinity)
      else if (lower.endsWith("nan")) Some(Double.NaN)
      else try Some(java.lang.Double.parseDouble(s)) catch { case _: NumberFormatException => None }
    }

  /** Label-string parsing precedence bool→i64→f64→string (value.rs:51-61). */
  def parse(s: String): Value =
    if (s == "true") BoolV(true)
    else if (s == "false") BoolV(false)
    else parseI64(s).map(IntV).getOrElse(
      parseF64(s).map(FloatV).getOrElse(StrV(s)))

  private val units: List[(String, Long)] = List(
    "us" -> 1L, "ms" -> 1000L, "s" -> 1000000L,
    "m" -> 60000000L, "h" -> 3600000000L, "d" -> 86400000000L)

  /** `"1h -30m"` → µs. Reference: core/duration.rs:11-49 — the numeric part
    * is every digit/'.'/'-' char (order-insensitive partition), the unit part
    * is everything else, and the numeric part must parse as i64.
    */
  def parseDurationMicros(s: String): Option[Long] = {
    val parts = s.trim.split("\\s+").filter(_.nonEmpty)
    if (parts.isEmpty) return None
    var total = 0L
    for (part <- parts) {
      val (numPart, unitPart) = part.partition(c => c.isDigit || c == '.' || c == '-')
      val n = parseI64(numPart).getOrElse(return None)
      val mul = units.collectFirst { case (u, m) if u == unitPart => m }
        .getOrElse(return None)
      total += n * mul
    }
    Some(total)
  }

  def parseDuration(s: String): Option[Value] = parseDurationMicros(s).map(DurV)

  /** value/duration_format.rs:29-50. */
  def formatDuration(usec0: Long): String = {
    var usec = usec0
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    for ((unit, unitUs) <- List("d" -> 86400000000L, "h" -> 3600000000L,
        "m" -> 60000000L, "s" -> 1000000L, "ms" -> 1000L, "us" -> 1L)) {
      if (math.abs(usec) >= unitUs) {
        val value = usec / unitUs
        parts += s"$value$unit"
        usec -= value * unitUs
      }
    }
    if (parts.isEmpty) "0us" else parts.mkString(" ")
  }

  /** Rust `{}` formatting for f64: shortest round-trip decimal, integral
    * values print without ".0", never scientific notation.
    */
  def formatRustF64(f: Double): String = {
    if (f.isNaN) return "NaN"
    if (f.isPosInfinity) return "inf"
    if (f.isNegInfinity) return "-inf"
    if (f == math.floor(f) && math.abs(f) < 1e16) {
      val l = f.toLong
      if (l == 0L && (1.0 / f) < 0) "-0" else l.toString
    } else {
      // Java's shortest round-trip repr, de-scientificated.
      val s = java.lang.Double.toString(f)
      if (!s.contains("E")) s
      else new java.math.BigDecimal(f).toPlainString // rare: |f|>=1e7 non-integral or <1e-3
    }
  }
}
