package graft.cond

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles a *pure* condition tree (no stateful operators) into a single
  * Catalyst `Column`, entirely out of built-in (whole-stage-codegen'd)
  * expressions — no UDFs.
  *
  * Dynamic typing: a label value is a string parsed lazily with the
  * precedence bool→i64→f64→string (value.rs:51-61). Statically-typed
  * subtrees (literals, `$timestamp`, arithmetic over them) stay plain typed
  * columns so Catalyst can fold/push them; only label references carry a
  * runtime tag, encoded as `STRUCT<k:INT, i:BIGINT, f:DOUBLE, s:STRING>`
  * with k ∈ {0:bool, 1:int, 2:float, 3:string, 4:duration}.
  *
  * Error semantics: evaluation errors (missing label, div-by-zero, bad
  * cast…) become NULL, and the top-level predicate treats NULL as false —
  * exactly the reference's non-strict mode (filters/when.rs:81-95). Strict
  * mode runs on the interpreter kernel instead, where real errors surface.
  *
  * Known benign divergences from the reference (documented, all corner
  * cases never produced by well-formed data): NaN label comparisons use
  * Spark double semantics; `show` of a *dynamically produced* duration
  * (only reachable via `$cast` of a label to duration then a string op)
  * formats as `<n>us` instead of `1h 2m`.
  */
object CondCompiler {
  import Value._

  sealed trait Kind
  case object KBool extends Kind
  case object KInt extends Kind
  case object KFloat extends Kind
  case object KStr extends Kind
  case object KDur extends Kind

  /** A compiled value: either statically typed or runtime-tagged. */
  sealed trait CVal
  /** `col` is BOOLEAN for KBool, BIGINT for KInt/KDur, DOUBLE for KFloat,
    * STRING for KStr. NULL means evaluation error. */
  final case class CStatic(kind: Kind, col: Column) extends CVal
  /** Tagged struct; NULL struct means evaluation error. */
  final case class CDynamic(col: Column) extends CVal

  /** Inputs the compiler reads from. `labelStructs`/`computedStructs` are
    * pre-projected parsed-value structs (one column per referenced label),
    * so each label parses ONCE per row instead of once per use site — the
    * inline fallback duplicates the whole parse cascade and can push
    * generated code past the JVM 64KB method limit.
    */
  final case class Cols(
      ts: Column, labels: Column, computedLabels: Column,
      labelStructs: Map[String, Column] = Map.empty,
      computedStructs: Map[String, Column] = Map.empty)

  private val nullStruct: Column = lit(null).cast(
    "struct<k:int,i:bigint,f:double,s:string>")
  private def mkStruct(k: Column, i: Column, f: Column, s: Column): Column =
    struct(k.cast("int").as("k"), i.cast("bigint").as("i"),
      f.cast("double").as("f"), s.cast("string").as("s"))
  private val nullL = lit(null).cast("bigint")
  private val nullD = lit(null).cast("double")
  private val nullS = lit(null).cast("string")
  private val nullB = lit(null).cast("boolean")

  private def intStruct(i: Column) = mkStruct(lit(1), i, nullD, nullS)
  private def floatStruct(f: Column) = mkStruct(lit(2), nullL, f, nullS)
  private def strStruct(s: Column) = mkStruct(lit(3), nullL, nullD, s)
  private def boolStruct(b: Column) =
    mkStruct(lit(0), when(b, 1L).otherwise(0L), nullD, nullS)

  private val IntRe = "^[+-]?[0-9]+$"
  // Rust f64 grammar (digits required somewhere; inf/nan excluded here —
  // they never round-trip through numeric labels in practice)
  private val FloatRe =
    "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"

  /** `Value::parse` over a (nullable) string column → tagged struct, via
    * the native [[ParseValueExpr]] (compact codegen; exact Rust parse-chain
    * semantics shared with the interpreter). */
  def parseValue(s: Column): Column = ParseValueExpr(s)

  /** Compile to the final boolean predicate (NULL-as-false, non-strict). */
  def compilePredicate(root: Node, cols: Cols): Column =
    coalesce(truthy(compile(root, cols)), lit(false))

  // ---------------------------------------------------------------- compile

  def compile(n: Node, cols: Cols): CVal = n match {
    case Node.Const(v) => v match {
      case BoolV(b)  => CStatic(KBool, lit(b))
      case IntV(i)   => CStatic(KInt, lit(i))
      case FloatV(f) => CStatic(KFloat, lit(f))
      case StrV(s)   => CStatic(KStr, lit(s))
      case DurV(us)  => CStatic(KDur, lit(us))
    }
    case Node.LabelRef(name) =>
      CDynamic(cols.labelStructs.getOrElse(name,
        parseValue(try_element_at(cols.labels, lit(name)))))
    case Node.ComputedRef(name) =>
      CDynamic(cols.computedStructs.getOrElse(name,
        parseValue(try_element_at(cols.computedLabels, lit(name)))))
    case Node.Op(name, operandNodes) =>
      val ops = operandNodes.map(compile(_, cols))
      name match {
        case "$and" | "$all_of" =>
          CStatic(KBool, ops.map(truthy).foldLeft(lit(true))(_ && _))
        case "$or" | "$any_of" =>
          CStatic(KBool, ops.map(truthy).foldLeft(lit(false))(_ || _))
        case "$not" | "$none_of" =>
          CStatic(KBool, !ops.map(truthy).foldLeft(lit(false))(_ || _))
        case "$xor" | "$one_of" =>
          CStatic(KBool, ops.map(o => truthy(o).cast("int"))
            .reduceLeft(_ + _) === 1)
        case "$in" =>
          CStatic(KBool, ops.tail.map(o => eqCol(ops.head, o))
            .foldLeft(lit(false))(_ || _))
        case "$nin" =>
          CStatic(KBool, !ops.tail.map(o => eqCol(ops.head, o))
            .foldLeft(lit(false))(_ || _))
        case "$eq"  => CStatic(KBool, eqCol(ops(0), ops(1)))
        case "$ne"  => CStatic(KBool, !eqCol(ops(0), ops(1)))
        case "$gt"  => CStatic(KBool, cmpCol(ops(0), ops(1), _ > _, _ > _))
        case "$gte" => CStatic(KBool, cmpCol(ops(0), ops(1), _ >= _, _ >= _))
        case "$lt"  => CStatic(KBool, cmpCol(ops(0), ops(1), _ < _, _ < _))
        case "$lte" => CStatic(KBool, cmpCol(ops(0), ops(1), _ <= _, _ <= _))
        case "$add"     => arith(ops(0), ops(1), _ + _, allowConcat = true)
        case "$sub"     => arith(ops(0), ops(1), _ - _)
        case "$mult"    => arith(ops(0), ops(1), _ * _)
        case "$div"     => divCol(ops(0), ops(1))
        case "$div_num" => divNumCol(ops(0), ops(1))
        case "$rem"     => remCol(ops(0), ops(1))
        case "$abs"     => absCol(ops(0))
        case "$contains" =>
          CStatic(KBool, showCol(ops(0)).contains(showCol(ops(1))))
        case "$starts_with" =>
          CStatic(KBool, showCol(ops(0)).startsWith(showCol(ops(1))))
        case "$ends_with" =>
          CStatic(KBool, showCol(ops(0)).endsWith(showCol(ops(1))))
        case "$second"  => dateOp(ops, second)
        case "$minute"  => dateOp(ops, minute)
        case "$hour"    => dateOp(ops, hour)
        case "$day"     => dateOp(ops, dayofmonth)
        case "$month"   => dateOp(ops, month)
        case "$year"    => dateOp(ops, year)
        case "$weekday" => dateOp(ops, weekday) // Spark weekday(): 0 = Monday
        case "$exists" | "$has" =>
          CStatic(KBool, ops.map(o =>
              coalesce(map_contains_key(cols.labels, showCol(o)), lit(false)))
            .foldLeft(lit(true))(_ && _))
        case "$cast" => castCol(ops(0), ops(1), operandNodes(1))
        case "$ref" =>
          CDynamic(parseValue(try_element_at(cols.labels, showCol(ops(0)))))
        case "$timestamp" | "$id" => CStatic(KInt, cols.ts)
        case other =>
          throw CondError(s"Operator '$other' is not compilable (stateful)")
      }
  }

  // ------------------------------------------------------------ primitives

  /** Truthiness (value.rs:66-73); NULL propagates. */
  def truthy(v: CVal): Column = v match {
    case CStatic(KBool, c)        => c
    case CStatic(KInt | KDur, c)  => c =!= 0L
    case CStatic(KFloat, c)       => c =!= 0.0
    case CStatic(KStr, c)         => length(c) > 0
    case CDynamic(d) =>
      when(d.isNull, nullB)
        .when(d("k") === 3, length(d("s")) > 0)
        .when(d("k") === 2, d("f") =!= 0.0)
        .otherwise(d("i") =!= 0L)
  }

  private def isFloatKind(v: CVal): Column = v match {
    case CStatic(KFloat, _) => lit(true)
    case CStatic(_, _)      => lit(false)
    case CDynamic(d)        => d("k") === 2
  }
  private def isStrKind(v: CVal): Column = v match {
    case CStatic(KStr, _) => lit(true)
    case CStatic(_, _)    => lit(false)
    case CDynamic(d)      => d("k") === 3
  }
  /** Numeric view as double; only valid under a non-string guard. */
  private def numF(v: CVal): Column = v match {
    case CStatic(KBool, c)       => when(c, 1.0).otherwise(0.0)
    case CStatic(KInt | KDur, c) => c.cast("double")
    case CStatic(KFloat, c)      => c
    case CStatic(KStr, c)        => when(c.rlike(FloatRe), c.cast("double"))
    case CDynamic(d) =>
      when(d("k") === 2, d("f")).otherwise(d("i").cast("double"))
  }
  /** Numeric view as long (float truncates toward zero, Rust `as i64`). */
  private def numI(v: CVal): Column = v match {
    case CStatic(KBool, c)       => when(c, 1L).otherwise(0L)
    case CStatic(KInt | KDur, c) => c
    case CStatic(KFloat, c)      => f64toI64(c)
    case CStatic(KStr, c)        => when(c.rlike(IntRe), c.cast("bigint"))
    case CDynamic(d) =>
      when(d("k") === 2, f64toI64(d("f"))).otherwise(d("i"))
  }
  /** Rust saturating `f64 as i64` (NaN→0), ANSI-safe. */
  private def f64toI64(f: Column): Column =
    when(isnan(f), 0L)
      .when(f >= lit(Long.MaxValue).cast("double"), Long.MaxValue)
      .when(f <= lit(Long.MinValue).cast("double"), Long.MinValue)
      .otherwise(f.cast("bigint"))

  private def anyNull(a: CVal, b: CVal): Column = rawCol(a).isNull || rawCol(b).isNull
  private def rawCol(v: CVal): Column = v match {
    case CStatic(_, c) => c
    case CDynamic(d)   => d
  }

  /** `as_int` with string-parse semantics (value.rs:78-97): a *string* kind
    * parses or errors→NULL. Used by date ops / div_num / cast. */
  private def asIntFull(v: CVal): Column = v match {
    case CDynamic(d) =>
      when(d.isNull, nullL)
        .when(d("k") === 3, when(d("s").rlike(IntRe), d("s").cast("bigint")))
        .when(d("k") === 2, f64toI64(d("f")))
        .otherwise(d("i"))
    case s @ CStatic(KStr, c) => when(c.rlike(IntRe), c.cast("bigint"))
    case other                => numI(other)
  }
  private def asFloatFull(v: CVal): Column = v match {
    case CDynamic(d) =>
      when(d.isNull, nullD)
        .when(d("k") === 3, when(d("s").rlike(FloatRe), d("s").cast("double")))
        .when(d("k") === 2, d("f"))
        .otherwise(d("i").cast("double"))
    case CStatic(KStr, c) => when(c.rlike(FloatRe), c.cast("double"))
    case other            => numF(other)
  }

  /** Rust `Display` (value.rs:131-141). Floats: integral → no ".0". */
  def showCol(v: CVal): Column = v match {
    case CStatic(KBool, c) => when(c, "true").otherwise("false")
    case CStatic(KInt, c)  => c.cast("string")
    case CStatic(KFloat, c) => showDouble(c)
    case CStatic(KStr, c)  => c
    case CStatic(KDur, c)  => showDurationCol(c)
    case CDynamic(d) =>
      when(d.isNull, nullS)
        .when(d("k") === 3, d("s"))
        .when(d("k") === 2, showDouble(d("f")))
        .when(d("k") === 0, when(d("i") =!= 0L, "true").otherwise("false"))
        .when(d("k") === 4, showDurationCol(d("i")))
        .otherwise(d("i").cast("string"))
  }
  private def showDouble(f: Column): Column =
    when(isnan(f), "NaN")
      .when(f === Double.PositiveInfinity, "inf")
      .when(f === Double.NegativeInfinity, "-inf")
      .when(f === floor(f) && abs(f) < 1e16, f.cast("bigint").cast("string"))
      .otherwise(f.cast("string"))
  /** Partial `fmt_duration`: whole-unit values only (covers literals used
    * in string contexts; full multi-part formatting lives in Value.show). */
  private def showDurationCol(us: Column): Column = {
    val units = List("d" -> 86400000000L, "h" -> 3600000000L,
      "m" -> 60000000L, "s" -> 1000000L, "ms" -> 1000L)
    units.foldRight(concat(us.cast("string"), lit("us"))) {
      case ((u, m), elseCol) =>
        when(us % m === 0L && abs(us) >= m,
          concat((us / m).cast("string"), lit(u))).otherwise(elseCol)
    }
  }

  /** PartialEq (value/cmp.rs:6-38). NULL on operand error. */
  def eqCol(a: CVal, b: CVal): Column = (a, b) match {
    case (CStatic(KStr, x), CStatic(KStr, y)) => x === y
    case (CStatic(KStr, _), CStatic(_, _)) => falseUnlessNull(a, b)
    case (CStatic(_, _), CStatic(KStr, _)) => falseUnlessNull(a, b)
    case (CStatic(ka, x), CStatic(kb, y)) =>
      if (ka == KFloat || kb == KFloat) numF(a) === numF(b)
      else numI(a) === numI(b)
    case _ =>
      when(anyNull(a, b), nullB)
        .when(isStrKind(a) && isStrKind(b), strOf(a) === strOf(b))
        .when(isStrKind(a) || isStrKind(b), lit(false))
        .when(isFloatKind(a) || isFloatKind(b), numF(a) === numF(b))
        .otherwise(numI(a) === numI(b))
  }
  private def falseUnlessNull(a: CVal, b: CVal): Column =
    when(anyNull(a, b), nullB).otherwise(lit(false))
  private def strOf(v: CVal): Column = v match {
    case CStatic(KStr, c) => c
    case CDynamic(d)      => d("s")
    case CStatic(_, _)    => nullS
  }

  /** PartialOrd (value/cmp.rs:40-70): string vs non-string unordered→false. */
  def cmpCol(a: CVal, b: CVal,
      fNum: (Column, Column) => Column,
      fStr: (Column, Column) => Column): Column = (a, b) match {
    case (CStatic(KStr, x), CStatic(KStr, y)) => fStr(x, y)
    case (CStatic(KStr, _), CStatic(_, _)) => falseUnlessNull(a, b)
    case (CStatic(_, _), CStatic(KStr, _)) => falseUnlessNull(a, b)
    case (CStatic(ka, x), CStatic(kb, y)) =>
      if (ka == KFloat || kb == KFloat) fNum(numF(a), numF(b))
      else fNum(numI(a), numI(b))
    case _ =>
      when(anyNull(a, b), nullB)
        .when(isStrKind(a) && isStrKind(b), fStr(strOf(a), strOf(b)))
        .when(isStrKind(a) || isStrKind(b), lit(false))
        .when(isFloatKind(a) || isFloatKind(b), fNum(numF(a), numF(b)))
        .otherwise(fNum(numI(a), numI(b)))
  }

  /** `$add`/`$sub`/`$mult` (value/arithmetic/{add,sub,mult}.rs): int unless either side
    * float; string+string concats (add only); string+non-string errors. */
  private def arith(a: CVal, b: CVal, f: (Column, Column) => Column,
      allowConcat: Boolean = false): CVal = (a, b) match {
    case (CStatic(KStr, x), CStatic(KStr, y)) =>
      if (allowConcat) CStatic(KStr, concat(x, y))
      else CDynamic(nullStruct)
    case (CStatic(KStr, _), CStatic(_, _)) => CDynamic(nullStruct)
    case (CStatic(_, _), CStatic(KStr, _)) => CDynamic(nullStruct)
    case (CStatic(ka, _), CStatic(kb, _)) =>
      if (ka == KFloat || kb == KFloat) CStatic(KFloat, f(numF(a), numF(b)))
      else CStatic(KInt, f(numI(a), numI(b)))
    case _ =>
      val concatBranch =
        if (allowConcat) strStruct(concat(strOf(a), strOf(b)))
        else nullStruct
      CDynamic(
        when(anyNull(a, b), nullStruct)
          .when(isStrKind(a) && isStrKind(b), concatBranch)
          .when(isStrKind(a) || isStrKind(b), nullStruct)
          .when(isFloatKind(a) || isFloatKind(b), floatStruct(f(numF(a), numF(b))))
          .otherwise(intStruct(f(numI(a), numI(b)))))
  }

  /** `$div`: always float; ÷0 and strings error→NULL (div.rs:26-46). */
  private def divCol(a: CVal, b: CVal): CVal = {
    val d = asFloatIfNotStr(b)
    val n = asFloatIfNotStr(a)
    CStatic(KFloat,
      when(anyNull(a, b) || isStrKind(a) || isStrKind(b) || d === 0.0, nullD)
        .otherwise(n / d))
  }
  private def asFloatIfNotStr(v: CVal): Column = v match {
    case CStatic(KStr, _) => nullD
    case other            => numF(other)
  }

  /** `$div_num`: integer division (div_num.rs:25-45). Exact truncated i64
    * quotient via `(n - n % d) / d` over decimals (Spark's `/` on integrals
    * yields double, which is lossy past 2^53). */
  private def divNumCol(a: CVal, b: CVal): CVal = {
    val d = asIntIfNotStr(b)
    val n = asIntIfNotStr(a)
    val quot = ((n - n % d).cast("decimal(38,0)") / d.cast("decimal(38,0)"))
      .cast("bigint")
    CStatic(KInt,
      when(anyNull(a, b) || isStrKind(a) || isStrKind(b) || d === 0L, nullL)
        .otherwise(quot))
  }
  private def asIntIfNotStr(v: CVal): Column = v match {
    case CStatic(KStr, _) => nullL
    case other            => numI(other)
  }

  /** `$rem`: truncated remainder, float-promoting (rem.rs:28-66). */
  private def remCol(a: CVal, b: CVal): CVal = {
    val anyF = isFloatKind(a) || isFloatKind(b)
    val guard = anyNull(a, b) || isStrKind(a) || isStrKind(b)
    CDynamic(
      when(guard, nullStruct)
        .when(anyF, floatStruct(numF(a) % numF(b)))
        .when(numI(b) === 0L, nullStruct)
        .otherwise(intStruct(numI(a) % numI(b))))
  }

  /** `$abs` (abs.rs): bool→int; keeps kind otherwise; string errors. */
  private def absCol(a: CVal): CVal = a match {
    case CStatic(KBool, c)  => CStatic(KInt, when(c, 1L).otherwise(0L))
    case CStatic(KInt, c)   => CStatic(KInt, abs(c))
    case CStatic(KDur, c)   => CStatic(KDur, abs(c))
    case CStatic(KFloat, c) => CStatic(KFloat, abs(c))
    case CStatic(KStr, _)   => CDynamic(nullStruct)
    case CDynamic(d) =>
      CDynamic(
        when(d.isNull || d("k") === 3, nullStruct)
          .otherwise(mkStruct(
            when(d("k") === 0, 1).otherwise(d("k")),
            abs(d("i")), abs(d("f")), nullS)))
  }

  /** `$cast` (value/misc/cast.rs:26-35). The target type name is virtually
    * always a JSON string constant — specialize on the AST when it is. */
  private def castCol(v: CVal, target: CVal, targetNode: Node): CVal =
    targetNode match {
      case Node.Const(StrV(name)) => name match {
        case "bool"     => CStatic(KBool, truthy(v))
        case "int"      => CStatic(KInt, asIntFull(v))
        case "float"    => CStatic(KFloat, asFloatFull(v))
        case "string"   => CStatic(KStr, showCol(v))
        case "duration" => CStatic(KDur, asIntFull(v))
        case _          => CDynamic(nullStruct) // Unknown type 'x' → error
      }
      case _ =>
        val tgt = target match {
          case CStatic(KStr, c) => c
          case CDynamic(d)      => d("s")
          case _                => nullS
        }
        CDynamic(
          when(tgt === "bool", boolStruct(truthy(v)))
            .when(tgt === "int", intStruct(asIntFull(v)))
            .when(tgt === "float", floatStruct(asFloatFull(v)))
            .when(tgt === "string", strStruct(showCol(v)))
            .when(tgt === "duration", mkStruct(lit(4), asIntFull(v), nullD, nullS))
            .otherwise(nullStruct))
    }

  /** Calendar field of a µs timestamp with optional IANA tz
    * (operators/date.rs:27-66). Invalid tz → NULL (error). */
  private def dateOp(ops: List[CVal], field: Column => Column): CVal = {
    val tsUs = asIntFull(ops.head)
    val utcTs = timestamp_micros(tsUs)
    val local = ops match {
      case _ :: tz :: Nil =>
        // from_utc_timestamp renders the instant in the given zone
        // (session tz is UTC, so extraction sees tz-local wall time)
        val tzStr = when(isStrKind(tz), strOf(tz))
        from_utc_timestamp(utcTs, tzStr)
      case _ => utcTs
    }
    CStatic(KInt, field(local).cast("bigint"))
  }
}
