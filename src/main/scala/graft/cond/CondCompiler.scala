package graft.cond

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles a *pure* condition tree (no stateful operators) into a single
  * Catalyst `Column`.
  *
  * Two value representations:
  *  - statically-typed subtrees (literals, `$timestamp`, arithmetic over
  *    them) stay plain typed columns → Catalyst folds/pushes them;
  *  - label references and anything touching them carry a runtime tag
  *    `STRUCT<k:INT, i:BIGINT, f:DOUBLE, s:STRING>` (k ∈ 0:bool 1:int
  *    2:float 3:string 4:duration) and are evaluated by the compact native
  *    expressions in [[DynOps]] (exact shared semantics with the
  *    interpreter, single static call per operator — see DynOps scaladoc
  *    for why built-in cascades don't work here).
  *
  * Error semantics: evaluation errors (missing label, ÷0, bad cast…)
  * become NULL and the top-level predicate treats NULL as false — exactly
  * the reference's non-strict mode (filters/when.rs:81-95). Strict mode
  * runs on the interpreter kernel instead, where real errors surface.
  * Logical ops use Kleene logic, which coincides with the reference's
  * short-circuit error behavior at the observable (non-strict) level.
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
    * so each label parses once per row instead of once per use site. */
  final case class Cols(
      ts: Column, labels: Column, computedLabels: Column,
      labelStructs: Map[String, Column] = Map.empty,
      computedStructs: Map[String, Column] = Map.empty)

  private val structTypeDdl = "struct<k:int,i:bigint,f:double,s:string>"
  private val nullStruct: Column = lit(null).cast(structTypeDdl)
  private def mkStruct(k: Column, i: Column, f: Column, s: Column): Column =
    struct(k.cast("int").as("k"), i.cast("bigint").as("i"),
      f.cast("double").as("f"), s.cast("string").as("s"))
  private val nullL = lit(null).cast("bigint")
  private val nullD = lit(null).cast("double")
  private val nullS = lit(null).cast("string")
  private val nullB = lit(null).cast("boolean")

  private val IntRe = "^[+-]?[0-9]+$"
  private val FloatRe =
    "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"

  /** `Value::parse` over a (nullable) string column → tagged struct. */
  def parseValue(s: Column): Column = ParseValueExpr(s)

  /** Static value → tagged struct (error-null preserved). */
  private def toDyn(v: CVal): Column = v match {
    case CDynamic(d) => d
    case CStatic(kind, c) =>
      val s = kind match {
        case KBool  => mkStruct(lit(0), when(c, 1L).otherwise(0L), nullD, nullS)
        case KInt   => mkStruct(lit(1), c, nullD, nullS)
        case KFloat => mkStruct(lit(2), nullL, c, nullS)
        case KStr   => mkStruct(lit(3), nullL, nullD, c)
        case KDur   => mkStruct(lit(4), c, nullD, nullS)
      }
      when(c.isNull, nullStruct).otherwise(s)
  }

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
          CStatic(KBool, andFold(ops.map(truthy)))
        case "$or" | "$any_of" =>
          CStatic(KBool, orFold(ops.map(truthy)))
        case "$not" | "$none_of" =>
          CStatic(KBool, !orFold(ops.map(truthy)))
        case "$xor" | "$one_of" =>
          CStatic(KBool, ops.map(o => truthy(o).cast("int"))
            .reduceLeft(_ + _) === 1)
        case "$in" =>
          CStatic(KBool, orFold(ops.tail.map(o => eqCol(ops.head, o))))
        case "$nin" =>
          CStatic(KBool, !orFold(ops.tail.map(o => eqCol(ops.head, o))))
        case "$eq" | "$ne" | "$gt" | "$gte" | "$lt" | "$lte" =>
          CStatic(KBool, cmpDispatch(name, ops(0), ops(1)))
        case "$add" | "$sub" | "$mult" => arith(name, ops(0), ops(1))
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
        case "$exists" | "$has" => // operators/misc/exists.rs:14-27
          CStatic(KBool, andFold(ops.map { o =>
            val k = showCol(o)
            when(k.isNull, nullB) // operand error propagates
              .otherwise(coalesce(map_contains_key(cols.labels, k), lit(false)))
          }))
        case "$cast" => castCol(ops(0), ops(1), operandNodes(1))
        case "$ref" =>
          CDynamic(parseValue(try_element_at(cols.labels, showCol(ops(0)))))
        case "$timestamp" | "$id" => CStatic(KInt, cols.ts)
        case other =>
          throw CondError(s"Operator '$other' is not compilable (stateful)")
      }
  }

  // ------------------------------------------------------------ primitives

  /** Sequential short-circuit folds matching the reference's evaluation:
    * operands evaluate left-to-right and the FIRST error aborts (→ NULL),
    * unless an earlier operand already decided the result
    * (all_of.rs/any_of.rs loops + `?` error propagation). Plain Kleene
    * logic would differ: Kleene `null OR true` = true, but the reference
    * errors out before ever seeing the `true`.
    */
  private def andFold(cs: Seq[Column]): Column =
    cs.foldLeft(lit(true)) { (acc, c) =>
      when(acc.isNull, nullB).when(!acc, lit(false)).otherwise(c)
    }
  private def orFold(cs: Seq[Column]): Column =
    cs.foldLeft(lit(false)) { (acc, c) =>
      when(acc.isNull, nullB).when(acc, lit(true)).otherwise(c)
    }

  /** Truthiness (value.rs:66-73); NULL propagates. */
  def truthy(v: CVal): Column = v match {
    case CStatic(KBool, c)       => c
    case CStatic(KInt | KDur, c) => c =!= 0L
    case CStatic(KFloat, c)      => c =!= 0.0
    case CStatic(KStr, c)        => length(c) > 0
    case CDynamic(d)             => DynOps.unCol("truthy", d)
  }

  private def numF(v: CVal): Column = v match {
    case CStatic(KBool, c)       =>
      when(c.isNull, nullD).when(c, 1.0).otherwise(0.0)
    case CStatic(KInt | KDur, c) => c.cast("double")
    case CStatic(KFloat, c)      => c
    case CStatic(KStr, c)        => when(c.rlike(FloatRe), c.cast("double"))
    case CDynamic(d)             => DynOps.unCol("as_float", d)
  }
  private def numI(v: CVal): Column = v match {
    case CStatic(KBool, c)       =>
      when(c.isNull, nullL).when(c, 1L).otherwise(0L)
    case CStatic(KInt | KDur, c) => c
    case CStatic(KFloat, c)      => f64toI64(c)
    case CStatic(KStr, c)        => when(c.rlike(IntRe), c.cast("bigint"))
    case CDynamic(d)             => DynOps.unCol("as_int", d)
  }
  /** Rust saturating `f64 as i64` (NaN→0), ANSI-safe. */
  private def f64toI64(f: Column): Column =
    when(isnan(f), 0L)
      .when(f >= lit(Long.MaxValue).cast("double"), Long.MaxValue)
      .when(f <= lit(Long.MinValue).cast("double"), Long.MinValue)
      .otherwise(f.cast("bigint"))

  /** `as_int` with string-parse semantics (value.rs:78-97). */
  private def asIntFull(v: CVal): Column = numI(v)
  private def asFloatFull(v: CVal): Column = numF(v)

  /** Rust `Display` (value.rs:131-141). Floats and durations go through
    * the shared native runtime — Java's Double.toString (scientific form
    * past 1e7) and SQL tricks both diverge from Rust's format. */
  def showCol(v: CVal): Column = v match {
    case CStatic(KBool, c) =>
      when(c.isNull, nullS).when(c, "true").otherwise("false")
    case CStatic(KInt, c)  => c.cast("string")
    case CStatic(KStr, c)  => c
    case CStatic(KFloat | KDur, _) => DynOps.unCol("show", toDyn(v))
    case CDynamic(d)       => DynOps.unCol("show", d)
  }

  /** PartialEq (value/cmp.rs:6-38); NULL on operand error. */
  def eqCol(a: CVal, b: CVal): Column = cmpDispatch("$eq", a, b)

  private def cmpDispatch(op: String, a: CVal, b: CVal): Column = (a, b) match {
    case (CStatic(ka, x), CStatic(kb, y)) =>
      val strCmp: (Column, Column) => Column = op match {
        case "$eq" => _ === _; case "$ne" => _ =!= _
        case "$gt" => _ > _;   case "$gte" => _ >= _
        case "$lt" => _ < _;   case "$lte" => _ <= _
      }
      (ka, kb) match {
        case (KStr, KStr) => strCmp(x, y)
        case (KStr, _) | (_, KStr) =>
          // string vs non-string: never equal, unordered (cmp.rs:33-36,66-69)
          val r = op == "$ne"
          when(x.isNull || y.isNull, nullB).otherwise(lit(r))
        case _ =>
          if (ka == KFloat || kb == KFloat) {
            // Rust f64 partial_cmp: NaN unordered → eq/gt/gte/lt/lte false,
            // ne true. Spark orders NaN largest and NaN==NaN, so guard.
            val (l, r) = (numF(a), numF(b))
            when(l.isNull || r.isNull, nullB)
              .when(isnan(l) || isnan(r), lit(op == "$ne"))
              .otherwise(strCmp(l, r))
          } else strCmp(numI(a), numI(b))
      }
    case _ => DynOps.cmpCol(op, toDyn(a), toDyn(b))
  }

  /** `$add`/`$sub`/`$mult` (value/arithmetic/{add,sub,mult}.rs). */
  private def arith(op: String, a: CVal, b: CVal): CVal = (a, b) match {
    case (CStatic(KStr, x), CStatic(KStr, y)) =>
      if (op == "$add") CStatic(KStr, concat(x, y))
      else CDynamic(nullStruct)
    case (CStatic(KStr, _), CStatic(_, _)) => CDynamic(nullStruct)
    case (CStatic(_, _), CStatic(KStr, _)) => CDynamic(nullStruct)
    case (CStatic(ka, _), CStatic(kb, _)) =>
      val f: (Column, Column) => Column = op match {
        case "$add" => _ + _; case "$sub" => _ - _; case "$mult" => _ * _
      }
      if (ka == KFloat || kb == KFloat) CStatic(KFloat, f(numF(a), numF(b)))
      else CStatic(KInt, f(numI(a), numI(b)))
    case _ => CDynamic(DynOps.binCol(op, toDyn(a), toDyn(b)))
  }

  /** `$div`: always float; ÷0 and strings error→NULL (div.rs:26-46). */
  private def divCol(a: CVal, b: CVal): CVal = (a, b) match {
    case (CStatic(ka, _), CStatic(kb, _)) if ka != KStr && kb != KStr =>
      val d = numF(b)
      CStatic(KFloat, when(d === 0.0, nullD).otherwise(numF(a) / d))
    case (CStatic(_, _), CStatic(_, _)) => CStatic(KFloat, nullD)
    case _ => CDynamic(DynOps.binCol("$div", toDyn(a), toDyn(b)))
  }

  /** `$div_num`: integer division (div_num.rs:25-45); exact i64 quotient. */
  private def divNumCol(a: CVal, b: CVal): CVal = (a, b) match {
    case (CStatic(ka, _), CStatic(kb, _)) if ka != KStr && kb != KStr =>
      val d = numI(b); val n = numI(a)
      val quot = ((n - n % d).cast("decimal(38,0)") / d.cast("decimal(38,0)"))
        .cast("bigint")
      CStatic(KInt, when(d === 0L, nullL).otherwise(quot))
    case (CStatic(_, _), CStatic(_, _)) => CStatic(KInt, nullL)
    case _ => CDynamic(DynOps.binCol("$div_num", toDyn(a), toDyn(b)))
  }

  /** `$rem`: truncated remainder, float-promoting (rem.rs:28-66). */
  private def remCol(a: CVal, b: CVal): CVal = (a, b) match {
    case (CStatic(ka, _), CStatic(kb, _)) if ka != KStr && kb != KStr =>
      if (ka == KFloat || kb == KFloat) {
        // Rust f64 % 0.0 = NaN; Spark's Remainder yields NULL there
        val d = numF(b)
        CStatic(KFloat, when(d === 0.0, lit(Double.NaN)).otherwise(numF(a) % d))
      } else {
        val d = numI(b)
        CStatic(KInt, when(d === 0L, nullL).otherwise(numI(a) % d))
      }
    case (CStatic(_, _), CStatic(_, _)) => CDynamic(nullStruct)
    case _ => CDynamic(DynOps.binCol("$rem", toDyn(a), toDyn(b)))
  }

  /** `$abs` (abs.rs): bool→int; keeps kind otherwise; string errors. */
  private def absCol(a: CVal): CVal = a match {
    case CStatic(KBool, c)  =>
      CStatic(KInt, when(c.isNull, nullL).when(c, 1L).otherwise(0L))
    case CStatic(KInt, c)   => CStatic(KInt, abs(c))
    case CStatic(KDur, c)   => CStatic(KDur, abs(c))
    case CStatic(KFloat, c) => CStatic(KFloat, abs(c))
    case CStatic(KStr, _)   => CDynamic(nullStruct)
    case CDynamic(d)        => CDynamic(DynOps.unCol("abs", d))
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
        val tgt = showCol(target)
        val dv = toDyn(v)
        CDynamic(
          when(tgt.isin("bool", "int", "float", "string", "duration"),
            DynOps.binCol("$castdyn", dv, toDyn(CStatic(KStr, tgt))))
            .otherwise(nullStruct))
    }

  /** Calendar field of a µs timestamp with optional IANA tz
    * (operators/date.rs:27-66). Invalid tz → NULL (error). */
  private def dateOp(ops: List[CVal], field: Column => Column): CVal = {
    val tsUs = asIntFull(ops.head)
    val utcTs = timestamp_micros(tsUs)
    val local = ops match {
      case _ :: tz :: Nil =>
        val tzStr = tz match {
          case CStatic(KStr, c) => c
          case CDynamic(d) =>
            // non-string tz is an error (date.rs:50-56)
            when(d("k") === 3, d("s"))
          case _ => nullS
        }
        // invalid tz → NULL (per-record error, absorbed as false in
        // non-strict mode) — from_utc_timestamp itself would throw
        // [INVALID_TIMEZONE] and crash the query (ADVICE r1)
        from_utc_timestamp(utcTs, DynOps.validZoneCol(tzStr))
      case _ => utcTs
    }
    CStatic(KInt, field(local).cast("bigint"))
  }
}
