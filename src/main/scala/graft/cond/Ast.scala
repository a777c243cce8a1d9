package graft.cond

/** Condition tree. One node per reference `Node`
  * (reductstore/src/storage/query/condition.rs:41-47); operator names keep
  * their `$`-form so the interpreter/compiler dispatch mirrors
  * condition/parser.rs:250-306.
  */
sealed trait Node
object Node {
  final case class Const(v: Value) extends Node
  /** `"&name"` — label reference; missing label is a NotFound error
    * (condition/reference.rs:14-27). */
  final case class LabelRef(name: String) extends Node
  /** `"@name"` — computed-label reference (condition/computed_reference.rs). */
  final case class ComputedRef(name: String) extends Node
  /** `{"$op": [...]}` — operator with child operands. */
  final case class Op(name: String, operands: List[Node]) extends Node

  /** Operators that carry mutable per-query state (SURVEY §2.2). Trees
    * containing these run on the sequential per-entry kernel; pure trees
    * compile to Catalyst columns.
    */
  val statefulOps: Set[String] = Set("$each_n", "$each_t", "$gate", "$limit")

  def isStateful(n: Node): Boolean = n match {
    case Op(name, ops) => statefulOps.contains(name) || ops.exists(isStateful)
    case _             => false
  }

  /** All static `&label` names referenced in the tree. */
  def labelRefNames(n: Node): Set[String] = n match {
    case LabelRef(name) => Set(name)
    case Op(_, ops)     => ops.flatMap(labelRefNames).toSet
    case _              => Set.empty
  }

  /** All static `@computed` names referenced in the tree. */
  def computedRefNames(n: Node): Set[String] = n match {
    case ComputedRef(name) => Set(name)
    case Op(_, ops)        => ops.flatMap(computedRefNames).toSet
    case _                 => Set.empty
  }

  /** Whether evaluating the tree can OBSERVE record labels: a static
    * `&ref`, a dynamic `$ref` lookup, or an `$exists`/`$has` membership
    * probe (the only three label readers in Interp/CondCompiler).
    * `@computed` refs count too — #ext processors derive computed labels
    * WITH the record's labels map as input. Trees where this is false
    * evaluate identically with or without the label-overlay join (a
    * PATCH can only change `labels`), so key-only consumers may match
    * against the base table directly. Callers must separately treat a
    * `#ext` directive as label-reading (its per-step when-conditions and
    * processors see labels). */
  def readsLabels(n: Node): Boolean = n match {
    case LabelRef(_) | ComputedRef(_)       => true
    case Op("$ref" | "$exists" | "$has", _) => true
    case Op(_, ops)                         => ops.exists(readsLabels)
    case _                                  => false
  }

  /** Render a tree back to condition-language JSON (array operator form —
    * always legal, unlike the object sugar). Round-trips through
    * [[Parser.parse]] up to the language's own string-literal limits: a
    * leading `$` re-escapes as `$$`, but strings that start with `&`/`@`
    * or look like duration literals are indistinguishable from refs /
    * durations in source form (the reference language has no escape for
    * those). Used for logging and the differential fuzzers. */
  def render(n: Node): String = n match {
    case Const(Value.BoolV(v))  => v.toString
    case Const(Value.IntV(v))   => v.toString
    case Const(Value.FloatV(v)) => v.toString
    case Const(Value.StrV(v)) =>
      quote(if (v.startsWith("$")) "$" + v else v)
    case Const(Value.DurV(us))  => quote(s"${us}us")
    case LabelRef(name)         => quote("&" + name)
    case ComputedRef(name)      => quote("@" + name)
    case Op(name, operands) =>
      s"""{${quote(name)}: [${operands.map(render).mkString(", ")}]}"""
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'            => "\\\""
      case '\\'           => "\\\\"
      case c if c < ' '   => f"\\u${c.toInt}%04x"
      case c              => c.toString
    } + "\""
}

/** Parsed `#directives` (condition/parser.rs:29-41,62-140). */
final case class Directives(values: Map[String, List[Value]]) {
  def get(name: String): Option[List[Value]] = values.get(name)
  def single(name: String): Option[Value] = values.get(name).flatMap {
    case v :: Nil => Some(v)
    case other =>
      throw CondError(s"$name must be a single value (got ${other.size})")
  }
}
object Directives { val empty: Directives = Directives(Map.empty) }

final case class ParsedCondition(root: Node, directives: Directives)
