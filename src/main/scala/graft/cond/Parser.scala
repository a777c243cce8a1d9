package graft.cond

import org.json4s._
import org.json4s.jackson.JsonMethods

/** `when`-JSON → condition tree + directives.
  *
  * Faithful re-expression of condition/parser.rs:54-306: two surface
  * syntaxes (array `{"$op": [a,b]}` and object `{"&label": {"$op": rhs}}`),
  * implicit top-level `$and`, `#directive` extraction, `$$` escaping,
  * duration literals, and the same operator dispatch table.
  */
object Parser {

  private val directiveNames = Set(
    "#ctx_before", "#ctx_after", "#select_labels", "#ext",
    "#batch_size", "#batch_records", "#batch_metadata_size",
    "#batch_timeout", "#record_timeout", "#io_timeout")

  val operatorNames: Set[String] = Set(
    "$each_n", "$each_t", "$gate", "$limit",
    "$add", "$sub", "$mult", "$div", "$div_num", "$rem", "$abs",
    "$and", "$all_of", "$or", "$any_of", "$not", "$none_of", "$xor", "$one_of",
    "$in", "$nin",
    "$eq", "$gt", "$gte", "$lt", "$lte", "$ne",
    "$second", "$minute", "$hour", "$day", "$month", "$year", "$weekday",
    "$contains", "$starts_with", "$ends_with",
    "$exists", "$has", "$cast", "$ref", "$timestamp", "$id")

  def parse(json: String): ParsedCondition = parse(JsonMethods.parse(json))

  def parse(json: JValue): ParsedCondition = {
    val (directives, stripped) = parseDirectives(json)
    val expressions = parseRecursively(stripped)
    ParsedCondition(Node.Op("$and", expressions), directives)
  }

  /** serde_json (preserve_order) semantics for duplicate object keys:
    * the later value wins but keeps the first occurrence's position.
    * json4s keeps every field, so normalize here. */
  private def dedupFields(fields: List[JField]): List[JField] = {
    val last = fields.toMap // Map keeps the last value per key
    val seen = scala.collection.mutable.HashSet.empty[String]
    fields.collect { case (k, _) if seen.add(k) => k -> last(k) }
  }

  // parser.rs:62-140
  private def parseDirectives(json: JValue): (Directives, JValue) = json match {
    case JObject(fields0) =>
      val fields = dedupFields(fields0)
      val (dirFields, rest) = fields.partition(_._1.startsWith("#"))
      val parsed = dirFields.map { case (key, value) =>
        if (!directiveNames.contains(key))
          throw CondError(s"Directive '$key' is not supported")
        val values: List[Value] = value match {
          case JNull => throw CondError(s"Directive '$key' cannot be null")
          case o: JObject => List(Value.StrV(JsonMethods.compact(o)))
          case JArray(items) => items.map {
            case o: JObject =>
              if (key == "#ext") Value.StrV(JsonMethods.compact(o))
              else throw CondError(
                s"Directive '$key' does not support object items in arrays")
            case prim => directivePrimitive(key, prim)
          }
          case prim => List(directivePrimitive(key, prim))
        }
        key -> values
      }.toMap
      (Directives(parsed), JObject(rest))
    case other => (Directives.empty, other)
  }

  // parser.rs:74-103: strings in directives parse as duration first
  private def directivePrimitive(key: String, v: JValue): Value = v match {
    case JBool(b)    => Value.BoolV(b)
    case JInt(i)     =>
      if (i.isValidLong) Value.IntV(i.toLong)
      else throw CondError(s"Directive '$key' contains integer value out of range: $i")
    case JLong(l)    => Value.IntV(l)
    case JDouble(d)  => Value.FloatV(d)
    case JDecimal(d) => Value.FloatV(d.toDouble)
    case JString(s)  => Value.parseDuration(s).getOrElse(Value.StrV(s))
    case other => throw CondError(
      s"Directive '$key' contains unsupported value type: $other")
  }

  // parser.rs:141-158
  private def parseRecursively(json: JValue): List[Node] = json match {
    case JObject(fields) => parseObject(dedupFields(fields))
    case JBool(b)        => List(Node.Const(Value.BoolV(b)))
    case JInt(i)         => List(Node.Const(Value.IntV(i.toLong)))
    case JLong(l)        => List(Node.Const(Value.IntV(l)))
    case JDouble(d)      => List(Node.Const(Value.FloatV(d)))
    case JDecimal(d)     => List(Node.Const(Value.FloatV(d.toDouble)))
    case JString(s)      => List(parseLiteral(s))
    case JArray(_) => throw CondError(
      s"Array type is not supported: ${JsonMethods.compact(json)}")
    case JNull | JNothing => throw CondError("Null type is not supported")
    case other => throw CondError(s"Unsupported JSON value: $other")
  }

  // parser.rs:160-177
  private def parseObject(fields: List[JField]): List[Node] =
    fields.map { case (key, value) =>
      value match {
        case JArray(operands) =>
          mkOperator(key, operands.flatMap(parseRecursively))
        case JObject(opRhs) => parseObjectSyntax(key, opRhs)
        case other => mkOperator(key, parseRecursively(other))
      }
    }

  // parser.rs:192-214
  private def parseLiteral(s: String): Node =
    if (s.startsWith("&")) Node.LabelRef(s.substring(1))
    else if (s.startsWith("@")) Node.ComputedRef(s.substring(1))
    else if (s.startsWith("$$")) Node.Const(Value.StrV("$" + s.substring(2)))
    else if (s.startsWith("$")) {
      if (operatorNames.contains(s)) mkOperator(s, Nil)
      else throw CondError(
        s"Unknown '$$' literal '$s'; use '$$$$' to escape a string value")
    } else Value.parseDuration(s) match {
      case Some(d) => Node.Const(d)
      case None    => Node.Const(Value.StrV(s))
    }

  // parser.rs:226-240: {"&label": {"$op": rhs}} — label becomes operand 0
  private def parseObjectSyntax(
      leftOperand: String, opRhs: List[JField]): Node = {
    val left = List(parseLiteral(leftOperand))
    if (opRhs.size != 1)
      throw CondError("Object notation must have exactly one operator")
    val (operator, operand) = opRhs.head
    mkOperator(operator, left ++ parseRecursively(operand))
  }

  /** Operator arity checks from each operator's `Boxed::boxed`. */
  private def mkOperator(name: String, operands: List[Node]): Node = {
    if (!name.startsWith("$"))
      throw CondError(s"Operator '$name' must start with '$$'")
    if (!operatorNames.contains(name))
      throw CondError(s"Operator '$name' not supported")
    val arity: PartialFunction[String, Unit] = {
      case "$each_n" | "$each_t" | "$limit" | "$abs" =>
        require1(name, operands, 1)
      case "$gate" | "$eq" | "$ne" | "$gt" | "$gte" | "$lt" | "$lte" |
          "$add" | "$sub" | "$mult" | "$div" | "$div_num" | "$rem" |
          "$contains" | "$starts_with" | "$ends_with" | "$cast" =>
        require1(name, operands, 2)
      case "$second" | "$minute" | "$hour" | "$day" | "$month" | "$year" |
          "$weekday" =>
        if (operands.size != 1 && operands.size != 2)
          throw CondError(s"$name requires one or two operands")
      case "$in" | "$nin" | "$exists" | "$has" | "$ref" =>
        if (operands.isEmpty)
          throw CondError(s"$name requires at least one operand")
      case "$timestamp" | "$id" =>
        if (operands.nonEmpty)
          throw CondError(s"$name requires no operands")
    }
    arity.lift(name)
    Node.Op(name, operands)
  }

  private def require1(name: String, ops: List[Node], n: Int): Unit =
    if (ops.size != n)
      throw CondError(s"$name requires exactly ${if (n == 1) "one" else "two"} operand${if (n == 1) "" else "s"}")
}
