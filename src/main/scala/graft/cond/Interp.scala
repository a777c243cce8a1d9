package graft.cond

import java.time.{Instant, ZoneId, ZonedDateTime}

/** Per-record evaluation context (condition.rs:19-29). */
final case class Ctx(
    timestamp: Long,
    labels: collection.Map[String, String],
    computedLabels: collection.Map[String, String] = Map.empty)

/** Tree-walking evaluator with per-node mutable state.
  *
  * Mirrors the reference's `Node::apply` interpreter exactly — including
  * short-circuiting `$and`/`$or`/`$none_of` (so stateful operands tick only
  * when actually evaluated), per-node `$each_n`/`$each_t`/`$gate` state, and
  * the `$limit` Interrupt. One instance per (query, entry): the reference
  * fans a multi-entry query out to one filter chain per entry
  * (storage/bucket/query.rs:40-63), so state is per-entry.
  *
  * This is the sequential kernel run inside `mapPartitions` for trees the
  * Catalyst compiler can't express; pure trees never use it
  * (see [[graft.cond.CondCompiler]]).
  */
final class Interp(root: Node) {
  import Value._

  /** Stateful node instances in tree (build) order — the hooks for the
    * streaming path to persist interpreter state across micro-batches
    * ([[graft.stream.StatefulStream.whenFilter]]). Build order is the
    * deterministic depth-first walk of the parsed tree, so snapshots
    * taken by one Interp instance restore into any other built from an
    * equal tree. */
  private val statefulNodes =
    scala.collection.mutable.ArrayBuffer.empty[StatefulEval]

  private val evalRoot = build(root)

  /** Evaluate the condition for one record. Throws [[CondError]] on
    * evaluation errors and [[InterruptSignal]] when `$limit` is exhausted.
    */
  def apply(ctx: Ctx): Value = evalRoot(ctx)

  /** Serializable snapshot of every stateful operator's state. */
  def stateSnapshot: Vector[Any] = statefulNodes.map(_.snapshot).toVector

  /** Restore a [[stateSnapshot]] taken from an Interp over an equal tree.
    * Ignores a snapshot of mismatched shape (e.g. after a replication's
    * `when` was edited — state restarts fresh, the only sane recovery). */
  def restoreState(s: Seq[Any]): Unit =
    if (s.length == statefulNodes.length)
      statefulNodes.zip(s).foreach { case (n, v) => n.restore(v) }

  private trait StatefulEval {
    def snapshot: Any
    def restore(s: Any): Unit
  }

  private type Eval = Ctx => Value

  private def build(n: Node): Eval = n match {
    case Node.Const(v)    => _ => v
    case Node.LabelRef(name) =>
      ctx => Value.parse(ctx.labels.getOrElse(name,
        throw CondError(s"Reference '$name' not found")))
    case Node.ComputedRef(name) =>
      ctx => Value.parse(ctx.computedLabels.getOrElse(name,
        throw CondError(s"Computed reference '$name' not found")))
    case Node.Op(name, operandNodes) =>
      val ops = operandNodes.map(build).toArray
      name match {
        // logical (operators/logical/*.rs) — all short-circuit
        case "$and" | "$all_of" =>
          ctx => BoolV(ops.forall(_(ctx).asBool))
        case "$or" | "$any_of" =>
          ctx => BoolV(ops.exists(_(ctx).asBool))
        case "$not" | "$none_of" =>
          ctx => BoolV(!ops.exists(_(ctx).asBool))
        case "$xor" | "$one_of" => // no short-circuit (one_of.rs:14-24)
          ctx => BoolV(ops.count(_(ctx).asBool) == 1)
        case "$in" =>
          ctx => {
            val v = ops(0)(ctx)
            BoolV(ops.iterator.drop(1).exists(_(ctx).valueEq(v)))
          }
        case "$nin" =>
          ctx => {
            val v = ops(0)(ctx)
            BoolV(!ops.iterator.drop(1).exists(_(ctx).valueEq(v)))
          }
        // comparison (operators/comparison/*.rs)
        case "$eq"  => ctx => BoolV(ops(0)(ctx).valueEq(ops(1)(ctx)))
        case "$ne"  => ctx => BoolV(!ops(0)(ctx).valueEq(ops(1)(ctx)))
        case "$gt"  => cmp(ops, _ > 0)
        case "$gte" => cmp(ops, _ >= 0)
        case "$lt"  => cmp(ops, _ < 0)
        case "$lte" => cmp(ops, _ <= 0)
        // arithmetic (value/arithmetic/*.rs)
        case "$add"     => ctx => ops(0)(ctx).add(ops(1)(ctx))
        case "$sub"     => ctx => ops(0)(ctx).sub(ops(1)(ctx))
        case "$mult"    => ctx => ops(0)(ctx).mult(ops(1)(ctx))
        case "$div"     => ctx => ops(0)(ctx).div(ops(1)(ctx))
        case "$div_num" => ctx => ops(0)(ctx).divNum(ops(1)(ctx))
        case "$rem"     => ctx => ops(0)(ctx).rem(ops(1)(ctx))
        case "$abs"     => ctx => ops(0)(ctx).abs
        // string (value/string/*.rs): both sides coerced via Display
        case "$contains" =>
          ctx => BoolV(ops(0)(ctx).show.contains(ops(1)(ctx).show))
        case "$starts_with" =>
          ctx => BoolV(ops(0)(ctx).show.startsWith(ops(1)(ctx).show))
        case "$ends_with" =>
          ctx => BoolV(ops(0)(ctx).show.endsWith(ops(1)(ctx).show))
        // date (operators/date.rs:27-66 + leaves)
        case "$second"  => dateOp(name, ops, _.getSecond.toLong)
        case "$minute"  => dateOp(name, ops, _.getMinute.toLong)
        case "$hour"    => dateOp(name, ops, _.getHour.toLong)
        case "$day"     => dateOp(name, ops, _.getDayOfMonth.toLong)
        case "$month"   => dateOp(name, ops, _.getMonthValue.toLong)
        case "$year"    => dateOp(name, ops, _.getYear.toLong)
        case "$weekday" => // 0 = Monday (weekday.rs:15-25)
          dateOp(name, ops, _.getDayOfWeek.getValue.toLong - 1L)
        // misc
        case "$exists" | "$has" => // operators/misc/exists.rs:14-27
          ctx => BoolV(ops.forall(op => ctx.labels.contains(op(ctx).show)))
        case "$cast" =>
          ctx => {
            val tpe = ops(1)(ctx)
            if (!tpe.isString)
              throw CondError("$cast requires a string type name")
            ops(0)(ctx).cast(tpe.show)
          }
        case "$ref" => // operators/misc/ref.rs:14-26 — dynamic label lookup
          ctx => {
            val label = ops(0)(ctx).show
            Value.parse(ctx.labels.getOrElse(label,
              throw CondError(s"Reference '$label' not found")))
          }
        case "$timestamp" | "$id" => ctx => IntV(ctx.timestamp)
        // aggregation (stateful; operators/aggregation/*.rs)
        case "$each_n" => new EachN(ops(0))
        case "$each_t" => new EachT(ops(0))
        case "$gate"   => new Gate(ops(0), ops(1))
        case "$limit"  => new Limit(ops(0))
        case other => throw CondError(s"Operator '$other' not supported")
      }
  }

  private def cmp(ops: Array[Eval], f: Int => Boolean): Eval =
    ctx => BoolV(ops(0)(ctx).partialCmp(ops(1)(ctx)).exists(f))

  private def dateOp(name: String, ops: Array[Eval], field: ZonedDateTime => Long): Eval =
    ctx => {
      val tsUs = ops(0)(ctx).asInt
      val zone =
        if (ops.length == 2) {
          val tz = ops(1)(ctx)
          if (!tz.isString)
            throw CondError(s"$name requires timezone to be a string")
          try ZoneId.of(tz.show)
          catch { case _: Exception => throw CondError(s"Invalid timezone: '${tz.show}'") }
        } else ZoneId.of("UTC")
      val instant = Instant.ofEpochSecond(
        Math.floorDiv(tsUs, 1000000L), Math.floorMod(tsUs, 1000000L) * 1000L)
      IntV(field(instant.atZone(zone)))
    }

  /** each_n.rs:34-54 — counter ticks per *evaluation*, true every n-th. */
  private final class EachN(nOp: Eval) extends (Ctx => Value) with StatefulEval {
    statefulNodes += this
    private var count = 0L
    def snapshot: Any = count
    def restore(s: Any): Unit = count = s.asInstanceOf[Long]
    def apply(ctx: Ctx): Value = {
      count += 1
      val n = nOp(ctx).asInt
      if (n == 0) throw CondError("Value '0' is not a valid operand for $each_n")
      BoolV(count % n == 0)
    }
  }

  /** each_t.rs:37-66 — time debounce; resets when time goes backwards.
    * Transition logic shared with the streaming path (StateMachines). */
  private final class EachT(tOp: Eval) extends (Ctx => Value) with StatefulEval {
    statefulNodes += this
    private var state = StateMachines.EachTState()
    def snapshot: Any = state
    def restore(s: Any): Unit = state = s.asInstanceOf[StateMachines.EachTState]
    def apply(ctx: Ctx): Value = {
      val v = tOp(ctx)
      val s = if (v.isDuration) v.asFloat / 1e6 else v.asFloat
      val (next, ret) = StateMachines.eachT(state, ctx.timestamp, s)
      state = next
      BoolV(ret)
    }
  }

  /** gate.rs:75-140 — edge-triggered gate with reset latch.
    * Transition logic shared with the streaming path (StateMachines). */
  private final class Gate(durOp: Eval, inputOp: Eval) extends (Ctx => Value) with StatefulEval {
    statefulNodes += this
    private var state = StateMachines.GateState()
    def snapshot: Any = state
    def restore(s: Any): Unit = state = s.asInstanceOf[StateMachines.GateState]
    def apply(ctx: Ctx): Value = {
      val dv = durOp(ctx)
      val duration = // gate.rs:42-53: duration literal in µs, number in sec
        math.max(0L, if (dv.isDuration) dv.asInt else (dv.asFloat * 1e6).toLong)
      val input = inputOp(ctx).asBool
      val (next, out) = StateMachines.gate(state, ctx.timestamp, duration, input)
      state = next
      BoolV(out)
    }
  }

  /** limit.rs:30-43 — Interrupt past n evaluations. */
  private final class Limit(nOp: Eval) extends (Ctx => Value) with StatefulEval {
    statefulNodes += this
    private var count = 0L
    def snapshot: Any = count
    def restore(s: Any): Unit = count = s.asInstanceOf[Long]
    def apply(ctx: Ctx): Value = {
      count += 1
      if (count > nOp(ctx).asInt) throw new InterruptSignal
      BoolV(true)
    }
  }
}
