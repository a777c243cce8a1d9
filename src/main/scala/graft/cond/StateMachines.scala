package graft.cond

/** The `$each_t` / `$gate` state machines as pure transition functions,
  * shared by the batch interpreter ([[Interp]]) and the Structured
  * Streaming stateful path (graft.stream.StatefulStream via
  * flatMapGroupsWithState). State is a small serializable case class per
  * (bucket, entry) key.
  */
object StateMachines {

  /** each_t.rs:37-66 — time debounce, reset when time goes backwards. */
  final case class EachTState(lastTimestamp: Option[Long] = None)

  def eachT(state: EachTState, tsUs: Long, intervalSec: Double): (EachTState, Boolean) = {
    val lastTime = state.lastTimestamp.getOrElse(tsUs)
    if (tsUs < lastTime) (EachTState(Some(tsUs)), false)
    else {
      // Rust `(s * 1e6) as u64` saturates negative to 0
      val intervalUs = math.max(0.0, intervalSec * 1e6).toLong
      val ret = tsUs - lastTime >= intervalUs
      (EachTState(Some(if (ret) tsUs else lastTime)), ret)
    }
  }

  /** gate.rs:16-29 state fields; transition = gate.rs:75-140. */
  final case class GateState(
      gateDeadline: Option[Long] = None,
      previousInput: Boolean = false,
      resetRequired: Boolean = false,
      lastTimestamp: Option[Long] = None)

  def gate(state0: GateState, tsUs: Long, durationUs: Long,
      input: Boolean): (GateState, Boolean) = {
    // time went backwards → drop runtime state
    var s =
      if (state0.lastTimestamp.exists(tsUs < _)) GateState()
      else state0
    s = s.copy(lastTimestamp = Some(tsUs))
    val dur = math.max(0L, durationUs)
    // 1) expire active window, arm reset latch
    if (s.gateDeadline.exists(tsUs >= _))
      s = s.copy(gateDeadline = None, resetRequired = true)
    // 2) after timeout, force false until input seen false once
    if (s.resetRequired) {
      if (!input) s = s.copy(resetRequired = false)
      return (s.copy(previousInput = input), false)
    }
    // 3) open a new window only on a rising edge
    if (s.gateDeadline.isEmpty && !s.previousInput && input)
      s = s.copy(gateDeadline = Some(tsUs + dur))
    // 4) while open, mirror input; otherwise force false
    val output = s.gateDeadline.exists(tsUs < _) && input
    (s.copy(previousInput = input), output)
  }
}
