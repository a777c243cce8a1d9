package graft.cond

import org.scalatest.funsuite.AnyFunSuite

/** Golden sequences transcribed from each_t.rs:80-140 and
  * gate.rs:131-240 test tables. */
class StateMachinesSpec extends AnyFunSuite {
  import StateMachines._

  private def runEachT(interval: Double, tss: Seq[Long]): Seq[Boolean] = {
    var s = EachTState()
    tss.map { ts => val (n, r) = eachT(s, ts, interval); s = n; r }
  }

  private def runGate(durUs: Long, steps: Seq[(Long, Boolean)]): Seq[Boolean] = {
    var s = GateState()
    steps.map { case (ts, in) => val (n, r) = gate(s, ts, durUs, in); s = n; r }
  }

  test("each_t apply_ok (0.1s interval)") {
    assert(runEachT(0.1, Seq(0L, 1L, 100001L, 100002L)) ==
      Seq(false, false, true, false))
  }

  test("each_t zero interval is always true") {
    assert(runEachT(0.0, Seq(0L)) == Seq(true))
  }

  test("each_t time-backwards resets") {
    assert(runEachT(0.1, Seq(200000L, 100000L, 200000L)) ==
      Seq(false, false, true))
  }

  test("gate apply_ok_with_duration_literal (10s)") {
    // gate.rs:131-155: opens at ts=100, mirrors until deadline
    assert(runGate(10000000L, Seq(
      (100L, true), (10000L - 1L + 100L, true),
      (100L + 9999899L, true), (100L + 10000000L, true),
      (100L + 10000001L, true))) ==
      Seq(true, true, true, false, false))
  }

  test("gate apply_ok_with_float_seconds (0.1s = 100000us)") {
    assert(runGate(100000L, Seq((0L, true), (99999L, true), (100000L, true))) ==
      Seq(true, true, false))
  }

  test("gate requires reset after timeout") {
    assert(runGate(1L, Seq((0L, true), (1L, true), (2L, true))) ==
      Seq(true, false, false))
  }

  test("gate reset cycle re-arms after input false") {
    assert(runGate(1L, Seq(
      (0L, true), (1L, true), (2L, true), (3L, false), (4L, true))) ==
      Seq(true, false, false, false, true))
  }

  test("gate time-backwards resets and reopens") {
    assert(runGate(100000L, Seq((200000L, true), (100000L, true))) ==
      Seq(true, true))
  }
}
