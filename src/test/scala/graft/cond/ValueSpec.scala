package graft.cond

import org.scalatest.funsuite.AnyFunSuite
import Value._

/** Coercion-lattice golden cases transcribed from the reference's rstest
  * tables (value/cmp.rs:72-160, value/misc/cast.rs:37-76, value.rs tests,
  * core/duration.rs, value/arithmetic tests).
  */
class ValueSpec extends AnyFunSuite {

  test("parse precedence bool -> i64 -> f64 -> string (value.rs:51-61)") {
    assert(Value.parse("true") == BoolV(true))
    assert(Value.parse("false") == BoolV(false))
    assert(Value.parse("42") == IntV(42))
    assert(Value.parse("-42") == IntV(-42))
    assert(Value.parse("42.0") == FloatV(42.0))
    assert(Value.parse("2000.0") == FloatV(2000.0))
    assert(Value.parse("some string") == StrV("some string"))
    assert(Value.parse("True") == StrV("True")) // Rust bool parse is exact
    assert(Value.parse("1e3") == FloatV(1000.0))
    // i64 overflow falls over to float like Rust's parse chain
    assert(Value.parse("99999999999999999999") == FloatV(1e20))
  }

  test("cross-type equality (value/cmp.rs eq table)") {
    assert(BoolV(true).valueEq(IntV(1)))
    assert(!BoolV(true).valueEq(IntV(0)))
    assert(!BoolV(true).valueEq(IntV(-1)))
    assert(BoolV(true).valueEq(FloatV(1.0)))
    assert(IntV(1).valueEq(DurV(1)))
    assert(FloatV(2.0).valueEq(IntV(2)))
    assert(!StrV("1").valueEq(IntV(1)))   // string vs non-string never equal
    assert(!IntV(1).valueEq(StrV("1")))
    assert(StrV("a").valueEq(StrV("a")))
  }

  test("string vs non-string is unordered -> every comparison false") {
    assert(StrV("10").partialCmp(IntV(5)).isEmpty)
    assert(IntV(5).partialCmp(StrV("10")).isEmpty)
    assert(IntV(5).partialCmp(FloatV(4.5)).contains(1))
    assert(StrV("a").partialCmp(StrV("b")).exists(_ < 0))
  }

  test("arithmetic (add/sub/mult/div/div_num/rem/abs reference cases)") {
    assert(BoolV(true).add(BoolV(false)) == IntV(1))
    assert(BoolV(true).add(IntV(2)) == IntV(3))
    assert(BoolV(true).add(FloatV(2.0)) == FloatV(3.0))
    assert(IntV(1).add(FloatV(2.0)) == FloatV(3.0))
    assert(StrV("a").add(StrV("b")) == StrV("ab"))
    assertThrows[CondError](StrV("a").add(IntV(1)))
    assert(IntV(1).sub(IntV(2)) == IntV(-1))
    assert(IntV(2).mult(IntV(3)) == IntV(6))
    assert(IntV(3).div(IntV(2)) == FloatV(1.5))
    assert(IntV(3).divNum(IntV(2)) == IntV(1))
    assert(FloatV(10.0).divNum(DurV(2)) == IntV(5))
    assert(IntV(-10).rem(IntV(6)) == IntV(-4)) // truncated remainder
    assert(IntV(-10).abs == IntV(10))
    assert(BoolV(true).abs == IntV(1))
    assert(DurV(-1).abs == DurV(1))
    assertThrows[CondError](IntV(1).div(IntV(0)))
    assertThrows[CondError](IntV(1).divNum(FloatV(0.4))) // as_int -> 0
  }

  test("cast table (value/misc/cast.rs:37-76)") {
    assert(IntV(1).cast("bool") == BoolV(true))
    assert(FloatV(1.0).cast("int") == IntV(1))
    assert(StrV("1").cast("int") == IntV(1))
    assertThrows[CondError](StrV("xx").cast("int"))
    assert(StrV("1.0").cast("float") == FloatV(1.0))
    assert(BoolV(true).cast("string") == StrV("true"))
    assert(FloatV(1.0).cast("string") == StrV("1")) // Rust Display drops .0
    assert(DurV(1).cast("string") == StrV("1us"))
    assert(FloatV(1.0).cast("duration") == DurV(1))
    assert(StrV("1").cast("duration") == DurV(1))
    assertThrows[CondError](BoolV(true).cast("unknown"))
  }

  test("duration parse/format (core/duration.rs, duration_format.rs)") {
    assert(Value.parseDurationMicros("100ms 500us").contains(100500L))
    assert(Value.parseDurationMicros("1h -30m").contains(1800000000L))
    assert(Value.parseDurationMicros("2d 3h").contains(183600000000L))
    assert(Value.parseDurationMicros("15us").contains(15L))
    assert(Value.parseDurationMicros("").isEmpty)
    assert(Value.parseDurationMicros("100xyz").isEmpty)
    assert(Value.parseDurationMicros("abc").isEmpty)
    assert(Value.formatDuration(0) == "0us")
    assert(Value.formatDuration(-1000000) == "-1s")
    assert(Value.formatDuration(86400000000L + 3600000000L) == "1d 1h")
    assert(Value.formatDuration(86400000000L - 3600000000L + 5) == "23h 5us")
    assert(DurV(3600000000L).valueEq(Value.parseDuration("1h").get))
  }

  test("truthiness (value.rs:66-73)") {
    assert(IntV(-1).asBool && FloatV(1.5).asBool && StrV("x").asBool)
    assert(!IntV(0).asBool && !FloatV(0.0).asBool && !StrV("").asBool)
  }
}
