package graft.util

import java.time.Duration
import org.scalatest.funsuite.AnyFunSuite

class HumanIntervalSpec extends AnyFunSuite {
  import HumanInterval._

  test("parses day/hour/minute combinations (refresh_interval.py:14-27)") {
    assert(parse("2 days 3 hours 4 minutes") ==
      Duration.ofDays(2).plusHours(3).plusMinutes(4))
    assert(parse("1 day") == Duration.ofDays(1))
    assert(parse("90 minutes") == Duration.ofMinutes(90))
    assert(parse("12 hours") == Duration.ofHours(12))
  }

  test("normalizes plurals, case and punctuation") {
    assert(parse("2 Days, 3 hours!") == Duration.ofDays(2).plusHours(3))
    assert(parse("1 minute") == parse("1 minutes"))
  }

  test("rejects seconds/weeks/months (refresh_interval.py:16-17)") {
    intercept[InvalidInterval](parse("30 seconds"))
    intercept[InvalidInterval](parse("2 weeks"))
    intercept[InvalidInterval](parse("1 month"))
    intercept[InvalidInterval](parse("1 day 5 seconds"))
  }

  test("requires at least one allowed unit (refresh_interval.py:18-19)") {
    intercept[InvalidInterval](parse("every so often"))
    intercept[InvalidInterval](parse(""))
    intercept[InvalidInterval](parse("5"))
  }

  test("leading unit rejected — deliberate hardening over the reference") {
    // refresh_interval.py:23-25 computes parts[parts.index('day')-1]; for a
    // LEADING unit the -1 wraps to the last token, so "days 2" silently
    // parses as 2 days there. We reject instead (documented divergence in
    // the HumanInterval scaladoc).
    intercept[InvalidInterval](parse("days 2"))
    intercept[InvalidInterval](parse("two days"))
  }

  test("tryParse returns Left on bad input") {
    assert(tryParse("1 hour").isRight)
    assert(tryParse("1 second").isLeft)
  }

  test("non-integer quantities rejected (hardening: reference reads '1.5' as 15)") {
    intercept[InvalidInterval](parse("1.5 hours"))
    intercept[InvalidInterval](parse("-2 days"))
  }

  test("abbreviations resolve or reject instead of silently dropping") {
    assert(parse("1 hour 30 min") == Duration.ofMinutes(90))
    assert(parse("2 hrs") == Duration.ofHours(2))
    assert(parse("1 d") == Duration.ofDays(1))
    intercept[InvalidInterval](parse("90 sec"))
    intercept[InvalidInterval](parse("2 wk"))
  }
}
