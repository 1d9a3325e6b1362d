package graft.util

import org.scalatest.funsuite.AnyFunSuite

class TimingSpec extends AnyFunSuite {

  test("prettyElapsed formats unit combinations") {
    assert(Timing.prettyElapsed(0) == "0 seconds")
    assert(Timing.prettyElapsed(1000) == "1 second")
    assert(Timing.prettyElapsed(61000) == "1 minute 1 second")
    assert(Timing.prettyElapsed(3661005) == "1 hour 1 minute 1.005 seconds")
    assert(Timing.prettyElapsed(90061000) == "1 day 1 hour 1 minute 1 second")
  }

  test("ordinal suffixes incl. teens") {
    assert(Seq(1, 2, 3, 4, 11, 12, 13, 21, 22, 23, 111).map(Timing.ordinal) ==
      Seq("1st", "2nd", "3rd", "4th", "11th", "12th", "13th", "21st", "22nd", "23rd", "111th"))
  }

  test("calculateTime returns the block result and a sane elapsed") {
    val (r, ms) = Timing.calculateTime { Thread.sleep(5); 42 }
    assert(r == 42 && ms >= 4)
  }

  test("richFormat replaces known vars, keeps unknown") {
    assert(Strings.richFormat("{a} and {b} and {c}", Map("a" -> 1, "b" -> "x")) ==
      "1 and x and {c}")
  }
}
