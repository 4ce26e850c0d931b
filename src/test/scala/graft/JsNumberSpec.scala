package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.JsNumber.format

/** JS `Number → String` rendering table (values cross-checked against V8) +
  * round-trip property. This is the reference's highest parity risk
  * (SURVEY.md §7.3). */
class JsNumberSpec extends AnyFunSuite {

  test("rendering table matches JS") {
    val cases = Seq(
      10.8103524 -> "10.8103524",   // freetrade.json golden
      78990.0 -> "78990",           // bullionvault.json golden (from 78,990.00)
      3.3 -> "3.3",
      10.0 -> "10",                 // Java Double.toString would say 10.0
      0.012 -> "0.012",
      1.32373113 -> "1.32373113",
      0.25746268 -> "0.25746268",
      9.90434808 -> "9.90434808",
      1296.45 -> "1296.45",
      3.21898 -> "3.21898",
      0.0 -> "0",
      -0.0 -> "0",
      -1.5 -> "-1.5",
      100.0 -> "100",
      0.1 -> "0.1",
      0.000001 -> "0.000001",       // smallest non-exponent magnitude in JS
      0.0000001 -> "1e-7",          // JS switches to exponent below 1e-6
      1.5e-7 -> "1.5e-7",
      1e21 -> "1e+21",              // JS switches to exponent at 1e21
      1e20 -> "100000000000000000000",
      12345.6789 -> "12345.6789",
      0.1 + 0.2 -> "0.30000000000000004", // shortest-round-trip classic
      1.0 / 3.0 -> "0.3333333333333333",
      2.5e22 -> "2.5e+22")
    for ((d, expected) <- cases) assert(format(d) == expected, s"format($d)")
  }

  test("round-trip property: parse(format(d)) == d (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    var i = 0
    while (i < 20000) {
      val d = rnd.nextInt(3) match {
        case 0 => (rnd.nextDouble() - 0.5) * 2e9
        case 1 => (rnd.nextDouble() - 0.5) * 2.0
        case _ =>
          val bits = rnd.nextLong()
          val v = java.lang.Double.longBitsToDouble(bits)
          if (v.isNaN || v.isInfinite) 1.25 else v
      }
      val s = format(d)
      assert(java.lang.Double.parseDouble(s) == d, s"round-trip failed for $d -> $s")
      i += 1
    }
  }

  test("integers render without decimal point") {
    val rnd = new scala.util.Random(7)
    (0 until 5000).foreach { _ =>
      val n = rnd.nextLong() % 1000000000L
      assert(format(n.toDouble) == n.toString)
    }
  }

  test("shortest representation: no trailing zeros, no forced .0") {
    val rnd = new scala.util.Random(11)
    (0 until 5000).foreach { _ =>
      val s = format((rnd.nextDouble() - 0.5) * 2e9)
      assert(!s.contains("e") || s.matches("-?\\d(\\.\\d+)?e[+-]\\d+"))
      if (s.contains('.') && !s.contains('e')) assert(!s.endsWith("0") && !s.endsWith("."))
    }
  }
}
