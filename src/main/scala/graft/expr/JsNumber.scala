package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** JavaScript-compatible `Number → String` rendering.
  *
  * The reference engine renders every numeric output field with the JS default
  * number-to-string algorithm (shortest decimal representation that round-trips,
  * no trailing zeros, integers without a decimal point, exponent notation only
  * for |x| >= 1e21 or |x| < 1e-6). See the reference's line formatting at
  * `freetrade.js:195-200`, `ii.js:116-118`, `fidelity.js:113-118`,
  * `bullionvault.js:114-119` and the golden expectations such as
  * `10.8103524` (from input `10.81035240`) and `78990` (from `78,990.00`)
  * in `__tests__/data/freetrade.json` / `bullionvault.json`.
  *
  * Java's `Double.toString` disagrees (`10.0` instead of `10`, different
  * scientific-notation thresholds), so we compute the shortest round-trip
  * representation explicitly: try 1..17 significant digits via correctly-rounded
  * `%.{p}e` formatting and take the first that parses back to the same double —
  * exactly the ECMA-262 `Number::toString` digit-selection rule.
  */
object JsNumber {

  /** Shortest-round-trip JS rendering of a double. */
  def format(d: Double): String = {
    if (java.lang.Double.isNaN(d)) return "NaN"
    if (d == java.lang.Double.POSITIVE_INFINITY) return "Infinity"
    if (d == java.lang.Double.NEGATIVE_INFINITY) return "-Infinity"
    if (d == 0.0) return "0" // JS renders both 0 and -0 as "0"
    val neg = d < 0
    val a = math.abs(d)
    // shortest significant-digit string s.t. parseDouble round-trips
    var digits: String = null
    var exp = 0
    var p = 1
    while (digits == null && p <= 17) {
      val s = String.format(java.util.Locale.ROOT, "%." + (p - 1) + "e", Double.box(a))
      if (java.lang.Double.parseDouble(s) == a) {
        val i = s.indexOf('e')
        digits = s.substring(0, i).replace(".", "")
        exp = Integer.parseInt(s.substring(i + 1))
      }
      p += 1
    }
    val out =
      if (exp >= 21) expForm(digits, exp)
      else if (exp >= 0) {
        if (digits.length <= exp + 1) digits + "0" * (exp + 1 - digits.length)
        else digits.substring(0, exp + 1) + "." + digits.substring(exp + 1)
      } else if (exp >= -6) "0." + "0" * (-exp - 1) + digits
      else expForm(digits, exp)
    if (neg) "-" + out else out
  }

  private def expForm(digits: String, exp: Int): String = {
    val m = if (digits.length == 1) digits else digits.substring(0, 1) + "." + digits.substring(1)
    val sign = if (exp >= 0) "+" else "-"
    m + "e" + sign + math.abs(exp)
  }

  private val fmtUdf = udf((d: java.lang.Double) => if (d == null) null else format(d))

  /** Column form: render a DoubleType column JS-style as StringType, via the
    * codegen'd Catalyst expression
    * [[org.apache.spark.sql.graft.JsNumberFormat]] (falls back to a plain
    * Scala UDF if the classic Column bridge is unavailable, e.g. under a
    * Connect client). */
  def jsNum(c: Column): Column =
    try org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.JsNumberFormat(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
    catch { case _: LinkageError => fmtUdf(c) }
}
