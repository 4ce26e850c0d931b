package graft

import org.apache.spark.sql.functions.col
import graft.expr.Parse

/** Unit coverage of the JS-compatible parsing scalars (SURVEY.md §2.3),
  * especially the parseFloat-vs-Number divergences that golden cases don't
  * exercise. */
class ParseSpec extends SparkSpec {

  private def evalD(c: org.apache.spark.sql.Column, input: String): Option[Double] = {
    import spark.implicits._
    val r = Seq(input).toDF("v").select(c.as("r")).first()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("jsParseFloat: longest numeric prefix, like JS parseFloat") {
    assert(evalD(Parse.jsParseFloat(col("v")), "1.32abc") == Some(1.32))    // prefix parse
    assert(evalD(Parse.jsParseFloat(col("v")), "  42.5 ") == Some(42.5))    // leading ws
    assert(evalD(Parse.jsParseFloat(col("v")), "-3e2xyz") == Some(-300.0))  // exponent prefix
    assert(evalD(Parse.jsParseFloat(col("v")), ".5") == Some(0.5))
    assert(evalD(Parse.jsParseFloat(col("v")), "abc") == None)              // NaN
    assert(evalD(Parse.jsParseFloat(col("v")), "") == None)                 // parseFloat('') is NaN
  }

  test("jsNumber: whole-string parse, ''/whitespace are 0, like JS Number") {
    assert(evalD(Parse.jsNumber(col("v")), "") == Some(0.0))        // Number('') == 0
    assert(evalD(Parse.jsNumber(col("v")), "   ") == Some(0.0))     // Number('  ') == 0
    assert(evalD(Parse.jsNumber(col("v")), "1.32abc") == None)      // whole-string only
    assert(evalD(Parse.jsNumber(col("v")), "-1296.45") == Some(-1296.45))
    assert(evalD(Parse.jsNumber(col("v")), "1e3") == Some(1000.0))
  }

  test("poundsNumber / parseNumber strip currency formatting") {
    assert(evalD(Parse.poundsNumber(col("v")), "£4,160.00") == Some(4160.0))
    assert(evalD(Parse.poundsNumber(col("v")), "n/a") == None)
    assert(evalD(Parse.parseNumber(col("v")), "78,990.00") == Some(78990.0))
  }

  test("date normalizers cover all four reference formats") {
    import spark.implicits._
    def evalS(c: org.apache.spark.sql.Column, input: String): Option[String] = {
      val r = Seq(input).toDF("v").select(c.as("r")).first()
      Option(r.getString(0))
    }
    assert(evalS(Parse.isoToDmy(col("v")), "2025-09-19T14:04:05.981Z") == Some("19/09/2025"))
    assert(evalS(Parse.dmyZeroPad(col("v")), "4/1/2024") == Some("04/01/2024"))
    assert(evalS(Parse.dmyZeroPad(col("v")), "31/2/2024") == Some("31/02/2024")) // passthrough, no validation (ii.js parity)
    assert(evalS(Parse.dMmmYyyyToDmy(col("v")), "16 Jun 2023") == Some("16/06/2023"))
    assert(evalS(Parse.dealTimeToDmy(col("v")), "May 20, 2025 at 9:59:30 PM BST") == Some("20/05/2025"))
    assert(evalS(Parse.dealTimeToDmy(col("v")), "21 August 2019 11:23:26 BST") == Some("21/08/2019"))
    assert(evalS(Parse.dealTimeToDmy(col("v")), "Apr 15, 2025 at 2:30:15 PM") == Some("15/04/2025")) // no tz token
  }
}
