package graft.model

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.expr.JsNumber

/** Canonical transaction record — the single schema every broker source
  * normalizes into, mirroring the reference's `{kind, date, asset, amount,
  * price, expenses}` object (`freetrade.js:152-159`, `ii.js:90`,
  * `fidelity.js:80-87`, `bullionvault.js:89-96`).
  *
  *  - `kind`     ∈ {BUY, SELL}
  *  - `date`     `dd/MM/yyyy` string (the reference's output/rendering form;
  *               sort paths re-derive a typed date — `index.js:12-36`)
  *  - `asset`    ISIN / ticker / SEDOL / underscored fund name / GOLD / SILVER
  *  - `amount`   quantity, > 0
  *  - `price`    per-unit price in GBP, > 0
  *  - `expenses` fees/commission, >= 0
  */
case class Transaction(
    kind: String,
    date: String,
    asset: String,
    amount: Double,
    price: Double,
    expenses: Double)

object Transaction {
  val columns: Seq[String] = Seq("kind", "date", "asset", "amount", "price", "expenses")

  /** The reference's space-delimited output line
    * `KIND DD/MM/YYYY ASSET AMOUNT PRICE EXPENSES` with JS number rendering
    * (`freetrade.js:197`, `ii.js:117`, `fidelity.js:115`, `bullionvault.js:116`). */
  def lineCol: Column =
    concat_ws(" ", col("kind"), col("date"), col("asset"),
      JsNumber.jsNum(col("amount")), JsNumber.jsNum(col("price")), JsNumber.jsNum(col("expenses")))

  /** Canonical DataFrame → formatted output lines. */
  def toLines(df: DataFrame): Dataset[String] = {
    import df.sparkSession.implicits._
    df.select(lineCol.as("line")).as[String]
  }
}
