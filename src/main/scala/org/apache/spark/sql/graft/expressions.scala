package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for JS `Number → String` rendering — the one
  * scalar the reference's output format needs that Spark lacks (SURVEY.md
  * §7.3; golden expectations like `78990` from `78,990.00` in the reference's
  * bullionvault fixtures). Codegen emits a direct static call, so the
  * formatter stays inside whole-stage codegen instead of paying ScalaUDF's
  * encoder + closure-call overhead. Registered as SQL function `js_num` by
  * [[graft.GraftExtensions]].
  *
  * Lives under `org.apache.spark.sql` because the expression/Column bridge
  * APIs it builds on are `private[sql]` in Spark 4's classic backend — the
  * standard packaging for third-party Catalyst expressions.
  */
case class JsNumberFormat(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = StringType
  override def prettyName: String = "js_num"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.expr.JsNumber.format(input.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.expr.JsNumber.format($c))")

  override protected def withNewChildInternal(newChild: Expression): JsNumberFormat =
    copy(child = newChild)
}

/** Column ↔ Expression bridge for the classic (non-Connect) backend. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Runtime registration for sessions not built with
  * `spark.sql.extensions=graft.GraftExtensions` — makes `js_num` callable
  * from SQL text on an existing session. */
object GraftFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "js_num", exprs => JsNumberFormat(exprs.head), "scala_udf")
  }
}
