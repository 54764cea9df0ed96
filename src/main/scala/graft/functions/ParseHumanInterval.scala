package graft.functions

import graft.util.HumanInterval
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, DayTimeIntervalType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for the reference's human-interval grammar (SURVEY §4.2a):
  * `parse_human_interval('2 days 3 hours 4 minutes')` → `INTERVAL DAY TO
  * SECOND`; invalid text → NULL (the relational face of the P5 repair
  * path — broken schedules become filterable nulls, not exceptions).
  *
  * A native Catalyst `Expression` with `doGenCode`, not a Scala UDF: the
  * generated code calls a static parse helper directly, so the call stays
  * inside whole-stage codegen with no row-encoder boundary or closure
  * serialization.
  */
case class ParseHumanInterval(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_human_interval requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = DayTimeIntervalType()
  override def nullable: Boolean = true
  override def prettyName: String = "parse_human_interval"

  override def nullSafeEval(input: Any): Any =
    ParseHumanInterval.parseOrNull(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("parsedInterval")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${childGen.isNull}) {
        java.lang.Long $boxed =
          graft.functions.ParseHumanInterval.parseOrNull(${childGen.value});
        if ($boxed != null) {
          ${ev.isNull} = false;
          ${ev.value} = $boxed.longValue();
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ParseHumanInterval =
    copy(child = newChild)
}

object ParseHumanInterval {
  /** Static helper the generated code calls: DayTimeIntervalType stores
    * microseconds as a long. */
  def parseOrNull(text: UTF8String): java.lang.Long =
    if (text == null) null
    else HumanInterval.tryParse(text.toString) match {
      case Right(d) =>
        try java.lang.Long.valueOf(Math.addExact(
          Math.multiplyExact(d.getSeconds, 1000000L), d.getNano / 1000L))
        catch { case _: ArithmeticException => null }
      case Left(_) => null
    }

  val info = new ExpressionInfo(classOf[ParseHumanInterval].getName,
    "parse_human_interval")

  /** Shared builder with an arity check — `exprs.head` alone would
    * silently drop extra arguments. */
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1,
      s"parse_human_interval expects exactly 1 argument, got ${exprs.length}")
    ParseHumanInterval(exprs.head)
  }

  /** Runtime registration against an existing session (no restart). */
  def install(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("parse_human_interval"), info, builder)
}
