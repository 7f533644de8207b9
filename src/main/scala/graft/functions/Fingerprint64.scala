package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's 64-bit rolling polynomial
  * fingerprint (base 131, natural overflow — same contract as
  * [[graft.ops.TextOps.fingerprint64]], asserted equal in tests).
  *
  * This is the SURVEY.md §5/§7.3 escape-hatch tier demonstrated for real: a codegen'd
  * `Expression` participates in whole-stage codegen — no object-mode island,
  * no UDF boxing — so fingerprinting stays inside the same generated loop as
  * the surrounding projections/filters. Interpreted `nullSafeEval` fallback
  * included (required for codegen-disabled paths).
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | org.apache.spark.sql.types.NullType =>
        TypeCheckResult.TypeCheckSuccess // null literal folds to null output
      case other => TypeCheckResult.TypeCheckFailure(
        s"fingerprint64 requires STRING input, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override protected def nullSafeEval(input: Any): Any =
    graft.ops.TextOps.fingerprint64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("fpStr")
      val i = ctx.freshName("fpI")
      val h = ctx.freshName("fpH")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 1125899906842597L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = $h * 131L + (long) $s.charAt($i);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native 64-bit SimHash over whitespace tokens — same contract as
  * [[graft.ops.Dedup.simhash64]] (asserted equal in tests). Codegen calls
  * the shared static scalar (scalac emits static forwarders for top-level
  * objects, so Janino-generated code can invoke it) — one virtual-free call
  * per row, still inside whole-stage codegen, no object-mode island. */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | org.apache.spark.sql.types.NullType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires STRING input, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    graft.ops.Dedup.simhash64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.ops.Dedup.simhash64($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftFunctions {

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "fingerprint64" -> ((children: Seq[Expression]) => Fingerprint64(children.head)),
    "simhash64" -> ((children: Seq[Expression]) => Simhash64(children.head)))

  /** Register graft SQL functions on an existing session (test/REPL path). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `SparkSessionExtensions` hook — cluster path:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fingerprint64"),
      new ExpressionInfo(classOf[Fingerprint64].getName, "fingerprint64"),
      (children: Seq[Expression]) => Fingerprint64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Simhash64].getName, "simhash64"),
      (children: Seq[Expression]) => Simhash64(children.head)))
  }
}
