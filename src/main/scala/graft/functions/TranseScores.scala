package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native TransE pair scorer: child is `array(h, r, t, t′)` (four equal-width
  * `array<double>` embeddings), output is `[‖h+r−t‖², ‖h+r−t′‖²]` — both
  * squared L2 distances in one ascending-dimension pass over in-place
  * `ArrayData` (the [[PqCodes]]/[[LshBucket]] codegen precedent).
  *
  * This replaces the long-format window form of
  * [[graft.ops.KgEmbed]]'s scoring — per-(pair, dim) rows shuffled to a
  * pair-keyed window summed 8 rows back into one score: a pairs×dims
  * exchange and a 64M-row pinned intermediate at the 2M-page probe scale,
  * all to compute two 8-term sums the scorer now does map-side. Rounding
  * (6dp) stays OUTSIDE in the Column code: the cross-engine contract is
  * ROUND(sum, 6), and an ascending in-register sum agrees with the
  * oracle's grouped SUM well inside 6dp. */
case class TranseScores(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(DoubleType, _), _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"transe_scores requires ARRAY<ARRAY<DOUBLE>> input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "transe_scores"

  override protected def nullSafeEval(input: Any): Any =
    TranseScores.score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TranseScores.score($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TranseScores {
  /** Static so generated code and interpreted eval share one body. */
  def score(quad: ArrayData): GenericArrayData = {
    val h = quad.getArray(0)
    val r = quad.getArray(1)
    val t = quad.getArray(2)
    val x = quad.getArray(3)
    val n = h.numElements()
    var spos = 0.0
    var sneg = 0.0
    var d = 0
    while (d < n) {
      val hr = h.getDouble(d) + r.getDouble(d)
      val dp = hr - t.getDouble(d)
      val dn = hr - x.getDouble(d)
      spos += dp * dp
      sneg += dn * dn
      d += 1
    }
    new GenericArrayData(Array(spos, sneg))
  }
}
