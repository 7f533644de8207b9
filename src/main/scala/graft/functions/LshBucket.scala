package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for the random-hyperplane LSH bucket id
  * (Charikar 2002): sign bit of ⟨plane_p, emb⟩ packed into bit p of an int.
  *
  * Replaces the typed `mapPartitions` formulation of
  * [[graft.ops.Similarity.lshBuckets]] — that shape re-introduced a
  * `DeserializeToObject → MapPartitions → SerializeFromObject` object-mode
  * island (every embedding decoded to `Seq[Double]` and re-encoded per row),
  * the exact tax the annotate path's native Generator exists to avoid. As a
  * codegen'd `UnaryExpression` the bucket computation stays inside
  * whole-stage codegen reading `ArrayData` in place: zero object conversion,
  * zero island (plan shape asserted in `OpsSpec`).
  *
  * The hyperplane matrix rides in the expression (same pattern as the
  * annotate Generators' broadcast handles): planes are few×dim doubles —
  * well under task-serialization scale — and have no SQL-literal form worth
  * forcing. Dot-product accumulation order is ascending j, matching both the
  * previous loop and DuckDB's `list_dot_product` (the oracle contract:
  * hyperplane literals round-trip exactly, so the fold is bit-identical).
  */
case class LshBucket(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket requires ARRAY<DOUBLE> input, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_bucket"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bucket = 0
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      var s = 0.0
      var j = 0
      val lim = math.min(pl.length, n)
      while (j < lim) { s += pl(j) * arr.getDouble(j); j += 1 }
      if (s >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val pls = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
      val b = ctx.freshName("lshBucket")
      val p = ctx.freshName("lshP")
      val j = ctx.freshName("lshJ")
      val s = ctx.freshName("lshSum")
      val pl = ctx.freshName("lshPlane")
      val lim = ctx.freshName("lshLim")
      s"""
         |int $b = 0;
         |for (int $p = 0; $p < $pls.length; $p++) {
         |  double[] $pl = $pls[$p];
         |  double $s = 0.0;
         |  int $lim = java.lang.Math.min($pl.length, $c.numElements());
         |  for (int $j = 0; $j < $lim; $j++) {
         |    $s += $pl[$j] * $c.getDouble($j);
         |  }
         |  if ($s >= 0) $b |= (1 << $p);
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
