package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the product-quantization hot path
  * ([[graft.ops.Similarity.pqTopK]]): the higher-order-function formulation
  * (`transform` + `aggregate` folds over a literal codebook) is interpreted
  * per row — 16 codes × 3 fold-dots × 4 subspaces of lambda dispatch per
  * vector benched the PQ scan at ~16 s where the brute-force scan runs in
  * ~1 s. As codegen'd expressions the encode and the ADC score stay inside
  * whole-stage codegen reading `ArrayData` in place (the [[LshBucket]]
  * precedent).
  *
  * Float contract (must stay bit-identical to the HOF form the DuckDB
  * oracle was proven against): every dot product accumulates ascending —
  * the `zip_with`+`aggregate` sequential fold = `list_dot_product` — and
  * the squared-L2 combines as `(sv·sv − 2·(sv·c)) + c·c`; the 6dp
  * assignment round is `java.math.BigDecimal.valueOf(x).setScale(6,
  * HALF_UP)` — exactly Spark's `round(x, 6)`.
  */
object PqMath {
  /** Ascending-order dot of an `ArrayData` slice with a codeword. */
  def sliceDot(a: ArrayData, off: Int, cv: Array[Double]): Double = {
    var s = 0.0
    var j = 0
    while (j < cv.length) { s += a.getDouble(off + j) * cv(j); j += 1 }
    s
  }

  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Nearest-code argmin for one subspace (round-6 squared L2, lowest code
    * wins ties — ascending k with strict `<` keeps the first minimum). */
  def argmin(a: ArrayData, off: Int, cb: Array[Array[Double]]): Long = {
    // sv·sv once per subspace (the HOF form folds it per candidate, but the
    // value is identical — one ascending sum over the same slice)
    var svv = 0.0
    var j = 0
    while (j < cb(0).length) {
      val x = a.getDouble(off + j); svv += x * x; j += 1
    }
    var best = Double.PositiveInfinity
    var bestCode = 0L
    var k = 0
    while (k < cb.length) {
      val cv = cb(k)
      val svc = sliceDot(a, off, cv)
      var cc = 0.0
      var i = 0
      while (i < cv.length) { cc += cv(i) * cv(i); i += 1 }
      val d2 = round6(svv - 2.0 * svc + cc)
      if (d2 < best) { best = d2; bestCode = k.toLong }
      k += 1
    }
    bestCode
  }
}

/** PQ encode: per subspace, the nearest-code id against its literal
  * codebook — `array<long>` of `codebooks.length` codes. Subspace `s`
  * reads the input slice `[off, off + w)` where `w = codebooks(s)(0).length`
  * and offsets accumulate — dimensions must cover the input in order. */
case class PqCodes(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes requires ARRAY<DOUBLE> input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val codes = new Array[Long](codebooks.length)
    var off = 0
    var s = 0
    while (s < codebooks.length) {
      codes(s) = PqMath.argmin(arr, off, codebooks(s))
      off += codebooks(s)(0).length
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cbs = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
      val codes = ctx.freshName("pqCodes")
      val off = ctx.freshName("pqOff")
      val s = ctx.freshName("pqS")
      s"""
         |long[] $codes = new long[$cbs.length];
         |int $off = 0;
         |for (int $s = 0; $s < $cbs.length; $s++) {
         |  $codes[$s] = graft.functions.PqMath.argmin($c, $off, $cbs[$s]);
         |  $off += $cbs[$s][0].length;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance cosine: exact query vector `left` vs the PQ
  * reconstruction named by `right` (the `array<long>` from [[PqCodes]]).
  * `(Σ_s q_s·c_s) / (√(q·q) · √(Σ_s c_s·c_s))`, every sum in fixed
  * ascending order — identical to the Column fold chain it replaces. */
case class PqAdcScore(left: Expression, right: Expression,
                      codebooks: Array[Array[Array[Double]]])
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score requires (ARRAY<DOUBLE>, ARRAY<BIGINT>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override protected def nullSafeEval(q: Any, codes: Any): Any =
    PqAdcScore.score(q.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, codes) => {
      val cbs = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
      s"${ev.value} = graft.functions.PqAdcScore.score($q, $codes, $cbs);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  /** Static so generated code and interpreted eval share one body. */
  def score(q: ArrayData, codes: ArrayData,
            cbs: Array[Array[Array[Double]]]): Double = {
    var adot = 0.0
    var an2 = 0.0
    var off = 0
    var s = 0
    while (s < cbs.length) {
      val cv = cbs(s)(codes.getLong(s).toInt)
      adot += PqMath.sliceDot(q, off, cv)
      var cc = 0.0
      var i = 0
      while (i < cv.length) { cc += cv(i) * cv(i); i += 1 }
      an2 += cc
      off += cv.length
      s += 1
    }
    var qq = 0.0
    var i = 0
    val n = q.numElements()
    while (i < n) { val x = q.getDouble(i); qq += x * x; i += 1 }
    adot / (math.sqrt(qq) * math.sqrt(an2))
  }
}
