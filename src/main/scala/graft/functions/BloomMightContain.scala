package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter membership as a codegen'd predicate — the runtime-filter /
  * semi-join-pruning pattern: a bounded bitset built from the SMALL side's
  * keys prunes the BIG side at scan time, before any shuffle. Spark's own
  * injected runtime filters use engine-private hashing; this one is built
  * on the repo's portable md5-derived double hashes (Kirsch–Mitzenmacher:
  * pos_i = (h1 + i·h2) mod m), so the DuckDB oracle reconstructs the
  * identical bit positions and the EXACT same accept set — false positives
  * included (they are a deterministic function of the hashes, not noise).
  *
  * `words` rides inside the expression (serialized with the plan): fine for
  * the filter sizes pruning is built for (m = 2^16 bits = 8 KB here); a
  * multi-MB production filter should hold a `Broadcast` reference instead.
  * Inputs are the two 60-bit hash columns (computed by codegen'd built-ins
  * in the caller), so the generated code is just the k-probe loop —
  * whole-stage codegen keeps the scan → filter pipeline in one loop.
  */
case class BloomMightContain(left: Expression, right: Expression,
                             words: Array[Long], mBits: Int, k: Int)
    extends BinaryExpression {

  require(mBits > 0 && (words.length == (mBits + 63) / 64),
    s"words length ${words.length} does not cover $mBits bits")
  // h1 + 7·h2 < 8·2^60 = 2^63 for 60-bit inputs; k = 9 would wrap negative
  require(k >= 1 && k <= 8, s"k=$k out of the no-overflow bound [1,8]")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (BIGINT, BIGINT) hashes, got $other")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  /** Shared scalar contract (also the spec oracle). */
  def contains(h1: Long, h2: Long): Boolean = {
    var i = 0
    while (i < k) {
      val pos = (h1 + i.toLong * h2) % mBits
      if ((words((pos >> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def nullSafeEval(h1: Any, h2: Any): Any =
    contains(h1.asInstanceOf[Long], h2.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h1, h2) => {
      val w = ctx.addReferenceObj("bloomWords", words, "long[]")
      val i = ctx.freshName("bloomI")
      val pos = ctx.freshName("bloomPos")
      val ok = ctx.freshName("bloomOk")
      s"""
         |boolean $ok = true;
         |for (int $i = 0; $i < $k; $i++) {
         |  long $pos = ($h1 + (long) $i * $h2) % ${mBits}L;
         |  if (($w[(int) ($pos >> 6)] & (1L << ($pos & 63))) == 0L) {
         |    $ok = false; break;
         |  }
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
