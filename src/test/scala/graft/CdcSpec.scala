package graft

import graft.ops.{Dedup, TextOps}
import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking: the property that justifies its existence —
  * boundaries are a function of LOCAL content, so an edit shifts only the
  * chunk it lands in and everything downstream of the next boundary token
  * hashes identically (fixed frames lose every chunk after the edit). */
class CdcSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def isBoundary(t: String) =
    java.lang.Long.remainderUnsigned(TextOps.fingerprint64(t), 4L) == 0L

  test("cdc chunks resynchronize after a front insertion; lossless rebuild") {
    import spark.implicits._
    val vocab = (0 until 200).map(i => s"w$i")
    val (bounds, plains) = vocab.partition(isBoundary)
    assert(bounds.size >= 3 && plains.size >= 8, "vocab split degenerate")
    // base: three boundary-closed chunks plus an open tail
    val base = Seq(plains(0), plains(1), bounds(0), plains(2), plains(3),
      bounds(1), plains(4), plains(5), bounds(2), plains(6))
    val shifted = plains(7) +: base
    val docs = Seq((1L, base.mkString(" ")), (2L, shifted.mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val c1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    val c2 = chunks.filter(_._1 == 2L).sortBy(_._2)
    // chunks joined with single spaces rebuild the original text exactly
    assert(c1.map(_._3).mkString(" ") === base.mkString(" "))
    assert(c2.map(_._3).mkString(" ") === shifted.mkString(" "))
    // the insertion only perturbs the FIRST chunk; the other three match
    assert(c1.length === 4 && c2.length === 4)
    assert(c1.map(_._3).toSet.intersect(c2.map(_._3).toSet).size === 3)
    // and the dedup sees exactly those three as 2-copy chunks, keeper doc 1
    val dd = Dedup.cdcDedup(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    assert(dd.count(_._3 == 2L) === 3)
    assert(dd.filter(_._3 == 2L).forall(_._1 == 1L))
  }
}
