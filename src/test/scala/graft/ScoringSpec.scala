package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.annotate.Scoring

/** A10 scoring: ordering contract direct-pref > direct-syn > expanded >
  * mapped holds by construction, per-match and per-weight. */
class ScoringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("weight ordering contract") {
    assert(Score.PrefWeight > Score.SynWeight)
    (1 to 10).foreach { d =>
      assert(Score.hierWeight(d) < Score.SynWeight, s"hier(d=$d) must stay below SYN")
      assert(Score.hierWeight(d) > 0)
    }
    assert(Score.hierWeight(2) < Score.hierWeight(1)) // decays with distance
    assert(Score.MapWeight < Score.SynWeight)
  }

  test("directScores: sums per (url, class), match_type prefers PREF") {
    import spark.implicits._
    val m = Seq(
      ("u1", 1, 4, "scan", "c1", "O1", "PREF"),
      ("u1", 9, 12, "scan", "c1", "O1", "SYN"),
      ("u1", 1, 4, "scan", "c2", "O1", "SYN"),
      ("u2", 1, 4, "sort", "c1", "O1", "PREF"))
      .toDF("url", "from", "to", "text", "classIri", "ont", "matchType")
    val out = Scoring.directScores(m).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(out(("u1", "c1")) === ((18.0, 2L, "PREF")))
    assert(out(("u1", "c2")) === ((8.0, 1L, "SYN")))
    assert(out(("u2", "c1")) === ((10.0, 1L, "PREF")))
  }

  test("cvalue variant: multi-word terms outrank single-word at equal counts") {
    import spark.implicits._
    val m = Seq(
      ("u1", 1, 10, "merge sort", "c1", "O1", "PREF"),
      ("u2", 1, 4, "sort", "c2", "O1", "PREF"))
      .toDF("url", "from", "to", "text", "classIri", "ont", "matchType")
    val out = Scoring.cvalueScores(m).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(out("c1") > out("c2"))
  }

  test("threshold + rank: ordered desc per doc, threshold filters") {
    import spark.implicits._
    val scored = Seq(("u1", "c1", 30.0), ("u1", "c2", 8.0), ("u1", "c3", 14.0))
      .toDF("url", "classIri", "score")
    val ranked = Scoring.thresholdAndRank(scored, 10.0).collect()
      .map(r => (r.getString(1), r.getInt(3))).toMap
    assert(ranked === Map("c1" -> 1, "c3" -> 2)) // c2 under threshold
  }
}
