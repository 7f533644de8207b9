package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Relations, TextOps}

/** Hand cases for the pass-11 operators: readability scores, typed-literal
  * extraction, Schwartz–Hearst abbreviation validation, mixture weights. */
class ReadabilityLiteralsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("readability: hand-computed Flesch / FK on a known doc, map-only plan") {
    // doc_id = 0 → k = 5 tokens/sentence; 6 words, 6 vowel groups,
    // sentences = ceil(6/5) = 2
    val docs = Seq((0L, "go to the big dog now")).toDF("doc_id", "text")
    val r = TextOps.readability(docs).head()
    assert(r.getLong(1) === 6L) // n_words
    assert(r.getLong(2) === 6L) // n_syllables
    assert(r.getLong(3) === 2L) // n_sentences
    // 206.835 - 1.015*(6/2) - 84.6*(6/6)
    assert(r.getDouble(4) === 119.19)
    // 0.39*3 + 11.8*1 - 15.59
    assert(r.getDouble(5) === -2.62)
    // map-only contract: no shuffle anywhere in the plan
    val plan = TextOps.readability(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "readability must be map-only")
  }

  test("literalFacts: dates and quantities extracted, set semantics") {
    val pages = Seq(
      ("u1", "x measured 42 units on 2024-01-02 and 2023-12-31"),
      ("u2", "no digits here"),
      ("u1", "x measured 42 units on 2024-01-02 and 2023-12-31") // dup page
    ).toDF("url", "text")
    val got = Relations.literalFacts(pages)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(got === Set(
      ("u1", "hasQuantity", "42", "xsd:integer"),
      ("u1", "hasDate", "2024-01-02", "xsd:date"),
      ("u1", "hasDate", "2023-12-31", "xsd:date")))
  }

  test("abbrevDefs: first-letter rule separates valid from invalid spans") {
    val pages = Seq(
      ("u1", "alpha beta gamma (ABG) trailing"),
      ("u2", "alpha beta gamma (ABX)"),
      ("u3", "no definitions at all")).toDF("url", "text")
    val got = Relations.abbrevDefs(pages)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getBoolean(3))).toSet
    assert(got === Set(
      ("u1", "alpha beta gamma", "ABG", true),
      ("u2", "alpha beta gamma", "ABX", false)))
  }

  test("mixWeights: sqrt-temperature weights and epochs on a 2-source corpus") {
    val docs = Seq(
      (1L, "a b c d", "s1"), (2L, "a", "s2")).toDF("doc_id", "text", "source")
    val got = TextOps.mixWeights(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap2
    // w_raw = (2, 1), sum 3
    assert(got("s1") === ((1L, 4L, 0.666667, 16666.666667)))
    assert(got("s2") === ((1L, 1L, 0.333333, 33333.333333)))
  }

  private implicit class Tup5Ops(
      rows: Array[(String, Long, Long, Double, Double)]) {
    def toMap2: Map[String, (Long, Long, Double, Double)] =
      rows.map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
  }
}
