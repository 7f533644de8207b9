package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interchange-format fidelity on ADVERSARIAL content — the registered
  * io_*_roundtrip queries prove fidelity on the real corpus (oracle-gated);
  * these specs prove the framing itself survives content the synthetic
  * corpus never exercises (embedded delimiters, quotes, newlines). */
class IoSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("CSV round trip survives embedded commas, quotes, and newlines") {
    import spark.implicits._
    val hostile = Seq(
      (1L, "plain tokens only", "en"),
      (2L, "comma, separated, clauses", "en"),
      (3L, "she said \"quoted, with comma\" twice \"\"", "fr"),
      (4L, "line one\nline two, with comma\n\"line three\"", "de"),
      (5L, "", "es"),
      (6L, "trailing backslash \\ and \\\" mix", "zh"))
      .toDF("doc_id", "text", "lang")
    val out = s"/tmp/graft-io-spec-${ProcessHandle.current().pid()}/csv-hostile"
    hostile.write.mode("overwrite").option("header", "false").csv(out)
    // embedded newlines make records span lines → the read needs multiLine
    // (documented trade: multiLine CSV files are not splittable — the
    // registered corpus round trip stays in default splittable mode and
    // the synthesis keeps text newline-free)
    val back = spark.read
      .schema("doc_id BIGINT, text STRING, lang STRING")
      .option("multiLine", "true").csv(out)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
      .sortBy(_._1)
    val want = hostile.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
      .sortBy(_._1)
    // Spark writes an empty string as an empty field and reads it back as
    // NULL unless told otherwise — pin the documented asymmetry explicitly
    assert(back.zip(want).forall { case (b, w) =>
      b._1 == w._1 && b._3 == w._3 &&
        (b._2 == w._2 || (w._2.contains("") && b._2.isEmpty))
    }, s"round trip mismatch:\n${back.mkString("\n")}")
  }
}
