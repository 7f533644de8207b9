package graft.oracle

import scala.collection.mutable

import graft.{MatchType, Pred}
import graft.dict.NaiveMatcher
import graft.fixture.OntologyFixture

/** Reference-semantics scalar oracle (SURVEY.md §6.2): re-derives the
  * expected pipeline output with naive single-threaded code — naive O(n·m)
  * matcher, BFS closure, scalar expansions — sharing NO Spark code paths
  * with the engine. The end-to-end P/R gate compares the engine's distinct
  * (subj, pred, obj) set against [[goldenTriples]]; determinism on both sides
  * makes P/R = 1.0 the expected outcome (gate ≥ 0.95, BASELINE.json).
  */
object ReferenceOracle {

  /** Normalized dictionary with dense ids — same D6 id contract
    * (row_number over term order) as DictBuild. */
  lazy val dict: Vector[(String, Int, Vector[graft.DictTerm])] = {
    val rows = OntologyFixture.dictRows()
    val terms = rows.map(_.term).distinct.sorted
    terms.zipWithIndex.map { case (t, i) =>
      (t, i + 1, rows.filter(_.term == t).toVector)
    }
  }

  lazy val matcher = new NaiveMatcher(dict.map(d => (d._1, d._2)).toArray)
  private lazy val payloadById: Map[Int, Vector[graft.DictTerm]] =
    dict.map(d => d._2 -> d._3).toMap

  /** Direct matches for one doc (url, from, to, text, classIri, ont, type). */
  def directMatches(url: String, text: String, longestOnly: Boolean = false): Vector[graft.Match] =
    matcher.scan(text, longestOnly).iterator.flatMap { h =>
      payloadById(h.termId).map { e =>
        graft.Match(url, h.from, h.to, text.substring(h.from - 1, h.to),
          e.classIri, e.ont, if (e.pref) MatchType.Pref else MatchType.Syn)
      }
    }.toVector

  /** BFS min-distance ancestors per class, bounded by maxLevel. */
  def closure(maxLevel: Int): Map[String, Map[String, Int]] = {
    val parents: Map[String, Vector[String]] =
      OntologyFixture.edges.groupBy(_.childIri).map { case (c, es) =>
        c -> es.map(_.parentIri).toVector
      }
    OntologyFixture.concepts.map(_.classIri).map { start =>
      val dist = mutable.Map[String, Int]()
      var frontier = Set(start)
      var d = 0
      while (frontier.nonEmpty && d < maxLevel) {
        d += 1
        frontier = frontier.flatMap(n => parents.getOrElse(n, Vector.empty))
          .filter(p => !dist.contains(p) && p != start)
        frontier.foreach(p => dist(p) = d)
      }
      start -> dist.toMap
    }.toMap
  }

  /** Golden (subj, pred, obj) set for a corpus slice — the P/R gate input. */
  def goldenTriples(docs: Seq[(String, String)],
                    maxLevel: Int = 5): Set[(String, String, String)] = {
    val cl = closure(maxLevel)
    val mappings = OntologyFixture.mappings.groupBy(_.classIri)
    val out = mutable.Set[(String, String, String)]()
    docs.foreach { case (url, text) =>
      val directClasses = directMatches(url, text).map(_.classIri).distinct
      directClasses.foreach { c =>
        out += ((url, Pred.Direct, c))
        cl.getOrElse(c, Map.empty).keys.foreach(a => out += ((url, Pred.Expanded, a)))
        mappings.getOrElse(c, Vector.empty).foreach(m => out += ((url, Pred.Mapped, m.mappedIri)))
      }
    }
    out.toSet
  }

  /** Precision/recall of `actual` vs `expected` triple sets. */
  def precisionRecall(actual: Set[(String, String, String)],
                      expected: Set[(String, String, String)]): (Double, Double) = {
    val tp = (actual intersect expected).size.toDouble
    val p = if (actual.isEmpty) 1.0 else tp / actual.size
    val r = if (expected.isEmpty) 1.0 else tp / expected.size
    (p, r)
  }
}
