package graft.operators

import org.apache.spark.sql.Row
import graft.SparkSpec

/** Pins `MinHashDedup.exactSubstringSpans` on hand-built corpora where
  * the expected maximal spans are computable by eye — in particular the
  * gap case: two distinct shared spans that happen to sit on the SAME
  * alignment diagonal must come out as two spans, not be welded into one
  * (the per-diagonal row_number run split exists exactly for this).
  */
class ExactSubstrSpec extends SparkSpec {

  private def run(docs: Seq[(Long, String)], k: Int = 4, minSpan: Int = 5,
                  maxDf: Int = 50): Seq[Row] = {
    import spark.implicits._
    MinHashDedup.exactSubstringSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", k, minSpan, maxDf)
      .orderBy("doc_a", "doc_b", "start_a")
      .collect().toSeq
  }

  // distinct filler words so no accidental k-grams collide
  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  describe("exactSubstringSpans") {
    it("finds one maximal shared span with both offsets") {
      val span = "s1 s2 s3 s4 s5 s6" // 6 shared words
      val a = words("a", 3) + " " + span + " " + words("b", 2)
      val b = words("c", 5) + " " + span + " " + words("d", 4)
      val out = run(Seq(1L -> a, 2L -> b))
      // span starts at word 4 in doc 1, word 6 in doc 2, length 6
      assert(out === Seq(Row(1L, 2L, 4L, 6L, 6L)))
    }

    it("splits two same-diagonal spans at the gap instead of welding them") {
      // both spans at the SAME offsets in both docs -> same diagonal
      // (pa - pb = 0); a diagonal-only merge would report one 16-word
      // span covering the differing gap
      val s1 = "x1 x2 x3 x4 x5 x6"
      val s2 = "y1 y2 y3 y4 y5 y6"
      val a = s1 + " ga1 ga2 ga3 ga4 " + s2
      val b = s1 + " gb1 gb2 gb3 gb4 " + s2
      val out = run(Seq(1L -> a, 2L -> b))
      assert(out === Seq(Row(1L, 2L, 1L, 1L, 6L), Row(1L, 2L, 11L, 11L, 6L)))
    }

    it("emits every pairwise alignment when a span repeats in one doc") {
      val span = "r1 r2 r3 r4 r5"
      val a = span + " " + words("m", 3) + " " + span // twice in doc 1
      val b = words("n", 2) + " " + span
      val out = run(Seq(1L -> a, 2L -> b))
      // two alignments: doc1@1 vs doc2@3 and doc1@9 vs doc2@3
      assert(out === Seq(Row(1L, 2L, 1L, 3L, 5L), Row(1L, 2L, 9L, 3L, 5L)))
    }

    it("df cap drops boilerplate-common grams") {
      val boiler = "b1 b2 b3 b4 b5 b6"
      val docs = (1L to 5L).map(i => i -> (boiler + " " + words(s"u$i", 3)))
      // df of every boiler gram is 5; cap at 4 -> no anchors survive
      assert(run(docs, maxDf = 4).isEmpty)
      // with the cap above df the shared span is found for every pair
      assert(run(docs, maxDf = 10).size === 10) // C(5,2) pairs
    }

    it("enforces the minimum span length") {
      val span = "p1 p2 p3 p4 p5" // 5 words
      val a = span + " " + words("q", 3)
      val b = span + " " + words("r", 3)
      assert(run(Seq(1L -> a, 2L -> b), minSpan = 6).isEmpty)
      assert(run(Seq(1L -> a, 2L -> b), minSpan = 5).size === 1)
    }
  }

  private def runCut(docs: Seq[(Long, String)], k: Int = 4,
                     minSpan: Int = 5, maxDf: Int = 50): Map[Long, Row] = {
    import spark.implicits._
    MinHashDedup.cutDuplicateSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", k, minSpan, maxDf)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  describe("cutDuplicateSpans") {
    it("cuts from the LATER doc only; the first occurrence survives whole") {
      val span = "s1 s2 s3 s4 s5 s6"
      val a = words("a", 3) + " " + span          // doc 1: 9 words
      val b = span + " " + words("b", 4)          // doc 2: 10 words
      val out = runCut(Seq(1L -> a, 2L -> b))
      assert(out(1L).getLong(2) === 9L && out(1L).getLong(3) === 0L,
        "first occurrence must keep every word")
      assert(out(2L).getLong(2) === 4L && out(2L).getLong(3) === 6L,
        "later doc must lose exactly the span words")
    }

    it("unions overlapping cut intervals instead of double-counting") {
      // doc 3 shares words 1..6 with doc 1 and words 3..8 with doc 2:
      // overlapping intervals on doc 3 must cut words 1..8 once
      val c = "c1 c2 c3 c4 c5 c6 c7 c8 " + words("z", 2) // 10 words
      val a = "c1 c2 c3 c4 c5 c6 " + words("x", 3)
      val b = words("y", 3) + " c3 c4 c5 c6 c7 c8"
      val out = runCut(Seq(1L -> a, 2L -> b, 3L -> c))
      assert(out(3L).getLong(3) === 8L,
        s"overlapping spans must union to 8 cut words, got ${out(3L)}")
      assert(out(3L).getLong(2) === 2L)
    }

    it("passes untouched documents through with a digest of the full text") {
      val lone = words("solo", 6)
      val out = runCut(Seq(9L -> lone))
      assert(out(9L).getLong(1) === 6L && out(9L).getLong(3) === 0L)
    }
  }
}
