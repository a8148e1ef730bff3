package graft.operators

import graft.SparkSpec

/** Containment dedup (MinHashDedup.containmentDupPairs): the asymmetric
  * overlap measure t31 registers. The defining case — a short document
  * quoted whole inside a much longer one — must be flagged by containment
  * and missed by the symmetric-Jaccard pipeline at the same threshold.
  */
class ContainmentSpec extends SparkSpec {

  import spark.implicits._

  // 4-token doc fully contained in a 40-token doc: with 3-gram shingles
  // the short doc's 2 shingles both occur in the long doc → cont_a = 1.0,
  // while jaccard = 2 / 38 ≈ 0.05. The filler tokens are all distinct so
  // no other shingles collide.
  private val short = "alpha beta gamma delta"
  private val long =
    (1 to 18).map(i => s"w$i").mkString(" ") + " " + short + " " +
      (19 to 36).map(i => s"w$i").mkString(" ")
  private val docs = Seq(
    (1L, short),
    (2L, long),
    (3L, (101 to 140).map(i => s"x$i").mkString(" ")) // unrelated control
  ).toDF("doc_id", "text")

  describe("containmentDupPairs") {
    it("flags full containment that symmetric Jaccard misses") {
      val cont = MinHashDedup
        .containmentDupPairs(docs, "doc_id", "text", threshold = 0.9)
        .collect()
      assert(cont.length == 1)
      val r = cont.head
      assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
      assert(r.getAs[Double]("cont_a") == 1.0) // every short shingle in long
      assert(r.getAs[Double]("cont_b") < 0.2)  // …but not vice versa
      val jacc = MinHashDedup
        .nearDuplicatePairs(docs, "doc_id", "text", threshold = 0.9)
        .collect()
      assert(jacc.isEmpty, "jaccard pipeline should miss the asymmetric dup")
    }
    it("is a superset of the Jaccard pairs at the same threshold") {
      // C(A,B) >= J(A,B) always, and near-dup docs share rare shingles
      // (df = 2 here), so every Jaccard pair must reappear
      val docs2 = Seq(
        (10L, "a b c d e f g h"),
        (11L, "a b c d e f g i"), // high-jaccard near-dup of 10
        (12L, "p q r s t u v w")
      ).toDF("doc_id", "text")
      val j = MinHashDedup
        .nearDuplicatePairs(docs2, "doc_id", "text", threshold = 0.6)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val c = MinHashDedup
        .containmentDupPairs(docs2, "doc_id", "text", threshold = 0.6)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(j.nonEmpty && j.subsetOf(c))
    }
  }
}
