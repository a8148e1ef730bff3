package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** The native WordGrams expression must be value-identical to the
  * pre-r14 Column composition it replaced (transform/sequence +
  * array_join(slice) under the callers' size >= k guard) — the
  * ExactSubstr span family's oracle hashes (t35/t36) ride on it.
  */
class WordGramsSpec extends SparkSpec {
  import spark.implicits._

  private def compare(df: org.apache.spark.sql.DataFrame, k: Int): Unit = {
    val both = df.select(
      TextFunctions.grams(col("w"), k).as("native"),
      TextFunctions.gramsComposed(col("w"), k).as("composed"))
    val bad = both.filter(not(col("native") <=> col("composed")))
    assert(bad.count() === 0,
      s"k=$k: native != composed on ${bad.head(3).mkString("; ")}")
  }

  describe("WordGrams (native positional k-grams)") {

    it("equals the Column composition on a randomized corpus (k = 1..4)") {
      val rnd = new scala.util.Random(11)
      val vocab = Vector("a", "bb", "ccc", "dd dd", "", "x1")
      val rows = (1 to 400).map { _ =>
        val len = rnd.nextInt(8) // includes 0-length (shorter than k)
        Tuple1((1 to len).map(_ => vocab(rnd.nextInt(vocab.size))))
      }
      val df = rows.toDF("w")
      (1 to 4).foreach(k => compare(df, k))
    }

    it("matches on edge cases: empty, exact-k, repeats, null elements, null array") {
      val df = Seq(
        Tuple1(Seq.empty[String]),
        Tuple1(Seq("one")),
        Tuple1(Seq("a", "b", "c")),              // exactly k for k=3
        Tuple1(Seq("a", "b", "a", "b", "a")),    // repeated grams KEPT
        Tuple1(Seq("a", null, "c", "d")),        // null element (skipped by array_join)
        Tuple1(null.asInstanceOf[Seq[String]]))  // null array -> empty
        .toDF("w")
      (1 to 3).foreach(k => compare(df, k))
      val r = df.filter(col("w").isNull)
        .select(TextFunctions.grams(col("w"), 3).as("g"))
        .head()
      assert(!r.isNullAt(0) && r.getSeq[String](0).isEmpty)
    }

    it("keeps every position in order (non-distinct) and splits once") {
      val out = Seq(Tuple1(Seq("b", "a", "b", "a")))
        .toDF("w")
        .select(TextFunctions.grams(col("w"), 2).as("g"))
        .as[Seq[String]].head()
      assert(out === Seq("b a", "a b", "b a"))
      // split-once behavior, as WordShinglesSpec pins for shingles: the
      // old composition inlined split(text) into every slice() after
      // projection collapse
      val plan = spark.range(3)
        .select(format_string("x y z w %d", col("id")).as("t"))
        .select(TextFunctions.grams(split(col("t"), " "), 2).as("g"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("wordgrams") || plan.contains("WordGrams"),
        s"native expression missing from plan:\n$plan")
      assert("split\\(".r.findAllIn(plan).size <= 1,
        s"split inlined more than once:\n$plan")
    }
  }
}
