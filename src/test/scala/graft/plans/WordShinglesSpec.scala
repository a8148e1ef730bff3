package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** The native WordShingles expression must be value-identical to the
  * pre-r13 Column composition it replaced (transform/sequence/element_at
  * + array_distinct + the when-size guard) — the dedup family's oracle
  * hashes (t6/t13/t31/t35/t36/t40/t41/j6/j13) all ride on it.
  */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  private def compare(df: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    val both = df.select(
      TextFunctions.shingles(col("w"), n).as("native"),
      TextFunctions.shinglesComposed(col("w"), n).as("composed"))
    val bad = both.filter(not(col("native") <=> col("composed")))
    assert(bad.count() === 0,
      s"n=$n: native != composed on ${bad.head(3).mkString("; ")}")
  }

  describe("WordShingles (native codegen shingler)") {

    it("equals the Column composition on a randomized corpus (n = 1..4)") {
      val rnd = new scala.util.Random(7)
      val vocab = Vector("a", "bb", "ccc", "dd dd", "", "x1")
      val rows = (1 to 400).map { _ =>
        val len = rnd.nextInt(8) // includes 0-length (shorter than n)
        Tuple1((1 to len).map(_ => vocab(rnd.nextInt(vocab.size))))
      }
      val df = rows.toDF("w")
      (1 to 4).foreach(n => compare(df, n))
    }

    it("matches on edge cases: empty, exact-n, duplicates, null elements, null array") {
      val df = Seq(
        Tuple1(Seq.empty[String]),
        Tuple1(Seq("one")),
        Tuple1(Seq("a", "b", "c")),              // exactly n for n=3
        Tuple1(Seq("a", "b", "a", "b", "a")),    // duplicate grams
        Tuple1(Seq("a", null, "c", "d")),        // null element (skipped by concat_ws)
        Tuple1(null.asInstanceOf[Seq[String]]))  // null array -> empty
        .toDF("w")
      (1 to 3).foreach(n => compare(df, n))
      // null array maps to EMPTY (the old otherwise-branch), never NULL
      val r = df.filter(col("w").isNull)
        .select(TextFunctions.shingles(col("w"), 3).as("s"))
        .head()
      assert(!r.isNullAt(0) && r.getSeq[String](0).isEmpty)
    }

    it("keeps first-occurrence order and evaluates the words child once") {
      val out = Seq(Tuple1(Seq("b", "a", "b", "a", "b")))
        .toDF("w")
        .select(TextFunctions.shingles(col("w"), 2).as("s"))
        .as[Seq[String]].head()
      assert(out === Seq("b a", "a b"))
      // split-once behavior: shingles over an inline split(text) plans the
      // split as ONE child of the expression (the old composition inlined
      // it into every element_at after projection collapse)
      // non-foldable input: a literal Seq would constant-fold the whole
      // expression into a LocalTableScan and hide the plan shape
      val plan = spark.range(3)
        .select(format_string("x y z w %d", col("id")).as("t"))
        .select(TextFunctions.shingles(split(col("t"), " "), 2).as("s"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("wordshingles") || plan.contains("WordShingles"),
        s"native expression missing from plan:\n$plan")
      assert("split\\(".r.findAllIn(plan).size <= 1,
        s"split inlined more than once:\n$plan")
    }
  }
}
