package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The whole-operator Catalyst stack: logical TopKPerGroup must plan as a
  * partial/final TopKPerGroupExec pair around ONE hash exchange, and the
  * result must equal the rank-window formulation row for row — including
  * when a group's rows are spread adversarially across input partitions
  * (the case the map-side partial must merge correctly).
  */
class TopKPerGroupSpec extends SparkSpec {

  import spark.implicits._

  private def windowTopK(df: DataFrame, k: Int): Set[(String, Long, Double)] =
    df.withColumn("rn", row_number().over(Window.partitionBy("g")
        .orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= k).drop("rn")
      .as[(String, Long, Double)].collect().toSet

  private def nativeTopK(df: DataFrame, k: Int): Set[(String, Long, Double)] =
    TopKPerGroup.topK(df, Seq("g"), Seq(("score", true), ("id", false)), k)
      .as[(String, Long, Double)].collect().toSet

  private def sample: DataFrame =
    (1 to 400).map(i => (s"g${i % 7}", i.toLong, (i * 37 % 101).toDouble))
      .toDF("g", "id", "score")
      // spread every group across many input partitions so the final exec
      // genuinely merges partials rather than seeing whole groups
      .repartition(8, col("id"))

  describe("plan shape") {
    it("plans as partial+final exec pair around exactly one exchange") {
      val df = TopKPerGroup.topK(sample, Seq("g"),
        Seq(("score", true), ("id", false)), 3)
      df.collect()
      // AQE's toString prints final AND initial plans — audit the final one
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // node name renders without the Exec suffix; partial prints ", true"
      assert(plan.contains(", 3, true") && plan.contains(", 3, false"),
        s"expected partial+final TopKPerGroup pair in:\n$plan")
      assert(plan.linesIterator.count(_.contains("TopKPerGroup ")) == 2,
        s"expected exactly two TopKPerGroup nodes in:\n$plan")
      // one requirement-driven exchange on the group key; the sample's own
      // repartition(id) exchange is the only other allowed
      assert(plan.linesIterator
        .count(_.contains("ENSURE_REQUIREMENTS")) == 1,
        s"expected exactly one requirement exchange in:\n$plan")
      assert(!plan.contains("Window") && !plan.contains("Sort"),
        s"native plan must not fall back to window/sort:\n$plan")
    }
  }

  describe("semantics") {
    it("equals the rank-window formulation on adversarial partitioning") {
      Seq(1, 3, 10).foreach { k =>
        assert(nativeTopK(sample, k) == windowTopK(sample, k), s"k=$k")
      }
    }
    it("returns whole groups when k exceeds the group size") {
      val df = Seq(("a", 1L, 5.0), ("a", 2L, 4.0), ("b", 3L, 1.0))
        .toDF("g", "id", "score")
      assert(nativeTopK(df, 100) == df.as[(String, Long, Double)].collect().toSet)
    }
    it("is empty on empty input") {
      val df = Seq.empty[(String, Long, Double)].toDF("g", "id", "score")
      assert(nativeTopK(df, 2).isEmpty)
    }
    it("keeps the first row in the requested total order on ties") {
      // two rows tie on score; the id tiebreak must pick the lower id
      val df = Seq(("a", 10L, 7.0), ("a", 2L, 7.0), ("a", 5L, 1.0))
        .toDF("g", "id", "score")
      assert(nativeTopK(df, 1) == Set(("a", 2L, 7.0)))
    }
    it("stays exact when the partial pass flush-degrades under a tiny budget") {
      // budget 4 on a 400-row/7-group input forces many flush epochs per
      // partial task; extra superset rows cross the exchange and the
      // final pass must still re-trim to the exact window answer
      spark.conf.set("spark.graft.topk.partialFlushRows", "4")
      try
        Seq(1, 3).foreach { k =>
          assert(nativeTopK(sample, k) == windowTopK(sample, k),
            s"k=$k under flush budget 4")
        }
      finally spark.conf.unset("spark.graft.topk.partialFlushRows")
    }
    it("stays exact across randomized inputs and every flush-budget regime") {
      // seeded randomized sweep over the lazy epoch-drain path: budget 1
      // flushes after EVERY insert (maximum epoch churn — each kept row
      // crosses the exchange alone), 7 flushes mid-group, MaxValue never
      // flushes; all must equal the window formulation on the same data
      val rnd = new scala.util.Random(42)
      val data = (1 to 500).map { i =>
        (s"g${rnd.nextInt(13)}", i.toLong, rnd.nextInt(50).toDouble)
      }
      val df = data.toDF("g", "id", "score").repartition(6, col("id"))
      for (budget <- Seq("1", "7", Long.MaxValue.toString); k <- Seq(2, 5)) {
        spark.conf.set("spark.graft.topk.partialFlushRows", budget)
        try assert(nativeTopK(df, k) == windowTopK(df, k),
          s"k=$k budget=$budget")
        finally spark.conf.unset("spark.graft.topk.partialFlushRows")
      }
    }
    it("normalizes float group keys: -0.0 and 0.0 are ONE group") {
      // the strategy must normalize double keys exactly as Catalyst's
      // NormalizeFloatingNumbers does for Aggregate/Window keys — without
      // it the byte-keyed map AND the hash exchange split this group
      val df = Seq((0.0, 1L, 5.0), (-0.0, 2L, 4.0), (-0.0, 3L, 3.0))
        .toDF("g", "id", "score").repartition(3, col("id"))
      val out = TopKPerGroup.topK(df, Seq("g"),
          Seq(("score", true), ("id", false)), 2)
        .as[(Double, Long, Double)].collect().toSet
      assert(out == Set((0.0, 1L, 5.0), (-0.0, 2L, 4.0)))
    }
    it("keeps downstream expressions working over the custom node") {
      val out = TopKPerGroup.topK(sample, Seq("g"),
          Seq(("score", true), ("id", false)), 2)
        .groupBy("g").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(out.values.forall(_ == 2) && out.size == 7)
    }
  }
}
