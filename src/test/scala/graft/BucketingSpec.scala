package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins: pre-bucketing both sides on the join key
  * removes the shuffle entirely — the strategy for repeatedly-joined
  * 100-TB fact tables (SURVEY.md §4 partitioning row).
  */
class BucketingSpec extends SparkSpec {

  describe("s5_bucketed_join plan") {
    it("joins bucket-to-bucket: the only exchange is the post-join rollup") {
      val plan = SparkEntry.all.find(_.name == "s5_bucketed_join").get
        .build(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(plan.contains("Bucketed: true"))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges === 1,
        s"expected only the rollup exchange, got $exchanges:\n$plan")
    }
  }

  describe("installBucketedFixture (the bench's untimed warmup path)") {
    it("is idempotent and registers the tables the s5 query joins") {
      val dir = "/root/testdata/sf0.001"
      val (o1, l1) = graft.queries.ScaleQueries.installBucketedFixture(spark, dir)
      assert(spark.catalog.tableExists(o1) && spark.catalog.tableExists(l1))
      // second call must resolve to the SAME catalog tables without a
      // rewrite (tableExists short-circuit) — a name drift here would
      // make the bench warmup install one pair and the timed s5 query
      // silently build another, reintroducing the timed fixture write
      val (o2, l2) = graft.queries.ScaleQueries.installBucketedFixture(spark, dir)
      assert((o2, l2) === (o1, l1))
    }
  }

  describe("bucketBy co-located join") {
    it("joins two bucketed tables without a shuffle exchange") {
      import spark.implicits._
      val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "av")
      val b = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "bv")
      a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bucketed_a")
      b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bucketed_b")
      // force the sort-merge path: tiny test tables would otherwise
      // broadcast, which disables bucket pruning entirely
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("bucketed_a")
          .join(spark.table("bucketed_b"), "k")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join should not shuffle:\n$plan")
        assert(plan.contains("SortMergeJoin"))
        assert(plan.contains("Bucketed: true"))
        assert(joined.count() === 1000L)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
        spark.sql("DROP TABLE IF EXISTS bucketed_a")
        spark.sql("DROP TABLE IF EXISTS bucketed_b")
      }
    }
  }
}
