package graft

import org.apache.spark.sql.functions._

/** AQE's OptimizeSkewedJoin is the runtime complement to the explicit
  * salted join (s1): prove the split actually fires on a skewed key
  * under the s8 conf scope ("skew=true" in the finalized adaptive plan),
  * and that the conf save/restore leaves the session untouched.
  */
class SkewJoinSpec extends SparkSpec {

  import spark.implicits._

  // the ONE shared scope s8 runs under — the spec proves exactly that
  // scope, so tuning AqeSkew.demoConfs re-tests the query's behavior
  private val confs = graft.operators.AqeSkew.demoConfs

  private def withSkewConfs[A](body: => A): A =
    graft.operators.AqeSkew.withDemoConfs(spark)(body)

  describe("AQE skew join (s8's mechanism)") {
    it("splits the hot key's partition at runtime (skew=true in the plan)") {
      withSkewConfs {
        // 50k rows on ONE key: that shuffle partition dwarfs the median,
        // so OptimizeSkewedJoin must split it. The payload is hashed
        // noise kept live through the aggregate — identical/sequential
        // values compress below the skew threshold in the map output,
        // and a pruned column wouldn't be shuffled at all
        val probe = ((1 to 50000).map(i => (1L, i * 2654435761L)) ++
          (2 to 200).map(i => (i.toLong, i.toLong)))
          .toDF("k", "payload")
        val build = (1 to 200).map(i => (i.toLong, s"v$i")).toDF("k", "tag")
        // aggregate on the BUILD side's column, like s8 does on
        // o_orderstatus: grouping on the join key itself would make the
        // split break the aggregate's required distribution, and AQE
        // (correctly) refuses to add that extra shuffle
        val joined = probe.join(build, "k")
          .groupBy("tag").agg(count(lit(1)).as("n"),
            sum(col("payload")).as("chk"))
        // collect THIS dataset (.as[...] would build a fresh
        // QueryExecution and leave joined's adaptive plan un-finalized)
        val n = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(n("v1") == 50000 && n("v7") == 1) // semantics unchanged
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("skew=true"),
          s"expected a runtime skew split in:\n$plan")
      }
    }
    it("restores every conf it touches") {
      val before = confs.map { case (k, _) => spark.conf.getOption(k) }
      withSkewConfs {
        assert(spark.conf.get(
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor") == "1.0")
      }
      val after = confs.map { case (k, _) => spark.conf.getOption(k) }
      assert(before == after)
    }
  }
}
