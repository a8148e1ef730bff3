package graft

import org.apache.spark.sql.execution.SparkPlan

/** Smoke: every registered query executes on sf0.001, and the plans that
  * should broadcast their dimension side actually do.
  */
class QueriesSmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  describe("registry integrity") {
    it("query names are unique (a duplicate would silently shadow in the Map)") {
      val names = SparkEntry.all.map(_.name)
      assert(names.distinct.size === names.size)
      assert(SparkEntry.queries.size === SparkEntry.all.size)
    }
  }

  describe("registered queries") {
    SparkEntry.all.foreach { rq =>
      it(s"${rq.name} runs non-empty on sf0.001") {
        val df = rq.build(spark, sf)
        // all 90+ queries are designed non-empty even at the smallest SF;
        // an empty result here means a threshold or filter regressed
        assert(df.queryExecution.toRdd.count() > 0)
      }
    }
  }

  describe("plan shape") {
    def executed(name: String): SparkPlan =
      SparkEntry.all.find(_.name == name).get.build(spark, sf)
        .queryExecution.executedPlan

    it("c14_star_join broadcasts the region-nation dim side") {
      assert(executed("c14_star_join").toString.contains("BroadcastHashJoin"))
    }
    it("c2_inner_join broadcasts the nation dim") {
      assert(executed("c2_inner_join").toString.contains("BroadcastHashJoin"))
    }
    it("f4_topk plans TakeOrderedAndProject (no global sort)") {
      assert(executed("f4_topk").toString.contains("TakeOrderedAndProject"))
    }
    it("c8_closure stays map-side (broadcast every hop, no probe shuffle)") {
      val p = executed("c8_closure").toString
      assert(p.contains("BroadcastHashJoin"))
    }
  }
}
