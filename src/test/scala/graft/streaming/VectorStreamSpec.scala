package graft.streaming

import graft.SparkSpec

/** j10 — stream-maintained IVF index. The index is parquet partitioned
  * by cell, so a probe must read only the probed cells (partition
  * pruning — static or dynamic), and the final answer must equal batch
  * v3's exactly: cell assignment depends only on the fixed coarse
  * quantizer, so the index contents — and therefore the search result —
  * are batching-invariant.
  */
class VectorStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  describe("j10_stream_ivf_index") {
    it("answers exactly like batch v3 (batching-invariant index)") {
      val j10 = graft.SparkEntry.queries("j10_stream_ivf_index")(spark, sf)
        .collect().map(_.toString).toSeq
      val v3 = graft.SparkEntry.queries("v3_ivf_ann")(spark, sf)
        .collect().map(_.toString).toSeq
      assert(j10.nonEmpty)
      assert(j10 === v3)
    }
    it("the probe prunes the cell-partitioned index scan") {
      val df = graft.SparkEntry.queries("j10_stream_ivf_index")(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // the candidate side joins the index on its PARTITION column with a
      // 5-row probe side: Spark's dynamic partition pruning must narrow
      // the scan to the probed cells — without it every cell directory is
      // read and the IVF layout buys nothing
      assert(plan.contains("dynamicpruning"),
        s"expected a dynamic partition-pruning filter on the index scan:\n$plan")
    }
  }
}
