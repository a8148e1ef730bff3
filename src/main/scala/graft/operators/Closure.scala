package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative lookup closures.
  *
  * C8 — the reference resolves "Transferred entry: x.x.x.x" EC chains by
  * repeatedly re-looking-up the target until it is terminal
  * (nextflow/bin/utils.py:77-84). Chains are short (depth ≤ ~4), so the
  * Spark-native shape is a bounded loop of left joins against a *broadcast*
  * edge table — each iteration is a map-side join, no shuffle of the probe
  * side, and the loop unrolls into one linear plan. This deliberately avoids
  * driver-side collect: the probe side can be arbitrarily large.
  *
  * C9 — partial-code expansion ("1.2.-.-" → every concrete EC under that
  * prefix, utils.py:243-256) is a prefix theta-join; with a small prefix
  * dimension it broadcasts, and at scale it should be rewritten as an
  * equi-join on the extracted prefix columns.
  */
object Closure {

  /** Follow `edges(src → dst)` from `keys(key)` for exactly `maxIter` hops
    * (rows with no outgoing edge stay put). Returns (key, terminal).
    * `edges` is broadcast — the reference's EC table is ~8k rows; anything
    * dimension-sized qualifies, so every hop is a map-side join and the
    * probe side never shuffles.
    *
    * Multi-target sources are collapsed to ONE dst per src (min) before the
    * walk, mirroring the reference's first-transfer choice
    * (utils.py:77-84 takes `transfers[0]`) and preventing combinatorial
    * fan-out of the probe side across hops.
    */
  def resolveToTerminal(keys: DataFrame, edges: DataFrame,
                        maxIter: Int): DataFrame = {
    val e0 = edges.groupBy(col("src")).agg(min(col("dst")).as("dst"))
    var cur = keys.select(col("key"), col("key").as("terminal"))
    var i = 0
    while (i < maxIter) {
      // fresh alias per hop: re-joining the same DataFrame instance would
      // put duplicate attribute ids in the plan (Spark self-join trap)
      val e = broadcast(e0.as(s"__closure_e$i"))
      cur = cur
        .join(e, cur("terminal") === col(s"__closure_e$i.src"), "left")
        .select(cur("key"),
          coalesce(col(s"__closure_e$i.dst"), cur("terminal")).as("terminal"))
      i += 1
    }
    cur
  }
}
