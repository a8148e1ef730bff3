package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.SparkSpec

/** The exact-vs-sketch accuracy gate for HyperBall closeness (VERDICT
  * r12 item 5): formerly computed INSIDE the registered x11 query, which
  * made every bench run pay exact x10's recursive expansion alongside
  * the sketch. The registered query is now sketch-only (the 100 TB
  * plan); this spec keeps the audit discipline — the t41-covers-t6
  * pattern — with the same error budget the gated query enforced:
  * n_reached within max(2, 15%) (512 registers ⇒ rsd ≈ 4.6%, small
  * counts ride linear counting), the HyperBall distance sum within
  * max(6, 20%) (it accumulates per-round estimate deltas, so its
  * variance is larger). Everything is deterministic (splitmix64, fixed
  * register count), so the gate is exact, not flaky.
  */
class HyperBallGateSpec extends AnyFunSpec with SparkSpec {

  private def gate(dir: String): Unit = {
    val exact = GraphAnalytics.closenessCentrality(spark, dir)
    val est = GraphAnalytics.hyperBallCloseness(spark, dir)
    val joined = exact.join(est, "suppkey")
      .select(col("suppkey"), col("n_reached"), col("total_dist"),
        col("n_reached_est"), col("total_dist_est"))
      .collect()
    assert(joined.nonEmpty)
    val badReached = joined.filter { r =>
      val n = r.getAs[Long]("n_reached").toDouble
      math.abs(r.getAs[Double]("n_reached_est") - n) >
        math.max(2.0, n * 0.15)
    }
    val badDist = joined.filter { r =>
      val d = r.getAs[Long]("total_dist").toDouble
      math.abs(r.getAs[Double]("total_dist_est") - d) >
        math.max(6.0, d * 0.2)
    }
    assert(badReached.isEmpty,
      s"n_reached outside budget: ${badReached.take(5).mkString(", ")}")
    assert(badDist.isEmpty,
      s"total_dist outside budget: ${badDist.take(5).mkString(", ")}")
  }

  describe("HyperBall sketch vs exact closeness") {
    it("stays inside the register error budget at sf0.001") {
      gate("/root/testdata/sf0.001")
    }
    it("stays inside the register error budget at sf0.01") {
      gate("/root/testdata/sf0.01")
    }
  }
}
