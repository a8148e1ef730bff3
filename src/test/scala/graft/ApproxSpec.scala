package graft

import org.apache.spark.sql.functions._

/** The approximate scale-path functions (percentile_approx backing the B6
  * quantile filter at 100 TB; approx_count_distinct backing D7 stats):
  * asserted within tolerance of their exact counterparts on real data —
  * these cannot be oracle-checked (engines' sketches differ), so the
  * exact Spark answer is the reference.
  */
class ApproxSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  describe("approx_count_distinct (D7 at scale)") {
    it("is within 5% of the exact distinct count") {
      val r = spark.read.parquet(s"$sf/lineitem.parquet")
        .agg(countDistinct(col("l_partkey")).as("exact"),
          approx_count_distinct(col("l_partkey")).as("approx"))
        .collect()(0)
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"exact=$exact approx=$approx")
    }
  }

  describe("percentile_approx (B6/A11 threshold at scale)") {
    it("lands within 2% of the exact 80th percentile") {
      val orders = spark.read.parquet(s"$sf/orders.parquet")
      val Array(approx) = orders.stat
        .approxQuantile("o_totalprice", Array(0.8), 0.001)
      val n = orders.count()
      val exact = orders.orderBy("o_totalprice")
        .limit((n * 0.8).toInt + 1)
        .agg(max("o_totalprice")).collect()(0).getDouble(0)
      assert(math.abs(approx - exact) / exact < 0.02,
        s"exact=$exact approx=$approx")
    }
  }
}
