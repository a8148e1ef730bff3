package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Z-order layout (s9): the property that makes the Morton key a useful
  * cluster/sort key is that every zkey>>8 cell is EXACTLY a 16×16 tile of
  * the (x, y) plane — so a file written per cell has min/max spans ≤ 15
  * on BOTH dimensions and parquet min/max stats prune scans for filters
  * on either column. A linear sort key (x*256+y) bounds only x.
  */
class ZOrderSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  describe("s9_zorder_layout") {
    it("bounds every cell's span to the 16x16 tile on both dimensions") {
      val rows = SparkEntry.all.find(_.name == "s9_zorder_layout").get
        .build(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (xs, ys) = (r.getAs[Long]("x_max") - r.getAs[Long]("x_min"),
          r.getAs[Long]("y_max") - r.getAs[Long]("y_min"))
        assert(xs >= 0 && xs <= 15, s"x span $xs in cell ${r.get(0)}")
        assert(ys >= 0 && ys <= 15, s"y span $ys in cell ${r.get(0)}")
      }
    }
    it("the production interleave matches an independent reference on " +
      "the full 8-bit x 8-bit grid (and is therefore a bijection)") {
      // independent reference implementation — shifts and ORs, written
      // differently from morton8's multiply-and-sum column expression
      def mortonRef(x: Int, y: Int): Long =
        (0 until 8).map { i =>
          (((x >> i) & 1).toLong << (2 * i)) |
            (((y >> i) & 1).toLong << (2 * i + 1))
        }.sum
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val pts = for (x <- 0 until 256; y <- 0 until 256) yield (x.toLong, y.toLong)
      // evaluate the PRODUCTION column expression (the one s9 uses) over
      // every grid point and compare value-for-value
      val got = pts.toDF("x", "y")
        .withColumn("z", ScaleQueries.morton8(col("x"), col("y")))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
        .toMap
      pts.foreach { case (x, y) =>
        assert(got((x, y)) == mortonRef(x.toInt, y.toInt),
          s"morton8($x, $y) diverged from the reference")
      }
      // bijection follows: 65536 distinct inputs → 65536 distinct refs
      assert(got.values.toSet.size == 65536)
    }
  }
}
