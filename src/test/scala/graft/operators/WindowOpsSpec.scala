package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  describe("argmaxFlag (D4)") {
    it("flags all rows achieving the per-group max, ties included") {
      val df = Seq(("g1", 1, 10.0), ("g1", 2, 30.0), ("g1", 3, 30.0),
        ("g2", 4, 5.0)).toDF("g", "id", "v")
      val out = WindowOps.argmaxFlag(df, Seq("g"), col("v"), "best")
        .select("id", "best").as[(Int, String)].collect().toMap
      assert(out === Map(1 -> "N", 2 -> "Y", 3 -> "Y", 4 -> "Y"))
    }
  }

  describe("withGroupShare (D3)") {
    it("attaches whole-group total and per-row share without reducing rows") {
      val df = Seq(("a", 1L), ("a", 3L), ("b", 2L)).toDF("g", "v")
      val out = WindowOps.withGroupShare(df, Seq("g"), col("v"), "tot", "sh")
      assert(out.count() === 3)
      val rows = out.select("g", "v", "tot", "sh")
        .as[(String, Long, Long, Double)].collect().toSet
      assert(rows === Set(("a", 1L, 4L, 0.25), ("a", 3L, 4L, 0.75),
        ("b", 2L, 2L, 1.0)))
    }
  }

  describe("denseGroupId (D5, partitioned)") {
    it("numbers groups independently per partition key") {
      val df = Seq(("p1", "x"), ("p1", "y"), ("p1", "x"), ("p2", "z"))
        .toDF("entry", "k")
      val out = WindowOps.denseGroupId(df, Seq("entry"), Seq("k"), "gid")
        .select("entry", "k", "gid").as[(String, String, Long)].collect().toSet
      assert(out === Set(("p1", "x", 1L), ("p1", "y", 2L), ("p2", "z", 1L)))
    }
  }

  describe("preferenceFirst (F2/I4)") {
    it("keeps exactly one row per group by the explicit order") {
      val df = Seq(("g", "b", 2), ("g", "a", 1), ("h", "c", 9)).toDF("g", "n", "p")
      val out = WindowOps.preferenceFirst(df, Seq("g"), Seq(col("p")))
        .select("g", "n").as[(String, String)].collect().toSet
      assert(out === Set(("g", "a"), ("h", "c")))
    }
    it("does not clobber a pre-existing temp-named column") {
      val df = Seq(("g", 1, "keep")).toDF("g", "p", "__graft_rn0")
      val out = WindowOps.preferenceFirst(df, Seq("g"), Seq(col("p")))
      assert(out.columns.contains("__graft_rn0"))
      assert(out.select("__graft_rn0").as[String].head() === "keep")
    }
  }

  describe("rangeCompress (F3)") {
    it("compresses sorted ints into range strings") {
      val df = Seq(("g", 1), ("g", 2), ("g", 3), ("g", 5), ("g", 9), ("g", 10),
        ("h", 7)).toDF("g", "v")
      val out = WindowOps.rangeCompress(df, "g", "v", "ranges")
        .as[(String, String)].collect().toMap
      assert(out === Map("g" -> "1-3,5,9-10", "h" -> "7"))
    }
    it("ignores duplicate values (distinct semantics)") {
      val df = Seq(("g", 1), ("g", 1), ("g", 2)).toDF("g", "v")
      val out = WindowOps.rangeCompress(df, "g", "v", "ranges")
        .as[(String, String)].collect().toMap
      assert(out === Map("g" -> "1-2"))
    }
  }
}
