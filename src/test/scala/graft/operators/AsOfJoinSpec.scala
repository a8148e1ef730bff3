package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  describe("AsOfJoin.asOfLeft") {

    it("attaches the latest build row at-or-before each probe row, per key") {
      val s = spark
      import s.implicits._
      val probe = Seq((1L, "k1", 10L), (2L, "k1", 20L), (3L, "k1", 5L),
        (4L, "k2", 10L)).toDF("id", "key", "ts")
      val build = Seq(("k1", 10L, 100L), ("k1", 15L, 101L), ("k3", 1L, 102L))
        .toDF("key", "ts", "pay")
      val out = AsOfJoin.asOfLeft(probe, build, "key", "ts", Seq("pay"))
        .orderBy("id").collect()
      // id=1 ts=10: build at ts=10 qualifies (at-or-before, tie → build first)
      assert(out(0).getAs[Long]("pay") == 100L)
      // id=2 ts=20: latest build <= 20 is ts=15
      assert(out(1).getAs[Long]("pay") == 101L)
      // id=3 ts=5: no build at-or-before → null
      assert(out(2).isNullAt(out(2).fieldIndex("pay")))
      // id=4 key=k2: no build rows for key → null
      assert(out(3).isNullAt(out(3).fieldIndex("pay")))
    }

    it("preserves all probe columns and row count") {
      val s = spark
      import s.implicits._
      val probe = Seq((1L, "k", 5L, "x")).toDF("id", "key", "ts", "extra")
      val build = Seq(("k", 1L, 9L)).toDF("key", "ts", "pay")
      val out = AsOfJoin.asOfLeft(probe, build, "key", "ts", Seq("pay"))
      assert(out.columns.toSeq == Seq("id", "key", "ts", "extra", "pay"))
      assert(out.count() == 1)
      assert(out.collect()(0).getAs[String]("extra") == "x")
    }

    it("takes the matched row whole: a null payload VALUE is not 'absent'") {
      val s = spark
      import s.implicits._
      val probe = Seq((1L, "k", 25L)).toDF("id", "key", "ts")
      val build = Seq(("k", 10L, Some(5L), Some(7L)),
          ("k", 20L, None, Some(9L)))
        .toDF("key", "ts", "x", "y")
      val out = AsOfJoin.asOfLeft(probe, build, "key", "ts", Seq("x", "y"))
        .collect()(0)
      // ASOF semantics: the ts=20 row matches → (x=NULL, y=9); per-column
      // lasts would have produced the never-existing row (x=5, y=9)
      assert(out.isNullAt(out.fieldIndex("x")))
      assert(out.getAs[Long]("y") == 9L)
    }

    it("null keys never match (SQL equi-join semantics)") {
      val s = spark
      import s.implicits._
      val probe = Seq((1L, Option.empty[String], 20L),
          (2L, Option("k"), 20L))
        .toDF("id", "key", "ts")
      val build = Seq((Option.empty[String], 10L, 1L), (Option("k"), 10L, 2L))
        .toDF("key", "ts", "pay")
      val out = AsOfJoin.asOfLeft(probe, build, "key", "ts", Seq("pay"))
        .orderBy("id").collect()
      assert(out(0).isNullAt(out(0).fieldIndex("pay")))
      assert(out(1).getAs[Long]("pay") == 2L)
    }

    it("null-ts build rows never match (SQL ASOF: probe.ts >= NULL is unknown)") {
      val s = spark
      import s.implicits._
      val probe = Seq((1L, "k", 20L)).toDF("id", "key", "ts")
      // under a nulls-first sort an unfiltered null-ts row would order
      // before the probe row and attach pay=7
      val build = Seq(("k", Option.empty[Long], 7L), ("k", Option(30L), 8L))
        .toDF("key", "ts", "pay")
      val out = AsOfJoin.asOfLeft(probe, build, "key", "ts", Seq("pay"))
        .collect()(0)
      assert(out.isNullAt(out.fieldIndex("pay")))
    }

    it("plans one shuffle on the key — no nested-loop range join") {
      val s = spark
      import s.implicits._
      val probe = Seq((1L, "k", 5L)).toDF("id", "key", "ts")
      val build = Seq(("k", 1L, 9L)).toDF("key", "ts", "pay")
      val plan = AsOfJoin.asOfLeft(probe, build, "key", "ts", Seq("pay"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"))
      assert(!plan.contains("CartesianProduct"))
    }
  }
}
