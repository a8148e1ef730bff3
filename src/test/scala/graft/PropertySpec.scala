package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.operators.{Invariants, WindowOps}

/** Property tests from the SURVEY.md §5 plan (seeded-random cases; the
  * scalacheck-scalatest bridge is not on the offline classpath, so the
  * generators are explicit): range compression matches a naive in-memory
  * compressor on arbitrary int sets; group shares always sum to 1;
  * invariants fire correctly.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def naiveCompress(vs: Set[Int]): String = {
    val sorted = vs.toSeq.sorted
    val pieces = collection.mutable.Buffer.empty[String]
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j + 1 < sorted.length && sorted(j + 1) == sorted(j) + 1) j += 1
      pieces += (if (i == j) s"${sorted(i)}" else s"${sorted(i)}-${sorted(j)}")
      i = j + 1
    }
    pieces.mkString(",")
  }

  describe("rangeCompress (F3) vs naive compressor") {
    it("agrees on arbitrary int sets (12 seeded cases)") {
      val rnd = new Random(42)
      (1 to 12).foreach { _ =>
        val vs = List.fill(1 + rnd.nextInt(40))(rnd.nextInt(61))
        val df = vs.map(("g", _)).toDF("g", "v")
        val got = WindowOps.rangeCompress(df, "g", "v", "r")
          .select("r").as[String].head()
        assert(got === naiveCompress(vs.toSet), s"input: $vs")
      }
    }
  }

  describe("withGroupShare (D3) share conservation") {
    it("per-group shares sum to 1 for arbitrary positive values") {
      val rnd = new Random(7)
      (1 to 6).foreach { _ =>
        val vs = List.fill(3 + rnd.nextInt(30))(1L + rnd.nextInt(100))
        val df = vs.zipWithIndex.map { case (v, i) => (s"g${i % 3}", v) }
          .toDF("g", "v")
        val sums = WindowOps
          .withGroupShare(df, Seq("g"), col("v"), "tot", "sh")
          .groupBy("g").agg(sum("sh").as("s")).select("s").as[Double].collect()
        sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
      }
    }
  }

  describe("Invariants") {
    it("requireUniqueKey passes on unique, fails on duplicated keys") {
      Invariants.requireUniqueKey(Seq(1, 2, 3).toDF("k"), Seq("k"), "uniq")
      assertThrows[IllegalArgumentException] {
        Invariants.requireUniqueKey(Seq(1, 1).toDF("k"), Seq("k"), "dup")
      }
    }
    it("requireJoinComplete detects dropped probe rows") {
      val dim = Seq(1, 2).toDF("k")
      Invariants.requireJoinComplete(Seq(1, 2, 2).toDF("k"), dim, Seq("k"), "ok")
      assertThrows[IllegalArgumentException] {
        Invariants.requireJoinComplete(Seq(1, 3).toDF("k"), dim, Seq("k"), "miss")
      }
    }
  }
}
