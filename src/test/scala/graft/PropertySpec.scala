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

  describe("TopKPerGroup (s7 operator) vs in-memory reference") {
    it("matches sort-take per group for arbitrary data/k/partitioning (10 seeded cases)") {
      val rnd = new Random(19)
      (1 to 10).foreach { _ =>
        val n = 50 + rnd.nextInt(300)
        // duplicate scores are likely (ties broken by unique id), group
        // count varies 1-9, partitioning is arbitrary w.r.t. the groups
        val rows = (1 to n).map(i =>
          (s"g${rnd.nextInt(1 + rnd.nextInt(9))}", i.toLong,
            rnd.nextInt(40).toDouble))
        val k = 1 + rnd.nextInt(5)
        val parts = 1 + rnd.nextInt(7)
        val df = rows.toDF("g", "id", "score").repartition(parts, col("id"))
        val got = graft.plans.TopKPerGroup
          .topK(df, Seq("g"), Seq(("score", true), ("id", false)), k)
          .as[(String, Long, Double)].collect().toSet
        val want = rows.groupBy(_._1).values
          .flatMap(g => g.toSeq.sortBy(r => (-r._3, r._2)).take(k)).toSet
        assert(got == want, s"k=$k parts=$parts n=$n")
      }
    }
  }

  describe("AsOfJoin vs naive range-join reference") {
    it("agrees with max-ts-at-or-before computed per probe row (8 seeded cases)") {
      val rnd = new Random(11)
      (1 to 8).foreach { _ =>
        val probe = List.tabulate(20)(i =>
          (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(100).toLong))
        val build = List.tabulate(15)(i =>
          (s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong, 1000L + i))
          // unique (key, ts) as the operator contract requires
          .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toList
        val got = operators.AsOfJoin.asOfLeft(
            probe.toDF("id", "key", "ts"), build.toDF("key", "ts", "pay"),
            "key", "ts", Seq("pay"))
          .select("id", "pay").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toMap
        val want = probe.map { case (id, k, ts) =>
          val cands = build.filter(b => b._1 == k && b._2 <= ts)
          id -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
        }.toMap
        assert(got === want)
      }
    }
  }

  describe("MinHash one-pass signature vs per-seed crossJoin formulation") {
    it("banded near-dup pairs are identical on random token docs") {
      val rnd = new Random(23)
      val docs = (0 until 30).map { i =>
        val base = List.fill(12)(s"w${rnd.nextInt(20)}")
        // make some documents near-identical so pairs actually survive
        val words = if (i % 3 == 0) base else List.fill(12)(s"w${rnd.nextInt(20)}")
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      val fast = operators.MinHashDedup
        .nearDuplicatePairs(docs, "doc_id", "text", n = 2, seeds = 4,
          rowsPerBand = 2, threshold = 0.5)
        .orderBy("doc_a", "doc_b")
        .as[(Long, Long, Double)].collect().toSeq
      // reference formulation: explicit per-seed rows (the pre-round-5
      // crossJoin shape), same md5 seed scheme
      val sh = docs.select(col("doc_id"),
          explode(graft.functions.TextFunctions.shingles(
            split(col("text"), " "), 2)).as("s"))
      val seedDf = spark.range(0, 4).select(col("id").cast("int").as("seed"))
      val sig = sh.crossJoin(seedDf)
        .groupBy("doc_id", "seed")
        .agg(min(md5(concat(col("seed").cast("string"), lit("|"), col("s"))
          .cast("binary"))).as("mh"))
      val band = sig.groupBy(col("doc_id"),
          floor(col("seed") / 2).cast("long").as("b"))
        .agg(concat_ws("", transform(
          array_sort(collect_list(struct(col("seed"), col("mh")))),
          x => x.getField("mh"))).as("bh"))
      val cand = band.select(col("doc_id").as("da"), col("b"), col("bh"))
        .join(band.select(col("doc_id").as("db"), col("b"), col("bh")),
          Seq("b", "bh"))
        .filter(col("da") < col("db")).select("da", "db").distinct()
        .as[(Long, Long)].collect().toSet
      // reference RESULT: exact Jaccard over the reference candidates —
      // the fast pipeline must produce exactly this set (both directions;
      // a subset-only check could not see dropped bands/candidates)
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      val shSets = sh.as[(Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val want = cand.flatMap { case (a, b) =>
        val i = (shSets(a) intersect shSets(b)).size.toDouble
        val j = i / (cnt(a) + cnt(b) - i).toDouble
        if (j >= 0.5) Some((a, b, j)) else None
      }
      assert(fast.toSet === want)
    }
  }

  describe("rangeCompress edge inputs") {
    it("drops non-numeric values instead of throwing under ANSI mode") {
      val df = Seq(("g", "1"), ("g", "2"), ("g", "n1"), ("g", "4"))
        .toDF("g", "v")
      val got = WindowOps.rangeCompress(df, "g", "v", "r")
        .select("r").as[String].head()
      assert(got === "1-2,4")
    }
  }

  describe("Invariants") {
    it("requireUniqueKey passes on unique, fails on duplicated keys") {
      Invariants.requireUniqueKey(Seq(1, 2, 3).toDF("k"), Seq("k"), "uniq")
      assertThrows[IllegalArgumentException] {
        Invariants.requireUniqueKey(Seq(1, 1).toDF("k"), Seq("k"), "dup")
      }
    }
    it("requireUniqueKey tolerates a single null-keyed row (not a duplicate)") {
      Invariants.requireUniqueKey(
        Seq(Some(1), Some(2), None).toDF("k"), Seq("k"), "null-ok")
      assertThrows[IllegalArgumentException] {
        Invariants.requireUniqueKey(
          Seq(None, None: Option[Int]).toDF("k"), Seq("k"), "null-dup")
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
