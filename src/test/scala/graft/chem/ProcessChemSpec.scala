package graft.chem

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the LIVE process bridge (VERDICT r12 item 2): protocol
  * framing, the reference's failure/timeout envelope
  * (get_pdb_parity.py scores errored pairs 0; rdFMCS `canceled` keeps
  * the best-so-far score), null handling, and value-equality with the
  * table backend over the same candidates — the i7 replay in miniature.
  */
class ProcessChemSpec extends SparkSpec {

  private def tk = ProcessChemToolkit.default()

  private def assumeWorker(): Unit =
    assume(ProcessChemToolkit.available, "python3 not available")

  describe("ProcessChemToolkit — canonicalize") {

    it("canonicalizes live, matching FixtureChem's definition") {
      assumeWorker()
      import spark.implicits._
      val df = Seq("  c1ccccc1 ", "CC(=O)O", "SM:C00003")
        .toDF("smiles")
      val out = tk.canonicalize(df, "smiles", "canon")
      val viaFixture = FixtureChem.canonicalize(df, "smiles", "canon")
      assert(out.select("smiles", "canon").exceptAll(
        viaFixture.select("smiles", "canon")).isEmpty)
      assert(out.count() === 3) // rows preserved
    }

    it("preserves rows with a null descriptor (null canonical back)") {
      assumeWorker()
      import spark.implicits._
      val df = Seq(Some("abc"), None).toDF("smiles")
      val out = tk.canonicalize(df, "smiles", "canon")
      assert(out.count() === 2)
      assert(out.filter(col("smiles").isNull &&
        col("canon").isNull).count() === 1)
    }
  }

  describe("ProcessChemToolkit — scoreCandidates (the PSIZE path)") {

    it("matches the table backend bit-exactly over the same blocked " +
       "candidates (the i7 replay)") {
      assumeWorker()
      val dir = "/root/testdata/sf0.001"
      val part = graft.Tables(spark, dir, "part")
      val a = part.select(col("p_partkey").as("lig"),
        col("p_brand").as("brand"), expr("p_size div 10").as("bucket"),
        col("p_size").cast("long").as("bsize"))
      val b = part.select(col("p_partkey").as("cog"),
        col("p_brand").as("brand"), expr("p_size div 10").as("bucket"),
        col("p_size").cast("long").as("csize"))
      val cand = a.join(b, Seq("brand", "bucket"))
      val live = tk.scoreCandidates(cand, "lig", "cog", "bsize", "csize",
          "score").select("lig", "cog", "score")
      val table = TableChemToolkit(SyntheticBridge.tables(spark, dir))
        .scoreCandidates(cand, "lig", "cog", "bsize", "csize", "score")
        .select("lig", "cog", "score")
      assert(live.exceptAll(table).isEmpty && table.exceptAll(live).isEmpty,
        "live scores diverge from the bridge-table scores")
    }

    it("the direct (inputIsDistinctPairs) form equals the deduped form " +
       "and passes null components through as null") {
      assumeWorker()
      import spark.implicits._
      val df = Seq(
        ("a1", "b1", Some(10L), Some(12L)),
        ("a2", "b2", Some(50L), Some(50L)),
        ("a3", "b3", None, Some(7L)),          // null bound size
        ("FAILPAIR", "b4", Some(3L), Some(4L)) // worker failure → 0.0
      ).toDF("a", "b", "bs", "cs")
      val direct = tk.copy(inputIsDistinctPairs = true)
        .scoreCandidates(df, "a", "b", "bs", "cs", "score")
      val deduped = tk.scoreCandidates(df, "a", "b", "bs", "cs", "score")
      assert(direct.exceptAll(deduped).isEmpty &&
        deduped.exceptAll(direct).isEmpty)
      assert(direct.filter(col("a") === "a3" && col("score").isNull)
        .count() === 1)
      assert(direct.filter(col("a") === "FAILPAIR").head()
        .getAs[Double]("score") === 0.0)
      assert(direct.count() === 4) // rows preserved, no dedup collapse
    }

    it("scores a computed failure 0.0, never null (the reference's " +
       "errored-pair convention)") {
      assumeWorker()
      import spark.implicits._
      val df = Seq(("FAILPAIR_X", "okpair", 10L, 12L)).toDF("a", "b", "bs", "cs")
      val out = tk.scoreCandidates(df, "a", "b", "bs", "cs", "score")
      assert(out.head().getAs[Double]("score") === 0.0)
    }
  }

  describe("ProcessParityKernel — the mapPartitions kernel seam") {

    it("ParityScorer over the process kernel equals the fixture kernel " +
       "(score, mapping, status)") {
      assumeWorker()
      import spark.implicits._
      val pairs = spark.range(0, 200)
        .select(col("id").as("ligandUniqueID"), (col("id") * 7 % 97).as("cogId"),
          (col("id") % 50 + 1).cast("int").as("boundSize"),
          (col("id") % 41 + 1).cast("int").as("cognateSize"))
        .as[CandidatePair]
      val live = ParityScorer.score(pairs,
        kernel = ProcessParityKernel(Seq("python3",
          new java.io.File("tools/chem_bridge_serve.py").getAbsolutePath)))
      val fixture = ParityScorer.score(pairs)
      assert(live.toDF.exceptAll(fixture.toDF).isEmpty &&
        fixture.toDF.exceptAll(live.toDF).isEmpty)
      assert(live.filter(col("status") =!= "ok").isEmpty)
    }
  }

  describe("ProcessChemToolkit — scoreStructures (the PMOL path)") {

    it("identity descriptors score exactly 1.0 live") {
      assumeWorker()
      import spark.implicits._
      val df = Seq(("SM:C00003", "SM:C00003")).toDF("a", "b")
      val out = tk.scoreStructures(df, "a", "b", "score")
      assert(out.head().getAs[Double]("score") === 1.0)
      assert(out.head().getAs[String]("score_status") === "ok")
    }

    it("an over-budget pair keeps the best-so-far score with status " +
       "timeout (rdFMCS canceled)") {
      assumeWorker()
      import spark.implicits._
      val slow = ProcessChemToolkit.default(budgetMillis = 50L)
      val df = Seq(("SLOWPAIR:abc", "SLOWPAIR:abc")).toDF("a", "b")
      val out = slow.scoreStructures(df, "a", "b", "score")
      val row = out.head()
      assert(row.getAs[String]("score_status") === "timeout")
      assert(row.getAs[Double]("score") === 1.0) // best-so-far kept
    }

    it("a failing structure pair scores 0.0 with status failure") {
      assumeWorker()
      import spark.implicits._
      val df = Seq(("FAILPAIR", "whatever")).toDF("a", "b")
      val out = tk.scoreStructures(df, "a", "b", "score")
      val row = out.head()
      assert(row.getAs[Double]("score") === 0.0)
      assert(row.getAs[String]("score_status") === "failure")
    }

    it("tab/newline in a descriptor cannot desync the protocol framing") {
      assumeWorker()
      import spark.implicits._
      val df = Seq(("bad\tkey\nhere", "bad\tkey\nhere"), ("x y", "x y"))
        .toDF("a", "b")
      val out = tk.scoreStructures(df, "a", "b", "score")
      assert(out.count() === 2)
      assert(out.filter(col("score") === 1.0).count() === 2)
    }
  }
}
