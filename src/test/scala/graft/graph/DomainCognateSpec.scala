package graft.graph

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the size-class factorization of `GraphTables.domainCognate`
  * against its definitional form (interactPairs ⋈ similarity, groupBy
  * (suppkey, cogId), max of parityScore / best-flagged parityScore).
  * The factorization is only valid while `build()`'s invariants hold —
  * parityScore a pure function of (bsize, csize), a ligand's candidate
  * set exactly its (brand, bucket) block, ties all best-flagged — so
  * this spec is the tripwire for any change to blocking, scoring, or
  * the argmax flag that would silently break the rewrite.
  */
class DomainCognateSpec extends SparkSpec {

  private def definitional(g: GraphTables) =
    g.interactPairs
      .join(g.similarity.select(col("ligandUniqueID"), col("cogId"),
        col("parityScore"), col("bestCognate")), "ligandUniqueID")
      .groupBy("suppkey", "cogId")
      .agg(max(col("parityScore")).as("maxAnyScore"),
        max(when(col("bestCognate") === "Y", col("parityScore")))
          .as("maxBestScore"))

  describe("domainCognate size-class factorization") {
    it("equals the definitional join-groupBy exactly (sf0.001)") {
      val g = GraphTables.build(spark, "/root/testdata/sf0.001")
      val a = g.domainCognate
        .select("suppkey", "cogId", "maxAnyScore", "maxBestScore")
      val b = definitional(g)
      // exact equality both directions, doubles included: the rewrite
      // must produce the same bits, not approximately the same scores
      assert(a.exceptAll(b).isEmpty, "factorized rows not in definitional")
      assert(b.exceptAll(a).isEmpty, "definitional rows not in factorized")
      assert(a.count() === b.count())
    }

    it("emits each (suppkey, cogId) exactly once") {
      val g = GraphTables.build(spark, "/root/testdata/sf0.001")
      val dup = g.domainCognate.groupBy("suppkey", "cogId")
        .count().filter(col("count") > 1).count()
      assert(dup === 0L)
    }

    it("a non-column-pure toolkit routes to the definitional path and matches") {
      // Computes the SAME score as FixtureChem but through a Scala UDF and
      // declares columnPure = false — the shape a SMILES-keyed kernel
      // would take (VERDICT r10 item 5: the factorization's premise breaks
      // the day a real toolkit backs the registry; the selection must be a
      // trait flag, not prose). Test-only: registered plans stay UDF-free.
      object UdfChem extends graft.chem.ColumnChem {
        override val columnPure: Boolean = false
        override def canonicalSmiles(d: Column): Column = upper(trim(d))
        private val scoreUdf = udf { (x: Long, y: Long) =>
          math.max(0.0, (100L - math.abs(x - y)).toDouble / 100.0)
        }
        override def parityScore(b: Column, c: Column): Column =
          scoreUdf(b.cast("long"), c.cast("long"))
      }
      val g = GraphTables.build(spark, "/root/testdata/sf0.001", UdfChem)
      // routed off the factorization: no size-class array packing in plan
      assert(!g.domainCognate.queryExecution.optimizedPlan.toString
        .contains("collect_list"))
      val a = g.domainCognate
        .select("suppkey", "cogId", "maxAnyScore", "maxBestScore")
      val b = definitional(g)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
      // identical score function ⇒ identical table through EITHER path
      val fix = GraphTables.build(spark, "/root/testdata/sf0.001")
        .domainCognate.select("suppkey", "cogId", "maxAnyScore", "maxBestScore")
      assert(a.exceptAll(fix).isEmpty && fix.exceptAll(a).isEmpty)
    }

    it("the table-backed kernel (TableChemToolkit) routes definitional and reproduces the fixture registry") {
      // VERDICT r11 item 5: the bridge-table toolkit end-to-end — scores
      // via the chem_parity broadcast join, canonical names via the
      // chem_canonical join, domainCognate through the definitional path
      // (columnPure = false), value-identical to the Column-expressed
      // fixture registry because SyntheticBridge derives its tables from
      // the ONE FixtureChem score/canonicalisation definition.
      import graft.chem.{SyntheticBridge, TableChemToolkit}
      val dir = "/root/testdata/sf0.001"
      val tk = TableChemToolkit(SyntheticBridge.tables(spark, dir))
      val g = GraphTables.build(spark, dir, tk)
      assert(g.domainCognatePath === "definitional")
      assert(!g.domainCognate.queryExecution.optimizedPlan.toString
        .contains("collect_list"), "table toolkit must not factorize")
      val fix = GraphTables.build(spark, dir)
      val cols = Seq("suppkey", "cogId", "maxAnyScore", "maxBestScore")
      val a = g.domainCognate.select(cols.map(col): _*)
      val b = fix.domainCognate.select(cols.map(col): _*)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "table-kernel domainCognate diverges from the fixture registry")
      // the scored candidate table itself: bit-identical doubles + flags
      val sCols = Seq("ligandUniqueID", "cogId", "parityScore", "bestCognate")
      val sa = g.similarity.select(sCols.map(col): _*)
      val sb = fix.similarity.select(sCols.map(col): _*)
      assert(sa.exceptAll(sb).isEmpty && sb.exceptAll(sa).isEmpty,
        "table-kernel similarity diverges from the fixture scores")
      // canonical names through the chem_canonical join
      val ca = g.cognates.select("cogId", "cogName")
      val cb = fix.cognates.select("cogId", "cogName")
      assert(ca.exceptAll(cb).isEmpty && cb.exceptAll(ca).isEmpty)
    }

    it("the LIVE process bridge (ProcessChemToolkit) routes definitional " +
       "and reproduces the fixture registry bit-exactly") {
      // VERDICT r12 item 2: the third toolkit — scores computed LIVE by
      // a worker subprocess (tools/chem_bridge_serve.py), no
      // pre-generated parity rows anywhere. Bit-equality holds because
      // the worker computes the same exact integer-ratio division and
      // Python repr round-trips doubles exactly.
      import graft.chem.ProcessChemToolkit
      assume(ProcessChemToolkit.available, "python3 not available")
      val dir = "/root/testdata/sf0.001"
      val g = GraphTables.build(spark, dir, ProcessChemToolkit.default())
      assert(g.domainCognatePath === "definitional")
      val fix = GraphTables.build(spark, dir)
      val cols = Seq("suppkey", "cogId", "maxAnyScore", "maxBestScore")
      val a = g.domainCognate.select(cols.map(col): _*)
      val b = fix.domainCognate.select(cols.map(col): _*)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "process-bridge domainCognate diverges from the fixture registry")
      val sCols = Seq("ligandUniqueID", "cogId", "parityScore", "bestCognate")
      val sa = g.similarity.select(sCols.map(col): _*)
      val sb = fix.similarity.select(sCols.map(col): _*)
      assert(sa.exceptAll(sb).isEmpty && sb.exceptAll(sa).isEmpty,
        "process-bridge similarity diverges from the fixture scores")
      val ca = g.cognates.select("cogId", "cogName")
      val cb = fix.cognates.select("cogId", "cogName")
      assert(ca.exceptAll(cb).isEmpty && cb.exceptAll(ca).isEmpty)
    }

    it("the native scoring loop COMPILES — no silent interpreted fallback") {
      // CODEGEN_ONLY makes projection creation THROW on a janino failure
      // instead of silently degrading to the interpreted eval() — the
      // regression this native expression exists to remove would
      // otherwise come back invisibly on any codegen bug
      val key = "spark.sql.codegen.factoryMode"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "CODEGEN_ONLY")
      try {
        val g = GraphTables.build(spark, "/root/testdata/sf0.001")
        val out = g.domainCognate
        assert(out.queryExecution.executedPlan.toString
          .contains("classbestscores") ||
          out.queryExecution.optimizedPlan.toString
            .contains("classbestscores"),
          "factorized plan no longer routes through ClassBestScores")
        assert(out.count() > 0)
        out.unpersist(blocking = true)
      } finally {
        prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    }

    it("maxBestScore is null exactly when no best-flagged path exists") {
      val g = GraphTables.build(spark, "/root/testdata/sf0.001")
      val d = definitional(g)
      val nullsA = g.domainCognate.filter(col("maxBestScore").isNull)
        .select("suppkey", "cogId")
      val nullsB = d.filter(col("maxBestScore").isNull)
        .select("suppkey", "cogId")
      assert(nullsA.exceptAll(nullsB).isEmpty &&
        nullsB.exceptAll(nullsA).isEmpty)
    }
  }
}
