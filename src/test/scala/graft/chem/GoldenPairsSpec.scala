package graft.chem

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.WindowOps

/** The reference's own 27 curated cognate-ligand pairs
  * (`/root/reference/cognate_ligand_pairs.csv`, committed verbatim at
  * src/test/resources/golden/) driven through the REAL bridge seam:
  * TableChem lookup joins + the registry's D4 argmax + the similarity
  * cutoff — the engine-side half of the chemistry loop, end to end.
  *
  * What is validated here vs what the offline RDKit run validates:
  * this container has no RDKit, so PARITY NUMERICS for analog pairs
  * cannot be computed in-repo. Two score classes are therefore used:
  *
  *   - identity pairs (bound het IS the cognate molecule — NAD/C00003,
  *     CDP/C00112, FAD/C00016 ×2, GTP/C00044, AMP/C00020, COA/C00010,
  *     MYA/C02593): PARITY(x, x) = 1.0 BY DEFINITION (all atoms match
  *     themselves) — no kernel needed, these eight scores are exact;
  *   - analog pairs: placeholder 0.75 (0.45 for 4d9p's Z17 — the
  *     reference's own note says its score is just under 0.5), marked
  *     `definitional = false`. When `tools/chem_bridge_generate.py` runs
  *     in an RDKit environment, its chem_parity output replaces these
  *     rows and this spec re-runs unchanged — the assertions are about
  *     WHICH cognate wins and survives the cutoff, which the curated CSV
  *     pins independently of the exact analog score.
  *
  * SMILES strings are opaque join keys to the engine (TableChem is a
  * lookup seam), so the fixture uses deterministic carrier keys; identity
  * means the same key on both sides, exactly as RDKit-canonical SMILES
  * would coincide for the same molecule.
  */
class GoldenPairsSpec extends SparkSpec {

  private val cutoff = 0.40

  /** het → expected KEGG cognate, identity flag (same molecule). */
  private lazy val golden: DataFrame = {
    val res = getClass.getResource("/golden/cognate_ligand_pairs.csv")
    spark.read.option("header", "true").csv(res.toString)
      .select(col("pdb_id"), col("hetCode").as("het"),
        col("dbxref").as("kegg"))
  }

  private val identityHets =
    Set("NAD", "CDP", "FAD", "GTP", "AMP", "COA", "MYA")

  /** Carrier descriptor key: identity pairs share one key (same
    * molecule ⇒ same canonical SMILES); analogs get distinct keys.
    */
  private def hetKey(het: String, kegg: String): String =
    if (identityHets.contains(het)) s"SM:$kegg" else s"SM:HET:$het"
  private def cogKey(kegg: String): String = s"SM:$kegg"

  // ---- committed-fixture bridge tables over the golden universe -------
  private lazy val rows: Seq[(String, String, String)] =
    golden.collect().toSeq.map(r =>
      (r.getString(0), r.getString(1), r.getString(2)))

  private lazy val chemCanonical: DataFrame = {
    import spark.implicits._
    rows.flatMap { case (_, het, kegg) =>
      Seq(hetKey(het, kegg), cogKey(kegg)) }
      .distinct.map(s => (s, s, s))
      .toDF("smiles_in", "canonical", "neutralized")
  }

  private lazy val chemParity: DataFrame = {
    import spark.implicits._
    val cogs = rows.map(_._3).distinct.sorted
    val pairs = rows.flatMap { case (_, het, kegg) =>
      val hk = hetKey(het, kegg)
      // golden pair: definitional 1.0 for identity, placeholder for
      // analogs (Z17's pinned sub-0.5 per the reference's note)
      val goldenScore =
        if (identityHets.contains(het)) 1.0
        else if (het == "Z17") 0.45
        else 0.75
      val goldenRow = (hk, cogKey(kegg), goldenScore)
      // decoys: the next cognate alphabetically scores just below the
      // golden score (present, above the cutoff where the golden score
      // allows, must LOSE the argmax — 0.40 for Z17, whose golden 0.45
      // sits closest to the cutoff); all others 0.2 (below cutoff, must
      // be filtered before the argmax sees them)
      val strongDecoy = math.min(0.5, goldenScore - 0.05)
      val others = cogs.filter(_ != kegg)
      val decoys = others.zipWithIndex.map { case (c, i) =>
        (hk, cogKey(c), if (i == 0) strongDecoy else 0.2) }
      goldenRow +: decoys
    }
    pairs.map { case (a, b, s) =>
      (if (a <= b) a else b, if (a <= b) b else a, s, "[mcs]") }
      .distinct
      .toDF("ligand_a", "ligand_b", "score", "mcs_smarts")
      // pair keys must be unique after normalization: keep max score
      // (identity pairs (x,x) can collide with a 0.2 decoy orientation)
      .groupBy("ligand_a", "ligand_b")
      .agg(max("score").as("score"), first("mcs_smarts").as("mcs_smarts"))
  }

  private lazy val chem = TableChem(chemCanonical, chemParity)

  describe("golden cognate pairs through the TableChem seam") {

    it("resolves every golden descriptor through chem_canonical " +
       "(no missing work list)") {
      import spark.implicits._
      val descs = rows.flatMap { case (_, het, kegg) =>
        Seq(hetKey(het, kegg), cogKey(kegg)) }.distinct.toDF("smiles")
      assert(chem.missingCanonical(descs, "smiles").count() === 0)
      val resolved = chem.withCanonical(descs, "smiles")
      assert(resolved.filter(col("canonical").isNull).count() === 0)
    }

    it("reproduces every curated cognate as the best-cognate argmax at " +
       "the 0.40 cutoff") {
      import spark.implicits._
      // distinct structures scored once; occurrences join back (the
      // reference's C12 rule — process_all_pdb_contacts.py:222-230)
      val hets = rows.map { case (_, het, kegg) =>
        (het, hetKey(het, kegg)) }.distinct.toDF("het", "hetSmiles")
      val cogs = rows.map(_._3).distinct
        .map(k => (k, cogKey(k))).toDF("kegg", "cogSmiles")
      val candidates = hets.crossJoin(cogs) // golden universe is tiny;
        // production candidates come blocked from GraphTables
      val scored = chem.withParity(candidates, "hetSmiles", "cogSmiles")
        .filter(col("score").isNotNull)     // absent = not yet computed
        .filter(col("score") >= cutoff)     // the similarity cutoff
      val best = WindowOps.argmaxFlag(scored, Seq("het"), col("score"),
        "bestCognate").filter(col("bestCognate") === "Y")
        .select(col("het"), col("kegg").as("bestKegg"), col("score"))
      // every one of the 27 occurrences gets its curated cognate back
      val joined = golden.join(best, Seq("het"), "left")
      val wrong = joined.filter(col("bestKegg").isNull ||
        col("bestKegg") =!= col("kegg"))
      assert(wrong.count() === 0,
        s"mismatches: ${wrong.collect().mkString(", ")}")
      assert(joined.count() === 27)
    }

    it("identity pairs score exactly 1.0 (the definitional anchor)") {
      import spark.implicits._
      val idPairs = rows.collect {
        case (_, het, kegg) if identityHets.contains(het) =>
          (hetKey(het, kegg), cogKey(kegg)) }
        .distinct.toDF("a", "b")
      val scored = chem.withParity(idPairs, "a", "b")
      assert(scored.count() > 0)
      assert(scored.filter(col("score") =!= 1.0).count() === 0)
    }

    it("keeps the sub-0.5 inhibitor pair (Z17) above the cutoff and " +
       "drops sub-cutoff decoys before the argmax") {
      import spark.implicits._
      val z = chem.withParity(
        Seq((hetKey("Z17", "C01300"), cogKey("C01300"))).toDF("a", "b"),
        "a", "b")
      assert(z.head().getAs[Double]("score") === 0.45)
      // a 0.2 decoy pair is present in the table but below the cutoff
      val decoyCount = chemParity
        .filter(col("score") < cutoff && col("score") > 0.0).count()
      assert(decoyCount > 0, "fixture must contain sub-cutoff decoys")
    }

    it("emits an empty parity work list for the golden candidates " +
       "(probe contract)") {
      import spark.implicits._
      val cand = rows.map { case (_, het, kegg) =>
        (hetKey(het, kegg), cogKey(kegg)) }.distinct.toDF("a", "b")
      assert(chem.missingParity(cand, "a", "b").count() === 0)
      // ...and a genuinely novel pair lands ON the work list
      val novel = Seq(("SM:NOVEL1", "SM:NOVEL2")).toDF("a", "b")
      assert(chem.missingParity(novel, "a", "b").count() === 1)
    }
  }
}
