package graft.chem

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Golden contract for the offline chemistry-bridge tables
  * (tools/chem_bridge_generate.py → docs/CHEM_BRIDGE.md): the script runs
  * outside this container (it needs RDKit), so what the engine pins here
  * is the TABLE CONTRACT a generated fixture must satisfy for the
  * `TableChem` broadcast-lookup swap to be a drop-in behind the
  * `ChemToolkit` seam. The spec builds contract-shaped tables in-test and
  * asserts every property the consuming side relies on; a real generated
  * parquet pair can be validated by pointing the same asserts at it.
  */
class ChemBridgeContractSpec extends SparkSpec {

  // the documented output schemas, verbatim from the script's docstring
  private val canonicalSchema = StructType(Seq(
    StructField("smiles_in", StringType),
    StructField("canonical", StringType),
    StructField("neutralized", StringType)))
  private val paritySchema = StructType(Seq(
    StructField("ligand_a", StringType),
    StructField("ligand_b", StringType),
    StructField("score", DoubleType),
    StructField("mcs_smarts", StringType)))

  private lazy val canonical: DataFrame = {
    import spark.implicits._
    Seq(("c1ccccc1C(=O)[O-]", "O=C([O-])c1ccccc1", "O=C(O)c1ccccc1"),
        ("CC(=O)O", "CC(=O)O", "CC(=O)O"),
        ("OCC1OC(O)C(O)C(O)C1O", "OCC1OC(O)C(O)C(O)C1O",
          "OCC1OC(O)C(O)C(O)C1O"))
      .toDF("smiles_in", "canonical", "neutralized")
  }

  private lazy val parity: DataFrame = {
    import spark.implicits._
    Seq(("CC(=O)O", "O=C(O)c1ccccc1", 0.4, "[#6]-[#6](=[#8])-[#8]"),
        ("CC(=O)O", "OCC1OC(O)C(O)C(O)C1O", 0.25, "[#6]-[#8]"),
        ("O=C(O)c1ccccc1", "OCC1OC(O)C(O)C(O)C1O", 0.0, ""))
      .toDF("ligand_a", "ligand_b", "score", "mcs_smarts")
  }

  describe("chem bridge table contract") {
    it("pins the exact schemas the generator must emit") {
      assert(canonical.schema.map(f => (f.name, f.dataType)) ===
        canonicalSchema.map(f => (f.name, f.dataType)))
      assert(parity.schema.map(f => (f.name, f.dataType)) ===
        paritySchema.map(f => (f.name, f.dataType)))
    }

    it("keys are unique and pairs are normalized a <= b") {
      assert(canonical.groupBy("smiles_in").count()
        .filter(col("count") > 1).count() === 0)
      assert(parity.groupBy("ligand_a", "ligand_b").count()
        .filter(col("count") > 1).count() === 0)
      assert(parity.filter(col("ligand_a") > col("ligand_b")).count() === 0)
    }

    it("scores are in [0,1] and failures carry score 0 + empty MCS") {
      assert(parity.filter(col("score") < 0 || col("score") > 1)
        .count() === 0)
      // the score-0-on-failure convention (ParityScorer.scala): a failed
      // pair is representable, not absent — absent pairs mean NOT YET
      // COMPUTED and belong to the cache-probe work list instead
      assert(parity.filter(col("mcs_smarts") === "" && col("score") =!= 0.0)
        .count() === 0)
    }

    it("drives the C11 cache-probe split that feeds the offline job") {
      import spark.implicits._
      // engine-side blocked candidates (the GraphTables pair grain),
      // normalized to the same a <= b key the table is keyed by
      val candidates = Seq(
        ("O=C(O)c1ccccc1", "CC(=O)O"),   // cached (after normalization)
        ("CC(=O)O", "CCN"))              // novel → next offline work list
        .toDF("x", "y")
        .select(least(col("x"), col("y")).as("ligand_a"),
          greatest(col("x"), col("y")).as("ligand_b"))
      val probed = candidates.join(parity, Seq("ligand_a", "ligand_b"),
        "left")
      assert(probed.filter(col("score").isNotNull).count() === 1)
      val missing = probed.filter(col("score").isNull)
        .select("ligand_a", "ligand_b")
      // exactly the pairs.parquet input schema of the generator — the
      // memoization loop closes without any engine change
      assert(missing.columns.toSeq === Seq("ligand_a", "ligand_b"))
      assert(missing.count() === 1)
    }

    it("broadcast-lookup canonicalisation is a drop-in for the seam") {
      // TableChem's I1/I2 path: descriptor → canonical via a
      // dimension-sized broadcast join (CHEM_BRIDGE.md primary plan);
      // unparseable descriptors stay absent and surface as nulls for the
      // probe, never as silently-wrong canonical forms
      import spark.implicits._
      val descriptors = Seq("CC(=O)O", "not-a-smiles").toDF("smiles_in")
      val looked = descriptors.join(broadcast(canonical), Seq("smiles_in"),
        "left")
      assert(looked.filter(col("canonical").isNotNull).count() === 1)
      assert(looked.filter(col("canonical").isNull)
        .select("smiles_in").as[String].collect().toSeq ===
        Seq("not-a-smiles"))
    }
  }
}
