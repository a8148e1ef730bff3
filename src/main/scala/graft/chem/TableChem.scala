package graft.chem

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The precomputed-descriptor-table chemistry backend (docs/CHEM_BRIDGE.md
  * "primary" path): consumes the two parquet tables the offline RDKit job
  * (`tools/chem_bridge_generate.py`) emits —
  *
  *   chem_canonical(smiles_in, canonical, neutralized)   I1/I2
  *   chem_parity(ligand_a, ligand_b, score, mcs_smarts)  I3
  *
  * — as broadcast joins. Chemistry in this pipeline only ever applies to
  * the ligand DIMENSION (distinct structures; thousands to low millions),
  * never to fact tables, so a dimension-sized broadcast join is the
  * scale-correct lookup: no per-row closure state, stays inside
  * whole-stage codegen, and Catalyst prunes/pushes around it like any
  * other join.
  *
  * Join-combinator shape (not `Column => Column`): a table lookup is a
  * relation, and pretending otherwise (a giant literal map in a closure)
  * would serialize the whole dimension into every task. `FixtureChem`
  * keeps the Column signature for the synthetic registry; pipelines that
  * consume REAL bridge tables compose these combinators at the same
  * points (GoldenPairsSpec drives the full loop).
  */
final case class TableChem(canonical: DataFrame, parity: DataFrame) {

  /** I1/I2 — attach the canonical + neutralized forms of `inCol`.
    * Descriptors missing from the table come back null — the C11
    * cache-probe contract: null canonical means "not yet computed",
    * and the probe emits those rows as the next offline work list.
    */
  def withCanonical(df: DataFrame, inCol: String): DataFrame =
    df.join(broadcast(canonical),
      df(inCol) === canonical("smiles_in"), "left")
      .drop("smiles_in")

  /** I3 — attach the PARITY score + MCS for the pair (aCol, bCol).
    * Pairs are normalized to the table's `ligand_a <= ligand_b` key
    * order first (the generator's contract), so callers can pass pairs
    * in either orientation. Missing pairs come back null score —
    * same cache-probe convention as above; a computed FAILURE is score
    * 0.0 + empty SMARTS, never null (ChemBridgeContractSpec pins this).
    */
  def withParity(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = least(df(aCol), df(bCol))
    val b = greatest(df(aCol), df(bCol))
    df.join(broadcast(parity),
      a === parity("ligand_a") && b === parity("ligand_b"), "left")
      .drop("ligand_a", "ligand_b")
  }

  /** Work lists for the next offline run (the C11 probe): descriptors
    * and normalized pairs present in `df` but absent from the tables.
    */
  def missingCanonical(df: DataFrame, inCol: String): DataFrame =
    df.select(df(inCol).as("smiles_in")).distinct()
      .join(broadcast(canonical.select("smiles_in")), Seq("smiles_in"),
        "left_anti")

  def missingParity(df: DataFrame, aCol: String, bCol: String): DataFrame =
    df.select(least(df(aCol), df(bCol)).as("ligand_a"),
        greatest(df(aCol), df(bCol)).as("ligand_b")).distinct()
      .join(broadcast(parity.select("ligand_a", "ligand_b")),
        Seq("ligand_a", "ligand_b"), "left_anti")
}

object TableChem {
  /** Load from a bridge-output directory (the generator's outDir). */
  def load(s: org.apache.spark.sql.SparkSession, dir: String): TableChem =
    TableChem(s.read.parquet(s"$dir/chem_canonical.parquet"),
      s.read.parquet(s"$dir/chem_parity.parquet"))
}

/** Bridge tables derived IN-ENGINE from the part dimension, with exactly
  * the generator's output contract (tools/chem_bridge_generate.py:
  * chem_canonical/chem_parity schemas, `ligand_a <= ligand_b` key order,
  * the blocked pair list): the oracle-checkable stand-in for an offline
  * RDKit run in a container that has none. Values use the ONE fixture
  * score/canonicalisation definition (FixtureChem), so a query whose
  * scores flow through the TABLE-KEYED lookup path still matches a
  * DuckDB oracle computing the formula directly — which is what makes
  * the whole table-backed kernel path (TableChemToolkit →
  * GraphTables.build → domainCognateDefinitional) a CORRECTNESS-gated
  * query (i7) rather than a fixture-only spec. A real RDKit table drops
  * in by swapping `tables()` for `TableChem.load(dir)`; nothing
  * downstream changes.
  */
object SyntheticBridge {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions._

  def tables(s: SparkSession, dir: String): TableChem = {
    val part = graft.Tables(s, dir, "part")
    val canonical = part.select(col("p_name").as("smiles_in")).distinct()
      .select(col("smiles_in"),
        FixtureChem.canonicalSmiles(col("smiles_in")).as("canonical"),
        FixtureChem.canonicalSmiles(col("smiles_in")).as("neutralized"))
    // one row per BLOCKED candidate pair, a <= b (the generator's key
    // contract) — self-pairs included, exactly the (brand, size-bucket)
    // block GraphTables generates, so the pair list IS the join key
    // contract and every registry candidate resolves non-null
    val a = part.select(col("p_partkey").as("ligand_a"),
      col("p_brand").as("brand"), expr("p_size div 10").as("bucket"),
      col("p_size").as("sa"))
    val b = part.select(col("p_partkey").as("ligand_b"),
      col("p_brand").as("brand"), expr("p_size div 10").as("bucket"),
      col("p_size").as("sb"))
    val parity = a.join(b, Seq("brand", "bucket"))
      .filter(col("ligand_a") <= col("ligand_b"))
      .select(col("ligand_a"), col("ligand_b"),
        FixtureChem.parityScore(col("sa"), col("sb")).as("score"),
        lit("").as("mcs_smarts"))
    TableChem(canonical, parity)
  }
}
