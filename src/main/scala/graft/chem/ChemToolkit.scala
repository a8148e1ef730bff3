package graft.chem

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The chemistry seam (SURVEY.md §2.I).
  *
  * The reference's chemistry is RDKit + pdbeccdutils
  * (pdbe_sanitise_smiles utils.py:153-186, neutralize_atoms
  * get_pdb_parity.py:31-51, PARITY compare_molecules
  * get_pdb_parity.py:88-107). There is no JVM RDKit, so the engine
  * isolates every chemistry call behind this trait. The interface is
  * DataFrame-shaped on purpose: a chemistry backend is either a Column
  * expression (the [[ColumnChem]] sub-trait — [[FixtureChem]]) or a
  * precomputed descriptor TABLE consumed as a broadcast join
  * ([[TableChemToolkit]] over the offline bridge output,
  * docs/CHEM_BRIDGE.md) — and a table lookup is a RELATION, not a
  * `Column => Column` function, so pretending otherwise would force a
  * giant literal map into every task closure.
  */
trait ChemToolkit {

  /** I1/I2 — attach the canonical (sanitised + neutralised) form of the
    * descriptor column `inCol` as `outCol`. Must add exactly `outCol`
    * and preserve the input rows (a missing-from-table descriptor comes
    * back null — the C11 cache-probe convention).
    */
  def canonicalize(df: DataFrame, inCol: String, outCol: String): DataFrame

  /** I3 — attach the PARITY-style similarity score in [0,1] as `outCol`
    * for each blocked candidate pair row. `aCol`/`bCol` are the pair's
    * ligand ids (orientation-free); `boundSizeCol`/`cognateSizeCol` are
    * the blocked size columns a Column-expressible backend scores from.
    * Must add exactly `outCol` and preserve the input rows; a pair the
    * backend cannot score comes back null (C11 convention again — a
    * computed FAILURE is 0.0, never null).
    */
  def scoreCandidates(df: DataFrame, aCol: String, bCol: String,
      boundSizeCol: String, cognateSizeCol: String, outCol: String): DataFrame

  /** Whether the score is a deterministic pure Column function of exactly
    * the two size arguments (the [[ColumnChem.parityScore]] purity
    * contract). Only a `true` here lets `GraphTables.domainCognate` take
    * the size-class factorization; anything else — a table-keyed kernel,
    * a UDF consulting external state — routes to the definitional
    * join-groupBy, correct for ANY toolkit. Abstract on purpose: every
    * implementation must state its claim; DomainCognateSpec pins both
    * paths against each other.
    */
  def columnPure: Boolean
}

/** Column-expressible toolkits: chemistry as Catalyst expressions (stays
  * inside whole-stage codegen). The df-level hooks derive mechanically.
  */
trait ColumnChem extends ChemToolkit {

  /** I1/I2 — canonical (sanitised + neutralised) form of a descriptor. */
  def canonicalSmiles(descriptor: Column): Column

  /** I3 — PARITY-style similarity score in [0,1] for a candidate pair.
    * Deterministic given inputs, so results are cacheable by the pair key
    * (the C11 cache-probe split relies on this).
    *
    * PURITY CONTRACT (when [[columnPure]] is true): the returned Column
    * must be a deterministic pure function of exactly its two size
    * arguments — no per-ligand lookups, no external state, no
    * non-deterministic expressions. Two registry optimizations assume
    * it: the bestCognate argmax (equal inputs ⇒ equal scores ⇒ a stable
    * tie set) and the size-class factorization of
    * `GraphTables.domainCognate`, which collapses every ligand of one
    * (brand, bucket, size) class to a single representative BECAUSE their
    * candidate scores are identical. An implementation that cannot
    * promise this must return `false` from [[columnPure]].
    */
  def parityScore(boundSize: Column, cognateSize: Column): Column

  final override def canonicalize(df: DataFrame, inCol: String,
      outCol: String): DataFrame =
    df.withColumn(outCol, canonicalSmiles(col(inCol)))

  final override def scoreCandidates(df: DataFrame, aCol: String,
      bCol: String, boundSizeCol: String, cognateSizeCol: String,
      outCol: String): DataFrame =
    df.withColumn(outCol,
      parityScore(col(boundSizeCol), col(cognateSizeCol)))
}

/** Deterministic fixture-backed toolkit: canonicalisation is a stable
  * string normalisation; the score is an exact integer ratio (one double
  * division — bit-identical across engines). Stands in for RDKit with the
  * same dataflow shape and cost model hooks.
  */
object FixtureChem extends ColumnChem {

  // an exact arithmetic expression of the two size columns — the
  // size-class factorization's premise holds
  override val columnPure: Boolean = true

  override def canonicalSmiles(descriptor: Column): Column =
    upper(trim(descriptor))

  override def parityScore(boundSize: Column, cognateSize: Column): Column =
    // clamped at 0: the trait contract is a score in [0,1], and a size
    // difference over 100 would otherwise go negative and flow into
    // cutoff filters / the bestCognate argmax as an out-of-contract
    // value. Registered data never reaches the clamp (p_size ∈ [1,50],
    // and bucket blocking caps the diff at 9), so oracle values are
    // unchanged and the oracles keep the unclamped formula.
    greatest(lit(0.0),
      (lit(100) - abs(boundSize.cast("long") - cognateSize.cast("long")))
        .cast("double") / lit(100.0))
}

/** The precomputed-descriptor-table chemistry backend as a ChemToolkit
  * (docs/CHEM_BRIDGE.md "primary" path, VERDICT r11 item 5): scores and
  * canonical forms come from the offline bridge tables via [[TableChem]]'s
  * broadcast-join combinators, keyed by ligand-pair ids — NOT a Column
  * function of the blocked sizes, so `columnPure` is definitionally
  * false and the registry's domainCognate routes to the definitional
  * join-groupBy (GraphTables). Chemistry applies only to the ligand
  * DIMENSION, so the dimension-sized broadcast lookup is the
  * scale-correct shape at 100 TB (no per-row closure state, Catalyst
  * prunes/pushes around it like any other join).
  */
final case class TableChemToolkit(tables: TableChem) extends ChemToolkit {

  override val columnPure: Boolean = false

  override def canonicalize(df: DataFrame, inCol: String,
      outCol: String): DataFrame =
    tables.withCanonical(df, inCol)
      .withColumnRenamed("canonical", outCol)
      .drop("neutralized")

  override def scoreCandidates(df: DataFrame, aCol: String, bCol: String,
      boundSizeCol: String, cognateSizeCol: String,
      outCol: String): DataFrame =
    tables.withParity(df, aCol, bCol)
      .withColumnRenamed("score", outCol)
      .drop("mcs_smarts")
}
