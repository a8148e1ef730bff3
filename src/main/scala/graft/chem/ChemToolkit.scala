package graft.chem

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The chemistry seam (SURVEY.md §2.I).
  *
  * The reference's chemistry is RDKit + pdbeccdutils
  * (pdbe_sanitise_smiles utils.py:153-186, neutralize_atoms
  * get_pdb_parity.py:31-51, PARITY compare_molecules
  * get_pdb_parity.py:88-107). There is no JVM RDKit, so the engine
  * isolates every chemistry call behind this trait: the fixture-backed
  * implementation below is deterministic and testable; a JNI/graalpy
  * bridge or a precomputed canonical-SMILES lookup table slots in without
  * touching any operator.
  *
  * Everything returns a Column so implementations stay inside codegen
  * (or, for a heavyweight scorer, can swap to a mapPartitions-backed
  * variant with a per-task timeout — the reference caps MCS at 40 s,
  * get_pdb_parity.py:96).
  */
trait ChemToolkit {

  /** I1/I2 — canonical (sanitised + neutralised) form of a descriptor. */
  def canonicalSmiles(descriptor: Column): Column

  /** I3 — PARITY-style similarity score in [0,1] for a candidate pair.
    * Deterministic given inputs, so results are cacheable by the pair key
    * (the C11 cache-probe split relies on this).
    *
    * PURITY CONTRACT: the returned Column must be a deterministic pure
    * function of exactly its two size arguments — no per-ligand lookups,
    * no external state, no non-deterministic expressions. Two registry
    * optimizations assume it: the bestCognate argmax (equal inputs ⇒
    * equal scores ⇒ a stable tie set) and the size-class factorization of
    * `GraphTables.domainCognate`, which collapses every ligand of one
    * (brand, bucket, size) class to a single representative BECAUSE their
    * candidate scores are identical. An implementation that cannot
    * promise this (a SMILES-keyed kernel, a UDF consulting a table) must
    * return `false` from [[columnPure]] — the registry then builds
    * domainCognate through the definitional join-groupBy instead.
    */
  def parityScore(boundSize: Column, cognateSize: Column): Column

  /** Whether [[parityScore]] honors the purity contract above (a pure
    * Column function of the two size arguments). `false` routes
    * `GraphTables.domainCognate` to the definitional fact-join path —
    * correct for ANY toolkit, just without the size-class shortcut.
    * Abstract on purpose: every implementation must state its claim;
    * DomainCognateSpec pins both paths against each other.
    */
  def columnPure: Boolean
}

/** Deterministic fixture-backed toolkit: canonicalisation is a stable
  * string normalisation; the score is an exact integer ratio (one double
  * division — bit-identical across engines). Stands in for RDKit with the
  * same dataflow shape and cost model hooks.
  */
object FixtureChem extends ChemToolkit {

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
