package graft.chem

import org.apache.spark.sql.Dataset

/** A C10 candidate pair ready for scoring: the distinct bound-ligand
  * structure vs a cognate candidate (never per-occurrence — the reference
  * scores each distinct descriptor once, process_all_pdb_contacts.py:222-230,
  * and occurrences join back at C12).
  */
final case class CandidatePair(ligandUniqueID: Long, cogId: Long,
                               boundSize: Int, cognateSize: Int)

/** Scorer output: similarity score plus the matched-atom mapping (the
  * reference's `mapping` dict, get_pdb_parity.py:91, exported as parallel
  * arrays at produce_neo4j_files.py:409-410) and a status for pairs that
  * hit the per-pair budget (`timeout`) or failed (`failure`).
  */
final case class ParityResult(ligandUniqueID: Long, cogId: Long,
                              parityScore: Double, matched: Seq[Int],
                              status: String)

/** The pluggable MCS kernel. Implementations MUST honor `budgetMillis`
  * internally — this mirrors how the reference enforces its per-pair cap:
  * rdFMCS.FindMCS takes `timeout=40` as a parameter and stops itself
  * (get_pdb_parity.py:96); the caller never preempts the thread. A kernel
  * that runs over budget returns its best-so-far result with
  * `timedOut = true` (rdFMCS's `canceled` flag — the reference still uses
  * the partial MCS in that case).
  */
trait ParityKernel extends Serializable {
  /** Returns (score in [0,1], matched-atom indices, timedOut). */
  def compare(p: CandidatePair, budgetMillis: Long): (Double, Seq[Int], Boolean)
}

/** Deterministic stand-in for the RDKit MCS kernel: score is a single
  * exact integer-difference division (matching FixtureChem.parityScore)
  * and the mapping is the first min(|bound|,|cognate|) atom indices, so
  * results are oracle-checkable. It completes instantly, so it never
  * trips the budget — but it checks it at every step boundary the way a
  * real iterative MCS search would.
  */
object FixtureKernel extends ParityKernel {
  override def compare(p: CandidatePair,
                       budgetMillis: Long): (Double, Seq[Int], Boolean) = {
    val deadline = System.nanoTime() + budgetMillis * 1000000L
    // clamped at 0 — the kernel contract is a score in [0,1], matching
    // FixtureChem.parityScore's clamp (registered data never reaches it)
    val s = math.max(0.0,
      (100L - math.abs(p.boundSize.toLong - p.cognateSize.toLong))
        .toDouble / 100.0)
    val matched = (1 to math.min(p.boundSize, p.cognateSize)).toSeq
    (s, matched, System.nanoTime() > deadline)
  }
}

/** I3 — the PARITY pairwise scorer (get_pdb_parity.py:88-107) in its
  * production Spark shape: `mapPartitions` over the candidate-pair table,
  * a per-pair budget handed to the kernel (the reference caps
  * `rdFMCS.FindMCS` at 40 s via the kernel's own timeout parameter,
  * get_pdb_parity.py:96), struct output with score + atom mapping.
  *
  * This is the one operator SURVEY.md §2.I designates for the
  * mapPartitions tier: the real computation is an external chemistry
  * kernel (MCS search), not expressible as Catalyst expressions.
  *
  * Failure convention follows the reference: a pair whose kernel throws is
  * recorded with score 0 (get_pdb_parity.py scores errored pairs 0, not a
  * sentinel), status `failure`; a pair that exhausts its budget keeps the
  * kernel's best-so-far score with status `timeout` (rdFMCS `canceled`).
  */
object ParityScorer {

  def score(pairs: Dataset[CandidatePair],
            timeoutMillis: Long = 40000L,
            kernel: ParityKernel = FixtureKernel): Dataset[ParityResult] = {
    import pairs.sparkSession.implicits._
    pairs.mapPartitions { it =>
      it.map { p =>
        try {
          val (s, matched, timedOut) = kernel.compare(p, timeoutMillis)
          if (timedOut)
            ParityResult(p.ligandUniqueID, p.cogId, s, matched, "timeout")
          else
            ParityResult(p.ligandUniqueID, p.cogId, s, matched, "ok")
        } catch {
          case scala.util.control.NonFatal(_) =>
            ParityResult(p.ligandUniqueID, p.cogId, 0.0, Nil, "failure")
        }
      }
    }
  }
}
