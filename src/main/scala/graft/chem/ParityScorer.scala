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

/** I3 — the PARITY pairwise scorer (get_pdb_parity.py:88-107) in its
  * production Spark shape: `mapPartitions` over the candidate-pair table,
  * one deadline per pair (the reference caps `rdFMCS.FindMCS` at 40 s,
  * get_pdb_parity.py:96), struct output with score + atom mapping.
  *
  * This is the one operator SURVEY.md §2.I designates for the
  * mapPartitions tier: the real computation is an external chemistry
  * kernel (MCS search), not expressible as Catalyst expressions. The
  * fixture kernel below is deterministic — score is a single exact
  * integer-difference division, matching FixtureChem.parityScore, and the
  * mapping is the first min(|bound|,|cognate|) atom indices — so results
  * are oracle-checkable while keeping the distributed shape (partition
  * parallelism, per-pair deadline, cacheable-by-pair-key determinism that
  * the C11 cache split relies on) identical to an RDKit-backed kernel.
  */
object ParityScorer {

  def score(pairs: Dataset[CandidatePair],
            timeoutMillis: Long = 40000L): Dataset[ParityResult] = {
    import pairs.sparkSession.implicits._
    pairs.mapPartitions { it =>
      it.map { p =>
        val deadline = System.nanoTime() + timeoutMillis * 1000000L
        try {
          val s = (100L - math.abs(p.boundSize.toLong - p.cognateSize.toLong))
            .toDouble / 100.0
          val matched = (1 to math.min(p.boundSize, p.cognateSize)).toSeq
          if (System.nanoTime() > deadline)
            ParityResult(p.ligandUniqueID, p.cogId, -1.0, Nil, "timeout")
          else
            ParityResult(p.ligandUniqueID, p.cogId, s, matched, "ok")
        } catch {
          case scala.util.control.NonFatal(_) =>
            ParityResult(p.ligandUniqueID, p.cogId, -1.0, Nil, "failure")
        }
      }
    }
  }
}
