package graft.chem

import graft.SparkSpec

/** I3 kernel-seam behavior: budget handed INTO the kernel (rdFMCS-style,
  * get_pdb_parity.py:96), failure convention score=0 (the reference records
  * 0 for errored pairs), timeout keeps the kernel's best-so-far result.
  */
class ParityScorerSpec extends SparkSpec {

  private def pairs(ps: (Long, Long, Int, Int)*) = {
    val s = spark
    import s.implicits._
    s.createDataset(ps.map { case (l, c, b, g) => CandidatePair(l, c, b, g) })
  }

  describe("ParityScorer") {

    it("scores pairs with the fixture kernel, status ok") {
      val out = ParityScorer.score(pairs((1L, 10L, 5, 8), (2L, 11L, 7, 7)))
        .collect().sortBy(_.ligandUniqueID)
      assert(out.map(_.parityScore).toSeq == Seq(0.97, 1.0))
      assert(out.forall(_.status == "ok"))
      assert(out.head.matched == (1 to 5))
    }

    it("records a throwing kernel as score 0 / status failure (reference convention)") {
      object Boom extends ParityKernel {
        def compare(p: CandidatePair, b: Long): (Double, Seq[Int], Boolean) =
          if (p.ligandUniqueID == 1L) throw new RuntimeException("kernel error")
          else (0.5, Seq(1), false)
      }
      val out = ParityScorer.score(pairs((1L, 10L, 5, 8), (2L, 11L, 7, 7)),
          kernel = Boom)
        .collect().sortBy(_.ligandUniqueID)
      assert(out(0).parityScore == 0.0 && out(0).status == "failure")
      assert(out(1).parityScore == 0.5 && out(1).status == "ok")
    }

    it("keeps the kernel's best-so-far result on timeout (rdFMCS canceled)") {
      object Slow extends ParityKernel {
        def compare(p: CandidatePair, b: Long): (Double, Seq[Int], Boolean) =
          (0.25, Seq(1, 2), true) // kernel self-reports budget exhaustion
      }
      val out = ParityScorer.score(pairs((1L, 10L, 5, 8)), kernel = Slow)
        .collect()
      assert(out(0).status == "timeout")
      assert(out(0).parityScore == 0.25 && out(0).matched == Seq(1, 2))
    }

    it("fixture kernel honors a generous budget without tripping it") {
      val (s, m, t) = FixtureKernel.compare(CandidatePair(1L, 2L, 3, 9), 40000L)
      assert(s == 0.94 && m == Seq(1, 2, 3) && !t)
    }
  }
}
