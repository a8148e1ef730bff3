package graft.graph

import org.scalatest.funspec.AnyFunSpec

/** DistVec (the sorted-primitive-array distance state that replaced the
  * immutable Map in closenessCentrality's Pregel loop, r14) must be
  * operation-for-operation equal to the Map semantics it replaced —
  * x10's oracle hash and the x11 gate ride on it.
  */
class DistVecSpec extends AnyFunSpec {

  private def toMap(v: DistVec): Map[Long, Long] =
    v.keys.zip(v.ds).toMap

  private def fromMap(m: Map[Long, Long]): DistVec = {
    val ks = m.keys.toArray.sorted
    DistVec(ks, ks.map(m))
  }

  // the pre-r14 reference semantics
  private def mergeRef(a: Map[Long, Long], b: Map[Long, Long]) =
    b.foldLeft(a) { case (m, (src, d)) =>
      if (d < m.getOrElse(src, Long.MaxValue)) m.updated(src, d) else m
    }
  private def improvedRef(from: Map[Long, Long], at: Map[Long, Long]) =
    from.collect { case (src, d)
      if d + 1 < at.getOrElse(src, Long.MaxValue) => src -> (d + 1) }

  private def randMap(rnd: scala.util.Random, n: Int): Map[Long, Long] =
    (1 to n).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(16).toLong)).toMap

  describe("DistVec") {
    it("merge equals the Map fold (min per key, union of keys)") {
      val rnd = new scala.util.Random(3)
      (1 to 500).foreach { _ =>
        val (a, b) = (randMap(rnd, rnd.nextInt(12)), randMap(rnd, rnd.nextInt(12)))
        val got = toMap(DistVec.merge(fromMap(a), fromMap(b)))
        assert(got === mergeRef(a, b))
      }
      // empty fast paths return the other side unchanged
      val v = fromMap(Map(1L -> 2L))
      assert(DistVec.merge(v, DistVec.empty) eq v)
      assert(DistVec.merge(DistVec.empty, v) eq v)
    }

    it("improved equals the Map collect (d+1 beats receiver or unknown)") {
      val rnd = new scala.util.Random(5)
      (1 to 500).foreach { _ =>
        val (f, t) = (randMap(rnd, rnd.nextInt(12)), randMap(rnd, rnd.nextInt(12)))
        val got = toMap(DistVec.improved(fromMap(f), fromMap(t)))
        assert(got === improvedRef(f, t).toMap)
      }
    }

    it("keeps keys strictly sorted (the merge-join invariant)") {
      val rnd = new scala.util.Random(7)
      (1 to 200).foreach { _ =>
        val m = DistVec.merge(fromMap(randMap(rnd, 10)), fromMap(randMap(rnd, 10)))
        assert(m.keys.toSeq === m.keys.toSeq.sorted)
        assert(m.keys.distinct.length === m.keys.length)
      }
    }
  }
}
