package graft.operators

import graft.SparkSpec

class ClosureSpec extends SparkSpec {
  import spark.implicits._

  describe("resolveToTerminal (C8)") {
    it("follows a 3-hop chain to its terminal") {
      val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
      val keys = Seq("a", "b", "x").toDF("key")
      val out = Closure.resolveToTerminal(keys, edges, 3)
        .as[(String, String)].collect().toMap
      assert(out === Map("a" -> "d", "b" -> "d", "x" -> "x"))
    }
    it("collapses multi-target sources to the first (min) transfer") {
      val edges = Seq(("a", "c"), ("a", "b")).toDF("src", "dst")
      val keys = Seq("a").toDF("key")
      val out = Closure.resolveToTerminal(keys, edges, 2)
        .as[(String, String)].collect().toMap
      // a → min(b,c)=b, b has no edge → stays
      assert(out === Map("a" -> "b"))
    }
    it("does not fan out duplicate keys across hops") {
      val edges = Seq(("a", "b"), ("a", "c"), ("b", "d")).toDF("src", "dst")
      val keys = Seq("a", "a").toDF("key")
      val out = Closure.resolveToTerminal(keys, edges, 3).collect()
      assert(out.length === 2) // one row per input row, no combinatorial blowup
    }
  }
}
