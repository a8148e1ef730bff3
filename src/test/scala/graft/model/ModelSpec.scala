package graft.model

import graft.SparkSpec
import graft.graph.GraphTables

class ModelSpec extends SparkSpec {

  describe("typed stage-boundary views") {
    it("every registry table maps onto its case class") {
      val g = GraphTables.build(spark, "/root/testdata/sf0.001")
      assert(g.typed.entriesDs.head().pdbEntry.startsWith("pdb"))
      val be = g.typed.boundEntitiesDs.head()
      assert(be.uniqueID === s"${be.ok}_${be.ligandUniqueID}")
      assert(Set("CATH", "SCOP", "Pfam").contains(g.typed.domainsDs.head().dtype))
      val dc = g.typed.interactsDs.head()
      assert(dc.perc > 0.0 && dc.perc <= 1.0)
      assert(g.typed.cognatesDs.head().cogId >= 0)
      val ps = g.typed.similarityDs.head()
      assert(ps.parityScore >= 0.9 && ps.parityScore <= 1.0)
      assert(Set("Y", "N").contains(ps.bestCognate))
    }
  }
}
