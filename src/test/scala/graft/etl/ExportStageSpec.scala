package graft.etl

import java.io.{BufferedReader, InputStreamReader}
import java.nio.file.Files
import java.util.zip.GZIPInputStream

import graft.SparkSpec
import graft.graph.GraphTables

/** Golden test of the Neo4j bulk-import header contract
  * (import_neo4j_data.sh:3-78 expectations).
  */
class ExportStageSpec extends SparkSpec {

  private def headerOf(dir: String): String =
    Files.readString(java.nio.file.Paths.get(dir, "header.tsv")).trim

  /** Data parts must be headerless — neo4j-admin reads every data file's
    * first line as a row; the single header lives in header.tsv.
    */
  private def firstDataLine(dir: String): String = {
    val part = new java.io.File(s"$dir/data").listFiles
      .filter(_.getName.endsWith(".csv.gz")).minBy(_.getName)
    val r = new BufferedReader(new InputStreamReader(
      new GZIPInputStream(Files.newInputStream(part.toPath))))
    try r.readLine() finally r.close()
  }

  describe("ExportStage") {
    it("writes the full node/rel set with the typed-header contract") {
      val out = Files.createTempDirectory("neo4j_export").toString
      val g = GraphTables.build(spark, "/root/testdata/sf0.001")
      val written = ExportStage.run(g, out).toMap
      assert(written.size === 7)

      assert(headerOf(written("entry_nodes")) === "pdbEntry:ID(entry-id)")
      assert(headerOf(written("bound_entity_nodes")) ===
        "uniqueID:ID(be-id)\thetCode\tdisplayID")
      assert(headerOf(written("be_is_in_pdb_rels")) ===
        ":START_ID(be-id)\t:END_ID(entry-id)")
      val interacts = headerOf(written("interacts_with_ligand_rels"))
      assert(interacts.contains(":START_ID(domain-id)"))
      assert(interacts.contains("domainContactPerc:float"))
      assert(interacts.contains("contactCount:long"))
      assert(headerOf(written("has_similarity_rels")) ===
        ":START_ID(be-id)\t:END_ID(cl-id)\tparityScore:float\tbestCognate")
      // data parts are headerless (the header would be ingested as a row)
      assert(firstDataLine(written("entry_nodes")).startsWith("pdb"))
      assert(!firstDataLine(written("bound_entity_nodes"))
        .startsWith("uniqueID:ID"))
    }
  }
}
