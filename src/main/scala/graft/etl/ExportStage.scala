package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.GraphTables
import graft.sources.Sinks

/** The Neo4j bulk-import export stage (produce_neo4j_files.py:83-562 →
  * import_neo4j_data.sh:3-78): node and relationship tables written as
  * TSV+gzip with the typed-header contract (`:ID(space)`, `:START_ID`,
  * `prop:float`, `prop:string[]`, array delim `|`).
  */
object ExportStage {

  /** Writes the full node/rel set for the graph registry; returns the list
    * of (table, path) written.
    */
  def run(g: GraphTables, outDir: String): Seq[(String, String)] = {
    def path(n: String) = s"$outDir/$n"

    Sinks.neo4jTsv(g.entries.select("pdbEntry"), path("entry_nodes"),
      Map("pdbEntry" -> "pdbEntry:ID(entry-id)"))

    Sinks.neo4jTsv(
      g.boundEntities.select("uniqueID", "hetCode", "displayID"),
      path("bound_entity_nodes"),
      Map("uniqueID" -> "uniqueID:ID(be-id)"))

    Sinks.neo4jTsv(
      g.cognates.select(col("cogId"), col("cogName").as("name"), col("brand")),
      path("cognate_ligand_nodes"),
      Map("cogId" -> "cogId:ID(cl-id)"))

    Sinks.neo4jTsv(
      g.domains.select("domainAccession", "dtype", "superfamily"),
      path("domain_nodes"),
      Map("domainAccession" -> "domainAccession:ID(domain-id)"))

    Sinks.neo4jTsv(
      g.boundEntities.select(col("uniqueID"),
        concat(lit("pdb"), col("ok")).as("pdbEntry")),
      path("be_is_in_pdb_rels"),
      Map("uniqueID" -> ":START_ID(be-id)", "pdbEntry" -> ":END_ID(entry-id)"))

    Sinks.neo4jTsv(
      g.interacts.join(
          g.domains.select("suppkey", "domainAccession"), "suppkey")
        .select(col("domainAccession"), col("uniqueID"),
          col("contactCount"), col("perc").as("domainContactPerc"),
          col("interactionMode")),
      path("interacts_with_ligand_rels"),
      Map("domainAccession" -> ":START_ID(domain-id)",
        "uniqueID" -> ":END_ID(be-id)",
        "domainContactPerc" -> "domainContactPerc:float",
        "contactCount" -> "contactCount:long"))

    // C12: occurrences join back to ligand-keyed scores at export
    Sinks.neo4jTsv(
      g.boundEntities.select("uniqueID", "ligandUniqueID")
        .join(g.similarity, "ligandUniqueID")
        .select(col("uniqueID"), col("cogId"),
          col("parityScore"), col("bestCognate")),
      path("has_similarity_rels"),
      Map("uniqueID" -> ":START_ID(be-id)", "cogId" -> ":END_ID(cl-id)",
        "parityScore" -> "parityScore:float"))

    Seq("entry_nodes", "bound_entity_nodes", "cognate_ligand_nodes",
      "domain_nodes", "be_is_in_pdb_rels", "interacts_with_ligand_rels",
      "has_similarity_rels").map(n => n -> path(n))
  }
}

/** Flat-file export (produce_flat_files.py:32-52): the similarity table
  * reduced to each ligand's best matches only (the `transform(max)` +
  * filter shape) and joined to cognate names, written as plain CSV for
  * distribution (the Zenodo flat-file artifact's analogue).
  */
object FlatFileExport {

  def bestScores(g: GraphTables): org.apache.spark.sql.DataFrame =
    g.similarity.filter(col("bestCognate") === "Y")
      .join(g.cognates.select(col("cogId"), col("cogName")), "cogId")
      .select(col("ligandUniqueID"), col("cogId"), col("cogName"),
        col("parityScore"))

  def write(g: GraphTables, path: String): Unit =
    bestScores(g).write.mode("overwrite")
      .option("header", "true").csv(path)
}

/** End-to-end ETL main: star schema → graph registry → Neo4j bulk files.
  * Usage: runMain graft.etl.Pipeline <sfDir> <outDir>
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // cached(): the 7 sink writes are separate actions over shared
    // lineages (boundEntities feeds 3 sinks) — persist once, not rebuild
    val written = ExportStage.run(GraphTables.cached(spark, sfDir), outDir)
    written.foreach { case (n, p) => println(s"[pipeline] wrote $n -> $p") }
    spark.stop()
  }
}
