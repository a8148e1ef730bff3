package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.WindowOps

/** The contacts stage (process_pdb_contacts.py): arpeggio contact JSON
  * (nested bgn/end structs + contact-type arrays, FIXTURES.md §2.3) →
  * relevance filter → per-(entity, domain) contact aggregation →
  * whole-entity share → ownership classification.
  */
object ContactsStage {

  /** Arpeggio contact record schema (process_pdb_contacts.py:115-121,
    * 349-350): nested residue structs, array-typed contact list.
    */
  val contactSchema: StructType = StructType(Seq(
    StructField("pdb_id", StringType),
    StructField("bgn", StructType(Seq(
      StructField("auth_asym_id", StringType),
      StructField("auth_seq_id", LongType),
      StructField("pdbx_PDB_ins_code", StringType)))),
    StructField("end", StructType(Seq(
      StructField("auth_asym_id", StringType),
      StructField("auth_seq_id", LongType)))),
    StructField("contact", ArrayType(StringType)),
    StructField("interacting_entities", StringType),
    StructField("distance", DoubleType),
    StructField("type", StringType)))

  /** Contact types that alone do not make a contact relevant
    * (process_pdb_contacts.py:121).
    */
  val irrelevant: Seq[String] = Seq("proximal", "vdw_clash", "clash")

  /** Relevance filter (B3): any contact type outside the irrelevant set,
    * and inter-entity only.
    */
  def relevant(contacts: DataFrame): DataFrame =
    contacts.filter(
      exists(col("contact"), t => !t.isin(irrelevant: _*)) &&
        col("interacting_entities") === "INTER")

  /** Per-(entity-chain, domain-chain) aggregation with hbond/covalent
    * breakdowns (process_pdb_contacts.py:379-392), whole-entity share and
    * ownership bands (:400-405).
    */
  def aggregate(contacts: DataFrame): DataFrame = {
    val perDomain = relevant(contacts)
      .groupBy(col("pdb_id"), col("bgn.auth_asym_id").as("entity_chain"),
        col("end.auth_asym_id").as("domain_chain"))
      .agg(count(lit(1)).as("contact_count"),
        sum(when(array_contains(col("contact"), "hbond"), 1L).otherwise(0L))
          .as("hbond_count"),
        sum(when(array_contains(col("contact"), "covalent"), 1L).otherwise(0L))
          .as("covalent_count"))
    // withGroupShare already emits perc = contact_count / total_contacts
    // (long/long division auto-widens to double — same value either way);
    // the band thresholds are the one shared classifier definition
    WindowOps.withGroupShare(perDomain, Seq("pdb_id", "entity_chain"),
        col("contact_count"), "total_contacts", "perc")
      .withColumn("ownership",
        graft.graph.GraphTables.ownershipBand(col("perc")))
  }

  /** Read an arpeggio-contacts JSON-lines directory with the explicit
    * schema (no inference pass — one scan at 100 TB).
    */
  def readContacts(s: SparkSession, path: String): DataFrame =
    s.read.schema(contactSchema).json(path)
}
