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
    * 349-350): nested residue structs, array-typed contact list, plus the
    * per-record `status` the arpeggio wrapper stamps on every envelope
    * (run_arpeggio.sh:15-22 writes {"status": timeout|arpeggio_failure|
    * success, "<pdb>": [...]}; unwrapping the envelope to JSON-lines
    * carries the status onto each record — a failed pdb surfaces as ONE
    * record with status != success and null contact fields). A null
    * status reads as success for legacy record streams.
    */
  val contactSchema: StructType = StructType(Seq(
    StructField("pdb_id", StringType),
    StructField("status", StringType),
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
    * inter-entity only, and only records from a SUCCESSFUL arpeggio run —
    * a timeout/arpeggio_failure envelope must surface as a classified
    * skip ([[skips]]), never as a parse anomaly inside the aggregation
    * (process_pdb_contacts.py:97-115 branches on the status before
    * touching the contact records).
    */
  def relevant(contacts: DataFrame): DataFrame =
    contacts.filter(relevantPred)

  /** The ONE per-record relevance predicate — shared by the batch filter,
    * the batch skip classifier, and the streaming skip aggregation (j14),
    * so the three can never drift.
    */
  def relevantPred: org.apache.spark.sql.Column =
    (col("status").isNull || col("status") === "success") &&
      exists(col("contact"), t => !t.isin(irrelevant: _*)) &&
      col("interacting_entities") === "INTER"

  /** Per-pdb skip-state aggregates (envelope flags + record counts) —
    * monotone under accumulation (max/sum), which is exactly what lets
    * the STREAMING form maintain them incrementally in update mode and
    * roll the sink up with max(): every column's final state is its
    * cross-batch maximum.
    */
  def skipAggs: Seq[org.apache.spark.sql.Column] = Seq(
    max(when(col("status") === "timeout", 1).otherwise(0)).as("t"),
    max(when(col("status") === "arpeggio_failure", 1).otherwise(0)).as("f"),
    sum(when(col("contact").isNotNull, 1L).otherwise(0L)).as("n_any"),
    sum(when(relevantPred, 1L).otherwise(0L)).as("n_rel"))

  /** Exit-code classification over the aggregated per-pdb skip state
    * (columns t/f/n_any/n_rel) — the reference's precedence order.
    */
  def classifySkips(agg: DataFrame): DataFrame =
    agg.select(col("pdb_id"),
      when(col("t") === 1 || col("f") === 1, lit(127))
        .when(col("n_any") === 0L, lit(124))
        .when(col("n_rel") === 0L, lit(124))
        .as("exit_code"),
      when(col("t") === 1, lit("no_contacts_record"))
        .when(col("f") === 1, lit("arpeggio_failure"))
        .when(col("n_any") === 0L, lit("no_ligand_protein_contacts"))
        .when(col("n_rel") === 0L, lit("no_valid_ligand_protein_contacts"))
        .as("reason"))
      .filter(col("exit_code").isNotNull)

  /** Per-pdb skip classification — the reference's exit-code contract
    * (process_pdb_contacts.py:97-115, 426-430; SURVEY §5):
    *
    *  - envelope status `timeout`          → 127 `no_contacts_record`
    *  - envelope status `arpeggio_failure` → 127 `arpeggio_failure`
    *  - success but NO contact records     → 124 `no_ligand_protein_contacts`
    *  - success, contacts present, none pass the relevance filter
    *                                       → 124 `no_valid_ligand_protein_contacts`
    *
    * One row per skipped pdb, `(pdb_id, exit_code, reason)`; pdbs with at
    * least one relevant contact emit nothing. One hash aggregation over
    * the record stream — the same grouping key the contact aggregation
    * shuffles on, so at 100 TB this is a second map-side-combined pass,
    * not a new shuffle shape.
    *
    * Codes 125 (contacts but none within an annotated domain) and 126
    * (no domains for any protein entity) belong to the reference's
    * DOMAIN-ASSIGNMENT step, downstream of the contact parse — in this
    * engine that is the registry build's domain join, where an entry
    * simply produces no interaction rows; they are not contact-stream
    * classifications and so are out of scope here by design.
    */
  def skips(contacts: DataFrame): DataFrame =
    classifySkips(contacts.groupBy("pdb_id")
      .agg(skipAggs.head, skipAggs.tail: _*))

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
