package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.SparkSpec

/** Negative-path contract of the contacts stage (VERDICT r12 item 3):
  * arpeggio's wrapper writes status ENVELOPES for failed runs
  * (run_arpeggio.sh:15-22), and the reference classifies them BEFORE
  * parsing contacts (process_pdb_contacts.py:97-115) with the exit-code
  * contract of :426-430 / SURVEY §5. A failed envelope must come out as
  * a classified skip row, never as rows inside the aggregation.
  */
class ContactsStageSpec extends AnyFunSpec with SparkSpec {

  private def read(lines: Seq[String]) = {
    import spark.implicits._
    spark.read.schema(ContactsStage.contactSchema)
      .json(lines.toDS)
  }

  private val good =
    """{"pdb_id":"pdb1","status":"success","bgn":{"auth_asym_id":"A","auth_seq_id":1,"pdbx_PDB_ins_code":""},"end":{"auth_asym_id":"C1","auth_seq_id":9},"contact":["hbond"],"interacting_entities":"INTER","distance":3.1,"type":"atom-atom"}"""

  describe("ContactsStage.skips — exit-code classification") {

    it("classifies a timeout envelope as 127/no_contacts_record") {
      val df = read(Seq(good, """{"pdb_id":"pdbT","status":"timeout"}"""))
      val rows = ContactsStage.skips(df).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      assert(rows == Set(("pdbT", 127, "no_contacts_record")))
    }

    it("classifies an arpeggio_failure envelope as 127/arpeggio_failure") {
      val df = read(Seq(good,
        """{"pdb_id":"pdbF","status":"arpeggio_failure"}"""))
      val rows = ContactsStage.skips(df).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      assert(rows == Set(("pdbF", 127, "arpeggio_failure")))
    }

    it("classifies a success pdb with no contact records as " +
       "124/no_ligand_protein_contacts") {
      val df = read(Seq(good, """{"pdb_id":"pdbE","status":"success"}"""))
      val rows = ContactsStage.skips(df).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      assert(rows == Set(("pdbE", 124, "no_ligand_protein_contacts")))
    }

    it("classifies only-irrelevant / only-INTRA contacts as " +
       "124/no_valid_ligand_protein_contacts (the 1a1q case)") {
      val df = read(Seq(good,
        """{"pdb_id":"pdbP","status":"success","contact":["proximal"],"interacting_entities":"INTER"}""",
        """{"pdb_id":"pdbP","status":"success","contact":["hbond"],"interacting_entities":"INTRA"}"""))
      val rows = ContactsStage.skips(df).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      assert(rows == Set(("pdbP", 124, "no_valid_ligand_protein_contacts")))
    }

    it("emits nothing for a pdb with at least one relevant contact") {
      val df = read(Seq(good))
      assert(ContactsStage.skips(df).isEmpty)
    }
  }

  describe("ContactsStage.aggregate — envelope rows never aggregate") {

    it("drops failed-envelope and non-success rows before aggregation") {
      val df = read(Seq(good,
        """{"pdb_id":"pdbT","status":"timeout"}""",
        // a malformed stream could carry contact arrays on a failed
        // envelope — the status branch must still exclude them
        """{"pdb_id":"pdbT","status":"timeout","contact":["hbond"],"interacting_entities":"INTER"}"""))
      val agg = ContactsStage.aggregate(df)
      assert(agg.select("pdb_id").distinct().collect()
        .map(_.getString(0)).toSeq == Seq("pdb1"))
    }

    it("treats a null status as success (legacy record streams)") {
      val df = read(Seq(
        """{"pdb_id":"pdbL","bgn":{"auth_asym_id":"A","auth_seq_id":1,"pdbx_PDB_ins_code":""},"end":{"auth_asym_id":"C1","auth_seq_id":9},"contact":["hbond"],"interacting_entities":"INTER","distance":3.1,"type":"atom-atom"}"""))
      assert(ContactsStage.aggregate(df).count() == 1L)
      assert(ContactsStage.skips(df).isEmpty)
    }
  }
}
