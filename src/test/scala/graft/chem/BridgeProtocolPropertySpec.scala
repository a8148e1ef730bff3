package graft.chem

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.SparkSpec

/** Property tests for the round-13 seams, in the repo's seeded-random
  * style (the scalacheck bridge is not on the offline classpath):
  *
  *  - the bridge protocol survives ARBITRARY descriptor strings —
  *    including tabs, newlines, unicode, empties — without desyncing
  *    the framing (every row gets exactly one answer, identity pairs
  *    that survive sanitization score 1.0);
  *  - PSIZE through the worker equals FixtureChem's formula for
  *    arbitrary size pairs (the bit-equality premise of i8);
  *  - ContactsStage.skips equals a naive in-memory classifier over
  *    randomly generated record sets covering all envelope shapes.
  */
class BridgeProtocolPropertySpec extends AnyFunSpec with SparkSpec {

  private def assumeWorker(): Unit =
    assume(ProcessChemToolkit.available, "python3 not available")

  describe("bridge protocol vs arbitrary descriptors") {

    it("never desyncs framing on hostile strings (5 seeded batches)") {
      assumeWorker()
      import spark.implicits._
      val rnd = new Random(7)
      val alphabet = "ab\t\né□ :#09"
      (1 to 5).foreach { round =>
        val rows = (1 to 40).map { i =>
          val s = (0 until 1 + rnd.nextInt(12))
            .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
          (s"k$round:$i", s)
        }
        val df = rows.toDF("k", "s")
        val out = ProcessChemToolkit.default()
          .scoreStructures(df, "s", "s", "score")
        // one answer per row, no protocol desync, no crash
        assert(out.count() === rows.length)
        // identity pairs: score 1.0 whenever the sanitized form has
        // at least one token (token-less strings are ERR -> 0.0)
        val scored = out.select(col("s"), col("score"), col("score_status"))
          .collect()
        scored.foreach { r =>
          val tokens = r.getString(0).split("[^\\p{Alnum}]+").count(_.nonEmpty)
          if (tokens > 0)
            assert(r.getDouble(1) === 1.0, s"input: ${r.getString(0)}")
          else assert(r.getString(2) === "failure")
        }
      }
    }

    it("PSIZE equals FixtureChem's exact formula on random size pairs") {
      assumeWorker()
      import spark.implicits._
      val rnd = new Random(11)
      val pairs = (1 to 300).map { i =>
        (s"a$i", s"b$i", rnd.nextInt(200).toLong, rnd.nextInt(200).toLong)
      }
      val df = pairs.toDF("a", "b", "bs", "cs")
      val live = ProcessChemToolkit.default()
        .scoreCandidates(df, "a", "b", "bs", "cs", "score")
        .select("a", "b", "score")
      val fixture = df.withColumn("score",
          FixtureChem.parityScore(col("bs"), col("cs")))
        .select("a", "b", "score")
      assert(live.exceptAll(fixture).isEmpty &&
        fixture.exceptAll(live).isEmpty)
    }
  }

  describe("ContactsStage.skips vs a naive classifier") {

    it("agrees on randomly generated envelope/record mixes (8 seeds)") {
      import graft.etl.ContactsStage
      import spark.implicits._
      val rnd = new Random(23)
      (1 to 8).foreach { round =>
        // per pdb: one of five shapes
        val shapes = (0 until 12).map { i =>
          (s"pdb${round}_$i", rnd.nextInt(5))
        }
        val lines = shapes.flatMap { case (pdb, shape) =>
          shape match {
            case 0 => Seq(s"""{"pdb_id":"$pdb","status":"timeout"}""")
            case 1 => Seq(s"""{"pdb_id":"$pdb","status":"arpeggio_failure"}""")
            case 2 => Seq(s"""{"pdb_id":"$pdb","status":"success"}""")
            case 3 => // only irrelevant / INTRA records
              (1 to 1 + rnd.nextInt(3)).map(_ =>
                s"""{"pdb_id":"$pdb","status":"success","contact":["proximal"],"interacting_entities":"INTER"}""")
            case _ => // at least one relevant record
              Seq(s"""{"pdb_id":"$pdb","status":"success","contact":["hbond"],"interacting_entities":"INTER"}""")
          }
        }
        val naive = shapes.collect {
          case (p, 0) => (p, 127, "no_contacts_record")
          case (p, 1) => (p, 127, "arpeggio_failure")
          case (p, 2) => (p, 124, "no_ligand_protein_contacts")
          case (p, 3) => (p, 124, "no_valid_ligand_protein_contacts")
        }.toSet
        val df = spark.read.schema(ContactsStage.contactSchema)
          .json(lines.toDS)
        val got = ContactsStage.skips(df).collect()
          .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
        assert(got === naive, s"round $round")
      }
    }
  }
}
