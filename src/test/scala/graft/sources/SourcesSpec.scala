package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  describe("mmCIF tokenizer") {
    it("splits on whitespace and honors quotes") {
      assert(Readers.tokenizeCifLine("1 'MIDDLE EAST' x") ===
        Seq("1", "MIDDLE EAST", "x"))
      assert(Readers.tokenizeCifLine("""a "b c" d""") === Seq("a", "b c", "d"))
    }
  }

  describe("flat-record field parser") {
    it("keeps the first value of repeated keys (reference parser semantics)") {
      val df = Seq("ID  first\nDE  desc here\nID  second").toDF("record")
        .select(Readers.recordFields(col("record")).as("f"))
      val m = df.select(col("f").getItem("ID"), col("f").getItem("DE"))
        .as[(String, String)].head()
      assert(m === (("first", "desc here")))
    }
  }

  describe("Neo4j sink (A10)") {
    it("writes typed headers, gzip, and |-serialized arrays") {
      val dir = Files.createTempDirectory("neo4j_sink").toString
      val df = Seq((1L, "x", Seq("a", "b"), 0.5))
        .toDF("id", "name", "tags", "score")
      Sinks.neo4jTsv(df, dir, Map("id" -> "id:ID(test)"))
      val files = new java.io.File(s"$dir/data").listFiles
        .filter(_.getName.endsWith(".csv.gz"))
      assert(files.nonEmpty, "gzip part files written")
      val back = Sinks.readNeo4jTsv(spark, dir)
      assert(back.columns.toSet ===
        Set("id:ID(test)", "name", "tags:string[]", "score:float"))
      assert(back.select("`tags:string[]`").as[String].head() === "a|b")
    }
  }

  describe("skew-chunked split (A11)") {
    it("isolates heavy rows one-per-partition, packs light rows by chunk") {
      val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "w")
      val (heavy, light) = Sinks.skewSplit(df, "w", 0.9, 20)
      val nHeavy = heavy.count()
      assert(nHeavy >= 9 && nHeavy <= 11)
      assert(heavy.rdd.getNumPartitions === nHeavy.toInt)
      // ~90 light rows / 20 per chunk → 5 partitions
      assert(light.rdd.getNumPartitions === math.ceil(light.count() / 20.0).toInt)
    }
  }
}
