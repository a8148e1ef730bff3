package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ResidueKeySpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.install(spark)

  describe("residue_key (native Catalyst expression)") {
    it("orders numerically first, then by insertion code") {
      assert(ResidueKey.eval("9_Z") < ResidueKey.eval("10_"))
      assert(ResidueKey.eval("2_A") < ResidueKey.eval("2_B"))
      assert(ResidueKey.eval("2") === (2L << 16))
    }
    it("parses signed residue numbers (PDB auth_seq_id can be negative)") {
      // a digit-only scan would fold "-5" to +5 and mis-sort it AFTER 3
      assert(ResidueKey.eval("-5_") < ResidueKey.eval("3_"))
      assert(ResidueKey.eval("-5_") < ResidueKey.eval("-4_"))
      // inscode order is preserved within one negative residue number
      assert(ResidueKey.eval("-5_A") < ResidueKey.eval("-5_B"))
      assert(ResidueKey.eval("-1_Z") < ResidueKey.eval("0_"))
    }
    it("is callable from SQL via the session extension") {
      val r = spark.sql("SELECT residue_key('123_A') AS k").as[Long].head()
      assert(r === ((123L << 16) | 'A'.toLong))
    }
    it("runs inside whole-stage codegen over a DataFrame") {
      // spark.range keeps the projection in a codegen stage (a local Seq
      // would constant-fold to LocalTableScan on the interpreted path).
      // fallback=false + CODEGEN_ONLY make a Janino compile failure a hard
      // test failure instead of a silent drop to interpreted execution.
      val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
      val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
      spark.conf.set("spark.sql.codegen.fallback", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      try {
        val df = spark.range(1, 101)
          .select(GraftExtensions.residueKey(
            concat(col("id"), lit("_A"))).as("k"))
        val plan = df.queryExecution.executedPlan.toString
        // "*(n)" marks operators fused into a WholeStageCodegen stage
        assert(plan.contains("*(1) Project [residuekey"))
        assert(df.as[Long].collect().toSeq.sorted.last === ((100L << 16) | 'A'.toLong))
      } finally {
        spark.conf.set("spark.sql.codegen.fallback", prevFallback)
        prevFactory match {
          case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
          case None => spark.conf.unset("spark.sql.codegen.factoryMode")
        }
      }
    }
  }
}
