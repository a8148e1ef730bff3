package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Semantic invariants for the round-11 pipeline additions (t37, t38,
  * d17, v14) — properties the DuckDB hash-compare implies but doesn't
  * state, asserted directly so a regression fails with a readable
  * message instead of a hash mismatch.
  */
class PipelineAddonsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.all.find(_.name == name).get.build(spark, sf)

  describe("t37_pii_redaction") {
    it("finds every synthesized PII instance (one email/phone/ip per doc)") {
      val bad = run("t37_pii_redaction")
        .filter(col("n_email") < 1 || col("n_phone") < 1 || col("n_ip") < 1)
        .count()
      assert(bad === 0L)
    }
    it("is total: one audit row per document") {
      val docs = spark.read.parquet(s"$sf/documents.parquet").count()
      assert(run("t37_pii_redaction").count() === docs)
    }
  }

  describe("t38_url_canonical_dedup") {
    it("canonical URLs carry no case/www/utm/fragment noise") {
      val bad = run("t38_url_canonical_dedup")
        .filter(col("canon_url").rlike("[A-Z]|www\\.|utm_|#"))
        .count()
      assert(bad === 0L)
    }
    it("partitions the corpus: group sizes sum to the document count") {
      val docs = spark.read.parquet(s"$sf/documents.parquet").count()
      val total = run("t38_url_canonical_dedup")
        .agg(sum("n_docs")).head().getLong(0)
      assert(total === docs)
    }
    it("actually collapses noise variants (dedup is not the identity)") {
      val docs = spark.read.parquet(s"$sf/documents.parquet").count()
      assert(run("t38_url_canonical_dedup").count() < docs)
    }
  }

  describe("d17_hist_quantile") {
    it("histogram estimate lands within one bin of the exact median, every group") {
      val out = run("d17_hist_quantile")
      assert(out.filter(col("within_bin") =!= 1L).count() === 0L)
      // n_rows accounts for every lineitem row — the cap bin drops nothing
      val li = spark.read.parquet(s"$sf/lineitem.parquet").count()
      assert(out.agg(sum("n_rows")).head().getLong(0) === li)
    }
  }

  describe("v14_sq_adc_search") {
    it("returns a full contiguous top-3 per query, self-matches excluded") {
      val out = run("v14_sq_adc_search").cache()
      try {
        val perQ = out.groupBy("q_id").agg(
          count(lit(1)).as("n"),
          min("rnk").as("lo"), max("rnk").as("hi"))
        assert(perQ.filter(col("n") =!= 3L || col("lo") =!= 1L ||
          col("hi") =!= 3L).count() === 0L)
        assert(out.filter(col("q_id") === col("n_id")).count() === 0L)
        // ranks are consistent with the distances they order
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("rnk"))
        val nonMono = out
          .withColumn("prev", lag("d2", 1).over(w))
          .filter(col("prev").isNotNull && col("prev") > col("d2"))
          .count()
        assert(nonMono === 0L)
      } finally out.unpersist()
    }
  }
}
