package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphAnalytics

/** Unit/property coverage for the round-6 training-pipeline operators:
  * triangle counting on a known graph, packing conservation, and
  * sorted-neighborhood adjacency shape.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.all.find(_.name == name).get.build(spark, sf)

  describe("triangleCountDf (x3 kernel)") {
    it("K4 gives every vertex 3 triangles; a pendant vertex gives 0") {
      // K4 on 1..4 plus pendant 5 attached to 4
      val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
        (3L, 4L), (4L, 5L)).toDF("ea", "eb")
      val verts = (1L to 5L).toDF("id")
      val got = GraphAnalytics.triangleCountDf(spark, verts, edges)
        .as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
    }
    it("a triangle-free path graph counts zero everywhere") {
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("ea", "eb")
      val verts = (1L to 4L).toDF("id")
      val got = GraphAnalytics.triangleCountDf(spark, verts, edges)
        .as[(Long, Long)].collect().toMap
      assert(got.values.forall(_ === 0L))
    }
  }

  describe("t19 sequence packing invariants") {
    it("pack token totals conserve the per-source corpus totals") {
      val packed = q("t19_sequence_packing")
        .groupBy("source")
        .agg(sum("n_tok").as("packed_tok"), sum("n_docs").as("packed_docs"))
      val direct = Tables(spark, sf, "documents")
        .groupBy("source")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("tok"),
          count(lit(1)).as("docs"))
      val joined = packed.join(direct, "source")
      assert(joined.count() > 0)
      assert(joined.filter(col("packed_tok") =!= col("tok") ||
        col("packed_docs") =!= col("docs")).count() === 0)
    }
    it("pack ids start at 0 and stay within the token-budget bound") {
      // NOT asserting gap-free: concat-and-chunk legitimately skips pack
      // ids when a single doc exceeds the 256-token budget (a 600-token
      // doc at cum_before=0 sends the next doc to pack 2). The definition
      // guarantees only: packs start at 0 and max pack_id ≤ total div 256.
      val bad = q("t19_sequence_packing")
        .groupBy("source")
        .agg(min("pack_id").as("lo"), max("pack_id").as("hi"),
          sum("n_tok").as("tok"))
        .filter(col("lo") =!= 0 || col("hi") > expr("tok div 256"))
      assert(bad.count() === 0)
    }
  }

  describe("t22 sorted-neighborhood adjacency shape") {
    it("every doc appears at most once per side (pairs form a path)") {
      val pairs = q("t22_adjacent_dedup")
      val dupA = pairs.groupBy("doc_a").count().filter(col("count") > 1)
      val dupB = pairs.groupBy("doc_b").count().filter(col("count") > 1)
      assert(dupA.count() === 0 && dupB.count() === 0)
    }
  }

  describe("t20 masking invariants") {
    it("masked names keep exactly the last 3 digits and drop the rest") {
      val rows = q("t20_pii_redact")
      // every valid-format row masks to the fixed 15-char prefix + 3 digits
      val bad = rows.filter(col("valid") === "Y" &&
        !col("masked").rlike("^Customer#######[0-9]{3}$"))
      assert(rows.count() > 0 && bad.count() === 0)
    }
  }

  describe("j4 streaming dedup agrees with its batch form") {
    it("per-source unique counts match the batch min-keeper computation") {
      val streamed = q("j4_stream_dedup").as[(String, Long)].collect().toMap
      val batch = Tables(spark, sf, "documents")
        .select(col("doc_id"), col("source"),
          md5(concat_ws(" ", slice(split(col("text"), " "), 1, 5))
            .cast("binary")).as("fp"))
      val keepers = batch.groupBy("fp").agg(min("doc_id").as("doc_id"))
        .join(batch, Seq("fp", "doc_id"))
        .groupBy("source").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(streamed === keepers)
    }
  }
}
