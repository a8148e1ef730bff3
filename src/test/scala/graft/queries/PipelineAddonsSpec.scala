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

  describe("t40_ngram_novelty") {
    it("novelty is a valid fraction and the novel total matches an " +
      "independent df-1 count") {
      val out = run("t40_ngram_novelty").cache()
      try {
        assert(out.filter(col("n_novel") > col("n_shingles") ||
          col("novelty") < 0.0 || col("novelty") > 1.0).count() === 0L)
        // independent recount: shingles owned by exactly one document
        val sh = graft.operators.MinHashDedup.shingleRows(
          spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text", 3)
        val df1 = sh.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") === 1).count()
        assert(out.agg(sum("n_novel")).head().getLong(0) === df1)
      } finally out.unpersist()
    }
  }

  describe("t41_minhash_estimate_gate") {
    it("covers every t6 near-dup pair, and identical shingle sets " +
      "estimate 8/8") {
      val audit = run("t41_minhash_estimate_gate").cache()
      try {
        val dup = run("t6_minhash_dedup")
          .select(col("doc_a"), col("doc_b"))
        assert(dup.join(audit, Seq("doc_a", "doc_b"), "left_anti")
          .count() === 0L)
        // jacc = 1 ⇒ same shingle set ⇒ every seeded minimum agrees
        assert(audit.filter(col("jacc") === 1.0 && col("n_agree") =!= 8L)
          .count() === 0L)
        assert(audit.filter(col("n_agree") < 0L || col("n_agree") > 8L)
          .count() === 0L)
      } finally audit.unpersist()
    }
  }

  describe("m11_audio_features") {
    it("features are bounded by the 8-bit PCM domain") {
      val out = run("m11_audio_features").cache()
      try {
        assert(out.filter(col("peak") > 128L || col("peak") < 0L)
          .count() === 0L)
        assert(out.filter(col("zero_crossings") >= col("n_frames"))
          .count() === 0L)
        assert(out.filter(col("mean_energy") > 128.0 * 128.0)
          .count() === 0L)
      } finally out.unpersist()
    }
  }

  describe("m12_image_neardup") {
    it("pairs are canonical and within the Hamming cutoff") {
      val out = run("m12_image_neardup").cache()
      try {
        assert(out.filter(col("media_a") >= col("media_b")).count() === 0L)
        assert(out.filter(col("hamm") < 0L || col("hamm") > 6L)
          .count() === 0L)
      } finally out.unpersist()
    }
  }

  describe("x9_neighborhood_jaccard") {
    it("jaccard is a valid positive fraction over canonical pairs") {
      val out = run("x9_neighborhood_jaccard").cache()
      try {
        assert(out.filter(col("sa") >= col("sb")).count() === 0L)
        assert(out.filter(col("n_shared") < 1L).count() === 0L)
        assert(out.filter(col("jacc") <= 0.0 || col("jacc") > 1.0)
          .count() === 0L)
      } finally out.unpersist()
    }
  }

  describe("x10_closeness") {
    it("the min supplier's row equals the single-source x4 BFS folded " +
      "to radius 15") {
      val hops = run("x4_bfs_hops").cache()
      try {
        val src = hops.agg(min("suppkey")).head().getLong(0)
        val in15 = hops.filter(col("hops") >= 1L && col("hops") <= 15L)
        val expReached = in15.count()
        val expTotal = in15.agg(sum("hops")).head().getLong(0)
        val row = run("x10_closeness")
          .filter(col("suppkey") === src).head()
        assert(row.getAs[Long]("n_reached") === expReached)
        assert(row.getAs[Long]("total_dist") === expTotal)
      } finally hops.unpersist()
    }
  }

  describe("m13/m14 container-metadata parsers") {
    import graft.multimodal.ContainerMeta

    it("mp3 round-trips exactly and rejects corrupt/truncated streams") {
      val data = Array.tabulate(300)(i => (i % 101).toByte)
      val mp3 = ContainerMeta.encodeMp3(data, nFrames = 5, bitrateIdx = 9,
        srIdx = 1)
      val m = ContainerMeta.parseMp3(mp3).get
      assert(m.nFrames === 5L && m.kbps === 128L && m.hz === 48000L)
      assert(m.samples === 5L * 1152L)
      // corrupt the sync word of frame 0 → rejected
      val bad = mp3.clone(); bad(0) = 0x7f.toByte
      assert(ContainerMeta.parseMp3(bad).isEmpty)
      // truncate mid-frame → rejected (a frame header promises bytes the
      // payload doesn't have)
      assert(ContainerMeta.parseMp3(mp3.dropRight(10)).isEmpty)
      // reserved bitrate index (15) in frame 0 → rejected
      val resv = mp3.clone(); resv(2) = (0xf << 4).toByte
      assert(ContainerMeta.parseMp3(resv).isEmpty)
    }

    it("mp4 box walk recovers ftyp/mvhd/trak/mdat and rejects malformed trees") {
      val data = Array.tabulate(64)(i => i.toByte)
      val mp4 = ContainerMeta.encodeMp4(data, "isom", timescale = 1200,
        duration = 54321L, nTraks = 2)
      val m = ContainerMeta.parseMp4(mp4).get
      assert(m.major === "isom" && m.timescale === 1200L &&
        m.duration === 54321L && m.nTraks === 2L && m.mdatBytes === 64L)
      // a box size that overruns the payload → rejected
      val bad = mp4.clone(); bad(3) = 0x7f.toByte // inflate ftyp size
      assert(ContainerMeta.parseMp4(bad).isEmpty)
      // truncated tail → rejected (pos never lands exactly at length)
      assert(ContainerMeta.parseMp4(mp4.dropRight(5)).isEmpty)
    }
  }

  describe("x11_hyperball_sketch") {
    it("the gated x11 emits one row per x10 vertex with passing audit " +
       "booleans (oracle coverage restored, VERDICT r13 item 1)") {
      val out = run("x11_hyperball_sketch").cache()
      try {
        val x10 = run("x10_closeness")
        assert(out.count() === x10.count())
        assert(out.columns.toSeq === Seq("suppkey", "n_reached",
          "total_dist", "reached_ok", "dist_ok"))
        // the oracle emits literal 1s for the booleans — a sketch outside
        // its error budget must show up HERE before it shows up as a
        // driver hash mismatch
        import org.apache.spark.sql.functions.col
        assert(out.filter(col("reached_ok") =!= 1L ||
          col("dist_ok") =!= 1L).count() === 0,
          "sketch estimate outside its error budget")
      } finally out.unpersist()
    }
    it("the sketch is deterministic: two runs produce identical estimates") {
      import graft.graph.GraphAnalytics
      val a = GraphAnalytics.hyperBallCloseness(spark, sf)
      val b = GraphAnalytics.hyperBallCloseness(spark, sf)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "HyperBall estimates differ between identical runs")
    }
    it("register-merge kernel: max-merge is idempotent and improves() detects subsumption") {
      import graft.graph.GraphAnalytics.HyperBall._
      val r1 = emptyRegs(); addId(r1, 7L); addId(r1, 9L)
      val r2 = emptyRegs(); addId(r2, 9L)
      val m = mergeRegs(r1, r2)
      assert(java.util.Arrays.equals(m, mergeRegs(m, r2)), "merge not idempotent")
      assert(!improves(r2, m), "subsumed sketch reported as improving")
      assert(improves(r1, emptyRegs()), "non-empty sketch must improve empty")
      // estimator sanity: singletons ≈ 1, unions grow monotonically
      val e1 = estimate(r2)
      assert(e1 > 0.5 && e1 < 2.0, s"singleton estimate $e1 out of range")
      assert(estimate(m) >= e1)
    }
  }

  describe("v18_knn_graph") {
    it("per-vector ranks are contiguous from 1 with monotone cosine") {
      val out = run("v18_knn_graph").cache()
      try {
        val perV = out.groupBy("vec_id").agg(count(lit(1)).as("n"),
          min("rnk").as("lo"), max("rnk").as("hi"))
        assert(perV.filter(col("lo") =!= 1L || col("hi") =!= col("n") ||
          col("n") > 3L).count() === 0L)
        assert(out.filter(col("vec_id") === col("nbr_id")).count() === 0L)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("rnk"))
        val nonMono = out
          .withColumn("prev", lag("cos", 1).over(w))
          .filter(col("prev").isNotNull && col("prev") < col("cos"))
          .count()
        assert(nonMono === 0L)
      } finally out.unpersist()
    }
  }

  describe("j13_stream_novelty_index") {
    it("the streamed first-seen table equals the static min-doc-id " +
      "computation (stream == batch)") {
      val streamed = run("j13_stream_novelty_index")
      val sh = graft.operators.MinHashDedup.shingleRows(
        spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text", 3)
        .persist()
      val first = sh.groupBy("s").agg(min("doc_id").as("fd"))
      val batch = sh.join(first, "s")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
            .as("n_first"))
      val got = streamed.select("doc_id", "n_shingles", "n_first")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val want = batch.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      sh.unpersist()
      assert(got === want)
    }
  }

  describe("v19_ivf_recall_gate") {
    it("nprobe=2 recall dominates nprobe=1 row by row (candidate " +
      "superset), both valid fractions") {
      val out = run("v19_ivf_recall_gate").cache()
      try {
        assert(out.filter(col("hit2") < col("hit1")).count() === 0L)
        assert(out.filter(col("hit1") < 0L || col("hit2") > col("n_true"))
          .count() === 0L)
        assert(out.filter(col("recall1") < 0.0 || col("recall2") > 1.0)
          .count() === 0L)
      } finally out.unpersist()
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
