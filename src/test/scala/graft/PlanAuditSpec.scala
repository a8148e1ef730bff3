package graft

/** Plan audits: predicate pushdown, column pruning, and shuffle counts —
  * the properties that decide whether a plan survives a 100× scale-up.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executed(name: String): String =
    SparkEntry.all.find(_.name == name).get.build(spark, sf)
      .queryExecution.executedPlan.toString

  describe("pushdown and pruning") {
    it("b2_filter_mask pushes the quantity filter into the parquet scan") {
      val p = executed("b2_filter_mask")
      // plan strings truncate long metadata; match the stable prefix
      assert(p.contains("PushedFilters:") && p.contains("GreaterThan(l_quan"))
    }
    it("b1_select_rename prunes the scan to the 3 projected columns") {
      val p = executed("b1_select_rename")
      val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
      assert(readSchema.contains("p_partkey") && readSchema.contains("p_brand")
        && readSchema.contains("p_size"))
      assert(!readSchema.contains("p_retailprice") && !readSchema.contains("p_name"))
    }
    it("d4_best_flag reads only the 3 needed lineitem columns") {
      val readSchema = executed("d4_best_flag")
        .linesIterator.find(_.contains("ReadSchema")).get
      assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_tax"))
    }
  }

  describe("shuffle economy") {
    it("d3/d4/d5 window queries shuffle exactly once (partition keys)") {
      Seq("d3_group_share", "d4_best_flag").foreach { n =>
        val p = executed(n)
        val exchanges = p.linesIterator.count(_.trim.startsWith("+- Exchange"))
        // one shuffle for the window partition; the final orderBy adds a
        // range exchange — anything beyond 2 means a redundant shuffle
        assert(exchanges <= 2, s"$n has $exchanges exchanges:\n$p")
      }
    }
    it("d15_grouping_sets is ONE Expand pass, not one group-by per set") {
      val p = executed("d15_grouping_sets")
      assert(p.linesIterator.count(_.trim.contains("Expand")) == 1,
        s"expected a single Expand in:\n$p")
      val exchanges = p.linesIterator.count(_.trim.startsWith("+- Exchange"))
      // one hash exchange for the (expanded) aggregate + the orderBy range
      assert(exchanges <= 2, s"d15 has $exchanges exchanges:\n$p")
    }
    it("c14_star_join broadcasts dims — no shuffle on the dimension side") {
      val p = executed("c14_star_join")
      assert(p.contains("BroadcastHashJoin"))
      assert(!p.contains("SortMergeJoin"))
    }
    it("e5_asof_join never degenerates into a range join (nested loop / cartesian)") {
      val p = executed("e5_asof_join")
      assert(!p.contains("BroadcastNestedLoopJoin"))
      assert(!p.contains("CartesianProduct"))
    }
    it("a11/t12 windows partition by real keys — no single-partition funnel") {
      Seq("a11_skew_chunks", "t12_corpus_stats").foreach { n =>
        val p = executed(n)
        assert(!p.contains("Exchange SinglePartition"),
          s"$n plans a global single-partition exchange:\n$p")
      }
    }
    it("s4_partition_pruning prunes to the matching partition directory") {
      val p = executed("s4_partition_pruning")
      val pf = p.linesIterator.find(_.contains("PartitionFilters")).get
      assert(pf.contains("o_orderstatus"), pf)
    }
    it("s10_dpp_join plants a dynamicpruning subquery on the fact scan") {
      // the aggregate (modal-status) dim filter means NO static
      // o_orderstatus predicate can appear in the fact's partition
      // filters — runtime pruning is the only mechanism; its absence
      // means the scan reads every partition directory. The default
      // 100-char metadata render truncates PartitionFilters, so widen it
      // for the assertion.
      val prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
      spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
      try {
        val p = executed("s10_dpp_join")
        val pf = p.linesIterator.find(_.contains("PartitionFilters")).get
        // the expression must PRUNE ON THE PARTITION COLUMN — a planned-
        // away filter renders dynamicpruningexpression(true) (no reusable
        // broadcast), which scans every partition while still containing
        // the substring "dynamicpruning"
        assert(pf.contains("dynamicpruningexpression(o_orderstatus"),
          s"no live DPP expression on the partition column in: $pf")
        // nothing static beyond null-safety: any md5/CASE/literal status
        // predicate here means constraint propagation found a static
        // route and the demo degraded to s4
        val statics = pf.substring(pf.indexOf("PartitionFilters"))
          .split(",").count(f => f.contains("o_orderstatus") &&
            !f.contains("dynamicpruning") && !f.contains("isnotnull"))
        assert(statics == 0, s"statically inferred predicate in: $pf")
      } finally spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    }
    it("v11_filtered_ann pushes the label predicate into the parquet scan") {
      val p = executed("v11_filtered_ann")
      assert(p.contains("PushedFilters:") && p.contains("EqualTo(label"),
        s"label filter not pushed down:\n$p")
    }
    it("s9_zorder_layout is scan → project → one agg exchange — no funnel") {
      val p = executed("s9_zorder_layout")
      assert(!p.contains("Exchange SinglePartition"), p)
      assert(!p.contains("Join"), p)
      val exchanges = p.linesIterator.count(_.trim.startsWith("+- Exchange"))
      // one hash exchange for the zcell aggregate + the orderBy range
      assert(exchanges <= 2, s"s9 has $exchanges exchanges:\n$p")
    }
    it("ANN queries actually use the native vec_dot expression") {
      Seq("v1_ann_brute_topk", "v2_lsh_ann", "v4_cosine_neardup").foreach { n =>
        assert(executed(n).contains("vectordot"), s"$n lost VectorDot")
      }
    }
    it("t19 packing plans one window shuffle + one aggregation, nothing more") {
      val p = executed("t19_sequence_packing")
      val exchanges = p.linesIterator.count(_.trim.startsWith("+- Exchange"))
      // window partition exchange, (partial→final agg reuses it or adds
      // one), final orderBy range exchange — 3 is the designed ceiling
      assert(exchanges <= 3, s"t19 has $exchanges exchanges:\n$p")
      assert(!p.contains("Exchange SinglePartition"), p)
    }
    it("t21 broadcasts the vocabulary frequency table back to the corpus") {
      val p = executed("t21_rarity_score")
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("SortMergeJoin"), p)
    }
    it("p14_ec_page broadcasts the EC domain set and the cognate dim") {
      val p = executed("p14_ec_page")
      // both dimension joins must broadcast — a single surviving BHJ with
      // the other side fallen back to sort-merge should fail here
      assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2, p)
      assert(!p.contains("SortMergeJoin"), p)
    }
    it("t24 chunking plans zero exchanges before its output sort") {
      // chunking must stay embarrassingly parallel: explode + project
      // only — the single exchange allowed is the final orderBy's range
      // partitioning
      val p = executed("t24_chunk_overlap")
      val exchanges = p.linesIterator.count(_.contains("Exchange"))
      assert(exchanges <= 1, s"t24 has $exchanges exchanges:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"), p)
    }
    it("c17 interval join stays an equi-join — never nested-loop") {
      val p = executed("c17_interval_join")
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), p)
    }
    it("v8 k-means assignment broadcasts the centroid table") {
      val p = executed("v8_kmeans_step")
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("SortMergeJoin"), p)
    }
    it("p15/p6 promiscuity serve from the materialized domainCognate edge cache, not a re-expansion") {
      // the Any@0.95 expansion this replaces was 74.6M intermediate rows
      // at sf0.1 (see GraphTables.domainCognate): the served plan must
      // read the edge table's InMemoryRelation and join ONLY the
      // broadcast domain dim — a SortMergeJoin or a join against the
      // similarity table means the per-variant expansion is back
      Seq("p15_promiscuity_any", "p6_superfamily_promiscuity").foreach { n =>
        val p = executed(n)
        assert(p.contains("InMemoryTableScan"),
          s"$n does not read a cached table:\n$p")
        assert(!p.contains("SortMergeJoin"), s"$n re-expands:\n$p")
        assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
          s"$n dim joins not broadcast:\n$p") // domains + ssfSize
      }
    }
  }

  describe("global plan sweep — every registered query") {
    // Queries whose plan LEGITIMATELY contains a broadcast nested-loop
    // join: a deliberately tiny broadcast side crossed against the fact,
    // where the pair expansion IS the semantics and the broadcast side is
    // bounded by a dimension/constant (never fact × fact). Every entry
    // must say why.
    val nestedLoopAllowed = Map(
      // k centroids (k = O(100)) broadcast against the vector table —
      // Lloyd assignment is by definition every-vector × every-centroid
      "v8_kmeans_step" -> "broadcast k-centroid assignment",
      // same centroid-assignment shape inside the SemDeDup clustering
      "v10_semantic_dedup" -> "broadcast centroid assignment",
      // same centroid-assignment shape feeding the kNN-graph build
      "v18_knn_graph" -> "broadcast centroid assignment",
      // IVF probes cross the query row against nprobe cell heads
      "v3_ivf_ann" -> "broadcast cell-centroid probe",
      "v9_multiprobe_ivf" -> "broadcast cell-centroid probe",
      // single-row broadcast totals crossed onto every row (the scalar
      // denominator pattern — broadcast side is exactly one row)
      "p1_summary_stats" -> "single-row corpus counts cross",
      "t15_tfidf_keywords" -> "single-row N-docs cross",
      "t16_vocab_zipf" -> "single-row token-total cross",
      "t17_stratified_sample" -> "single-row corpus-total cross",
      "t32_weighted_mix" -> "single-row max-source-total cross",
      // the documented brute-force ANN BASELINE: the (small) query set is
      // broadcast against the corpus — v2/v3 are the scale path
      "v1_ann_brute_topk" -> "broadcast query-set × corpus by design",
      // same baseline shape over the metadata-filtered candidate set —
      // the filter-first strategy (the selective predicate shrinks the
      // corpus side BEFORE the cross)
      "v11_filtered_ann" -> "broadcast query-set × filtered corpus",
      "v5_ann_recall" -> "brute-force truth side of the recall gate",
      // same truth side + the sanctioned cell-centroid probes (v3/v9)
      "v19_ivf_recall_gate" -> "brute truth side + cell-centroid probes",
      // stage-1 of the Matryoshka rerank is v1's sanctioned baseline
      // shape (broadcast query set × corpus) on prefix slices; stage-2
      // touches 10 rows/query
      "v15_matryoshka_rerank" -> "broadcast query-set × corpus (prefix)",
      // the baseline shape over 16-byte sign codes — the corpus side is
      // two BIGINT words/row, the cheapest scan in the family
      "v17_binary_sign_search" -> "broadcast query-set × sign codes",
      // 256-codeword PQ codebook broadcast per subspace
      "v7_pq_codes" -> "broadcast codebook assignment",
      // the same broadcast codebook cross twice: corpus-side code
      // assignment + the per-query distance-table build (4·4 rows/query)
      "v12_pq_adc_search" -> "broadcast codebook assignment + ADC table",
      // IVF-PQ composes both sanctioned crosses: cell-centroid probe
      // (v3's) + PQ codebook assignment/distance table (v12's)
      "v13_ivfpq_search" -> "broadcast cell probe + codebook + ADC table",
      // v16 = v13's sanctioned crosses + an equi-join refine stage
      "v16_ivfpq_rerank" -> "broadcast cell probe + codebook + ADC table",
      // partial-EC PREFIX match (startswith) against the EC hierarchy
      // dimension — non-equi by semantics, broadcast side is the dim
      "c9_prefix_expand" -> "broadcast EC-dim prefix join")

    it("no ScalaUDF, CartesianProduct, or unsanctioned nested-loop join " +
      "in any of the registered queries' plans") {
      val violations = SparkEntry.all.flatMap { rq =>
        val plan = rq.build(spark, sf).queryExecution.executedPlan.toString
        val bad = Seq(
          // the engine's no-UDF claim (SCALING.md): every scalar path is
          // codegen — a ScalaUDF anywhere breaks whole-stage codegen and
          // the claim
          "ScalaUDF" -> plan.contains("ScalaUDF"),
          // an unconditional cross product is never sanctioned
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" ->
            (plan.contains("BroadcastNestedLoopJoin") &&
              !nestedLoopAllowed.contains(rq.name)))
        bad.collect { case (what, true) => s"${rq.name}: $what" }
      }
      assert(violations.isEmpty,
        s"plan violations:\n${violations.mkString("\n")}")
    }
  }
}
