package graft.query

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.graph.GraphTables
import graft.query.ProCogQueries._

/** The reference dashboard's ~25 remaining queries are parameterizations
  * of the idioms the p-queries already cover (neodash_queries.yaml:
  * $neodash_parity_score_cutoff, $neodash_max_cognate,
  * $neodash_domain_filter_1, $neodash_pdb_query, $neodash_entry_pdbentry_1
  * over the search/similarity/interactions/promiscuity/graph-view pages).
  * This spec sweeps the typed API over that parameter grid and asserts
  * the invariant each dashboard control implies — so every reference
  * parameterization is demonstrably runnable and mutually consistent,
  * not just the registered-query default points.
  */
class DashboardParamsSpec extends SparkSpec {

  private lazy val g = GraphTables.build(spark, "/root/testdata/sf0.001")

  private val cutoffs = Seq(0.3, 0.7, 0.95)

  describe("dashboard parameter grid (sf0.001)") {

    it("parity cutoff control: result sets shrink monotonically, rows honor the cutoff") {
      // Ligand Similarity page ($neodash_parity_score_cutoff slider)
      for (mode <- Seq(Best, AnyCognate)) {
        val counts = cutoffs.map(c => ligandSimilarity(g, 100L, c, mode).count())
        assert(counts === counts.sorted.reverse,
          s"counts not non-increasing in cutoff for $mode: $counts")
        for (c <- cutoffs) {
          val below = ligandSimilarity(g, 100L, c, mode)
            .filter(col("parityScore") < c).count()
          assert(below === 0, s"rows below cutoff $c in $mode")
        }
      }
    }

    it("Best/Any toggle: Best is the per-ligand argmax subset of Any at every cutoff") {
      // apoc.when($neodash_max_cognate = "Best") on every similarity page
      for (c <- cutoffs) {
        val best = ligandSimilarity(g, 100L, c, Best)
        val any = ligandSimilarity(g, 100L, c, AnyCognate)
        assert(best.count() <= any.count())
        // set containment, not just counts
        assert(best.exceptAll(any).count() === 0,
          s"Best rows missing from Any at cutoff $c")
      }
    }

    it("domain-type filter: each filtered view is the dtype slice and the three slices partition the unfiltered view") {
      // Domain Interactions / Search pages ($neodash_domain_filter_1)
      val all = domainInteractions(g, 100L, None)
      val types = Seq("CATH", "SCOP", "Pfam")
      val typed = types.map(t => domainInteractions(g, 100L, Some(t)))
      assert(typed.map(_.count()).sum === all.count())
      // a filtered view contains no rows of another type's accession space
      for ((t, df) <- types.zip(typed)) {
        val accs = g.domains.filter(col("dtype") === t)
          .select(col("domainAccession").as("chainDomain"))
        assert(df.join(accs, Seq("chainDomain"), "left_anti").count() === 0,
          s"$t slice has rows outside $t's accession space")
      }
    }

    it("search control: case-insensitive, and narrower substrings return subsets") {
      // PDB Search page ($neodash_pdb_query)
      val broad = searchEntries(g, "pdb", 0.7, Best)
      val upper = searchEntries(g, "PDB", 0.7, Best)
      assert(broad.count() === upper.count(), "search is not case-insensitive")
      val narrow = searchEntries(g, "pdb1", 0.7, Best)
      assert(narrow.count() <= broad.count())
      assert(narrow.select("pdbEntry")
        .exceptAll(broad.select("pdbEntry")).count() === 0)
    }

    it("search counts respond to the cutoff and mode the way the page's cards do") {
      // the search page re-runs with the global cutoff/mode controls:
      // per entry, cog_count is non-increasing in cutoff and Best <= Any
      val byEntry = cutoffs.zipWithIndex.map { case (c, i) =>
        searchEntries(g, "pdb", c, AnyCognate)
          .select(col("pdbEntry"), col("cog_count").as(s"c$i"))
      }
      val joined = byEntry.reduce(_.join(_, "pdbEntry"))
      val breaks = joined.filter(
        col("c0") < col("c1") || col("c1") < col("c2")).count()
      assert(breaks === 0, "per-entry cognate counts not monotone in cutoff")
      val bestVsAny = searchEntries(g, "pdb", 0.7, Best)
        .select(col("pdbEntry"), col("cog_count").as("b"))
        .join(searchEntries(g, "pdb", 0.7, AnyCognate)
          .select(col("pdbEntry"), col("cog_count").as("a")), "pdbEntry")
        .filter(col("b") > col("a")).count()
      assert(bestVsAny === 0, "Best cog_count exceeds Any for some entry")
    }

    it("promiscuity page: per-(superfamily, cognate) binding counts are monotone in cutoff and mode") {
      val loose = superfamilyPromiscuity(g, 0.3, AnyCognate)
        .select(col("superfamily"), col("cogId"), col("n_bind").as("nl"))
      val tight = superfamilyPromiscuity(g, 0.95, AnyCognate)
        .select(col("superfamily"), col("cogId"), col("n_bind").as("nt"))
      // every tight group exists in loose with at least as many binders
      val broken = tight.join(loose, Seq("superfamily", "cogId"), "left")
        .filter(col("nl").isNull || col("nl") < col("nt")).count()
      assert(broken === 0, "tight-cutoff binders not a subset of loose-cutoff binders")
      val bestBroken = superfamilyPromiscuity(g, 0.7, Best)
        .select(col("superfamily"), col("cogId"), col("n_bind").as("nb"))
        .join(superfamilyPromiscuity(g, 0.7, AnyCognate)
          .select(col("superfamily"), col("cogId"), col("n_bind").as("na")),
          Seq("superfamily", "cogId"), "left")
        .filter(col("na").isNull || col("na") < col("nb")).count()
      assert(bestBroken === 0, "Best-mode binders not a subset of Any-mode binders")
    }

    it("promiscuity page: the materialized domainCognate edge path equals the direct join expansion at every grid point") {
      // superfamilyPromiscuity serves from GraphTables.domainCognate
      // (max-score per domain–cognate edge); this pins it to the
      // from-scratch definition the oracle SQL states: expand
      // interactPairs × (mode's similarity rows ≥ cutoff), distinct
      // (suppkey, cogId), count per (superfamily, cogId).
      for (c <- cutoffs; mode <- Seq(Best, AnyCognate)) {
        val simsDf = (mode match {
          case Best       => g.similarityBest
          case AnyCognate => g.similarity
        }).filter(col("parityScore") >= c)
        val direct = g.interactPairs
          .join(simsDf.select("ligandUniqueID", "cogId"), "ligandUniqueID")
          .select("suppkey", "cogId").distinct()
          .join(g.domains.select("suppkey", "superfamily"), "suppkey")
          .groupBy("superfamily", "cogId")
          .agg(count(lit(1)).as("n_bind"))
        val served = superfamilyPromiscuity(g, c, mode)
          .select("superfamily", "cogId", "n_bind")
        assert(served.exceptAll(direct).count() === 0 &&
          direct.exceptAll(served).count() === 0,
          s"domainCognate path diverges from direct expansion at cutoff $c, $mode")
      }
    }

    it("graph view: entry scope bounds every edge and the cutoff prunes only similarity edges") {
      val scope = 20L
      val view = entryGraphView(g, scope, 0.3)
      // containment edges stay inside the entry scope
      val badDst = view.filter(col("edge_type") === "IS_IN_PDB")
        .filter(!regexp_extract(col("dst"), "pdb(\\d+)", 1)
          .cast("long").leq(scope)).count()
      assert(badDst === 0, "IS_IN_PDB edge outside the entry scope")
      val tightView = entryGraphView(g, scope, 0.95)
      def byType(df: org.apache.spark.sql.DataFrame, t: String) =
        df.filter(col("edge_type") === t).count()
      for (t <- Seq("IS_IN_PDB", "INTERACTS_WITH_LIGAND"))
        assert(byType(view, t) === byType(tightView, t),
          s"cutoff changed non-similarity edge family $t")
      assert(byType(tightView, "HAS_SIMILARITY") <=
        byType(view, "HAS_SIMILARITY"))
    }

    it("EC page: every row honors the cutoff; distinct EC keys cover distinct domain slices") {
      for (ecKey <- Seq(1L, 2L); c <- Seq(0.3, 0.9)) {
        val page = ecPage(g, ecKey, c)
        assert(page.filter(col("parityScore") < c).count() === 0)
      }
    }

    it("autocomplete: k is honored and results are shortest-first") {
      for (k <- Seq(1, 5, 10)) {
        val rows = autocomplete(g, "HET", k).collect()
        assert(rows.length <= k)
        val lens = rows.map(_.getAs[String]("hetCode").length)
        assert(lens.sameElements(lens.sorted), "not shortest-first")
      }
    }

    it("cognate summary: unambiguous <= 1+, and the 1+ card is monotone in cutoff") {
      val byCutoff = cutoffs.map { c =>
        val m = cognateSummary(g, c).collect()
          .map(r => r.getAs[String]("title") -> r.getAs[Long]("n")).toMap
        assert(m("unambiguous") <= m("1+ cognate"), s"at cutoff $c")
        m("1+ cognate")
      }
      assert(byCutoff === byCutoff.sorted.reverse,
        s"1+ cognate card not non-increasing in cutoff: $byCutoff")
    }
  }
}
