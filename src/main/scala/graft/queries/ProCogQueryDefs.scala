package graft.queries

import org.apache.spark.sql.functions._

import graft.RQ
import graft.graph.GraphTables
import graft.query.ProCogQueries
import graft.query.ProCogQueries.{AnyCognate, Best}

/** The ProCogGraph dashboard surface under the oracle gate: each query is
  * a fixed-parameter instantiation of a ProCogQueries method, with a
  * DuckDB oracle that re-derives the graph registry (see GraphTables)
  * from the raw star schema.
  */
object ProCogQueryDefs {

  /** DuckDB mirror of GraphTables.build (shared with CoverageQueries). */
  private[queries] val G = """
      WITH be0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                   FROM lineitem),
      be AS (SELECT ok, pk, ok || '_' || pk AS uid, 'HET' || pk AS hetCode,
                    'bm' || dense_rank() OVER (PARTITION BY ok ORDER BY pk)
                      AS disp
             FROM be0),
      ia0 AS (SELECT l_orderkey AS ok, l_partkey AS pk, l_suppkey AS sk,
                     CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS cc
              FROM lineitem GROUP BY 1, 2, 3),
      ia AS (SELECT ok, pk, sk, cc, ok || '_' || pk AS uid,
                    cc::DOUBLE /
                    CAST(sum(cc) OVER (PARTITION BY ok, pk) AS BIGINT)::DOUBLE
                      AS perc
             FROM ia0),
      iam AS (SELECT *, CASE WHEN perc > 0.9 THEN 'exclusive'
                             WHEN perc > 0.5 THEN 'dominant'
                             WHEN perc > 0.1 THEN 'partner'
                             ELSE 'minor' END AS mode FROM ia),
      dom AS (SELECT s_name AS acc, s_suppkey AS sk,
                     CASE s_suppkey % 3 WHEN 0 THEN 'CATH' WHEN 1 THEN 'SCOP'
                          ELSE 'Pfam' END AS dtype,
                     'SF' || s_nationkey AS ssf
              FROM supplier),
      cand AS (SELECT p1.p_partkey AS pk, p2.p_partkey AS cog,
                      (100 - abs(p2.p_size - p1.p_size))::DOUBLE / 100::DOUBLE
                        AS score
               FROM part p1 JOIN part p2
                 ON p2.p_brand = p1.p_brand
                AND p2.p_size // 10 = p1.p_size // 10),
      sim AS (SELECT pk, cog, score,
                     CASE WHEN score = max(score) OVER (PARTITION BY pk)
                          THEN 'Y' ELSE 'N' END AS best
              FROM cand)"""

  /** DuckDB mirror of java.net.URLEncoder (= Spark's `url_encode` = the
    * reference's apoc.text.urlencode) for the viewer payloads' restricted
    * alphabet — DuckDB has no urlencode, so the oracle pins the exact
    * byte mapping: '%' first (so later replacements' escapes survive),
    * the JSON/payload punctuation, space→'+' last. Every character the
    * payloads can contain outside [A-Za-z0-9._] is covered; URLEncoder
    * leaves '.' and '_' unchanged.
    */
  private def urlencSql(e: String): String =
    s"""replace(replace(replace(replace(replace(replace(replace(replace(
       replace(replace($e,
       '%','%25'),'{','%7B'),'}','%7D'),'"','%22'),':','%3A'),
       ',','%2C'),'#','%23'),'[','%5B'),']','%5D'),' ','+')"""

  val defs: Seq[RQ] = Seq(

    RQ("p1_summary_stats", Some(s"""$G
      SELECT CAST((SELECT count(DISTINCT o_orderkey) FROM orders) AS BIGINT)
               AS n_entries,
             CAST((SELECT count(*) FROM be0) AS BIGINT) AS n_bound_entities,
             CAST((SELECT count(DISTINCT pk) FROM be0) AS BIGINT)
               AS n_ligand_structures,
             CAST((SELECT count(DISTINCT p_partkey) FROM part) AS BIGINT)
               AS n_cognates"""))((s, dir) =>
      ProCogQueries.summaryStats(GraphTables.cached(s, dir))),

    RQ("p2_search_entries", Some(s"""$G
      SELECT e.pdbEntry,
             CAST(coalesce(bc.be_count, 0) AS BIGINT) AS be_count,
             CAST(coalesce(cc.cog_count, 0) AS BIGINT) AS cog_count
      FROM (SELECT 'pdb' || o_orderkey AS pdbEntry, o_orderkey AS ok
            FROM orders) e
      LEFT JOIN (SELECT ok, count(DISTINCT uid) AS be_count FROM be
                 GROUP BY 1) bc USING (ok)
      LEFT JOIN (SELECT b.ok, count(DISTINCT s.cog) AS cog_count
                 FROM be b JOIN sim s ON s.pk = b.pk
                 WHERE s.score >= 0.9 AND s.best = 'Y' GROUP BY 1) cc
        USING (ok)
      WHERE upper(e.pdbEntry) LIKE '%42%'
      ORDER BY pdbEntry"""))((s, dir) =>
      ProCogQueries.searchEntries(GraphTables.cached(s, dir), "42", 0.9, Best)
        .orderBy("pdbEntry")),

    RQ("p3_domain_interactions", Some(s"""$G
      SELECT 'pdb' || i.ok AS pdbID, d.acc AS chainDomain,
             b.disp AS pdbLigand,
             upper(substr(i.mode, 1, 1)) || substr(i.mode, 2)
               AS interactionMode,
             i.cc AS contactCount, i.perc
      FROM iam i JOIN dom d ON d.sk = i.sk JOIN be b ON b.uid = i.uid
      WHERE i.ok <= 20
      ORDER BY pdbID, chainDomain, pdbLigand, interactionMode,
               contactCount, perc"""))((s, dir) =>
      ProCogQueries.domainInteractions(GraphTables.cached(s, dir), 20L)
        .orderBy("pdbID", "chainDomain", "pdbLigand", "interactionMode",
          "contactCount", "perc")),

    RQ("p4_ligand_similarity_best", Some(s"""$G
      SELECT b.hetCode, upper(trim(p.p_name)) AS cognateLigand,
             s.score AS parityScore, s.best
      FROM be b JOIN sim s ON s.pk = b.pk
                JOIN part p ON p.p_partkey = s.cog
      WHERE b.ok <= 20 AND s.score >= 0.9 AND s.best = 'Y'
      ORDER BY hetCode, cognateLigand, parityScore, best"""))((s, dir) =>
      ProCogQueries.ligandSimilarity(GraphTables.cached(s, dir), 20L, 0.9, Best)
        .orderBy("hetCode", "cognateLigand", "parityScore", "best")),

    RQ("p5_ligand_similarity_any", Some(s"""$G
      SELECT b.hetCode, upper(trim(p.p_name)) AS cognateLigand,
             s.score AS parityScore, s.best
      FROM be b JOIN sim s ON s.pk = b.pk
                JOIN part p ON p.p_partkey = s.cog
      WHERE b.ok <= 20 AND s.score >= 0.97
      ORDER BY hetCode, cognateLigand, parityScore, best"""))((s, dir) =>
      ProCogQueries.ligandSimilarity(GraphTables.cached(s, dir), 20L, 0.97,
          AnyCognate)
        .orderBy("hetCode", "cognateLigand", "parityScore", "best")),

    RQ("p6_superfamily_promiscuity", Some(s"""$G,
      binds AS (SELECT d.ssf, s.cog, CAST(count(DISTINCT i.sk) AS BIGINT)
                  AS n_bind
                FROM (SELECT DISTINCT pk, sk FROM iam) i
                JOIN sim s ON s.pk = i.pk AND s.score >= 0.95
                          AND s.best = 'Y'
                JOIN dom d ON d.sk = i.sk
                GROUP BY 1, 2),
      ssfsize AS (SELECT ssf, CAST(count(DISTINCT sk) AS BIGINT) AS n_dom
                  FROM dom GROUP BY 1)
      SELECT b.ssf AS superfamily, b.cog AS cogId, b.n_bind, z.n_dom,
             b.n_bind::DOUBLE / z.n_dom::DOUBLE AS frac_binding
      FROM binds b JOIN ssfsize z USING (ssf)
      ORDER BY superfamily, cogId"""))((s, dir) =>
      ProCogQueries.superfamilyPromiscuity(GraphTables.cached(s, dir), 0.95,
          Best)
        .orderBy("superfamily", "cogId")),

    RQ("p7_combinatorial_fingerprints", Some(s"""$G,
      fp AS (SELECT i.uid,
                    string_agg(d.acc || ':' || i.mode, '|'
                               ORDER BY d.acc || ':' || i.mode)
                      AS fingerprint
             FROM iam i JOIN dom d ON d.sk = i.sk GROUP BY 1)
      SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_entities
      FROM fp GROUP BY 1 ORDER BY fingerprint"""))((s, dir) =>
      ProCogQueries.combinatorialFingerprints(GraphTables.cached(s, dir))
        .orderBy("fingerprint")),

    RQ("p8_compare_domains", Some(s"""$G,
      sa AS (SELECT DISTINCT s.cog FROM iam i JOIN sim s ON s.pk = i.pk
             WHERE i.sk = 1 AND s.score >= 0.9 AND s.best = 'Y'),
      sb AS (SELECT DISTINCT s.cog FROM iam i JOIN sim s ON s.pk = i.pk
             WHERE i.sk = 2 AND s.score >= 0.9 AND s.best = 'Y')
      SELECT CAST((SELECT count(*) FROM (SELECT * FROM sa INTERSECT
                   SELECT * FROM sb)) AS BIGINT) AS n_common,
             CAST((SELECT count(*) FROM (SELECT * FROM sa EXCEPT
                   SELECT * FROM sb)) AS BIGINT) AS n_only_a,
             CAST((SELECT count(*) FROM (SELECT * FROM sb EXCEPT
                   SELECT * FROM sa)) AS BIGINT) AS n_only_b"""))((s, dir) =>
      ProCogQueries.compareDomains(GraphTables.cached(s, dir), 1L, 2L, 0.9,
        Best)),

    RQ("p9_autocomplete", Some(s"""$G
      SELECT hetCode FROM (SELECT DISTINCT hetCode FROM be)
      WHERE hetCode LIKE '%1%'
      ORDER BY length(hetCode), hetCode LIMIT 5"""))((s, dir) =>
      ProCogQueries.autocomplete(GraphTables.cached(s, dir), "1", 5)),

    // Cognate Ligands Summary (neodash_queries.yaml:23-36): bound entities
    // with 1+ cognate at the cutoff, and the unambiguous (exactly-1) count
    RQ("p12_cognate_ambiguity", Some(s"""$G,
      bc AS (SELECT b.uid, count(DISTINCT s.cog) AS n_cog
             FROM be b JOIN sim s ON s.pk = b.pk
             WHERE s.score >= 0.9 GROUP BY 1)
      SELECT * FROM (
        SELECT '1+ cognate' AS title, CAST(count(*) AS BIGINT) AS n FROM bc
        UNION ALL
        SELECT 'unambiguous' AS title, CAST(count(*) AS BIGINT) AS n
        FROM bc WHERE n_cog = 1)
      ORDER BY title"""))((s, dir) =>
      ProCogQueries.cognateSummary(GraphTables.cached(s, dir), 0.9)),

    // Graph View neighborhood extraction (neodash_queries.yaml:54-64):
    // typed edge list of the first entries' bounded neighborhood
    RQ("p13_entry_graph_view", Some(s"""$G
      SELECT * FROM (
        SELECT 'IS_IN_PDB' AS edge_type, uid AS src, 'pdb' || ok AS dst,
               1.0 AS weight
        FROM be WHERE ok <= 20
        UNION ALL
        SELECT 'INTERACTS_WITH_LIGAND', d.acc, i.uid, i.perc
        FROM iam i JOIN dom d ON d.sk = i.sk WHERE i.ok <= 20
        UNION ALL
        SELECT 'HAS_SIMILARITY', b.uid, upper(trim(p.p_name)), s.score
        FROM be b JOIN sim s ON s.pk = b.pk
                  JOIN part p ON p.p_partkey = s.cog
        WHERE b.ok <= 20 AND s.score >= 0.9 AND s.best = 'Y')
      ORDER BY edge_type, src, dst, weight"""))((s, dir) =>
      ProCogQueries.entryGraphView(GraphTables.cached(s, dir), 20L, 0.9)),

    // EC page (docs/tutorial per-EC listing; SURVEY §7's ecPage): entries
    // carrying an EC-3 domain with their best cognates at 0.9
    RQ("p14_ec_page", Some(s"""$G
      SELECT DISTINCT 'pdb' || i.ok AS pdbEntry, 'HET' || i.pk AS hetCode,
             upper(trim(p.p_name)) AS cognateLigand, s.score AS parityScore
      FROM (SELECT DISTINCT ok, pk, sk FROM ia0) i
      JOIN supplier sp ON sp.s_suppkey = i.sk AND sp.s_nationkey = 3
      JOIN sim s ON s.pk = i.pk AND s.score >= 0.9 AND s.best = 'Y'
      JOIN part p ON p.p_partkey = s.cog
      ORDER BY pdbEntry, hetCode, cognateLigand, parityScore"""))((s, dir) =>
      ProCogQueries.ecPage(GraphTables.cached(s, dir), 3L, 0.9)),

    // Deterministic demo sample (produce_minimal_neo4j_files.py:107-108's
    // seed-42 2000-PDB sample, re-expressed engine-portably: md5-bucket
    // membership instead of a seeded RNG, so any engine reproduces it)
    RQ("p11_demo_sample", Some(s"""$G
      SELECT e.pdbEntry, CAST(count(*) AS BIGINT) AS n_bound
      FROM (SELECT 'pdb' || o_orderkey AS pdbEntry, o_orderkey AS ok
            FROM orders
            WHERE substr(md5('pdb' || o_orderkey), 1, 1) = '0') e
      JOIN be b USING (ok)
      GROUP BY 1 ORDER BY pdbEntry"""))((s, dir) => {
      val g = GraphTables.cached(s, dir)
      val sampled = g.entries
        .filter(substring(md5(col("pdbEntry").cast("binary")), 1, 1) === "0")
      sampled.join(g.boundEntities, "ok")
        .groupBy("pdbEntry").agg(count(lit(1)).as("n_bound"))
        .orderBy("pdbEntry")
    }),

    // Dashboard parameter variants (VERDICT r7 item 6): the neodash
    // controls are parameter grids over the typed API (DashboardParamsSpec
    // sweeps the invariants); these three put representative OFF-default
    // parameter points under the driver's oracle gate.

    // promiscuity with the Best/Any toggle set to Any (neodash's cognate
    // mode control): every candidate above the cutoff counts, not just
    // each ligand's best match
    RQ("p15_promiscuity_any", Some(s"""$G,
      binds AS (SELECT d.ssf, s.cog, CAST(count(DISTINCT i.sk) AS BIGINT)
                  AS n_bind
                FROM (SELECT DISTINCT pk, sk FROM iam) i
                JOIN sim s ON s.pk = i.pk AND s.score >= 0.95
                JOIN dom d ON d.sk = i.sk
                GROUP BY 1, 2),
      ssfsize AS (SELECT ssf, CAST(count(DISTINCT sk) AS BIGINT) AS n_dom
                  FROM dom GROUP BY 1)
      SELECT b.ssf AS superfamily, b.cog AS cogId, b.n_bind, z.n_dom,
             b.n_bind::DOUBLE / z.n_dom::DOUBLE AS frac_binding
      FROM binds b JOIN ssfsize z USING (ssf)
      ORDER BY superfamily, cogId"""))((s, dir) =>
      ProCogQueries.superfamilyPromiscuity(GraphTables.cached(s, dir), 0.95,
          AnyCognate)
        .orderBy("superfamily", "cogId")),

    // interactions restricted to one classification DB (the dashboard's
    // domain-type dropdown): the CATH partition of p3
    RQ("p16_interactions_cath", Some(s"""$G
      SELECT 'pdb' || i.ok AS pdbID, d.acc AS chainDomain,
             b.disp AS pdbLigand,
             upper(substr(i.mode, 1, 1)) || substr(i.mode, 2)
               AS interactionMode,
             i.cc AS contactCount, i.perc
      FROM iam i JOIN dom d ON d.sk = i.sk JOIN be b ON b.uid = i.uid
      WHERE i.ok <= 20 AND d.dtype = 'CATH'
      ORDER BY pdbID, chainDomain, pdbLigand, interactionMode,
               contactCount, perc"""))((s, dir) =>
      ProCogQueries.domainInteractions(GraphTables.cached(s, dir), 20L,
          Some("CATH"))
        .orderBy("pdbID", "chainDomain", "pdbLigand", "interactionMode",
          "contactCount", "perc")),

    // cutoff-swept similarity (the dashboard's parity-score slider): Best
    // mode at 0.95 — between p4's 0.9 and p5's 0.97 on the cutoff grid
    RQ("p17_similarity_cutoff", Some(s"""$G
      SELECT b.hetCode, upper(trim(p.p_name)) AS cognateLigand,
             s.score AS parityScore, s.best
      FROM be b JOIN sim s ON s.pk = b.pk
                JOIN part p ON p.p_partkey = s.cog
      WHERE b.ok <= 20 AND s.score >= 0.95 AND s.best = 'Y'
      ORDER BY hetCode, cognateLigand, parityScore, best"""))((s, dir) =>
      ProCogQueries.ligandSimilarity(GraphTables.cached(s, dir), 20L, 0.95,
          Best)
        .orderBy("hetCode", "cognateLigand", "parityScore", "best")),

    // EC-hierarchy walk shape (dashboard EC page): two-level rollup listing
    RQ("p10_hierarchy_walk", Some("""
      SELECT r_name, n_name, CAST(count(DISTINCT o_orderkey) AS BIGINT)
               AS n_entries
      FROM region JOIN nation ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders ON o_custkey = c_custkey
      GROUP BY 1, 2 ORDER BY r_name, n_name"""))((s, dir) => {
      import graft.Tables
      Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        // count, not countDistinct: o_orderkey is unique per order and the
        // join multiplicity is exactly 1 (customer/nation/region are all
        // key-unique dims), so every order survives once — plain count
        // equals the oracle's COUNT(DISTINCT) without the distinct
        // aggregate's extra shuffle-side dedup pass
        .agg(count(col("o_orderkey")).as("n_entries"))
        .orderBy("r_name", "n_name")
    }),

    // Parity-viewer iframe payload (neodash_queries.yaml:78): the Ligand
    // Similarity table WITH the urlencoded JSON viewer link — the exact
    // payload schema the reference's parity_viewer.html consumes
    // (apoc.convert.toJson + apoc.text.urlencode → to_json + url_encode)
    RQ("p18_parity_viewer_payload", Some(s"""$G,
      pay AS (SELECT b.hetCode, upper(trim(p.p_name)) AS cognateLigand,
                     s.score AS parityScore, s.best,
                     to_json(struct_pack(
                       bl_name := upper(trim(p.p_name)),
                       bl_smiles := upper(trim(p.p_name)),
                       parity := printf('%.3f', s.score),
                       parity_smarts := p.p_brand || ':' ||
                                        CAST(p.p_size // 10 AS VARCHAR),
                       parity_pdb := CAST(bp.p_size AS VARCHAR),
                       parity_bl := CAST(p.p_size AS VARCHAR),
                       be_name := b.hetCode,
                       be_smiles := upper(trim(bp.p_name))))::VARCHAR AS j
              FROM be b JOIN sim s ON s.pk = b.pk
                   JOIN part p ON p.p_partkey = s.cog
                   JOIN part bp ON bp.p_partkey = b.pk
              WHERE b.ok <= 20 AND s.score >= 0.9 AND s.best = 'Y')
      SELECT hetCode, cognateLigand, parityScore, best,
             'http://localhost:8080/procogdash/web/parity_viewer.html?data='
               || ${urlencSql("j")} AS iframe_url,
             'Parity Score: ' || hetCode || ' - ' || cognateLigand
               AS iframe_header
      FROM pay
      ORDER BY hetCode, cognateLigand, parityScore, iframe_url"""))((s, dir) =>
      ProCogQueries.parityViewerPayload(GraphTables.cached(s, dir), 20L, 0.9,
          Best)
        .orderBy("hetCode", "cognateLigand", "parityScore", "iframe_url")),

    // Molstar-viewer iframe payload (neodash_queries.yaml:70): the Domain
    // Interactions table WITH the urlencoded structure-viewer JSON —
    // residue-list analogs are real per-contact line numbers from the
    // fact table (this domain's interface + the all-domain union)
    RQ("p19_molstar_viewer_payload", Some(s"""$G,
      ifc AS (SELECT l_orderkey AS ok, l_partkey AS pk, l_suppkey AS sk,
                     list_sort(list(CAST(l_linenumber AS BIGINT))) AS iface
              FROM lineitem WHERE l_orderkey <= 20 GROUP BY 1, 2, 3),
      ai AS (SELECT ok, pk, list_sort(list(ln)) AS all_iface
             FROM (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk,
                          CAST(l_linenumber AS BIGINT) AS ln
                   FROM lineitem WHERE l_orderkey <= 20) GROUP BY 1, 2),
      pay AS (SELECT d.acc AS chainDomain, b.disp AS pdbLigand,
                     upper(substr(i.mode, 1, 1)) || substr(i.mode, 2)
                       AS interactionMode,
                     i.perc * 100 AS domainContactPct,
                     CAST(len(f.iface) AS BIGINT) AS interfaceCount,
                     to_json(struct_pack(
                       pdb_id := 'pdb' || i.ok,
                       bl_chain := b.disp,
                       bl_residues := a.all_iface,
                       all_interface := a.all_iface,
                       interface_chain := CAST(i.ok AS VARCHAR) || ':' ||
                                          CAST(sp.s_nationkey AS VARCHAR),
                       interface := f.iface))::VARCHAR AS j
              FROM iam i
              JOIN ifc f ON f.ok = i.ok AND f.pk = i.pk AND f.sk = i.sk
              JOIN ai a ON a.ok = i.ok AND a.pk = i.pk
              JOIN dom d ON d.sk = i.sk
              JOIN supplier sp ON sp.s_suppkey = i.sk
              JOIN be b ON b.ok = i.ok AND b.pk = i.pk
              WHERE i.ok <= 20)
      SELECT chainDomain, pdbLigand, interactionMode, domainContactPct,
             interfaceCount,
             'http://www.localhost:8080/procogdash/web/pdbe_molstar_viewer.html?data='
               || ${urlencSql("j")} AS iframe_url,
             'Interface: ' || chainDomain || ' - ' || pdbLigand
               AS iframe_header
      FROM pay ORDER BY chainDomain, pdbLigand, iframe_url"""))((s, dir) =>
      ProCogQueries.molstarViewerPayload(GraphTables.cached(s, dir),
          graft.Tables(s, dir, "lineitem"), 20L)
        .orderBy("chainDomain", "pdbLigand", "iframe_url")),

    // Remaining high-traffic neodash parameter-grid points under the
    // oracle gate (VERDICT r9 item 6; neodash_queries.yaml:40-81 — the
    // EC-page cutoff slider and the domain-type dropdown's SCOP/Pfam
    // positions mirroring p16's CATH, plus the search page in Any mode):

    // EC-page cognate listing at a NON-default parity cutoff (p14 is the
    // 0.9 default; the dashboard slider's tighter 0.95 stop)
    RQ("p20_ec_page_cutoff", Some(s"""$G
      SELECT DISTINCT 'pdb' || i.ok AS pdbEntry, 'HET' || i.pk AS hetCode,
             upper(trim(p.p_name)) AS cognateLigand, s.score AS parityScore
      FROM (SELECT DISTINCT ok, pk, sk FROM ia0) i
      JOIN supplier sp ON sp.s_suppkey = i.sk AND sp.s_nationkey = 3
      JOIN sim s ON s.pk = i.pk AND s.score >= 0.95 AND s.best = 'Y'
      JOIN part p ON p.p_partkey = s.cog
      ORDER BY pdbEntry, hetCode, cognateLigand, parityScore"""))((s, dir) =>
      ProCogQueries.ecPage(GraphTables.cached(s, dir), 3L, 0.95)),

    // interaction table restricted to the SCOP partition (the dropdown's
    // second position; p16 covers CATH)
    RQ("p21_interactions_scop", Some(s"""$G
      SELECT 'pdb' || i.ok AS pdbID, d.acc AS chainDomain,
             b.disp AS pdbLigand,
             upper(substr(i.mode, 1, 1)) || substr(i.mode, 2)
               AS interactionMode,
             i.cc AS contactCount, i.perc
      FROM iam i JOIN dom d ON d.sk = i.sk JOIN be b ON b.uid = i.uid
      WHERE i.ok <= 20 AND d.dtype = 'SCOP'
      ORDER BY pdbID, chainDomain, pdbLigand, interactionMode,
               contactCount, perc"""))((s, dir) =>
      ProCogQueries.domainInteractions(GraphTables.cached(s, dir), 20L,
          Some("SCOP"))
        .orderBy("pdbID", "chainDomain", "pdbLigand", "interactionMode",
          "contactCount", "perc")),

    // ...and the Pfam partition (third dropdown position)
    RQ("p22_interactions_pfam", Some(s"""$G
      SELECT 'pdb' || i.ok AS pdbID, d.acc AS chainDomain,
             b.disp AS pdbLigand,
             upper(substr(i.mode, 1, 1)) || substr(i.mode, 2)
               AS interactionMode,
             i.cc AS contactCount, i.perc
      FROM iam i JOIN dom d ON d.sk = i.sk JOIN be b ON b.uid = i.uid
      WHERE i.ok <= 20 AND d.dtype = 'Pfam'
      ORDER BY pdbID, chainDomain, pdbLigand, interactionMode,
               contactCount, perc"""))((s, dir) =>
      ProCogQueries.domainInteractions(GraphTables.cached(s, dir), 20L,
          Some("Pfam"))
        .orderBy("pdbID", "chainDomain", "pdbLigand", "interactionMode",
          "contactCount", "perc")),

    // PDB search with the cognate-mode toggle at Any and the cutoff
    // slider at 0.95 (p2 is the Best@0.9 default): the cognate count per
    // entry counts EVERY candidate above the cutoff, not just each
    // ligand's best match
    RQ("p23_search_any", Some(s"""$G
      SELECT e.pdbEntry,
             CAST(coalesce(bc.be_count, 0) AS BIGINT) AS be_count,
             CAST(coalesce(cc.cog_count, 0) AS BIGINT) AS cog_count
      FROM (SELECT 'pdb' || o_orderkey AS pdbEntry, o_orderkey AS ok
            FROM orders) e
      LEFT JOIN (SELECT ok, count(DISTINCT uid) AS be_count FROM be
                 GROUP BY 1) bc USING (ok)
      LEFT JOIN (SELECT b.ok, count(DISTINCT s.cog) AS cog_count
                 FROM be b JOIN sim s ON s.pk = b.pk
                 WHERE s.score >= 0.95 GROUP BY 1) cc
        USING (ok)
      WHERE upper(e.pdbEntry) LIKE '%42%'
      ORDER BY pdbEntry"""))((s, dir) =>
      ProCogQueries.searchEntries(GraphTables.cached(s, dir), "42", 0.95,
          AnyCognate)
        .orderBy("pdbEntry")),

    // Round-11 dashboard tail (VERDICT r10 item 7): Compare-Domains with
    // the SECOND domain parameter varied (p8 fixes the (1,2) pair; the
    // apoc.coll.subtract widgets re-run per selection), the EC-hierarchy
    // walk at the class/subclass levels, and the Cognate Ligand Search's
    // ANY-substring name/dbxref mode.

    RQ("p24_compare_domains_alt", Some(s"""$G,
      sa AS (SELECT DISTINCT s.cog FROM iam i JOIN sim s ON s.pk = i.pk
             WHERE i.sk = 1 AND s.score >= 0.9 AND s.best = 'Y'),
      sb AS (SELECT DISTINCT s.cog FROM iam i JOIN sim s ON s.pk = i.pk
             WHERE i.sk = 3 AND s.score >= 0.9 AND s.best = 'Y')
      SELECT CAST((SELECT count(*) FROM (SELECT * FROM sa INTERSECT
                   SELECT * FROM sb)) AS BIGINT) AS n_common,
             CAST((SELECT count(*) FROM (SELECT * FROM sa EXCEPT
                   SELECT * FROM sb)) AS BIGINT) AS n_only_a,
             CAST((SELECT count(*) FROM (SELECT * FROM sb EXCEPT
                   SELECT * FROM sa)) AS BIGINT) AS n_only_b"""))((s, dir) =>
      ProCogQueries.compareDomains(GraphTables.cached(s, dir), 1L, 3L, 0.9,
        Best)),

    // EC hierarchy walk over the export's dotted-code scheme: per
    // (class, subclass) prefix, distinct EC ids + cognates beneath it
    RQ("p25_ec_hierarchy_walk", Some("""
      WITH codes AS (SELECT p_partkey AS cogId,
                       regexp_extract(p_brand, '#(\d+)', 1) || '.' ||
                       (p_size // 10) || '.' || (p_size % 10) || '.' ||
                       (p_partkey % 7) AS ec
                     FROM part)
      SELECT str_split(ec, '.')[1] AS ecClass,
             str_split(ec, '.')[1] || '.' || str_split(ec, '.')[2]
               AS ecSubclass,
             CAST(count(DISTINCT ec) AS BIGINT) AS n_ec,
             CAST(count(DISTINCT cogId) AS BIGINT) AS n_cognates
      FROM codes GROUP BY 1, 2
      ORDER BY ecClass, ecSubclass"""))((s, dir) =>
      ProCogQueries.ecHierarchyWalk(GraphTables.cached(s, dir))),

    // Cognate Ligand Search in name_db mode, two comma-split terms: a
    // name-substring term ('OSE' — part names contain e.g. "rose") and a
    // dbxref term ('CHEBI:10') — ANY term in ANY field matches
    RQ("p26_cognate_search_namedb", Some("""
      WITH c AS (SELECT p_partkey AS cogId,
                        upper(trim(p_name)) AS cognateLigand,
                        'CHEBI:' || p_partkey AS x1,
                        'KEGG:C' || p_size AS x2
                 FROM part)
      SELECT cogId, cognateLigand, x1 || '|' || x2 AS ligandDB
      FROM c
      WHERE cognateLigand LIKE '%OSE%' OR x1 LIKE '%OSE%' OR x2 LIKE '%OSE%'
         OR cognateLigand LIKE '%CHEBI:10%' OR x1 LIKE '%CHEBI:10%'
         OR x2 LIKE '%CHEBI:10%'
      ORDER BY cogId"""))((s, dir) =>
      ProCogQueries.cognateSearch(GraphTables.cached(s, dir),
        "ose,CHEBI:10")),

    // domain-database dropdown autocomplete (distinct type values,
    // shortest first — the dashboard's size(value) ASC LIMIT idiom)
    RQ("p27_domain_autocomplete", Some("""
      SELECT dtype FROM (
        SELECT DISTINCT CASE s_suppkey % 3 WHEN 0 THEN 'CATH'
                             WHEN 1 THEN 'SCOP' ELSE 'Pfam' END AS dtype
        FROM supplier)
      WHERE lower(dtype) LIKE '%a%'
      ORDER BY length(dtype), dtype LIMIT 5"""))((s, dir) =>
      ProCogQueries.domainTypeAutocomplete(GraphTables.cached(s, dir),
        "a", 5)),

    // Cognate Ligand Search, "id:" branch: exact uniqueID lookup with
    // the same output shape as p26's name_db branch
    RQ("p28_cognate_search_id", Some("""
      SELECT p_partkey AS cogId, upper(trim(p_name)) AS cognateLigand,
             'CHEBI:' || p_partkey || '|' || 'KEGG:C' || p_size AS ligandDB
      FROM part WHERE p_partkey = 42"""))((s, dir) =>
      ProCogQueries.cognateSearchById(GraphTables.cached(s, dir), "id:42")),

    // EC direct-entry autocomplete (dashboard.json Enzyme Query panel:
    // substring on ecID, shortest-first, LIMIT 5 — VERDICT r12 item 7's
    // first straggler). Same idiom as p9/p27 over the EC dim.
    RQ("p29_ec_autocomplete", Some(s"""
      WITH codes AS (SELECT DISTINCT $ecSql AS ec FROM part)
      SELECT ec FROM codes WHERE ec LIKE '%3.1%'
      ORDER BY length(ec), ec LIMIT 5"""))((s, dir) =>
      ProCogQueries.ecAutocomplete(GraphTables.cached(s, dir), "3.1", 5)),

    // Enzyme Results card: the focus EC's class/subclass/subsubclass
    // lineage + cognate count (the 4-hop IS_IN_* chain as derived prefix
    // projections). Focus = min(ec) — the deterministic stand-in for the
    // dashboard's picked parameter.
    RQ("p30_ec_direct_entry", Some(s"""
      WITH codes AS (SELECT p_partkey AS cogId, $ecSql AS ec FROM part),
           f AS (SELECT ec FROM (SELECT ec, count(DISTINCT cogId) AS n
                                 FROM codes GROUP BY ec
                                 ORDER BY n DESC, ec LIMIT 1))
      SELECT str_split(codes.ec, '.')[1] AS ecClass,
             str_split(codes.ec, '.')[1] || '.' ||
               str_split(codes.ec, '.')[2] AS ecSubclass,
             str_split(codes.ec, '.')[1] || '.' ||
               str_split(codes.ec, '.')[2] || '.' ||
               str_split(codes.ec, '.')[3] AS ecSubsubclass,
             codes.ec AS ecID,
             CAST(count(DISTINCT cogId) AS BIGINT) AS n_cognates
      FROM codes JOIN f ON codes.ec = f.ec
      GROUP BY codes.ec"""))((s, dir) =>
      ProCogQueries.ecDirectEntry(GraphTables.cached(s, dir))),

    // "PDBs : $enzyme_focus": entries whose chain carries the focus EC,
    // LIMIT 1000 (dashboard.json) — the one-row EC dim broadcasts into
    // the fact scan, then distinct + ordered top-k.
    RQ("p31_ec_entries", Some(s"""
      WITH codes AS (SELECT p_partkey AS cogId, $ecSql AS ec FROM part),
           f AS (SELECT ec FROM (SELECT ec, count(DISTINCT cogId) AS n
                                 FROM codes GROUP BY ec
                                 ORDER BY n DESC, ec LIMIT 1)),
           hits AS (SELECT DISTINCT 'pdb' || l_orderkey AS pdbEntry
                    FROM lineitem
                    JOIN codes ON codes.cogId = l_partkey
                    JOIN f ON codes.ec = f.ec)
      SELECT pdbEntry FROM hits ORDER BY pdbEntry LIMIT 1000"""))((s, dir) =>
      ProCogQueries.ecEntries(GraphTables.cached(s, dir))),

    // Per-domain-type group tiles for the focus EC (the dashboard's
    // "$neodash_group_level" apoc.case over SCOP/CATH/Pfam) — all three
    // database branches in one grouped pass, with the reference's
    // "<group> (<db>)" description and group-level label.
    RQ("p32_ec_domain_groups", Some(s"""
      WITH codes AS (SELECT p_partkey AS cogId, $ecSql AS ec FROM part),
           f AS (SELECT ec FROM (SELECT ec, count(DISTINCT cogId) AS n
                                 FROM codes GROUP BY ec
                                 ORDER BY n DESC, ec LIMIT 1)),
           s AS (SELECT DISTINCT s_suppkey AS sk,
                        CASE s_suppkey % 3 WHEN 0 THEN 'CATH'
                             WHEN 1 THEN 'SCOP' ELSE 'Pfam' END AS dtype,
                        'SF' || s_nationkey AS superfamily
                 FROM supplier),
           hit AS (SELECT DISTINCT s.dtype, s.superfamily, s.sk
                   FROM lineitem
                   JOIN codes ON codes.cogId = l_partkey
                   JOIN f ON codes.ec = f.ec
                   JOIN s ON s.sk = l_suppkey)
      SELECT dtype, superfamily || ' (' || dtype || ')' AS groupDesc,
             CASE WHEN dtype = 'Pfam' THEN 'Family'
                  ELSE 'Superfamily' END AS groupLevel,
             CAST(count(DISTINCT sk) AS BIGINT) AS n_domains
      FROM hit GROUP BY dtype, superfamily
      ORDER BY dtype, groupDesc"""))((s, dir) =>
      ProCogQueries.ecDomainGroups(GraphTables.cached(s, dir))),

    // "Cognate Ligands : $enzyme_focus" (the Enzyme page's 4th panel):
    // cognates in the focus EC with the smiles-viewer iframe payload —
    // the p18/p19 url_encode(to_json(...)) idiom over the EC dim join.
    RQ("p33_ec_cognates", Some(s"""
      WITH codes AS (SELECT p_partkey AS cogId, $ecSql AS ec FROM part),
           f AS (SELECT ec FROM (SELECT ec, count(DISTINCT cogId) AS n
                                 FROM codes GROUP BY ec
                                 ORDER BY n DESC, ec LIMIT 1)),
           c AS (SELECT codes.cogId, upper(trim(p_name)) AS nm
                 FROM codes JOIN f ON codes.ec = f.ec
                 JOIN part ON p_partkey = codes.cogId),
           pay AS (SELECT cogId, nm,
                          to_json(struct_pack(name := nm, smiles := nm))
                            ::VARCHAR AS j
                   FROM c)
      SELECT cogId, nm AS cognateLigand,
             'http://localhost:8080/procogdash/web/smiles_viewer.html?type=smiles&data='
               || ${urlencSql("j")} AS iframe_url
      FROM pay ORDER BY cogId"""))((s, dir) =>
      ProCogQueries.ecCognates(GraphTables.cached(s, dir)))
  )

  /** The dotted EC code in DuckDB SQL — mirror of ExportStage.ecCode.
    * A def: `defs` above interpolates it during its own eager init.
    */
  private def ecSql: String =
    """regexp_extract(p_brand, '#(\d+)', 1) || '.' ||
       (p_size // 10) || '.' || (p_size % 10) || '.' || (p_partkey % 7)"""
}
