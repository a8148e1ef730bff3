package graft.queries

import org.apache.spark.sql.functions._

import graft.{RQ, Tables}
import graft.etl.{ContactsStage, ExportStage, FlatFileExport}
import graft.graph.GraphTables
import graft.sources.Sinks

/** The contacts ETL stage under the oracle gate: lineitem rows become
  * arpeggio-shaped nested-JSON contact records (written as a JSON-lines
  * fixture), run through readContacts → relevance filter → aggregation →
  * ownership; the oracle derives the same result from lineitem directly,
  * so the whole JSON roundtrip + stage logic is value-checked.
  */
object EtlQueries {

  import Fixtures.rm

  /** The etl1 JSON-lines contacts fixture, generated ONCE per (data dir,
    * lineitem fingerprint) and installed by atomic rename (the s4
    * pattern: process-unique temp, exactly one rename wins, stale
    * fingerprints swept once cold). Bench calls this during untimed
    * warmup so the measured etl1 region is the operator under test —
    * JSON scan → relevance filter → aggregation — not a full-table disk
    * write (the round-7 driver record charged that write to etl1:
    * 28.3 s, ~8× the builder's number, maximally contention-sensitive).
    * Returns the path to read.
    */
  def contactsFixture(s: org.apache.spark.sql.SparkSession,
                      dir: String): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
    val src = new java.io.File(s"$dir/lineitem.parquet")
    // legacySweep: the retired fixed-path layout ("etl1_contacts", no
    // fingerprint) and its temp naming, swept once cold
    // fp "v2": the fixture gained status-stamped records + envelope rows
    // (run_arpeggio.sh:15-22) — the bump regenerates memoized v1 dirs,
    // which then age out via the standard name-prefix sweep
    Fixtures.installDir(safe, "etl1_contacts",
      s"v2_${src.length}_${src.lastModified}",
      legacySweep = n => n == "etl1_contacts" ||
        n.matches("\\.etl1_tmp_\\d+_.*")) { tmp =>
      val records = Tables(s, dir, "lineitem")
        .select(to_json(struct(
          concat(lit("pdb"), col("l_orderkey") % 50).as("pdb_id"),
          lit("success").as("status"),
          struct(col("l_returnflag").as("auth_asym_id"),
            col("l_linenumber").cast("long").as("auth_seq_id"),
            lit("").as("pdbx_PDB_ins_code")).as("bgn"),
          struct(concat(lit("C"), col("l_suppkey") % 20).as("auth_asym_id"),
            col("l_partkey").as("auth_seq_id")).as("end"),
          when(col("l_discount") >= 0.06, array(lit("proximal"), lit("hbond")))
            .when(col("l_discount") >= 0.03, array(lit("covalent")))
            .otherwise(array(lit("proximal"))).as("contact"),
          when(col("l_tax") > 0.04, "INTER").otherwise("INTRA")
            .as("interacting_entities"),
          col("l_extendedprice").as("distance"),
          lit("atom-atom").as("type"))).as("value"))
      // envelope rows (run_arpeggio.sh:15-22): one record per failed or
      // empty pdb, status carrying the wrapper's verdict. Derived from
      // nation so the skip classification is data-driven at every SF:
      // k%4 = 0 timeout, 1 arpeggio_failure, 2 success-with-no-contact-
      // records, 3 success with only-irrelevant contacts
      val k = col("n_nationkey")
      val envelopes = Tables(s, dir, "nation")
        .select(to_json(struct(
          concat(lit("pdbx"), k).as("pdb_id"),
          when(k % 4 === 0, "timeout")
            .when(k % 4 === 1, "arpeggio_failure")
            .otherwise("success").as("status"),
          when(k % 4 === 3, array(lit("proximal"))).as("contact"),
          when(k % 4 === 3, "INTER").as("interacting_entities")))
          .as("value"))
      records.unionByName(envelopes).write.mode("overwrite").text(tmp)
    }
  }

  /** etl5/j14 shared oracle: the skip classification re-derived
    * analytically (batch and streamed forms must both match it). */
  private def contactSkipsSql: String = """
      WITH c AS (SELECT 'pdb' || (l_orderkey % 50) AS pdb_id,
                        CASE WHEN l_discount >= 0.06 THEN ['proximal','hbond']
                             WHEN l_discount >= 0.03 THEN ['covalent']
                             ELSE ['proximal'] END AS contact,
                        CASE WHEN l_tax > 0.04 THEN 'INTER' ELSE 'INTRA' END
                          AS ie
                 FROM lineitem),
           rel AS (SELECT DISTINCT pdb_id FROM c
                   WHERE ie = 'INTER' AND EXISTS (
                     SELECT 1 FROM unnest(contact) AS t(x)
                     WHERE x NOT IN ('proximal','vdw_clash','clash'))),
           norel AS (SELECT pdb_id, CAST(124 AS INT) AS exit_code,
                            'no_valid_ligand_protein_contacts' AS reason
                     FROM (SELECT DISTINCT pdb_id FROM c) p
                     WHERE pdb_id NOT IN (SELECT pdb_id FROM rel)),
           env AS (SELECT 'pdbx' || n_nationkey AS pdb_id,
                          CAST(CASE WHEN n_nationkey % 4 IN (0, 1)
                                    THEN 127 ELSE 124 END AS INT)
                            AS exit_code,
                          CASE WHEN n_nationkey % 4 = 0
                                 THEN 'no_contacts_record'
                               WHEN n_nationkey % 4 = 1
                                 THEN 'arpeggio_failure'
                               WHEN n_nationkey % 4 = 2
                                 THEN 'no_ligand_protein_contacts'
                               ELSE 'no_valid_ligand_protein_contacts'
                          END AS reason
                   FROM nation)
      SELECT pdb_id, exit_code, reason FROM env
      UNION ALL SELECT pdb_id, exit_code, reason FROM norel
      ORDER BY pdb_id"""

  /** j14's oracle: the skip classification over the STREAMED slice —
    * every envelope pdb plus the one data pdb (which emits a skip row
    * only if none of its contacts pass the relevance filter, same rule
    * as etl5's norel branch). */
  private def contactSkipsStreamSql: String = """
      WITH c AS (SELECT 'pdb' || (l_orderkey % 50) AS pdb_id,
                        CASE WHEN l_discount >= 0.06 THEN ['proximal','hbond']
                             WHEN l_discount >= 0.03 THEN ['covalent']
                             ELSE ['proximal'] END AS contact,
                        CASE WHEN l_tax > 0.04 THEN 'INTER' ELSE 'INTRA' END
                          AS ie
                 FROM lineitem WHERE l_orderkey % 50 = 7),
           rel AS (SELECT DISTINCT pdb_id FROM c
                   WHERE ie = 'INTER' AND EXISTS (
                     SELECT 1 FROM unnest(contact) AS t(x)
                     WHERE x NOT IN ('proximal','vdw_clash','clash'))),
           norel AS (SELECT pdb_id, CAST(124 AS INT) AS exit_code,
                            'no_valid_ligand_protein_contacts' AS reason
                     FROM (SELECT DISTINCT pdb_id FROM c) p
                     WHERE pdb_id NOT IN (SELECT pdb_id FROM rel)),
           env AS (SELECT 'pdbx' || n_nationkey AS pdb_id,
                          CAST(CASE WHEN n_nationkey % 4 IN (0, 1)
                                    THEN 127 ELSE 124 END AS INT)
                            AS exit_code,
                          CASE WHEN n_nationkey % 4 = 0
                                 THEN 'no_contacts_record'
                               WHEN n_nationkey % 4 = 1
                                 THEN 'arpeggio_failure'
                               WHEN n_nationkey % 4 = 2
                                 THEN 'no_ligand_protein_contacts'
                               ELSE 'no_valid_ligand_protein_contacts'
                          END AS reason
                   FROM nation)
      SELECT pdb_id, exit_code, reason FROM env
      UNION ALL SELECT pdb_id, exit_code, reason FROM norel
      ORDER BY pdb_id"""

  val defs: Seq[RQ] = Seq(

    // Flat-file distribution export (produce_flat_files.py): best-cognate
    // rows + names to CSV, read back plain — full roundtrip value-checked
    RQ("etl2_flat_export", Some("""
      WITH cand AS (SELECT p1.p_partkey AS pk, p2.p_partkey AS cog,
                           upper(trim(p2.p_name)) AS cogName,
                           (100 - abs(p2.p_size - p1.p_size))::DOUBLE
                             / 100::DOUBLE AS score
                    FROM part p1 JOIN part p2
                      ON p2.p_brand = p1.p_brand
                     AND p2.p_size // 10 = p1.p_size // 10),
           best AS (SELECT pk, cog, cogName, score,
                           max(score) OVER (PARTITION BY pk) AS mx
                    FROM cand)
      SELECT pk AS ligandUniqueID, cog AS cogId, cogName,
             score AS parityScore
      FROM best WHERE score = mx
      ORDER BY ligandUniqueID, cogId"""))((s, dir) => {
      val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = s"/tmp/graft_fixtures/$safe/etl2_flat"
      FlatFileExport.write(GraphTables.cached(s, dir), path)
      s.read.option("header", "true")
        .schema("ligandUniqueID LONG, cogId LONG, cogName STRING, parityScore DOUBLE")
        .csv(path)
        .orderBy("ligandUniqueID", "cogId")
    }),

    // Full Neo4j bulk-file inventory roundtrip: ExportStage writes all
    // 73 node/rel files (produce_neo4j_files.py:69-562; covers the import
    // script's 71-file consumption list incl. SUPERFAMILY/Gene3D), a representative
    // file from every inventory group is read BACK through the TSV+gz
    // sink layout, and its row count is checked against the star schema —
    // so the EC hierarchy, protein-chain, per-DB split, classification
    // hierarchy, descriptor, and stats files are all value-anchored, not
    // just written
    RQ("etl3_export_inventory", Some("""
      WITH sup AS (SELECT s_suppkey, s_name, s_nationkey,
                          s_suppkey % 3 AS m
                   FROM supplier),
           codes AS (SELECT DISTINCT
                       regexp_extract(p_brand, '#(\d+)', 1) || '.' ||
                       (p_size // 10) || '.' || (p_size % 10) || '.' ||
                       (p_partkey % 7) AS ec
                     FROM part),
           chains AS (SELECT DISTINCT l_orderkey AS ok, s_nationkey AS nk
                      FROM lineitem JOIN sup ON l_suppkey = s_suppkey),
           chainec AS (SELECT DISTINCT
                         l_orderkey || ':' || s_nationkey AS chain,
                         regexp_extract(p_brand, '#(\d+)', 1) || '.' ||
                         (p_size // 10) || '.' || (p_size % 10) || '.' ||
                         (p_partkey % 7) AS ec
                       FROM lineitem
                       JOIN sup ON l_suppkey = s_suppkey
                       JOIN part ON p_partkey = l_partkey),
           rows AS (
             SELECT 'ec_id_nodes' AS file, count(*) AS n FROM codes
             UNION ALL SELECT 'ec_nodes_class',
               count(DISTINCT str_split(ec, '.')[1]) FROM codes
             UNION ALL SELECT 'ec_class_subclass_rel',
               count(DISTINCT str_split(ec, '.')[1] || '.' ||
                     str_split(ec, '.')[2]) FROM codes
             UNION ALL SELECT 'cognate_ligands_ec', count(*) FROM part
             UNION ALL SELECT 'pdb_protein_chain_nodes', count(*) FROM chains
             UNION ALL SELECT 'pdb_protein_rels', count(*) FROM chains
             UNION ALL SELECT 'protein_ec_rels', count(*) FROM chainec
             UNION ALL SELECT 'cath_protein_rels',
               count(DISTINCT s_name || '|' || l_orderkey)
               FROM lineitem JOIN sup ON l_suppkey = s_suppkey WHERE m = 0
             UNION ALL SELECT 'cath_class_nodes',
               count(DISTINCT s_nationkey // 20) FROM sup WHERE m = 0
             UNION ALL SELECT 'cath_homologous_superfamily_domain_rels',
               count(*) FROM sup WHERE m = 0
             UNION ALL SELECT 'scop_family_nodes',
               count(DISTINCT s_nationkey || '_' || (s_suppkey % 2))
               FROM sup WHERE m = 1
             UNION ALL SELECT 'scop2_sf_nodes',
               count(DISTINCT s_nationkey) FROM sup WHERE m = 1
             UNION ALL SELECT 'pfam_clans',
               count(DISTINCT s_nationkey // 5) FROM sup WHERE m = 2
             UNION ALL SELECT 'bound_descriptors',
               count(DISTINCT l_partkey) FROM lineitem
             UNION ALL SELECT 'be_bd_rels',
               count(DISTINCT l_orderkey || '_' || l_partkey) FROM lineitem
             UNION ALL SELECT 'superfamily_domains_nodes',
               count(*) FROM sup WHERE m = 1
             UNION ALL SELECT 'superfamily_fold_rels',
               count(*) FROM sup WHERE m = 1
             UNION ALL SELECT 'gene3d_domains_nodes',
               count(*) FROM sup WHERE m = 0
             UNION ALL SELECT 'cath_topology_domain_rels',
               count(*) FROM sup WHERE m = 0
             UNION ALL SELECT 'procoggraph_node', 1)
      SELECT file, CAST(n AS BIGINT) AS n FROM rows ORDER BY file"""))(
      (s, dir) => {
      val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
      val out = s"/tmp/graft_fixtures/$safe/etl3_export"
      val written = ExportStage.run(GraphTables.cached(s, dir), out).toMap
      val subset = Seq("ec_id_nodes", "ec_nodes_class",
        "ec_class_subclass_rel", "cognate_ligands_ec",
        "pdb_protein_chain_nodes", "pdb_protein_rels", "protein_ec_rels",
        "cath_protein_rels", "cath_class_nodes",
        "cath_homologous_superfamily_domain_rels", "scop_family_nodes",
        "scop2_sf_nodes", "pfam_clans", "bound_descriptors", "be_bd_rels",
        "superfamily_domains_nodes", "superfamily_fold_rels",
        "gene3d_domains_nodes", "cath_topology_domain_rels",
        "procoggraph_node")
      subset.map(f => Sinks.readNeo4jTsv(s, written(f))
          .agg(count(lit(1)).as("n")).select(lit(f).as("file"), col("n")))
        .reduce(_.unionByName(_))
        .orderBy("file")
    }),

    RQ("etl1_contacts_stage", Some("""
      WITH c AS (SELECT 'pdb' || (l_orderkey % 50) AS pdb_id,
                        l_returnflag AS entity_chain,
                        'C' || l_suppkey % 20 AS domain_chain,
                        CASE WHEN l_discount >= 0.06 THEN ['proximal','hbond']
                             WHEN l_discount >= 0.03 THEN ['covalent']
                             ELSE ['proximal'] END AS contact,
                        CASE WHEN l_tax > 0.04 THEN 'INTER' ELSE 'INTRA' END
                          AS ie
                 FROM lineitem),
           rel AS (SELECT * FROM c WHERE ie = 'INTER' AND EXISTS (
                     SELECT 1 FROM unnest(contact) AS t(x)
                     WHERE x NOT IN ('proximal','vdw_clash','clash'))),
           agg AS (SELECT pdb_id, entity_chain, domain_chain,
                          CAST(count(*) AS BIGINT) AS contact_count,
                          CAST(sum(CASE WHEN list_contains(contact,'hbond')
                                        THEN 1 ELSE 0 END) AS BIGINT)
                            AS hbond_count,
                          CAST(sum(CASE WHEN list_contains(contact,'covalent')
                                        THEN 1 ELSE 0 END) AS BIGINT)
                            AS covalent_count
                   FROM rel GROUP BY 1, 2, 3),
           sh AS (SELECT *, CAST(sum(contact_count) OVER
                              (PARTITION BY pdb_id, entity_chain) AS BIGINT)
                              AS total_contacts
                  FROM agg)
      SELECT pdb_id, entity_chain, domain_chain, contact_count, hbond_count,
             covalent_count, total_contacts,
             contact_count::DOUBLE / total_contacts::DOUBLE AS perc,
             CASE WHEN contact_count::DOUBLE / total_contacts::DOUBLE > 0.9
                    THEN 'exclusive'
                  WHEN contact_count::DOUBLE / total_contacts::DOUBLE > 0.5
                    THEN 'dominant'
                  WHEN contact_count::DOUBLE / total_contacts::DOUBLE > 0.1
                    THEN 'partner'
                  ELSE 'minor' END AS ownership
      FROM sh
      ORDER BY pdb_id, entity_chain, domain_chain"""))((s, dir) => {
      // fixture generation is memoized + rename-installed (see
      // contactsFixture); when Bench pre-generates it during warmup the
      // timed region below is scan → filter → aggregate only
      val path = contactsFixture(s, dir)
      ContactsStage.aggregate(ContactsStage.readContacts(s, path))
        .orderBy("pdb_id", "entity_chain", "domain_chain")
    }),

    // ETL5 — arpeggio skip classification (VERDICT r12 item 3): the
    // status-envelope branch of the contacts stage. The oracle
    // reconstructs BOTH skip sources analytically: the nation-derived
    // envelope rows (timeout / arpeggio_failure / empty / only-irrelevant)
    // and any data pdb whose contacts all fail the relevance filter —
    // so the classification logic, not just the fixture constants, is
    // what's being checked (process_pdb_contacts.py:97-115, 426-430).
    RQ("etl5_contact_skips", Some(contactSkipsSql))((s, dir) => {
      val path = contactsFixture(s, dir)
      ContactsStage.skips(ContactsStage.readContacts(s, path))
        .orderBy("pdb_id")
    }),

    // J14 — STREAMING arpeggio skip classification: the contact stream's
    // envelope triage as it would run while records LAND (the batch twin
    // is etl5; same oracle). The per-pdb skip state (envelope flags +
    // record counts, ContactsStage.skipAggs) is maintained as a streaming
    // aggregation in update mode; every aggregate is MONOTONE under
    // accumulation, so the sink rolls up with max() and the final state
    // classifies through the ONE shared ContactsStage.classifySkips —
    // batching-invariant by construction, so the streamed answer must
    // hash-equal the batch oracle.
    RQ("j14_stream_contact_skips", Some(contactSkipsStreamSql))((s, dir) => {
      import s.implicits._
      val path = contactsFixture(s, dir)
      // the MemoryStream replay harness collects its feed to the driver
      // (documented across the j-family; the production source swap runs
      // the same plan unbounded) — so the streamed slice is BOUNDED: one
      // data pdb (pdb7 — exercises the counting/no-skip path) plus every
      // envelope pdb (all four skip classes). The oracle filters to the
      // same slice.
      val recs = ContactsStage.readContacts(s, path)
        .filter(col("pdb_id") === "pdb7" || col("pdb_id").startsWith("pdbx"))
        .select(col("pdb_id"), col("status"), col("contact"),
          col("interacting_entities"))
        .orderBy("pdb_id", "status", "interacting_entities")
        .as[(String, String, Seq[String], String)].collect()
      Replay.chunked(s, recs.toSeq, 4, statePartitions = Some(8)) { ds =>
        val df = ds.toDF("pdb_id", "status", "contact",
          "interacting_entities")
        df.groupBy("pdb_id")
          .agg(ContactsStage.skipAggs.head, ContactsStage.skipAggs.tail: _*)
          .writeStream.format("memory").queryName("j14_skips")
          .outputMode("update").start()
      }
      ContactsStage.classifySkips(
        s.table("j14_skips").groupBy("pdb_id")
          .agg(max("t").as("t"), max("f").as("f"),
            max("n_any").as("n_any"), max("n_rel").as("n_rel")))
        .orderBy("pdb_id")
    }),

    // ETL4 — snapshot CDC diff: classify every key of two keyed snapshots
    // as insert / update / delete via ONE full-outer join — the
    // change-data-capture delta that feeds MERGE INTO in a lakehouse
    // pipeline (and the batch twin of a Debezium-style stream). The
    // "next" snapshot is derived deterministically from the base
    // (deletes: k%17, updates: k%5 nation bump, inserts: k%13 shifted
    // keys), so the oracle reconstructs both snapshots and the exact
    // delta analytically. Unchanged rows are filtered OUT — CDC output
    // size is the churn, not the table. At scale: key-unique equi full
    // outer join — one shuffle per side on the join key, no skew by
    // construction (keys are unique in each snapshot), AQE coalesces;
    // the plan is identical at 100 TB with the snapshots as parquet
    // scans.
    RQ("etl4_cdc_diff", Some("""
      WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS k,
                           CAST(c_nationkey AS BIGINT) AS nation
                    FROM customer),
      nxt AS (SELECT k, CASE WHEN k % 5 = 0 THEN (nation + 1) % 25
                             ELSE nation END AS nation
              FROM base WHERE k % 17 <> 0
              UNION ALL
              SELECT k + 100000000 AS k, nation FROM base WHERE k % 13 = 0),
      j AS (SELECT coalesce(b.k, n.k) AS c_custkey,
                   b.nation AS old_nation, n.nation AS new_nation,
                   CASE WHEN b.k IS NULL THEN 'I'
                        WHEN n.k IS NULL THEN 'D'
                        WHEN b.nation <> n.nation THEN 'U' END AS op
            FROM base b FULL OUTER JOIN nxt n ON n.k = b.k)
      SELECT op, c_custkey, old_nation, new_nation
      FROM j WHERE op IS NOT NULL
      ORDER BY op, c_custkey"""))((s, dir) => {
      val base = Tables(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("k"),
          col("c_nationkey").cast("long").as("nation"))
      val next = base.filter(col("k") % 17 =!= 0)
        .select(col("k"),
          when(col("k") % 5 === 0, (col("nation") + 1) % 25)
            .otherwise(col("nation")).as("nation"))
        .unionByName(base.filter(col("k") % 13 === 0)
          .select((col("k") + 100000000L).as("k"), col("nation")))
      base.as("b").join(next.as("n"), col("b.k") === col("n.k"), "full_outer")
        .select(
          when(col("b.k").isNull, "I")
            .when(col("n.k").isNull, "D")
            .when(col("b.nation") =!= col("n.nation"), "U").as("op"),
          coalesce(col("b.k"), col("n.k")).as("c_custkey"),
          col("b.nation").as("old_nation"),
          col("n.nation").as("new_nation"))
        .filter(col("op").isNotNull)
        .orderBy("op", "c_custkey")
    })
  )
}
