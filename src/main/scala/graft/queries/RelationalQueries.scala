package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{RQ, Tables}
import graft.operators.{Closure, WindowOps}

/** Relational operator queries (SURVEY.md §2.B-§2.H) over the driver's
  * TPC-H-ish tables, each paired with a DuckDB oracle.
  *
  * Determinism rules (see core.RQ):
  *  - money stays in integer cents (`round(x*100)::bigint`) so sums are
  *    exact and order-insensitive — no floating-point accumulation drift
  *    between Spark's partial aggregates and DuckDB;
  *  - doubles only appear as a final division of two exact integers (one
  *    IEEE-754 op → bit-identical on both engines);
  *  - every query is totally ordered on its output columns.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** money double → exact integer cents */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  val defs: Seq[RQ] = Seq(

    // ----- B: projections / filters ------------------------------------

    // B1 — select / rename / drop (produce_neo4j_files.py:99,121 renames)
    RQ("b1_select_rename", Some("""
      SELECT p_partkey AS partkey, p_brand AS brand,
             CAST(p_size AS BIGINT) AS size_l
      FROM part ORDER BY partkey"""))((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey").as("partkey"), col("p_brand").as("brand"),
          col("p_size").cast("long").as("size_l"))
        .orderBy("partkey")),

    // B2 — boolean-mask filter (process_pdb_structure.py:111 isin-negation)
    RQ("b2_filter_mask", Some("""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber
      FROM lineitem
      WHERE l_returnflag NOT IN ('R') AND l_quantity > 45
      ORDER BY l_orderkey, l_linenumber"""))((s, dir) =>
      t(s, dir, "lineitem")
        .filter(!col("l_returnflag").isin("R") && col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber").cast("long"))
        .orderBy("l_orderkey", "l_linenumber")),

    // B3 — any-element array predicate (process_pdb_contacts.py:121)
    RQ("b3_array_exists", Some("""
      SELECT p_partkey, p_name FROM part
      WHERE list_contains(str_split(p_name, ' '), 'widget')
      ORDER BY p_partkey"""))((s, dir) =>
      t(s, dir, "part")
        .filter(exists(split(col("p_name"), " "), w => w === "widget"))
        .select("p_partkey", "p_name").orderBy("p_partkey")),

    // B4 — regex predicates (process_pdb_contacts.py:146)
    RQ("b4_regex", Some("""
      SELECT p_partkey, p_name FROM part
      WHERE regexp_matches(p_name, 'ring$') OR p_name LIKE 'red %'
      ORDER BY p_partkey"""))((s, dir) =>
      t(s, dir, "part")
        .filter(col("p_name").rlike("ring$") || col("p_name").startsWith("red "))
        .select("p_partkey", "p_name").orderBy("p_partkey")),

    // B5 — sentinel → null → default cascade (the "NA"=sodium trap,
    // process_all_pdb_contacts.py:145; fillna get_ec_information.py:655)
    RQ("b5_sentinel", Some("""
      SELECT doc_id, coalesce(nullif(lang, 'en'), '__default') AS lang2
      FROM documents ORDER BY doc_id"""))((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          coalesce(nullif(col("lang"), lit("en")), lit("__default")).as("lang2"))
        .orderBy("doc_id")),

    // B6 — quantile filter (80th-pct molwt split, process_pdb_structure.py:195).
    // Exact rank definition via cume_dist on both engines; at 100-TB scale the
    // threshold would come from percentile_approx + a broadcast scalar instead
    // of a global window.
    RQ("b6_quantile_filter", Some("""
      SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS total_cents
      FROM (SELECT o_orderkey, o_totalprice,
                   cume_dist() OVER (ORDER BY o_totalprice) AS cd FROM orders)
      WHERE cd > 0.8 ORDER BY o_orderkey"""))((s, dir) =>
      t(s, dir, "orders")
        .withColumn("cd", cume_dist().over(Window.orderBy("o_totalprice")))
        .filter(col("cd") > 0.8)
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"))
        .orderBy("o_orderkey")),

    // B7 — anti-filter via indicator (left_only kept, get_pdb_parity.py:160-165)
    RQ("b7_anti_filter", Some("""
      SELECT p_partkey, p_name FROM part
      WHERE NOT EXISTS (SELECT 1 FROM lineitem
                        WHERE l_partkey = p_partkey AND l_quantity >= 49)
      ORDER BY p_partkey"""))((s, dir) => {
      val heavy = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
        .select(col("l_partkey"))
      t(s, dir, "part")
        .join(heavy, col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name").orderBy("p_partkey")
    }),

    // ----- C: joins ----------------------------------------------------

    // C1 — broadcast left join against a tiny dim (process_pdb_structure.py:74)
    RQ("c1_broadcast_left", Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, r_name
      FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
      ORDER BY n_nationkey"""))((s, dir) =>
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"), "left")
        .select(col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_name"), col("r_name"))
        .orderBy("n_nationkey")),

    // C2 — inner join fact × dim (process_pdb_structure.py:81-86)
    RQ("c2_inner_join", Some("""
      SELECT c_custkey, n_name FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      ORDER BY c_custkey"""))((s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "n_name").orderBy("c_custkey")),

    // C3 — semi-filter with payload (inner keeps only members,
    // process_pdb_structure.py:125)
    RQ("c3_semi_payload", Some("""
      SELECT p_partkey, p_name FROM part
      JOIN (SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity >= 49) h
        ON p_partkey = l_partkey
      ORDER BY p_partkey"""))((s, dir) => {
      val h = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
        .select("l_partkey").distinct()
      t(s, dir, "part").join(h, col("p_partkey") === col("l_partkey"))
        .select("p_partkey", "p_name").orderBy("p_partkey")
    }),

    // C5 — explode + inner join (process_pdb_contacts.py:383-384)
    RQ("c5_explode_join", Some("""
      WITH toks AS (SELECT p_partkey, unnest(str_split(p_name,' ')) AS tok
                    FROM part),
           dim AS (SELECT DISTINCT str_split(p_name,' ')[1] AS tok FROM part)
      SELECT t.tok, count(*) AS n FROM toks t JOIN dim d ON t.tok = d.tok
      GROUP BY t.tok ORDER BY t.tok"""))((s, dir) => {
      val part = t(s, dir, "part")
      val toks = part.select(col("p_partkey"),
        explode(split(col("p_name"), " ")).as("tok"))
      val dim = part.select(element_at(split(col("p_name"), " "), 1).as("dtok"))
        .distinct()
      toks.join(broadcast(dim), col("tok") === col("dtok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy("tok")
    }),

    // C8 — iterative closure over a broadcast edge table (utils.py:77-84).
    // Synthetic edges nationkey→regionkey; 3 unrolled broadcast hops.
    RQ("c8_closure", Some("""
      WITH e AS (SELECT CAST(n_nationkey AS BIGINT) AS src,
                        CAST(min(n_regionkey) AS BIGINT) AS dst
                 FROM nation GROUP BY 1),
           k AS (SELECT CAST(n_nationkey AS BIGINT) AS key FROM nation),
           s1 AS (SELECT key, coalesce(e.dst, key) AS t FROM k
                  LEFT JOIN e ON key = e.src),
           s2 AS (SELECT key, coalesce(e.dst, t) AS t FROM s1
                  LEFT JOIN e ON t = e.src),
           s3 AS (SELECT key, coalesce(e.dst, t) AS terminal FROM s2
                  LEFT JOIN e ON t = e.src)
      SELECT key, terminal FROM s3 ORDER BY key"""))((s, dir) => {
      val n = t(s, dir, "nation")
      val edges = n.select(col("n_nationkey").cast("long").as("src"),
        col("n_regionkey").cast("long").as("dst"))
      val keys = n.select(col("n_nationkey").cast("long").as("key"))
      Closure.resolveToTerminal(keys, edges, 3).orderBy("key")
    }),

    // C9 — partial-code prefix expansion ("1.2.-.-" → concrete codes,
    // utils.py:243-256): broadcast theta-join of a tiny prefix dim against
    // the code universe.
    RQ("c9_prefix_expand", Some("""
      WITH pre AS (SELECT DISTINCT substr(p_brand,1,7) AS prefix FROM part),
           uni AS (SELECT DISTINCT p_brand FROM part)
      SELECT prefix, p_brand FROM uni JOIN pre
        ON p_brand LIKE prefix || '%'
      ORDER BY prefix, p_brand"""))((s, dir) => {
      val part = t(s, dir, "part")
      val pre = part.select(substring(col("p_brand"), 1, 7).as("prefix")).distinct()
      val uni = part.select(col("p_brand")).distinct()
      uni.join(broadcast(pre), col("p_brand").startsWith(col("prefix")))
        .select("prefix", "p_brand").orderBy("prefix", "p_brand")
    }),

    // C10 — candidate pairs by shared key after explode (get_pdb_parity.py:
    // 114-124): customer×supplier pairs co-located in a nation, aggregated.
    RQ("c10_shared_key_pairs", Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM customer JOIN supplier ON c_nationkey = s_nationkey
      JOIN nation ON n_nationkey = c_nationkey
      GROUP BY 1, 2 ORDER BY n_nationkey"""))((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "supplier"), col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("n_nationkey")),

    // C11 — cache probe: left join + both/left_only split (get_pdb_parity.py:
    // 157-168). "Cache" = pairs seen with linestatus F.
    RQ("c11_cache_probe", Some("""
      WITH cache AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
                     WHERE l_linestatus = 'F'),
           probe AS (SELECT DISTINCT l_partkey, l_suppkey, l_returnflag
                     FROM lineitem)
      SELECT p.l_returnflag,
             CASE WHEN c.l_partkey IS NULL THEN 'to_compute' ELSE 'cached' END
               AS status,
             CAST(count(*) AS BIGINT) AS n
      FROM probe p LEFT JOIN cache c
        ON p.l_partkey = c.l_partkey AND p.l_suppkey = c.l_suppkey
      GROUP BY 1, 2 ORDER BY l_returnflag, status"""))((s, dir) => {
      val li = t(s, dir, "lineitem")
      val cache = li.filter(col("l_linestatus") === "F")
        .select(col("l_partkey").as("cp"), col("l_suppkey").as("cs")).distinct()
      val probe = li.select("l_partkey", "l_suppkey", "l_returnflag").distinct()
      probe.join(cache,
          probe("l_partkey") === cache("cp") && probe("l_suppkey") === cache("cs"),
          "left")
        .withColumn("status",
          when(col("cp").isNull, lit("to_compute")).otherwise(lit("cached")))
        .groupBy("l_returnflag", "status").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag", "status")
    }),

    // C14 — multiway star join (Cypher 5-hop pattern, neodash_queries.yaml:67):
    // region-nation-customer-orders-lineitem, dims broadcast, revenue exact.
    RQ("c14_star_join", Some("""
      SELECT n_name, CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                              * (100 - CAST(round(l_discount*100) AS BIGINT)))
                          AS BIGINT) AS revenue,
             CAST(count(*) AS BIGINT) AS n_items
      FROM region JOIN nation ON r_regionkey = n_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE r_name IN ('AMERICA','ASIA') AND l_quantity > 10
      GROUP BY n_name ORDER BY n_name"""))((s, dir) => {
      val dims = broadcast(
        t(s, dir, "region").filter(col("r_name").isin("AMERICA", "ASIA"))
          .join(t(s, dir, "nation"), col("r_regionkey") === col("n_regionkey")))
      t(s, dir, "lineitem").filter(col("l_quantity") > 10)
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(dims, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(cents(col("l_extendedprice")) *
               (lit(100) - cents(col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // C15 — OPTIONAL MATCH → left join with null-preserving agg
    // (neodash_queries.yaml:44-48)
    RQ("c15_left_null_agg", Some("""
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
             CAST(coalesce(sum(CAST(round(o_totalprice*100) AS BIGINT)), 0)
                  AS BIGINT) AS total_cents
      FROM customer LEFT JOIN orders
        ON o_custkey = c_custkey AND o_orderstatus = 'F'
      GROUP BY c_custkey ORDER BY c_custkey"""))((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      t(s, dir, "customer")
        .join(o, col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(cents(col("o_totalprice"))), lit(0L)).as("total_cents"))
        .orderBy("c_custkey")
    }),

    // C16 — semi / anti set semantics (apoc.coll.subtract, dashboard
    // Compare-Domains): customers with an open order minus those with any
    // urgent order.
    RQ("c16_semi_anti", Some("""
      SELECT c_custkey FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderstatus = 'O')
      EXCEPT
      SELECT c_custkey FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""))((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val open = c.join(o.filter(col("o_orderstatus") === "O"),
        col("o_custkey") === col("c_custkey"), "left_semi").select("c_custkey")
      val urgent = c.join(o.filter(col("o_orderpriority") === "1-URGENT"),
        col("o_custkey") === col("c_custkey"), "left_semi").select("c_custkey")
      open.except(urgent).orderBy("c_custkey")
    }),

    // ----- D: aggregations ---------------------------------------------

    // D1 — group-agg first/collect_set (process_pdb_structure.py:137).
    // pandas "first" is order-dependent; canonicalized to min() here.
    RQ("d1_first_collect", Some("""
      SELECT l_orderkey, min(l_linestatus) AS first_status,
             string_agg(DISTINCT l_returnflag, '|' ORDER BY l_returnflag)
               AS flags,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""))((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_orderkey")
        .agg(min("l_linestatus").as("first_status"),
          concat_ws("|", array_sort(collect_set(col("l_returnflag")))).as("flags"),
          count(lit(1)).as("n"))
        .orderBy("l_orderkey")),

    // D2 — multi-column sum agg (process_pdb_contacts.py:379-392), exact cents
    RQ("d2_multi_sum", Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)::DOUBLE
               / CAST(count(*) AS BIGINT)::DOUBLE AS avg_qty
      FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus"""))(
      (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
          count(lit(1)).as("n"),
          (sum(col("l_quantity").cast("long")).cast("double") /
            count(lit(1)).cast("double")).as("avg_qty"))
        .orderBy("l_returnflag", "l_linestatus")),

    // D3 — grouped transform: whole-partition sum + share
    // (process_pdb_contacts.py:400-404)
    RQ("d3_group_share", Some("""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             CAST(qty AS BIGINT) AS qty, CAST(total AS BIGINT) AS total,
             qty::DOUBLE / total::DOUBLE AS share
      FROM (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
                   sum(CAST(l_quantity AS BIGINT))
                     OVER (PARTITION BY l_orderkey) AS total
            FROM lineitem)
      ORDER BY l_orderkey, l_linenumber"""))((s, dir) => {
      val base = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity").cast("long").as("qty"))
      WindowOps.withGroupShare(base, Seq("l_orderkey"), col("qty"),
          "total", "share")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // D4 — argmax-per-partition best flag (produce_neo4j_files.py:423-425,
    // the bestCognate column — ties all get "Y")
    RQ("d4_best_flag", Some("""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             CASE WHEN l_extendedprice =
                    max(l_extendedprice) OVER (PARTITION BY l_orderkey)
                  THEN 'Y' ELSE 'N' END AS best
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))((s, dir) =>
      WindowOps.argmaxFlag(t(s, dir, "lineitem"), Seq("l_orderkey"),
          col("l_extendedprice"), "best")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("best"))
        .orderBy("l_orderkey", "l_linenumber")),

    // D5 — dense group id within a partition (bm{n} numbering,
    // process_pdb_structure.py:138)
    RQ("d5_dense_id", Some("""
      SELECT l_returnflag, l_orderkey,
             CAST(dense_rank() OVER (PARTITION BY l_returnflag
                                     ORDER BY l_orderkey) AS BIGINT) AS gid
      FROM lineitem ORDER BY l_returnflag, l_orderkey, gid"""))((s, dir) =>
      WindowOps.denseGroupId(t(s, dir, "lineitem"), Seq("l_returnflag"),
          Seq("l_orderkey"), "gid")
        .select("l_returnflag", "l_orderkey", "gid")
        .orderBy("l_returnflag", "l_orderkey", "gid")),

    // D6 — distinct / dedup (get_pdb_parity.py:159)
    RQ("d6_distinct", Some("""
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus"""))((s, dir) =>
      t(s, dir, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus")),

    // D7 — count-distinct stats node (produce_neo4j_files.py:555-558)
    RQ("d7_count_distinct", Some("""
      SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
      FROM orders"""))((s, dir) =>
      t(s, dir, "orders")
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
          countDistinct(col("o_orderkey")).as("n_orders"))),

    // D16 — HLL++ approximate distinct under an error GATE: the sketch
    // value itself is engine-specific (Spark's HLL++ vs DuckDB's
    // ApproxCountDistinct use different registers), so it can never
    // hash-match an oracle — what CAN be gated exactly is the exact
    // count plus a boolean "the sketch landed within 10% relative
    // error" (rsd = 2%, so 10% is a ≥5σ bound — a deterministic pass on
    // real data, same gate discipline as v5's ANN recall). At 100 TB the
    // sketch is the point: approx_count_distinct is one mergeable
    // 4 KB register set per group — no distinct-Expand shuffle, no
    // per-key state proportional to cardinality.
    RQ("d16_hll_gate", Some("""
      SELECT o_orderpriority,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
             CAST(1 AS BIGINT) AS approx_ok
      FROM orders GROUP BY 1 ORDER BY o_orderpriority"""))((s, dir) =>
      t(s, dir, "orders").groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_exact"),
          approx_count_distinct(col("o_custkey"), 0.02).as("n_approx"))
        .select(col("o_orderpriority"), col("n_exact"),
          when(abs(col("n_approx") - col("n_exact")).cast("double")
            <= col("n_exact").cast("double") * 0.1, 1L).otherwise(0L)
            .as("approx_ok"))
        .orderBy("o_orderpriority")),

    // D17 — mergeable histogram-quantile sketch: per-group median of
    // l_extendedprice estimated from a FIXED 256-bin equi-width
    // histogram (width 512 over [0, 131072) — covers TPC-H's ~101k max
    // with headroom; the cap bin absorbs any outlier). Unlike d16's
    // engine-specific HLL registers, the sketch here is fully
    // deterministic SQL on both engines, so the ESTIMATE ITSELF
    // hash-matches the oracle; the exactness gate (estimate within one
    // bin of the true interpolated median) is computed Spark-side
    // against sort-based percentile(), oracle-side a literal 1 — the
    // d16 gate discipline. At 100 TB the sketch is the point: the
    // histogram is a 256-cell mergeable partial per group (map-side
    // combine on (group, bin)), vs an exact median's full sort /
    // per-group value buffer. Cum-sum over 256 bins per group is
    // window work on |groups|×256 rows, never on the fact table.
    RQ("d17_hist_quantile", Some("""
      WITH b AS (SELECT l_returnflag AS flag,
                        least(255, CAST(floor(l_extendedprice / 512)
                          AS BIGINT)) AS bin,
                        count(*) AS n
                 FROM lineitem GROUP BY 1, 2),
           c AS (SELECT flag, bin, n,
                        sum(n) OVER (PARTITION BY flag ORDER BY bin) AS cum,
                        sum(n) OVER (PARTITION BY flag) AS total
                 FROM b),
           pick AS (SELECT flag, CAST(max(total) AS BIGINT) AS n_rows,
                           min(bin) AS mbin
                    FROM c WHERE cum * 2 >= total GROUP BY flag)
      SELECT flag, n_rows,
             CAST((mbin + 0.5) * 512 AS DOUBLE) AS p50_est,
             CAST(1 AS BIGINT) AS within_bin
      FROM pick ORDER BY flag"""))((s, dir) => {
      val b = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          least(lit(255), floor(col("l_extendedprice") / 512)
            .cast("long")).as("bin"))
        .groupBy("flag", "bin").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("flag").orderBy("bin")
      val wg = Window.partitionBy("flag")
      val pick = b
        .withColumn("cum", sum("n").over(w))
        .withColumn("total", sum("n").over(wg))
        .filter(col("cum") * 2 >= col("total"))
        .groupBy("flag").agg(max("total").as("n_rows"),
          min("bin").as("mbin"))
      val exact = t(s, dir, "lineitem").groupBy(col("l_returnflag").as("flag"))
        .agg(expr("percentile(l_extendedprice, 0.5)").as("p50_exact"))
      pick.join(exact, "flag")
        .select(col("flag"), col("n_rows"),
          ((col("mbin") + 0.5) * 512).cast("double").as("p50_est"),
          when(abs((col("mbin") + 0.5) * 512 - col("p50_exact")) <= 512.0,
            1L).otherwise(0L).as("within_bin"))
        .orderBy("flag")
    }),

    // D9 — list-concat agg: flatten(collect_list) (get_ec_information.py:458)
    RQ("d9_flatten_agg", Some("""
      SELECT p_brand,
             array_to_string(list_sort(list_distinct(
               flatten(list(str_split(p_name,' '))))), '|') AS words
      FROM part GROUP BY p_brand ORDER BY p_brand"""))((s, dir) =>
      t(s, dir, "part").groupBy("p_brand")
        .agg(concat_ws("|", array_sort(array_distinct(
          flatten(collect_list(split(col("p_name"), " ")))))).as("words"))
        .orderBy("p_brand")),

    // D12 — rollup (the optimization SURVEY.md flags for materializing
    // hierarchy levels in one pass instead of one groupBy per level)
    RQ("d12_rollup", Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS flag,
             coalesce(l_linestatus, 'ALL') AS status,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY flag, status"""))((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy("flag", "status")),

    // D15 — GROUPING SETS: two independent one-dimension summaries in ONE
    // aggregation pass — the cross-dimensional shape ROLLUP (d12) cannot
    // express (rollup only nests prefixes). Same one-shuffle Expand-based
    // plan as d12; at scale this halves the passes over the fact table vs
    // running the two group-bys separately.
    RQ("d15_grouping_sets", Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS flag,
             coalesce(l_linestatus, 'ALL') AS status,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      ORDER BY flag, status"""))((s, dir) =>
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy("flag", "status")),

    // D11 — group-concat over sorted collect_set
    // (process_all_pdb_contacts.py:65,193)
    RQ("d11_group_concat", Some("""
      SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
             string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment)
               AS segments
      FROM customer GROUP BY 1 ORDER BY c_nationkey"""))((s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
        .agg(concat_ws("|", array_sort(collect_set(col("c_mktsegment"))))
          .as("segments"))
        .orderBy("c_nationkey")),

    // ----- F: sorts / limits / top-k ------------------------------------

    // F1 — custom-key residue sort: numeric then inscode, joined "|"
    // (process_pdb_contacts.py:41-44,407-411)
    RQ("f1_custom_sort", Some("""
      SELECT l_orderkey,
             string_agg(l_linenumber::VARCHAR || '_' || l_returnflag, '|'
                        ORDER BY l_linenumber, l_returnflag) AS residues
      FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""))((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(concat_ws("|", transform(
          array_sort(collect_list(struct(col("l_linenumber"), col("l_returnflag"),
            concat_ws("_", col("l_linenumber"), col("l_returnflag")).as("item")))),
          x => x.getField("item"))).as("residues"))
        .orderBy("l_orderkey")),

    // F2 / I4 — preference pick-one-per-group (OpenEye-first descriptor
    // selection, process_all_pdb_contacts.py:34-58)
    RQ("f2_preference_first", Some("""
      SELECT p_brand, p_partkey FROM
        (SELECT p_brand, p_partkey,
                row_number() OVER (PARTITION BY p_brand
                                   ORDER BY p_size, p_partkey) AS rn
         FROM part) WHERE rn = 1 ORDER BY p_brand"""))((s, dir) =>
      WindowOps.preferenceFirst(t(s, dir, "part"), Seq("p_brand"),
          Seq(col("p_size"), col("p_partkey")))
        .select("p_brand", "p_partkey").orderBy("p_brand")),

    // F3 — numeric sort + range-compress "1-3,5" (find_ec_ranges,
    // process_all_pdb_contacts.py:76-101)
    RQ("f3_range_compress", Some("""
      WITH d AS (SELECT DISTINCT p_brand, CAST(p_size AS BIGINT) AS v FROM part),
           i AS (SELECT p_brand, v,
                        v - row_number() OVER (PARTITION BY p_brand ORDER BY v)
                          AS grp FROM d),
           isl AS (SELECT p_brand, grp, min(v) AS lo, max(v) AS hi
                   FROM i GROUP BY 1, 2)
      SELECT p_brand,
             string_agg(CASE WHEN lo = hi THEN lo::VARCHAR
                             ELSE lo::VARCHAR || '-' || hi::VARCHAR END,
                        ',' ORDER BY lo) AS ranges
      FROM isl GROUP BY p_brand ORDER BY p_brand"""))((s, dir) =>
      WindowOps.rangeCompress(t(s, dir, "part"), "p_brand", "p_size", "ranges")
        .orderBy("p_brand")),

    // F4 — ORDER BY + LIMIT top-k (neodash_queries.yaml:79-81; Spark plans
    // TakeOrderedAndProject — no global sort)
    RQ("f4_topk", Some("""
      SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS total_cents
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))(
      (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"))),

    // F5 — sorted-collect fingerprints as group keys (dashboard
    // Combinatorial Interactions: apoc.coll.sort)
    RQ("f5_sorted_collect", Some("""
      WITH fp AS (SELECT o_custkey,
                         string_agg(o_orderpriority, '|' ORDER BY o_orderpriority)
                           AS fingerprint
                  FROM orders GROUP BY o_custkey)
      SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_customers
      FROM fp GROUP BY fingerprint ORDER BY fingerprint"""))((s, dir) =>
      t(s, dir, "orders").groupBy("o_custkey")
        .agg(concat_ws("|", array_sort(collect_list(col("o_orderpriority"))))
          .as("fingerprint"))
        .groupBy("fingerprint").agg(count(lit(1)).as("n_customers"))
        .orderBy("fingerprint")),

    // ----- G: set operations --------------------------------------------

    // G1 — UNION ALL of per-source tables (produce_neo4j_files.py:113,133)
    RQ("g1_union_all", Some("""
      SELECT src, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
      FROM (SELECT 'customer' AS src, c_acctbal AS acctbal FROM customer
            UNION ALL
            SELECT 'supplier' AS src, s_acctbal AS acctbal FROM supplier)
      GROUP BY src ORDER BY src"""))((s, dir) => {
      val c = t(s, dir, "customer")
        .select(lit("customer").as("src"), col("c_acctbal").as("acctbal"))
      val su = t(s, dir, "supplier")
        .select(lit("supplier").as("src"), col("s_acctbal").as("acctbal"))
      c.unionByName(su).groupBy("src")
        .agg(count(lit(1)).as("n"), sum(cents(col("acctbal"))).as("bal_cents"))
        .orderBy("src")
    }),

    // G2 — UNION distinct (neodash_queries.yaml:7-29)
    RQ("g2_union_distinct", Some("""
      SELECT CAST(k AS BIGINT) AS k FROM
        (SELECT c_nationkey AS k FROM customer
         UNION SELECT s_nationkey AS k FROM supplier)
      ORDER BY k"""))((s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").cast("long").as("k"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").cast("long").as("k")))
        .distinct().orderBy("k")),

    // G3 — INTERSECT on key sets (apoc.coll.intersection, Compare Domains)
    RQ("g3_intersect", Some("""
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      ORDER BY l_partkey"""))((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_returnflag") === "R").select("l_partkey")
        .intersect(li.filter(col("l_returnflag") === "A").select("l_partkey"))
        .orderBy("l_partkey")
    }),

    // G4 — EXCEPT on key sets (apoc.coll.subtract)
    RQ("g4_except", Some("""
      SELECT l_partkey FROM lineitem WHERE l_quantity >= 45
      EXCEPT
      SELECT l_partkey FROM lineitem WHERE l_quantity <= 5
      ORDER BY l_partkey"""))((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_quantity") >= 45).select("l_partkey")
        .except(li.filter(col("l_quantity") <= 5).select("l_partkey"))
        .orderBy("l_partkey")
    }),

    // ----- H: scalar function families ----------------------------------

    // H1 — string strip/replace/case family (process_pdb_structure.py:57,
    // produce_neo4j_files.py:186-189)
    RQ("h1_string_funcs", Some("""
      SELECT p_partkey, upper(p_brand) AS ub, lower(p_type) AS lt,
             replace(p_brand, '#', '_') AS rb,
             regexp_replace(p_name, '[aeiou]', '', 'g') AS devow,
             substr(p_name, 1, 3) AS pre,
             CAST(length(p_name) AS BIGINT) AS ln
      FROM part ORDER BY p_partkey"""))((s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
          upper(col("p_brand")).as("ub"), lower(col("p_type")).as("lt"),
          regexp_replace(col("p_brand"), "#", "_").as("rb"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("devow"),
          substring(col("p_name"), 1, 3).as("pre"),
          length(col("p_name")).cast("long").as("ln"))
        .orderBy("p_partkey")),

    // H2 — regex extract (process_all_pdb_contacts.py:288-290)
    RQ("h2_regex_extract", Some("""
      SELECT p_partkey, regexp_extract(p_brand, '#(\d+)', 1) AS brandnum,
             regexp_extract(p_name, '^(\w+)', 1) AS firstword
      FROM part ORDER BY p_partkey"""))((s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
          regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brandnum"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("firstword"))
        .orderBy("p_partkey")),

    // H3 — split + explode word histogram (UNWIND, neodash_queries.yaml:50)
    RQ("h3_split_explode", Some("""
      SELECT tok, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest(str_split(p_name, ' ')) AS tok FROM part)
      GROUP BY tok ORDER BY tok"""))((s, dir) =>
      t(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy("tok")),

    // H4 — numeric range expansion (pattern_to_range,
    // process_pdb_structure.py:12-14): sequence + explode
    RQ("h4_sequence_expand", Some("""
      SELECT l_orderkey, unnest(range(1, mx + 1)) AS i
      FROM (SELECT l_orderkey, max(l_linenumber) AS mx FROM lineitem
            GROUP BY l_orderkey)
      ORDER BY l_orderkey, i"""))((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_orderkey").agg(max("l_linenumber").as("mx"))
        .select(col("l_orderkey"), explode(sequence(lit(1), col("mx"))).as("i0"))
        .select(col("l_orderkey"), col("i0").cast("long").as("i"))
        .orderBy("l_orderkey", "i")),

    // H5 — nested conditional classifier (ownership thresholds,
    // process_pdb_contacts.py:59-78): share-of-order bands
    RQ("h5_classifier", Some("""
      WITH sh AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT)::DOUBLE /
                    sum(CAST(l_quantity AS BIGINT))
                      OVER (PARTITION BY l_orderkey)::DOUBLE AS share
                  FROM lineitem)
      SELECT l_returnflag,
             CASE WHEN share > 0.9 THEN 'exclusive'
                  WHEN share > 0.5 THEN 'dominant'
                  WHEN share > 0.1 THEN 'partner'
                  ELSE 'minor' END AS band,
             CAST(count(*) AS BIGINT) AS n
      FROM sh GROUP BY 1, 2 ORDER BY l_returnflag, band"""))((s, dir) => {
      val w = Window.partitionBy("l_orderkey")
      t(s, dir, "lineitem")
        .withColumn("share", col("l_quantity").cast("long").cast("double") /
          sum(col("l_quantity").cast("long")).over(w).cast("double"))
        .withColumn("band", graft.graph.GraphTables.ownershipBand(col("share")))
        .groupBy("l_returnflag", "band").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag", "band")
    }),

    // H6 — math / round family (neodash_queries.yaml:70 round(x,4)*100)
    RQ("h6_math_round", Some("""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
             round(l_tax, 1) AS tax_r
      FROM lineitem WHERE l_orderkey <= 1000
      ORDER BY l_orderkey, l_linenumber"""))((s, dir) =>
      t(s, dir, "lineitem").filter(col("l_orderkey") <= 1000)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          round(col("l_discount") * 100).cast("long").as("disc_pct"),
          round(col("l_tax"), 1).as("tax_r"))
        .orderBy("l_orderkey", "l_linenumber"))
,
    // D13 — PIVOT: per order priority, quantity totals spread into one
    // column per return flag (the wide-format report shape). Spark's
    // pivot with an EXPLICIT value list stays a single hash aggregation
    // (no second pass to discover values — at 100 TB the value list must
    // always be declared). Oracle: portable CASE-based conditional sums.
    RQ("d13_pivot", Some("""
      SELECT o_orderpriority,
             CAST(sum(CASE WHEN l_returnflag = 'A'
                           THEN CAST(floor(l_quantity) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS qty_a,
             CAST(sum(CASE WHEN l_returnflag = 'N'
                           THEN CAST(floor(l_quantity) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS qty_n,
             CAST(sum(CASE WHEN l_returnflag = 'R'
                           THEN CAST(floor(l_quantity) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS qty_r
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY o_orderpriority"""))((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(floor(col("l_quantity")).cast("long")))
        .select(col("o_orderpriority"),
          coalesce(col("A"), lit(0L)).as("qty_a"),
          coalesce(col("N"), lit(0L)).as("qty_n"),
          coalesce(col("R"), lit(0L)).as("qty_r"))
        .orderBy("o_orderpriority")),

    // D14 — UNPIVOT (melt to long format, the inverse of d13): each part
    // row becomes one (metric, val) row per measure via the codegen'd
    // stack() generator — a width-bounded explode, no shuffle at all
    // before the output sort. Oracle: the portable UNION ALL form.
    RQ("d14_unpivot", Some("""
      SELECT p_partkey, 'retail_cents' AS metric,
             CAST(round(p_retailprice*100) AS BIGINT) AS val FROM part
      UNION ALL
      SELECT p_partkey, 'size' AS metric, CAST(p_size AS BIGINT) AS val
      FROM part
      ORDER BY p_partkey, metric"""))((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), expr(
          """stack(2,
               'retail_cents', CAST(round(p_retailprice*100) AS BIGINT),
               'size', CAST(p_size AS BIGINT)) AS (metric, val)"""))
        .orderBy("p_partkey", "metric")),

    // C17 — interval (range) join, bucket-decomposed: each supplier owns
    // the balance interval [acctbal-100, acctbal+100]; count the
    // customers whose balance falls inside. The scale path for a
    // LARGE × LARGE range join is to map each interval to the fixed-width
    // buckets it spans (width 200 → at most 2 buckets per interval) and
    // each point to its one bucket, equi-join on the bucket key, then
    // post-filter the exact range — a shuffle join on an integer key
    // instead of a nested-loop theta join. (Broadcast handles the
    // small-dim case; this is the shape for when neither side fits.)
    // Everything runs in integer cents OFFSET POSITIVE (+110k, so interval lows stay positive too) because
    // Spark's `div` truncates toward zero while DuckDB's `//` floors —
    // equal only for non-negative operands; a (interval, bucket) pair is
    // unique, so the equi-join introduces no duplicate matches.
    RQ("c17_interval_join", Some("""
      WITH sup AS (SELECT s_suppkey,
                          CAST(round(s_acctbal*100) AS BIGINT) + 110000
                            AS bc
                   FROM supplier),
           cust AS (SELECT CAST(round(c_acctbal*100) AS BIGINT) + 110000
                             AS cc
                    FROM customer)
      SELECT s_suppkey, CAST(count(cust.cc) AS BIGINT) AS n_in_range
      FROM sup LEFT JOIN cust
        ON cust.cc >= sup.bc - 10000 AND cust.cc <= sup.bc + 10000
      GROUP BY 1 ORDER BY s_suppkey"""))((s, dir) => {
      val W = 20000L // bucket width = interval width (cents): ≤ 2 buckets
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"),
          (round(col("s_acctbal") * 100).cast("long") + 110000L).as("bc"))
        .select(col("s_suppkey"), col("bc"),
          (col("bc") - 10000L).as("lo"), (col("bc") + 10000L).as("hi"))
        .select(col("s_suppkey"), col("lo"), col("hi"),
          explode(sequence(expr(s"lo div $W"), expr(s"hi div $W")))
            .as("bkt"))
      val cust = t(s, dir, "customer")
        .select((round(col("c_acctbal") * 100).cast("long") + 110000L)
          .as("cc"))
        .select(col("cc"), expr(s"cc div $W").as("bkt"))
      sup.join(cust, Seq("bkt"), "left")
        .withColumn("hit",
          when(col("cc").isNotNull &&
            col("cc") >= col("lo") && col("cc") <= col("hi"), 1L)
            .otherwise(0L))
        .groupBy("s_suppkey")
        // a supplier spans 2 buckets → 2 left rows even with no match;
        // summing hit (not counting rows) keeps the zero-count exact
        .agg(sum("hit").as("n_in_range"))
        .orderBy("s_suppkey")
    }),

    // C18 — blocked fuzzy-match self-join (entity resolution / record
    // linkage): near-identical catalog names found by edit distance ≤ 4,
    // with candidates BLOCKED on a stable token (the name's noun) so the
    // pair space is Σ block² over distinct NAMES — never all-pairs, and
    // never the occurrence table (occurrences join back by name, the
    // same distinct-key discipline as the similarity registry). At
    // production block sizes use Spark's 3-arg levenshtein(a, b, k)
    // (early-exits the DP once k is exceeded, returns -1) — here the
    // 2-arg form keeps the expression bit-identical to the DuckDB
    // oracle's levenshtein.
    RQ("c18_fuzzy_link", Some("""
      WITH n AS (SELECT DISTINCT p_name FROM part),
           t AS (SELECT p_name, str_split(p_name, ' ')[2] AS noun FROM n)
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      FROM t a JOIN t b ON a.noun = b.noun AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 4
      ORDER BY name_a, name_b"""))((s, dir) => {
      val n = t(s, dir, "part").select(col("p_name")).distinct()
        // get() (0-based, null on out-of-bounds) — a single-token name
        // yields noun NULL and drops out of the equi-join, exactly the
        // oracle's str_split[2]=NULL semantics; element_at would THROW
        // under ANSI mode instead
        .withColumn("noun", get(split(col("p_name"), " "), lit(1)))
      val a = n.select(col("p_name").as("name_a"), col("noun"))
      val b = n.select(col("p_name").as("name_b"), col("noun"))
      a.join(b, Seq("noun")).filter(col("name_a") < col("name_b"))
        .withColumn("dist",
          levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("dist") <= 4)
        .select("name_a", "name_b", "dist")
        .orderBy("name_a", "name_b")
    })
  )
}
