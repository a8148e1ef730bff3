package graft.queries

import graft.RQ
import graft.graph.GraphAnalytics

/** GraphX whole-graph analytics under the oracle gate. GraphX's
  * connectedComponents labels every component with its minimum vertex id,
  * which a recursive min-label-propagation CTE reproduces exactly in
  * DuckDB (dimension-sized graph: suppliers).
  */
object GraphQueryDefs {

  val defs: Seq[RQ] = Seq(

    RQ("x1_graph_components", Some("""
      WITH RECURSIVE
      pairs AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
                FROM lineitem),
      e0 AS (SELECT a.sk AS s1, b.sk AS s2
             FROM pairs a JOIN pairs b ON a.pk = b.pk AND a.sk < b.sk),
      edges AS (SELECT DISTINCT s1, s2 FROM e0
                UNION SELECT DISTINCT s2, s1 FROM e0),
      nodes AS (SELECT DISTINCT sk FROM pairs),
      reach(node, lab) AS (
        SELECT sk, sk FROM nodes
        UNION
        SELECT e.s2, r.lab FROM reach r JOIN edges e ON e.s1 = r.node)
      SELECT node AS suppkey, CAST(min(lab) AS BIGINT) AS component
      FROM reach GROUP BY node ORDER BY suppkey"""))((s, dir) =>
      GraphAnalytics.coBindingComponents(s, dir)),

    RQ("x2_promiscuity_degrees", Some("""
      SELECT l_partkey AS p_partkey,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_domains
      FROM lineitem GROUP BY 1 ORDER BY p_partkey"""))((s, dir) =>
      GraphAnalytics.ligandPromiscuity(s, dir))
  )
}
