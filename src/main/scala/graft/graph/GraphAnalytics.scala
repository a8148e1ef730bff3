package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Whole-graph analytics on GraphX (BASELINE.json: "GraphX for analytics
  * queries"). Interactive traversals stay DataFrame joins (bounded-depth
  * patterns, §2.C); GraphX is reserved for genuinely global computations:
  * connected components and degree distributions.
  */
object GraphAnalytics {

  /** Connected components of the supplier co-binding graph: suppliers are
    * linked when they supply the same part (≈ domains co-binding the same
    * ligand). GraphX labels every component with its minimum vertex id —
    * deterministic, so oracle-checkable via a recursive min-label CTE.
    */
  def coBindingComponents(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val pairs = li.select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct()
    val a = pairs.select(col("pk"), col("sk").as("s1"))
    val b = pairs.select(col("pk"), col("sk").as("s2"))
    val edgesDf = a.join(b, "pk").filter(col("s1") < col("s2"))
      .select("s1", "s2").distinct()

    val vertices = pairs.select(col("sk")).distinct()
      .rdd.map(r => (r.getLong(0), ()))
    val edges = edgesDf.rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val graph = Graph(vertices, edges)
    val cc = graph.connectedComponents().vertices

    s.createDataFrame(cc.map { case (id, comp) => (id, comp) })
      .toDF("suppkey", "component")
      .orderBy("suppkey")
  }

  /** Degree statistics — ligand promiscuity: for each part (ligand), the
    * number of distinct suppliers (domains) binding it, computed from
    * GraphX degrees on the bipartite contact graph.
    */
  def ligandPromiscuity(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val pairs = li.select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct()
    // bipartite ids: parts in positive space, suppliers offset negative
    val edges = pairs.rdd.map(r => Edge(r.getLong(0), -1L - r.getLong(1), ()))
    val graph = Graph.fromEdges(edges, ())
    val degs = graph.degrees.filter(_._1 >= 0) // part side only
    s.createDataFrame(degs.map { case (id, d) => (id, d.toLong) })
      .toDF("p_partkey", "n_domains")
      .orderBy("p_partkey")
  }
}
