package graft.operators

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.shingles

/** MinHash-LSH near-duplicate detection as a reusable operator: shingle →
  * k-seed signature → banded buckets → candidate pairs within buckets only
  * → exact-Jaccard verify. Candidate generation is an equi-join on
  * (band, band-hash) — cost ~ Σ bucket², never N² — which is the only
  * shape that survives 100 TB (the t6 oracle checks this implementation
  * value-for-value against DuckDB).
  */
object MinHashDedup {

  /** @param docs      input with an id column and a text column
    * @param idCol     unique document id (orderable)
    * @param textCol   whitespace-tokenizable text
    * @param n         shingle width (words)
    * @param seeds     number of minhash seeds (signature length)
    * @param rowsPerBand seeds per band; bands = seeds / rowsPerBand
    * @param threshold exact-Jaccard acceptance cutoff
    * @return (doc_a, doc_b, jacc) near-duplicate pairs, doc_a < doc_b
    */
  def nearDuplicatePairs(docs: DataFrame, idCol: String, textCol: String,
                         n: Int = 3, seeds: Int = 8, rowsPerBand: Int = 2,
                         threshold: Double = 0.8): DataFrame = {
    // sh feeds the signature, both sides of the intersection join, and
    // the per-doc counts — persist instead of re-shingling four times
    val sh = shingleRows(docs, idCol, textCol, n).persist()
    val band = bandRows(sh, seeds, rowsPerBand)
    val bandA = band.select(col("doc_id").as("da"), col("b"), col("bh"))
    val bandB = band.select(col("doc_id").as("db"), col("b"), col("bh"))
    val cand = bandA.join(bandB, Seq("b", "bh"))
      .filter(col("da") < col("db")).select("da", "db").distinct()
    verifyPairs(cand, sh, threshold)
  }

  /** Stage 1 — (doc_id, s) distinct n-gram shingle rows. */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(shingles(col("w"), n)).as("s"))

  /** Stage 2 — (doc_id, b, bh) LSH band-hash rows. All k minhashes in ONE
    * aggregation pass: k `min` terms over the same shingle rows,
    * partial-aggregated map-side — no k× row explosion, no (doc_id, seed)
    * shuffle, no second groupBy for the bands (band hashes are plain
    * column concats of the signature row, exploded shuffle-free).
    * ONE definition of the seed-hash scheme: TextFunctions.minhashAgg
    * (changing the scheme there and here separately would silently
    * diverge the operator from the tested expression).
    */
  def bandRows(sh: DataFrame, seeds: Int = 8,
               rowsPerBand: Int = 2): DataFrame = {
    require(seeds % rowsPerBand == 0,
      s"seeds ($seeds) must be a multiple of rowsPerBand ($rowsPerBand) — " +
        "a trailing partial band would silently change recall")
    val minTerms = (0 until seeds).map { k =>
      graft.functions.TextFunctions.minhashAgg(col("s"), k).as(s"mh$k")
    }
    val sig = sh.groupBy("doc_id").agg(minTerms.head, minTerms.tail: _*)
    val nBands = seeds / rowsPerBand
    val bandStructs = (0 until nBands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(k => col(s"mh$k"))
      struct(lit(b.toLong).as("b"), concat(cols: _*).as("bh"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("x"))
      .select(col("doc_id"), col("x.b").as("b"), col("x.bh").as("bh"))
  }

  /** Stage 3 — exact-Jaccard verification of candidate (da, db) pairs
    * against shingle rows; keeps pairs at or above `threshold` as
    * (doc_a, doc_b, jacc). Jaccard depends only on the two docs' static
    * shingle sets, so the verdict is the same whether candidates arrive
    * from a batch self-join or an incremental index probe.
    */
  def verifyPairs(cand: DataFrame, sh: DataFrame,
                  threshold: Double): DataFrame = {
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shA = sh.select(col("doc_id").as("da"), col("s"))
    val shB = sh.select(col("doc_id").as("db"), col("s"))
    val inter = cand.join(shA, "da").join(shB, Seq("db", "s"))
      .groupBy("da", "db").agg(count(lit(1)).as("i"))
    inter
      .join(cnt.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(cnt.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .withColumn("jacc",
        col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
      .filter(col("jacc") >= threshold)
      .select(col("da").as("doc_a"), col("db").as("doc_b"), col("jacc"))
  }

  /** Collapse near-duplicate pairs into clusters and pick a canonical
    * representative per cluster (the minimum doc id — GraphX
    * connectedComponents' label), returning (doc_id, canonical) for every
    * doc that appears in a pair. Dropping rows where doc_id != canonical
    * is the final dedup action.
    */
  def canonicalize(pairs: DataFrame): DataFrame = {
    // GraphX vertex ids are Long — enforce the contract loudly instead of
    // an ANSI cast error (string doc ids must be mapped to longs first)
    import org.apache.spark.sql.types.{IntegerType, LongType}
    require(Seq("doc_a", "doc_b").forall(c =>
      Seq(LongType, IntegerType).contains(pairs.schema(c).dataType)),
      "canonicalize requires integral doc ids (GraphX vertex ids); " +
        "map string ids to longs first")
    val s = pairs.sparkSession
    val edges = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val cc = Graph.fromEdges(edges, ()).connectedComponents().vertices
    s.createDataFrame(cc.map { case (id, comp) => (id, comp) })
      .toDF("doc_id", "canonical")
  }
}
