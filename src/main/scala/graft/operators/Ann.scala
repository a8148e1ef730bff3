package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosine, dot, norm, rpLshBucket}

/** Approximate-nearest-neighbor search as reusable operators over an
  * `(id, embedding array<float>)` table. Three strategies, all
  * oracle-checked by the v1/v2/v4 queries.
  *
  * Cache ownership: the bucketed projection is persisted because the
  * returned plan consumes it from both sides of the pair join; the blocks
  * are MEMORY_AND_DISK and LRU-evictable, but the CacheManager entry
  * lives until the session ends — cleanup after the consuming action is
  * the caller's job (the same note applies to MinHashDedup's shingle
  * table). The all-queries mains honor the contract via
  * graft.CacheHygiene.sweep between query families; a long-lived user
  * session should unpersist or `spark.catalog.clearCache()` likewise.
  *
  * Strategies:
  *
  *  - brute: exact, broadcast the (small) query set — N×Q work;
  *  - LSH: random-hyperplane bucket equi-join — Σ bucket² work;
  *  - threshold pairs: LSH buckets + exact cosine verify (dedup shape).
  */
object Ann {

  /** Exact top-k: every query vector against all candidates. `queries`
    * must be broadcast-sized (it is sent to every executor).
    */
  def bruteTopK(emb: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val n = emb.select(col(idCol).as("n_id"), col(vecCol).as("nv"))
    n.crossJoin(broadcast(q)).filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
      // a zero-norm vector's cosine is null (cosine's nullif guard); it
      // must drop out of the RANKING too, not just threshold filters —
      // unfiltered, null rows would fill top-k slots for queries with
      // fewer than k real matches
      .filter(col("cos").isNotNull)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk").cast("long").as("rnk"),
        col("cos"))
  }

  /** LSH nearest neighbor: RP-bucket every vector, search within the
    * bucket only; returns each vector's top-1 bucket-mate.
    *
    * Norms are computed ONCE per vector before the pair join (the join
    * multiplies row counts; norm(q)*norm(n) recomputed per pair would
    * triple the hot-loop HOF work). `dot/(na*nb)` evaluates the exact
    * same IEEE-754 sequence as `cosine(a,b)` — oracle values unchanged.
    */
  def lshNearest(emb: DataFrame, idCol: String, vecCol: String,
                 planes: Int): DataFrame = {
    val b = emb.select(col(idCol).as("vid"), col(vecCol).as("v"),
      rpLshBucket(col(vecCol), planes).as("bucket"),
      norm(col(vecCol)).as("nrm")).persist()
    val a = b.select(col("vid").as("q_id"), col("v").as("qv"),
      col("bucket"), col("nrm").as("qn"))
    val c = b.select(col("vid").as("n_id"), col("v").as("nv"),
      col("bucket"), col("nrm").as("nn"))
    a.join(c, Seq("bucket")).filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", dot(col("qv"), col("nv")) / nullif(col("qn") * col("nn"), lit(0.0)))
      // null-cos rows (zero-norm query or mate) must not surface as a
      // "nearest neighbor" when a bucket holds only degenerate mates —
      // the null drops out of the ranking, same rule as bruteTopK
      .filter(col("cos").isNotNull)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))))
      .filter(col("rnk") === 1)
      .select(col("q_id"), col("n_id"), col("bucket"), col("cos"))
  }

  /** Near-duplicate pairs by embedding cosine: LSH-bucketed candidates,
    * exact verify at `threshold` — never all-pairs. Norms precomputed
    * per vector (see lshNearest).
    */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         planes: Int, threshold: Double): DataFrame = {
    val b = emb.select(col(idCol).as("vid"), col(vecCol).as("v"),
      rpLshBucket(col(vecCol), planes).as("bucket"),
      norm(col(vecCol)).as("nrm")).persist()
    val a = b.select(col("vid").as("vec_a"), col("v").as("av"),
      col("bucket"), col("nrm").as("an"))
    val c = b.select(col("vid").as("vec_b"), col("v").as("bv"),
      col("bucket"), col("nrm").as("bn"))
    a.join(c, Seq("bucket")).filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", dot(col("av"), col("bv")) / nullif(col("an") * col("bn"), lit(0.0)))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
  }
}
