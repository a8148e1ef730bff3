package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.CachedData

/** Access to the session CacheManager's entry list for cache hygiene
  * (graft.CacheHygiene): `Dataset.persist` registers a (logical plan →
  * InMemoryRelation) entry there, and unpersisting only the underlying
  * RDD (all a `SparkContext.getPersistentRDDs` sweep can reach) leaves
  * the entry behind — the catalog grows monotonically across a long
  * session, and a swept-but-still-registered plan silently recomputes
  * through its InMemoryRelation on every later action WITHOUT re-caching
  * (columnar encode each time, no reuse — slower than no cache at all).
  *
  * The entry list itself is `private` in CacheManager (no accessor at any
  * visibility), so enumeration goes through one reflective call to the
  * private `cachedData()` accessor; eviction then uses the PUBLIC
  * `uncacheQuery(session, plan, cascade)` API, which removes the entry
  * and its blocks together. Confined to the graftx bridge package with
  * GraftPlanBridge — the one place the engine touches Spark internals.
  */
object GraftCacheBridge {

  private val cachedDataAccessor = {
    val m = classOf[org.apache.spark.sql.execution.CacheManager]
      .getDeclaredMethod("cachedData")
    m.setAccessible(true)
    m
  }

  /** Every CacheManager entry as (logical plan, column-buffer RDD id if
    * the cache has materialized). An unmaterialized entry has no blocks
    * yet, so its id is None.
    */
  def entries(s: SparkSession): Seq[(LogicalPlan, Option[Int])] = {
    val cs = s.asInstanceOf[classic.SparkSession]
    cachedDataAccessor.invoke(cs.sharedState.cacheManager)
      .asInstanceOf[IndexedSeq[CachedData]]
      .map { cd =>
        val b = cd.cachedRepresentation.cacheBuilder
        val id = if (b.isCachedColumnBuffersLoaded)
          Some(b.cachedColumnBuffers.id) else None
        (cd.plan, id)
      }
  }

  /** Drop one entry (blocks + catalog entry, non-cascading): the public
    * uncache path `Dataset.unpersist` itself uses.
    */
  def uncache(s: SparkSession, plan: LogicalPlan,
              blocking: Boolean = false): Unit = {
    val cs = s.asInstanceOf[classic.SparkSession]
    cs.sharedState.cacheManager
      .uncacheQuery(cs, plan, cascade = false, blocking = blocking)
  }

  /** Storage residency of a persisted DataFrame: Some(cached partitions /
    * total partitions) of its column-buffer RDD, None when the plan has no
    * CacheManager entry or the buffers never materialized. 1.0 = every
    * partition is storage-resident (memory or disk — either serves reads
    * without recomputing the lineage); < 1.0 = the missing partitions
    * recompute through the full lineage on the next action, silently.
    * This is the registry-residency CANARY the r11 bench lacked: the
    * driver's domainCognate/p2/etl3 blowups all fit "a registry input
    * lost residency and every consumer recomputed", but no artifact field
    * could confirm residency at the moment the timed section started.
    */
  def residency(s: SparkSession, df: org.apache.spark.sql.DataFrame)
      : Option[Double] = {
    val cs = s.asInstanceOf[classic.SparkSession]
    val ds = df.asInstanceOf[classic.Dataset[_]]
    cs.sharedState.cacheManager.lookupCachedData(ds).flatMap { cd =>
      val b = cd.cachedRepresentation.cacheBuilder
      if (!b.isCachedColumnBuffersLoaded) None
      else {
        val id = b.cachedColumnBuffers.id
        // getRDDStorageInfo omits RDDs with zero cached blocks — loaded
        // buffers absent from it mean "every partition dropped", not
        // "never cached": report 0.0, the strongest canary signal
        Some(s.sparkContext.getRDDStorageInfo.find(_.id == id).map { info =>
          if (info.numPartitions == 0) 1.0
          else info.numCachedPartitions.toDouble / info.numPartitions
        }.getOrElse(0.0))
      }
    }
  }

  /** Whether the plan has a CacheManager entry at all — materialized or
    * not. Distinguishes the two cases [[residency]] collapses to None:
    * "caller persisted but buffers never loaded" (entry present — a
    * count() materializes INTO the caller's entry) vs "never persisted"
    * (no entry — the consumer must persist for itself). ExportStage's
    * input-residency gate needs the distinction (ADVICE r12): treating a
    * cached-but-unmaterialized registry table as uncached would persist
    * AND RELEASE it in the stage's finally, silently removing the
    * caller's cache entry so every later consumer recomputes lineage.
    */
  def hasCacheEntry(s: SparkSession, df: org.apache.spark.sql.DataFrame)
      : Boolean = {
    val cs = s.asInstanceOf[classic.SparkSession]
    cs.sharedState.cacheManager
      .lookupCachedData(df.asInstanceOf[classic.Dataset[_]]).isDefined
  }

  /** Wait until the async listener bus has delivered every posted event
    * (`SparkContext.listenerBus` is `private[spark]`, reachable from this
    * bridge package). The bench samples its block-telemetry counters
    * around measured regions; without a drain, block-removal events from
    * an immediately-preceding sweep are still in flight and get charged
    * to the NEXT query's eviction delta. Returns false on timeout (bus
    * still busy) — callers sample anyway; attribution degrades to the
    * undrained behavior rather than failing the run.
    */
  def drainListenerBus(s: SparkSession, timeoutMs: Long = 10000L): Boolean =
    try { s.sparkContext.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
