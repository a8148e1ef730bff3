package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.GraftCacheBridge

import graft.{CacheHygiene, SparkSpec, StorageTelemetry}

/** The bench-attribution machinery under test: the round-8 spike-cause
  * analysis leans entirely on these three pieces — the block-update
  * telemetry (what the artifact reports), the between-family sweeps
  * (what keeps a 161-query session from accumulating state), and the
  * install-once fixture policy (what keeps fixture writes out of timed
  * regions). Each has a failure mode that silently corrupts attribution
  * rather than failing a query, so they get direct specs.
  */
class BenchHygieneSpec extends SparkSpec {

  private def drain(): Unit = GraftCacheBridge.drainListenerBus(spark)

  describe("StorageTelemetry") {

    it("reports live persisted caches as storage bytes (listener integration)") {
      val t = new StorageTelemetry
      spark.sparkContext.addSparkListener(t)
      try {
        val df = spark.range(200000).select(col("id"),
          (col("id") % 97).as("k")).persist()
        df.queryExecution.toRdd.count()
        drain()
        assert(t.currentBytes > 0, "materialized caches report no storage bytes")
        assert(t.highWaterBytes >= t.currentBytes)
        df.unpersist(blocking = true)
      } finally spark.sparkContext.removeSparkListener(t)
    }

    it("counts memory-residency loss (LRU drop / disk demotion), restricted to the designated baseline — via synthetic block events") {
      // NOTE (empirically pinned by the integration test above +
      // removal behavior): plain unpersist does NOT arrive as a
      // block-update, only real storage transitions do (LRU drop,
      // MEMORY_AND_DISK demotion) — which is exactly the "registry lost
      // memory residency" signal the bench wants; sweeps' unpersists
      // never pollute the per-query deltas. Synthetic events let the
      // eviction-transition logic be tested deterministically, since a
      // genuine LRU drop needs real memory pressure.
      import org.apache.spark.sql.graftx.BlockEvents
      import org.apache.spark.storage.StorageLevel
      val t = new StorageTelemetry
      def ev(rddId: Int, part: Int, level: StorageLevel, mem: Long) =
        t.onBlockUpdated(BlockEvents.updated(rddId, part, level, mem))
      t.setBaseline(Set(7))
      ev(7, 0, StorageLevel.MEMORY_AND_DISK, 1000L) // registry block
      ev(9, 0, StorageLevel.MEMORY_AND_DISK, 500L)  // operator cache
      assert(t.currentBytes === 1500L && t.highWaterBytes === 1500L)
      ev(9, 0, StorageLevel.DISK_ONLY, 0L) // demotion: memory lost
      assert(t.evicted === 1L && t.baselineEvicted === 0L,
        "non-baseline demotion charged to the baseline counter")
      assert(t.currentBytes === 1000L)
      ev(7, 0, StorageLevel.NONE, 0L) // LRU drop of the registry block
      assert(t.evicted === 2L && t.baselineEvicted === 1L,
        "registry block's residency loss not counted against the baseline")
      assert(t.currentBytes === 0L && t.highWaterBytes === 1500L)
      // re-persist after a refresh: same block id regains memory —
      // counted as bytes again, not as another eviction
      ev(7, 0, StorageLevel.MEMORY_AND_DISK, 1000L)
      assert(t.evicted === 2L && t.currentBytes === 1000L)
    }

    it("attributes executor run-time per warm: job group (the warmup_run map)") {
      // The r11 warmup attribution: per-table WALLS overlap under the
      // concurrent registry build, so the artifact's coherent per-table
      // numbers are executor run-ms keyed by the warm:<table> job group
      // set around each materialization. Tag two jobs under different
      // groups and one untagged; only the tagged groups appear, each
      // with positive run-time.
      val t = new StorageTelemetry
      spark.sparkContext.addSparkListener(t)
      try {
        spark.sparkContext.setJobGroup("warm:tblA", "a", false)
        spark.range(500000).selectExpr("sum(id * id)")
          .queryExecution.toRdd.count()
        spark.sparkContext.setJobGroup("warm:tblB", "b", false)
        spark.range(500000).groupBy(expr("id % 1000")).count()
          .queryExecution.toRdd.count()
        spark.sparkContext.clearJobGroup()
        spark.range(1000).selectExpr("sum(id)")
          .queryExecution.toRdd.count() // untagged — must not register
        drain()
        val g = t.warmGroupRunMs
        assert(g.keySet === Set("tblA", "tblB"),
          s"expected exactly the two warm groups, got ${g.keySet}")
        assert(g.values.forall(_ >= 0L))
        assert(g.values.sum > 0L,
          "tagged jobs accumulated no executor run-time")
      } finally {
        spark.sparkContext.clearJobGroup()
        spark.sparkContext.removeSparkListener(t)
      }
    }
  }

  describe("CacheHygiene") {

    it("sweep drops post-baseline caches AND their CacheManager entries, keeps the baseline") {
      val keep = spark.range(50000).select((col("id") * 2).as("v")).persist()
      keep.queryExecution.toRdd.count()
      val baseline = CacheHygiene.snapshot(spark.sparkContext)
      val drop = spark.range(50000).select((col("id") * 3).as("w")).persist()
      drop.queryExecution.toRdd.count()
      val entriesBefore = GraftCacheBridge.entries(spark).size
      CacheHygiene.sweep(spark, baseline, blocking = true)
      drain()
      val persistedAfter = spark.sparkContext.getPersistentRDDs.keySet
      assert(baseline.subsetOf(persistedAfter),
        "sweep evicted a baseline (registry) table")
      assert(GraftCacheBridge.entries(spark).size < entriesBefore,
        "sweep left the swept plan's CacheManager ENTRY behind — later " +
          "matching plans would silently recompute through a dead " +
          "InMemoryRelation without re-caching")
      keep.unpersist(blocking = true)
    }

    it("family groups by letter prefix; familyContiguous regroups without reordering within a family") {
      assert(CacheHygiene.family("t9_dedup_clusters") === "t")
      assert(CacheHygiene.family("etl2_flat_export") === "etl")
      assert(CacheHygiene.family("p15_promiscuity_any") === "p")
      val in = Seq("t1_a", "j4_x", "t2_b", "p1_c", "j6_y", "t3_d")
      val out = CacheHygiene.familyContiguous(in)(identity)
      assert(out === Seq("t1_a", "t2_b", "t3_d", "j4_x", "j6_y", "p1_c"))
    }
  }

  describe("Fixtures.installDir") {

    // unique namespace per run so per-JVM memoization can't leak state
    // between test executions of the same suite
    val ns = s"benchhygiene_${System.nanoTime()}"

    def install(name: String, fp: String,
                writes: java.util.concurrent.atomic.AtomicInteger): String =
      Fixtures.installDir(ns, name, fp) { tmp =>
        val d = new java.io.File(tmp)
        d.mkdirs()
        java.nio.file.Files.writeString(
          java.nio.file.Path.of(tmp, "_SUCCESS"), "")
        writes.incrementAndGet(): Unit
      }

    it("writes once, installs atomically, and memoizes the resolved path for the JVM") {
      val writes = new java.util.concurrent.atomic.AtomicInteger(0)
      val p1 = install("fxa", "fp1", writes)
      val p2 = install("fxa", "fp1", writes)
      assert(p1 === p2)
      assert(writes.get() === 1,
        "second call re-paid the fixture write — in Bench that write " +
          "lands inside the measured region")
      assert(new java.io.File(s"$p1/_SUCCESS").exists())
    }

    it("heals a cold no-_SUCCESS wreck instead of reading it") {
      val root = new java.io.File(s"/tmp/graft_fixtures/$ns")
      val wreck = new java.io.File(root, "fxb_fp2")
      wreck.mkdirs() // no _SUCCESS: simulated crashed installer
      // a real wreck has partial part files — and must for this test:
      // rename(2) silently replaces an EMPTY destination directory
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(wreck.getPath, "part-00000"), "partial")
      wreck.setLastModified(System.currentTimeMillis - 3600000L)
      val writes = new java.util.concurrent.atomic.AtomicInteger(0)
      val p = install("fxb", "fp2", writes)
      assert(p === wreck.getPath, "cold wreck not healed in place")
      assert(new java.io.File(s"$p/_SUCCESS").exists())
      assert(writes.get() === 1)
    }

    it("falls back to its own temp on a YOUNG wreck and keeps that resolution on later calls") {
      val root = new java.io.File(s"/tmp/graft_fixtures/$ns")
      val wreck = new java.io.File(root, "fxc_fp3")
      wreck.mkdirs() // young: mtime now — might be a healer mid-install
      java.nio.file.Files.writeString( // non-empty, so rename can't replace it
        java.nio.file.Path.of(wreck.getPath, "part-00000"), "partial")
      val writes = new java.util.concurrent.atomic.AtomicInteger(0)
      val p1 = install("fxc", "fp3", writes)
      assert(p1 !== wreck.getPath, "young wreck was read (or rm-ed) instead of temp fallback")
      assert(new java.io.File(s"$p1/_SUCCESS").exists())
      val p2 = install("fxc", "fp3", writes)
      assert(p2 === p1 && writes.get() === 1,
        "young-wreck fallback not memoized — the measured call re-writes")
    }

    it("sweeps stale-fingerprint finals once cold, never the live one") {
      val root = new java.io.File(s"/tmp/graft_fixtures/$ns")
      val stale = new java.io.File(root, "fxd_oldfp")
      stale.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(stale.getPath, "_SUCCESS"), "")
      stale.setLastModified(System.currentTimeMillis - 7200000L)
      val young = new java.io.File(root, "fxd_youngfp")
      young.mkdirs()
      val writes = new java.util.concurrent.atomic.AtomicInteger(0)
      val p = install("fxd", "fp4", writes)
      assert(!stale.exists(), "cold stale-fingerprint fixture not swept")
      assert(young.exists(), "young sibling swept — could be a live JVM's copy")
      assert(new java.io.File(s"$p/_SUCCESS").exists())
    }
  }
}
