package graft.tsdb

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame

/** Write-once-read-many cache of materialized selections — the
  * Spark-granularity analog of the reference's
  * `RowRangesForConstraintsCache` (search/constraint_cache.go:15-22,
  * sync.Map implementation at :36-75, wired into the queryable at
  * queryable/parquet_queryable.go:112): repeated selects with the same
  * constraints must not redo the filtering work.
  *
  * Granularity shift, deliberately: the reference caches row-range
  * indexes per (shard, row group, constraints) because its unit of
  * re-done work is page-level pruning inside one shard. Spark's unit
  * is the whole pruned-filtered-projected scan, so the value cached
  * here is the materialized selection itself — a `localCheckpoint`ed
  * DataFrame keyed by (table plan, time range, matchers, projection).
  * A hit replans from the checkpointed partition blocks: no parquet
  * scan, no filter re-evaluation, no regex work. Quotas and result
  * ordering are applied ON TOP of the cached selection, so selects
  * that differ only in quota/sort share one entry (the reference
  * likewise caches pre-materialization ranges, not final results).
  *
  * Concurrency matches the reference's sync.Map rationale
  * (constraint_cache.go:36-40): one write per key, then reads. A
  * memoized holder is inserted with `putIfAbsent` and the
  * materialization job runs via the WINNING holder's `lazy val` —
  * single materialization per key under concurrent first use, but
  * the map's bin lock is never held across a Spark job, so a build
  * that re-enters the cache for an UNRELATED key never serializes
  * behind (or deadlocks on) another materialization. Same-key
  * re-entry (a build transitively selecting itself) would recurse
  * through the holder's re-entrant lazy-val monitor, so it is
  * detected per-thread and fails fast with IllegalStateException.
  * A build that throws is evicted before the exception propagates:
  * failed keys don't consume capacity, and a retry re-materializes.
  *
  * Capacity: checkpoint blocks hold executor disk, so unlike the
  * reference's unbounded map of tiny row ranges, at most `maxEntries`
  * selections are retained; once full, further misses pass through
  * UNCACHED (no eviction — an evicted-then-refetched 100 TB selection
  * costs more than a passthrough, and write-once-read-many workloads
  * have no better victim signal than "don't churn").
  */
final class SelectionCache(maxEntries: Int = 64) {
  require(maxEntries > 0, s"maxEntries must be positive, got $maxEntries")

  // Memoized slot: `df` materializes at most once (Scala lazy-val
  // latch), synchronizing on the holder — NOT on the map bin. The
  // build closure (and the plan lineage it captures) is released
  // once the checkpoint exists; a throwing build keeps it so the
  // lazy val can retry after the failed entry is evicted.
  private final class Holder(build0: () => DataFrame) {
    private[this] var build: () => DataFrame = build0
    lazy val df: DataFrame = {
      val out = build().localCheckpoint()
      build = null
      out
    }
  }

  private val entries = new ConcurrentHashMap[String, Holder]()
  // Keys whose build is running on THIS thread — same-key re-entry
  // means the build depends on its own result; fail fast instead of
  // recursing through the lazy-val monitor to StackOverflowError.
  private val building = ThreadLocal.withInitial[java.util.HashSet[String]](() => new java.util.HashSet[String]())
  private val hitCount = new AtomicLong
  private val missCount = new AtomicLong

  /** Selections served from cache (Get-with-ok analog). */
  def hits: Long = hitCount.get
  /** Selections that had to materialize (or passed through at capacity). */
  def misses: Long = missCount.get
  def size: Int = entries.size

  /** Serve `key` from cache, or materialize `build` once and retain
    * its checkpoint. The checkpoint is EAGER: the miss pays the
    * materialization job up front, and every later use (same object,
    * cached) replans from the written partition blocks. (Lazy
    * checkpoints let concurrent AQE stage jobs race to materialize
    * the same partitions, which leaks "non-existent accumulator"
    * scheduler ERRORs — see Dedup.ngramJaccard.)
    */
  private[graft] def getOrMaterialize(key: String, build: => DataFrame): DataFrame = {
    val cached = entries.get(key)
    if (cached != null) { hitCount.incrementAndGet(); force(key, cached) }
    else {
      missCount.incrementAndGet()
      if (entries.size >= maxEntries) build // full: uncached passthrough
      else {
        val mine = new Holder(() => build)
        val prev = entries.putIfAbsent(key, mine)
        // whichever holder won the insert race materializes; the
        // loser's job never runs (its lazy val is never forced)
        force(key, if (prev != null) prev else mine)
      }
    }
  }

  /** Force a holder's materialization with same-key re-entry
    * detection; evict the entry if the build throws so failed keys
    * neither occupy a capacity slot nor get counted as hits while
    * silently re-running a failing build.
    */
  private def force(key: String, holder: Holder): DataFrame = {
    val inFlight = building.get()
    if (!inFlight.add(key))
      throw new IllegalStateException(
        s"SelectionCache: build for key re-entered getOrMaterialize with the same key " +
          s"(selection depends on its own cached result): $key")
    try holder.df
    catch {
      case e: Throwable =>
        entries.remove(key, holder)
        throw e
    } finally inFlight.remove(key)
  }

  /** Drop one cached selection (constraint_cache.go:63 Delete analog). */
  def invalidate(key: String): Unit = entries.remove(key)

  /** Drop everything (constraint_cache.go:69 Close analog). Checkpoint
    * blocks are reclaimed by Spark's ContextCleaner once the dropped
    * DataFrames are unreferenced.
    */
  def clear(): Unit = entries.clear()
}
