package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-scoped materialized-intermediate reuse — the engine-side
  * analog of a materialized view. Pipelines compose operators that share
  * expensive intermediates (the LSH pair graph feeds dedup_minhash_lsh,
  * dedup_clusters, dedup_survivors AND curated_corpus); without reuse,
  * each query in one session re-derives the whole graph — at 100 TB that
  * means re-minhashing the corpus four times.
  *
  * Keying: operator name + parameters + the canonicalized logical plan of
  * the input (full plan string, so a hash collision can never alias two
  * different inputs) — the same operator over the same source (same path,
  * same projection) hits the cache, while a different scale factor, a
  * filtered subset, or a test fixture misses it. Correctness never
  * depends on a hit.
  *
  * Materialization: eager `localCheckpoint` — the result is computed
  * exactly once and pinned as executor-resident leaf blocks (surviving
  * `spark.catalog.clearCache()`, which drops only catalog/dataset cache
  * entries between queries). Only bounded intermediates (pair lists,
  * cluster labels) belong here — never corpus-sized data.
  *
  * Concurrency: a build may RE-ENTER `cached` for a sub-derivation
  * (clusters → minhash pair graph), so the Spark job must never run
  * inside a `ConcurrentHashMap` bin lock (`computeIfAbsent` forbids
  * touching other mappings from the mapping function, and would hold the
  * bin lock across an entire eager checkpoint job). Instead: lock-free
  * read, then a per-key monitor for the build, then publish. Two threads
  * racing distinct keys never block each other; the same thread
  * re-entering a different key takes a different monitor (no deadlock);
  * re-entering the SAME key would be a reentrant lock (and a build bug —
  * it would loop — which plain recursion would too).
  */
object Memo {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]
  private val buildSeconds =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]
  private val nestedSeconds = new ThreadLocal[Double] {
    override def initialValue: Double = 0.0
  }

  private def key(name: String, input: DataFrame): String = {
    val plan = input.queryExecution.logical.canonicalized
    // full plan text + 32-bit semantic hash: the hash alone could collide
    // across two different inputs in one session and silently serve the
    // wrong intermediate; the plan string disambiguates.
    name + ":" + plan.semanticHash() + ":" + plan.toString
  }

  /** Build-once: returns the checkpointed result of `build(input)`,
    * reusing it for every later call with the same (name, input plan).
    */
  def cached(name: String, input: DataFrame)(build: DataFrame => DataFrame): DataFrame = {
    val k = key(name, input)
    val hit = cache.get(k)
    if (hit != null) return hit
    val lock = buildLocks.computeIfAbsent(k, _ => new Object)
    lock.synchronized {
      val again = cache.get(k) // raced builder may have published
      if (again != null) again
      else {
        // exclusive timing: a build that re-enters cached() for a
        // sub-derivation must not double-count the inner build's seconds
        // (each derivation reports under its own name)
        val outerNested = nestedSeconds.get
        nestedSeconds.set(0.0)
        val t0 = System.nanoTime()
        try {
          val built = build(input).localCheckpoint(eager = true)
          val elapsed = (System.nanoTime() - t0) / 1e9
          buildSeconds.merge(name, elapsed - nestedSeconds.get, (a, b) => a + b)
          nestedSeconds.set(outerNested + elapsed)
          cache.put(k, built)
          built
        } catch {
          case e: Throwable =>
            // restore the outer frame's accumulator (still charging it the
            // failed attempt's wall time) so a caught-and-handled failure
            // can't corrupt later attribution
            nestedSeconds.set(outerNested + (System.nanoTime() - t0) / 1e9)
            throw e
        }
      }
    }
  }

  /** Seconds spent on memo-miss derivations since the last drain, keyed
    * by operator name (exclusive — nested sub-derivations report under
    * their own names). Lets a benchmark attribute each one-time
    * derivation to its own line item instead of folding it into
    * whichever query happened to trigger the miss.
    */
  def drainBuildSeconds(): Map[String, Double] = {
    val snap = scala.collection.mutable.Map[String, Double]()
    buildSeconds.forEach((k, v) => snap(k) = v.doubleValue)
    buildSeconds.clear()
    snap.toMap
  }

  /** Drop all memoized intermediates (test isolation / memory release)
    * AND unpersist their checkpoint blocks — clearing only the map would
    * leave the eagerly-checkpointed RDDs pinned on executors until GC,
    * so e.g. a bench warmup's blocks would still occupy memory during
    * the timed pass.
    */
  def invalidate(): Unit = {
    cache.forEach((_, df) => releaseCheckpoint(df))
    cache.clear()
    buildLocks.clear()
  }

  /** A locally-checkpointed Dataset's plan is a leaf `LogicalRDD` over
    * the persisted internal RDD; unpersist exactly that RDD to free its
    * executor blocks.
    */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
