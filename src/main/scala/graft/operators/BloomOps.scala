package graft.operators

import graft.functions.{BloomFilter, BloomFilterAgg}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Explicit runtime-filter join pruning: build a Bloom filter over the
  * dim side's join keys (one map-side-combined aggregate), broadcast the
  * BITS (not the rows), and drop non-matching fact rows BEFORE the fact
  * shuffles for the exact join that culls the filter's false positives.
  *
  * When it pays at 100 TB: the dim's rows exceed the broadcast budget
  * (so the exact join must shuffle BOTH sides) but its key set fits a
  * bloom — the fact-side shuffle then carries only probable matches.
  * Results are EXACTLY the plain join's (false positives die in the
  * exact join; false negatives are impossible), which is what the
  * oracle checks.
  */
object BloomOps {

  /** Inner-join `fact` to `dim` with a bloom pre-filter on the fact
    * side. The exact join is hinted shuffle-hash to model the
    * non-broadcastable-dim regime the pattern exists for.
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, numBits: Int = 1 << 17, numHashes: Int = 5): DataFrame = {
    val bloomAgg = udaf(new BloomFilterAgg(numBits, numHashes),
      Encoders.scalaLong)
    val bloom = dim.agg(bloomAgg(col(dimKey)).as("bloom_words"))
    fact
      .join(broadcast(bloom)) // 1 row of bits — a broadcast nested loop of width 1
      .filter(BloomFilter.mightContain(col("bloom_words"), col(factKey),
        numHashes))
      .drop("bloom_words")
      .join(dim.hint("shuffle_hash"), col(factKey) === col(dimKey))
  }

  /** Revenue by priority for one market segment, routed through the
    * bloom-pruned join — oracle-checked against the plain-join SQL (the
    * bloom changes the physical work, never the result).
    */
  def bloomSegmentRevenue(orders: DataFrame, customer: DataFrame,
      segment: String = "BUILDING"): DataFrame = {
    val dim = customer.filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    bloomPrunedJoin(orders.select(col("o_custkey"), col("o_orderpriority"),
        col("o_totalprice")), dim, "o_custkey", "c_custkey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
          .as("revenue"))
  }
}
