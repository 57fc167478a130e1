package graft.operators

import graft.functions.Geohash.geohash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial operators beyond exact-cell matching. */
object GeoOps {

  /** Proximity (range) join expressed as an equi-join: block on a coarse
    * geohash cell, then filter candidates by planar squared distance.
    * This is how a range join survives 100 TB — the cross-product space
    * collapses to per-cell buckets, and the distance test is a codegen'd
    * arithmetic filter. Blocking recall: pairs straddling a cell border
    * are missed (standard grid-blocking trade-off; halve the precision or
    * add neighbor-cell probes to tighten), and the oracle mirrors the
    * same blocking.
    *
    * The planar metric uses a fixed latitude-scale constant (cos²(40.7°)
    * for the NYC box) so both engines run identical IEEE arithmetic —
    * no trig divergence.
    */
  def neighborJoin(customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, maxDist2: Double = 1e-4): DataFrame = {
    val LonScale2 = 0.5749 // cos^2(40.7 deg), fixed for the NYC data box
    val cust = StarSchema.dimCustomerGeo(customer, nation, region)
      .select(col("c_custkey"), col("lat").as("c_lat"), col("lon").as("c_lon"))
      .withColumn("cell", geohash(col("c_lat"), col("c_lon"), 5))
    val supp = StarSchema.dimSupplierGeo(supplier, nation, region)
      .select(col("s_suppkey"), col("lat").as("s_lat"), col("lon").as("s_lon"))
      .withColumn("cell", geohash(col("s_lat"), col("s_lon"), 5))
    cust.join(supp, Seq("cell"))
      .withColumn("dist2",
        (col("c_lat") - col("s_lat")) * (col("c_lat") - col("s_lat")) +
          (col("c_lon") - col("s_lon")) * (col("c_lon") - col("s_lon")) * lit(LonScale2))
      .filter(col("dist2") <= maxDist2)
      .select(col("c_custkey"), col("s_suppkey"), round(col("dist2"), 10).as("dist2"))
  }

  /** Customers inside a geohash-prefix region, counted per nation — the
    * geo-fenced rollup shape ("everyone in cell dr5"). The prefix filter
    * is written against the COMPUTED geohash, which is exact but opaque
    * to any scan; the [[graft.plans.GeohashPrefixPushdown]] optimizer
    * rule derives the cell's lat/lon bounding box as extra conjuncts, so
    * on physical coordinate columns the predicate reaches the parquet
    * zone maps (here the coordinates are key-derived, so the rewrite is
    * exercised semantically — the oracle confirms the rewritten plan
    * returns the identical rows).
    */
  def geoPrefixCounts(customer: DataFrame, nation: DataFrame,
      prefix: String = "dr5"): DataFrame =
    CleanOps.withDerivedCoords(
        customer.select(col("c_custkey"), col("c_nationkey")), "c_custkey")
      .withColumn("gh", geohash(col("lat"), col("lon"), 7))
      .filter(col("gh").startsWith(prefix))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
}
