package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT graft_geohash(lat, lon, 7) ...")` works on any
  * session (the driver builds sessions without extensions, so operators
  * call [[registerAll]] idempotently via GraftSession.register).
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_geohash",
      (exprs: Seq[Expression]) => {
        val precision = exprs.lift(2) match {
          case Some(Literal(v: Int, IntegerType)) => v
          case None => 7
          case other => throw new IllegalArgumentException(
            s"graft_geohash precision must be an int literal, got $other")
        }
        GeohashExpr(Cast(exprs(0), DoubleType), Cast(exprs(1), DoubleType), precision)
      },
      "built-in")
    // typed Aggregators, fixed at their query-surface arities (a UDAF's
    // parameters are baked in at registration)
    spark.udf.register("graft_topk3",
      org.apache.spark.sql.functions.udaf(new TopKLongs(3),
        org.apache.spark.sql.Encoders.scalaLong))
    spark.udf.register("graft_heavy_hitters16",
      org.apache.spark.sql.functions.udaf(new HeavyHitters(16),
        org.apache.spark.sql.Encoders.STRING))
    // sketch builders at their query-surface shapes (bloom: 2¹⁷ bits /
    // 5 hashes; cms: 1024×4), plus the codegen'd probes
    spark.udf.register("graft_bloom_agg",
      org.apache.spark.sql.functions.udaf(new BloomFilterAgg(1 << 17, 5),
        org.apache.spark.sql.Encoders.scalaLong))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      (exprs: Seq[Expression]) => BloomMightContainExpr(exprs(0), exprs(1), 5),
      "built-in")
    spark.udf.register("graft_cms_agg",
      org.apache.spark.sql.functions.udaf(new CountMinAgg(1024, 4),
        org.apache.spark.sql.Encoders.STRING))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_estimate",
      (exprs: Seq[Expression]) => CmsEstimateExpr(exprs(0), exprs(1), 1024),
      "built-in")
  }
}
