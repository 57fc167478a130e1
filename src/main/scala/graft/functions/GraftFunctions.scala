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
  /** Optional int-literal argument at `pos` (config parameters like
    * precision / shingle width are plan-time constants, never data).
    */
  private def intLit(exprs: Seq[Expression], pos: Int, default: Int,
      fn: String, what: String): Int = exprs.lift(pos) match {
    case Some(Literal(v: Int, IntegerType)) => v
    case None => default
    case other => throw new IllegalArgumentException(
      s"$fn $what must be an int literal, got $other")
  }

  def registerAll(spark: SparkSession): Unit = {
    def expressionFn(name: String)(builder: Seq[Expression] => Expression): Unit =
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    expressionFn("graft_geohash") { exprs =>
      GeohashExpr(Cast(exprs(0), DoubleType), Cast(exprs(1), DoubleType),
        intLit(exprs, 2, 7, "graft_geohash", "precision"))
    }
    // embedding dot product (array<float> × array<float> → double)
    expressionFn("graft_dot")(exprs => DotProductExpr(exprs(0), exprs(1)))
    // oracle-parity positive hash from an md5 prefix (nHex hex chars)
    expressionFn("graft_hash64") { exprs =>
      Md5PrefixExpr(exprs(0), intLit(exprs, 1, 15, "graft_hash64", "nHex"))
    }
    // MinHash signature / distinct shingle set / SimHash of (normalized)
    // text — the dedup family's row-local primitives
    expressionFn("graft_minhash_sig") { exprs =>
      MinhashSigExpr(exprs(0), intLit(exprs, 1, 5, "graft_minhash_sig", "k"))
    }
    expressionFn("graft_shingle_set") { exprs =>
      DistinctShinglesExpr(exprs(0), intLit(exprs, 1, 5, "graft_shingle_set", "k"))
    }
    expressionFn("graft_simhash")(exprs => SimhashExpr(exprs(0)))
    // 60-bit perceptual blockhash of a BINARY payload (media near-dup)
    expressionFn("graft_blockhash")(exprs => BlockHashExpr(exprs(0)))
    // rolling token-span hashes (array<string> tokens → array<long>)
    expressionFn("graft_span_hashes") { exprs =>
      SpanHashExpr(exprs(0),
        intLit(exprs, 1, 8, "graft_span_hashes", "span"),
        intLit(exprs, 2, 15, "graft_span_hashes", "nHex"))
    }
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
    expressionFn("graft_bloom_contains")(exprs =>
      BloomMightContainExpr(exprs(0), exprs(1), 5))
    spark.udf.register("graft_cms_agg",
      org.apache.spark.sql.functions.udaf(new CountMinAgg(1024, 4),
        org.apache.spark.sql.Encoders.STRING))
    expressionFn("graft_cms_estimate")(exprs =>
      CmsEstimateExpr(exprs(0), exprs(1), 1024))
  }
}
