package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2.D): brute-force cosine top-k as the exact baseline, and a
  * signed-random-projection LSH bucketed variant as the scale path.
  *
  * Scale design: the query set is the small side and is broadcast; the
  * corpus is scanned once. The LSH variant buckets both sides on sign-bit
  * prefixes so per-bucket candidate lists stay bounded — that's the plan
  * that survives a billion-vector corpus where brute force cannot.
  */
object SimilarityOps {

  /** Brute-force cosine top-k for each query vector (vec_id < nQueries). */
  def bruteCosineTopK(embeddings: DataFrame, nQueries: Int = 20, k: Int = 5): DataFrame = {
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val sims = embeddings.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorFns.cosine(col("q_emb"), col("embedding")), 6).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  private val Planes = 16
  private val Dim = 64

  /** Deterministic pseudo-random hyperplane weights, shared with the
    * oracle: w(p,i) = ((1103515245*(p*Dim+i) + 12345) mod 65536)/65536 - 0.5
    * — exact dyadic rationals, so both engines compute identical doubles.
    */
  def planeWeight(p: Int, i: Int): Double =
    ((1103515245L * (p * Dim + i) + 12345L) % 65536L).toDouble / 65536.0 - 0.5

  /** 16-bit sign-projection LSH bucket for each embedding. The plane
    * weights are dyadic rationals with ≤17 mantissa bits, so shipping
    * them as float arrays into the codegen'd dot product is lossless.
    */
  def withLshBucket(embeddings: DataFrame): DataFrame = {
    val bucket = (0 until Planes).map { p =>
      val w = (0 until Dim).map(i => planeWeight(p, i).toFloat)
      val dotp = graft.functions.DotProduct.dotF(col("embedding"), typedlit(w))
      when(dotp >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    embeddings.withColumn("bucket", bucket)
  }

  /** LSH-bucketed ANN: candidates share the full 16-bit bucket; top-k by
    * exact cosine within candidates (recall < 1 by design — mirrored by
    * the oracle).
    */
  def lshAnn(embeddings: DataFrame, nQueries: Int = 20, k: Int = 3): DataFrame = {
    val bucketed = withLshBucket(embeddings)
    val queries = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("bucket"))
    val sims = bucketed.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorFns.cosine(col("q_emb"), col("embedding")), 6).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
