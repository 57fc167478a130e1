package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA over the embedding column — the whitening /
  * dimensionality-reduction pass an embedding-heavy curation pipeline
  * runs before clustering or ANN indexing (cf. SemDeDup's preprocessing).
  *
  * Scale shape: the covariance is EXACT and fully distributed — one
  * upper-triangle (i ≤ j) pair expansion per row feeding a map-side
  * combined (i, j) aggregation, so the shuffle is always 64·65/2 = 2080
  * cells per partition regardless of corpus size. Only the dim×dim
  * matrix ever reaches the driver (a dim-table-sized collect, never
  * data), where a deterministic cyclic Jacobi sweep diagonalizes it.
  * Projections ship the eigenvectors back as broadcast literals into the
  * codegen'd dot product — one scan, no shuffle.
  *
  * Spec-gated (like [[SimilarityOps.ivfTrainedAnn]]): eigensolves are
  * iterative float math with no engine-independent oracle form; the spec
  * checks the eigen-identities (C·v = λ·v, orthonormality, trace
  * preservation) and that projected variance matches the eigenvalues on
  * real testdata.
  */
object PcaOps {
  private val Dim = 64

  /** Per-dimension corpus means (one 64-explode, map-side combined). */
  def dimMeans(embeddings: DataFrame): DataFrame =
    embeddings
      .select(posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy(col("i"))
      .agg(avg(col("v").cast("double")).as("mu"))

  /** Upper-triangle raw second-moment cells Σ xᵢxⱼ plus n — everything
    * needed to assemble the centered covariance driver-side:
    * cov(i,j) = Σxᵢxⱼ/n − μᵢμⱼ.
    */
  def momentCells(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "vi")))
      .select(col("i"), col("vi").cast("double").as("vi"),
        posexplode(col("embedding")).as(Seq("j", "vj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("vi") * col("vj").cast("double")).as("sxy"),
        count(lit(1)).as("n"))

  /** Full covariance matrix (driver-side assembly of the 2080 cells). */
  def covarianceMatrix(embeddings: DataFrame): Array[Array[Double]] = {
    val mu = new Array[Double](Dim)
    dimMeans(embeddings).collect().foreach(r => mu(r.getInt(0)) = r.getDouble(1))
    val c = Array.ofDim[Double](Dim, Dim)
    momentCells(embeddings).collect().foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val cov = r.getDouble(2) / r.getLong(3) - mu(i) * mu(j)
      c(i)(j) = cov; c(j)(i) = cov
    }
    c
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric
    * matrix: returns (eigenvalues, eigenvectors as rows), sorted by
    * eigenvalue descending. O(dim³) per sweep on a dim×dim matrix —
    * driver-side by design, like any catalog/dim-sized computation.
    */
  def jacobiEigen(m: Array[Array[Double]], sweeps: Int = 16): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until sweeps; p <- 0 until n - 1; q <- p + 1 until n) {
      if (math.abs(a(p)(q)) > 1e-14) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val cos = 1.0 / math.sqrt(t * t + 1.0)
        val sin = t * cos
        for (k <- 0 until n) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = cos * akp - sin * akq
          a(k)(q) = sin * akp + cos * akq
        }
        for (k <- 0 until n) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = cos * apk - sin * aqk
          a(q)(k) = sin * apk + cos * aqk
        }
        for (k <- 0 until n) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = cos * vkp - sin * vkq
          v(k)(q) = sin * vkp + cos * vkq
        }
      }
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until n).map(k => v(k)(i)).toArray).toArray)
  }

  /** Top-k principal components of the embedding corpus. */
  def fit(embeddings: DataFrame, k: Int = 8): (Array[Double], Array[Array[Double]]) = {
    val (values, vectors) = jacobiEigen(covarianceMatrix(embeddings))
    (values.take(k), vectors.take(k))
  }

  /** Project every embedding onto the top-k components: the eigenvectors
    * (and the mean, folded into a constant offset per component) ship as
    * literals into the codegen'd dot product — one scan, zero shuffles.
    */
  def project(embeddings: DataFrame, means: Array[Double],
      components: Array[Array[Double]]): DataFrame = {
    val cols = components.zipWithIndex.map { case (w, c) =>
      val offset = w.zip(means).map { case (wi, mi) => wi * mi }.sum
      (graft.functions.DotProduct.dotF(col("embedding"),
        typedlit(w.map(_.toFloat).toSeq)) - lit(offset)).as(s"pc${c + 1}")
    }
    embeddings.select(col("vec_id") +: cols: _*)
  }
}
