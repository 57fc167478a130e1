package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaOpsSpec extends SparkSpec {

  test("eigen-identities hold and projections carry the eigenvariance") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val c = PcaOps.covarianceMatrix(emb)
    val (values, vectors) = PcaOps.jacobiEigen(c)
    // sorted descending; trace preserved by the similarity transform
    assert(values.zip(values.tail).forall { case (a, b) => a >= b - 1e-9 })
    val trace = (0 until 64).map(i => c(i)(i)).sum
    assert(math.abs(values.sum - trace) < 1e-6 * math.abs(trace))
    // C·v = λ·v for the top component
    val v0 = vectors(0)
    val cv = (0 until 64).map(i => (0 until 64).map(j => c(i)(j) * v0(j)).sum)
    val eigErr = (0 until 64).map(i => math.abs(cv(i) - values(0) * v0(i))).max
    assert(eigErr < 1e-8, s"C v != lambda v (err $eigErr)")
    // orthonormal basis
    val dot01 = vectors(0).zip(vectors(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot01) < 1e-9)
    assert(math.abs(v0.map(x => x * x).sum - 1.0) < 1e-9)
    // distributed projection: var(pc1) ≈ λ1 (float-literal tolerance),
    // and the variance ordering matches the eigenvalue ordering
    val mu = new Array[Double](64)
    PcaOps.dimMeans(emb).collect().foreach(r => mu(r.getInt(0)) = r.getDouble(1))
    val proj = PcaOps.project(emb, mu, vectors.take(2))
    val stats = proj.agg(var_pop(col("pc1")), var_pop(col("pc2"))).head
    assert(math.abs(stats.getDouble(0) - values(0)) < 0.05 * values(0) + 1e-6,
      s"var(pc1)=${stats.getDouble(0)} vs lambda1=${values(0)}")
    assert(stats.getDouble(0) >= stats.getDouble(1))
  }

  test("projection plans as one scan with zero exchanges") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (values, vectors) = PcaOps.fit(emb, k = 2)
    assert(values.length == 2)
    val mu = new Array[Double](64)
    PcaOps.dimMeans(emb).collect().foreach(r => mu(r.getInt(0)) = r.getDouble(1))
    val plan = PcaOps.project(emb, mu, vectors)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "projection must not shuffle:\n" + plan)
  }
}
