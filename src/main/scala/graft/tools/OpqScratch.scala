package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Memo, SimilarityOps}
import org.apache.spark.sql.functions._

/** Dev-only: print the raw hit counts behind opq_trained_recall. */
object OpqScratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(cores = 16, shufflePartitions = 16)
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, dir)
    val exact = SimilarityOps.exactL2TopK(e, 50, 5)
    val fixed = SimilarityOps.pqAnn(e, 50, 5)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit_fixed"))
    val cb = Memo.cachedModel("pq_codebook:iters=2", Seq(e))(
      SimilarityOps.trainPqCodebook(e, sys.env.getOrElse("OPQ_IT","2").toInt))
    val pqFlat = SimilarityOps.pqAnn(e, 50, 5, codebook = cb)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit_pq"))
    val (rot, opqCb) = SimilarityOps.opqTrain(e, sys.env.getOrElse("OPQ_ALT","2").toInt, sys.env.getOrElse("OPQ_IT","2").toInt)
    val rotated = SimilarityOps.withRotation(e, rot)
    val opqFlat = SimilarityOps.pqAnn(rotated, 50, 5, codebook = opqCb)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit_opq"))
    val row = exact
      .join(fixed, Seq("query_id", "neighbor_id"), "left")
      .join(pqFlat, Seq("query_id", "neighbor_id"), "left")
      .join(opqFlat, Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit_fixed"), lit(0L))).as("nf"),
        sum(coalesce(col("hit_pq"), lit(0L))).as("np"),
        sum(coalesce(col("hit_opq"), lit(0L))).as("no"))
      .head()
    println(s"[opq] n_exact=${row.getLong(0)} fixed=${row.getLong(1)} " +
      s"trained_pq=${row.getLong(2)} opq=${row.getLong(3)}")
    // distortion: sum over rows of min_j score (score = |cb|^2 - 2<x,cb>,
    // so adding |x_m|^2 gives |x_m - cb|^2; |x|^2 is rotation-invariant)
    def distortion(frame: org.apache.spark.sql.DataFrame,
        codebook: SimilarityOps.PqCodebook): Double = {
      val scored = SimilarityOps.withPqCodes(frame, codebook)
      // recompute min scores: withPqCodes drops them; redo quickly
      val sc = frame.select(col("embedding") +:
        (for (m <- 0 until SimilarityOps.PqSub; j <- 0 until SimilarityOps.PqCent) yield {
          val sub = slice(col("embedding"), m * 8 + 1, 8)
          val w = codebook(m)(j).map(x => x.toDouble * x.toDouble).sum
          (lit(w) - lit(2.0) * graft.functions.DotProduct.dotF(sub,
            typedlit(codebook(m)(j)))).as(s"s${m}_$j")
        }): _*)
      val tot = sc.select(((0 until SimilarityOps.PqSub).map { m =>
        least((0 until SimilarityOps.PqCent).map(j => col(s"s${m}_$j")): _*)
      }.reduce(_ + _) + graft.functions.DotProduct.dotF(col("embedding"),
        col("embedding"))).as("d"))
        .agg(sum(col("d"))).head().getDouble(0)
      val _ = scored
      tot
    }
    println(f"[opq] distortion pq=${distortion(e, cb)}%.3f " +
      f"opq=${distortion(rotated, opqCb)}%.3f")
    spark.stop()
  }
}
