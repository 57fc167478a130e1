package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Memo, SimilarityOps => S}
import org.apache.spark.sql.functions._

/** Dev-only: phase-by-phase timing of the OPQ / PQ training loops. */
object OpqProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[opq] $tag%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val e = Tables.embeddings(spark, dir)
    // warm everything once
    time("warmup opqTrain(1,1)") { S.opqTrain(e, 1, 1) }
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      Memo.releaseManaged()
      val rot = time("opqRotation (PCA + jacobi)") { S.opqRotation(e) }
      val withRaw = e.select(col("vec_id"), col("embedding"),
        col("embedding").as("raw"))
      val rotated = time("rotate + checkpoint") {
        Memo.managedCheckpoint(S.withRotation(withRaw, rot))
      }
      val cb = time("trainPqCodebook(rotated, 4)") {
        S.trainPqCodebook(rotated, 4)
      }
      time("trainPqCodebook(rotated, 4) AGAIN") {
        S.trainPqCodebook(rotated, 4)
      }
      time("cross-moment pass") {
        S.withPqCodes(rotated, cb)
          .select(col("raw"), explode(array((0 until S.PqSub).map(m =>
            struct(lit(m).as("m"), col(s"code$m").as("c"))): _*)).as("mc"))
          .groupBy(col("mc.m").as("m"), col("mc.c").as("c"))
          .agg(sum(element_at(col("raw"), 1).cast("double")).as("s0"),
            (1 until S.Dim).map(j =>
              sum(element_at(col("raw"), j + 1).cast("double"))
                .as(s"s$j")): _*)
          .collect()
      }
      time("full opqTrain(3, 4)") { S.opqTrain(e, 3, 4) }
    }
    spark.stop()
  }
}
