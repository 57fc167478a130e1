package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev/perf tool: time named SparkEntry queries inside one warmed JVM —
  * the per-query companion to [[graft.Bench]] for optimization work.
  *
  * Usage: runMain graft.tools.Time <sfDir> <iters> <query> [query...]
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (0 until iters + 1).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        graft.operators.Memo.invalidate()
        graft.operators.Memo.drainBuildSeconds()
        val tag = if (i == 0) "warmup" else s"iter$i"
        println(f"[time] $name $tag ${sec}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
