package graft.tools

import graft.{GraftSession, Tables}
import graft.operators._

/** Scratch profiler for the pair_medians derivation (dev only): times
  * the memoized chain dailyFact → dayPairs → pairMedians at bench
  * conditions (SPARK_GRAFT_CPUS, default 4), then re-times a hot
  * rebuild with a job/stage listener so a slow stage names itself.
  */
object ProfilePairCdfs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    GraftSession.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val orders = Tables.orders(spark, dir)
    time("daily_fact") { OpUtils.dailyFact(orders).count() }
    time("day_pairs") { OpUtils.dayPairs(orders).count() }
    time("pair_medians build (cold)") { OpUtils.pairMedians(orders).count() }
    time("pair_medians cached hit") { OpUtils.pairMedians(orders).count() }
    // bench-order repro: warm JIT above, invalidate, re-time with a
    // job/stage listener
    graft.operators.Memo.invalidate()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, (System.nanoTime(),
            "stages=" + j.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString("|")))
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, desc) = starts.getOrDefault(j.jobId, (0L, "?"))
          println(f"[job] ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.2f s  $desc")
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val m = i.taskMetrics
          println(f"[stage] ${i.stageId}%3d tasks=${i.numTasks}%3d " +
            f"exec=${m.executorRunTime / 1e3}%7.2f s " +
            f"in=${m.inputMetrics.recordsRead}%9d " +
            f"sh_r=${m.shuffleReadMetrics.recordsRead}%9d " +
            f"sh_w=${m.shuffleWriteMetrics.recordsWritten}%9d  " +
            i.name.takeWhile(_ != '\n'))
        }
      })
    time("pair_medians rebuild (hot)") { OpUtils.pairMedians(orders).count() }
    spark.stop()
  }
}
