package graft.tools

import graft.{GraftSession, Tables}
import graft.operators._

/** Scratch profiler for the pair_medians derivation (dev only): times
  * the memoized chain dailyFact → dayPairs → pairMedians at bench
  * conditions (SPARK_GRAFT_CPUS, default 4).
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
    time("pair_medians build") { OpUtils.pairMedians(orders).count() }
    time("pair_medians cached hit") { OpUtils.pairMedians(orders).count() }
    spark.stop()
  }
}
