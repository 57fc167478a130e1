package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only: measure the fixed per-job cost of this box/session shape —
  * trivial actions over a small cached frame, with and without an
  * exchange, at several partition counts.
  */
object JobOverhead {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = spark.range(0, 5000, 1, 32)
      .select(col("id"), (col("id") % 97).as("k"))
      .localCheckpoint(true)
    val narrow = base.filter(col("k") >= 0)
    def run(tag: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (0 until n).foreach(_ => f)
      println(f"[job] $tag%-42s ${(System.nanoTime() - t0) / 1e9 / n}%7.3f s/job")
    }
    run("count over cached 32-part", 20) { narrow.count(); () }
    run("agg sum over cached (exchange)", 20) {
      base.groupBy(col("k")).agg(sum(col("id"))).count(); ()
    }
    run("1-row agg head()", 20) { base.agg(sum(col("id"))).head(); () }
    run("count over cached 4-part", 20) {
      base.coalesce(4).count(); ()
    }
    val base4 = spark.range(0, 5000, 1, 4)
      .select(col("id"), (col("id") % 97).as("k")).localCheckpoint(true)
    run("1-row agg head() over 4-part", 20) { base4.agg(sum(col("id"))).head(); () }
    spark.stop()
  }
}
