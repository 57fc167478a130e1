package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    GraftSession.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warmup pass on the target dir: pays JVM/JIT/codegen-compile AND
    // file-listing/footer caches once so the timed pass measures the
    // engine, not HotSpot or first-touch metadata IO.
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      // operators persist intermediates for their own multi-branch plans;
      // drop them between queries so timings don't alias cache reuse
      spark.catalog.clearCache()
    }
    // The warmup built the session-scoped memoized intermediates (the
    // LSH pair graph etc.); drop them so the timed pass pays each
    // derivation exactly once — the honest cost of a fresh session
    // running the whole workload. Later queries then show the documented
    // reuse, which is the engine's real steady-state behavior.
    graft.operators.Memo.invalidate()
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (name, sec, ok)
    }
    // failed queries report null (never a normal-looking duration) and
    // are listed separately so a failure can't hide in the totals
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) v.toString else "null")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
