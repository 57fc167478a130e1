package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.OpUtils
import org.apache.spark.sql.functions._

/** Dev-only: decompose the pair_medians build cost stage by stage. */
object PmScratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Memo

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pm] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val orders = Tables.orders(spark, dir)
    // warmup: full pair consumer once
    graft.SparkEntry.queries("theil_sen_trend")(spark, dir).count()
    Memo.invalidate(); Memo.drainBuildSeconds()

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val daily = time("dailyFact build") { val d = OpUtils.dailyFact(orders); d.count(); d }
      val pairs = time("dayPairs build (NLJ + memo ckpt)") {
        val p = OpUtils.dayPairs(orders); p.count(); p
      }
      val eventsPlan = pairs.select(explode(when(col("tb") > col("ta"),
          array(
            struct(lit(0L).as("kind"), (col("ya") + col("yb")).as("s")),
            struct(lit(1L).as("kind"), expr(OpUtils.slopeMicroSql).as("s"))))
        .otherwise(array(
          struct(lit(0L).as("kind"), (col("ya") + col("yb")).as("s")))))
        .as("e"))
        .select(col("e.kind").as("kind"), col("e.s").as("s"))
      time("events scan, noop sink (no ckpt)") {
        eventsPlan.write.format("noop").mode("overwrite").save()
      }
      time("events scan, count only") { eventsPlan.count() }
      val ck = time("events localCheckpoint(eager)") { eventsPlan.localCheckpoint(true) }
      time("census pass 1 over ckpt") {
        ck.groupBy(col("kind"), expr("s div 1000000").as("b")).agg(count(lit(1))).count()
      }
      Memo.release(ck)
      // long-only slope variant (no decimal)
      val eventsLong = pairs.select(explode(when(col("tb") > col("ta"),
          array(
            struct(lit(0L).as("kind"), (col("ya") + col("yb")).as("s")),
            struct(lit(1L).as("kind"),
              expr("CASE WHEN yb >= ya THEN ((yb - ya) * 1000000) div (tb - ta) " +
                "ELSE -(((ya - yb) * 1000000) div (tb - ta)) END").as("s"))))
        .otherwise(array(
          struct(lit(0L).as("kind"), (col("ya") + col("yb")).as("s")))))
        .as("e"))
        .select(col("e.kind").as("kind"), col("e.s").as("s"))
      time("events scan LONG slope, noop") {
        eventsLong.write.format("noop").mode("overwrite").save()
      }
      // full build as shipped
      time("pairMedians full build") {
        OpUtils.pairMedians(orders).count()
      }
      Memo.invalidate(); Memo.drainBuildSeconds()
    }
    spark.stop()
  }
}
