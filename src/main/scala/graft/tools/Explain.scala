package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev/audit tool: print the formatted physical plan (and optionally run)
  * a named SparkEntry query — used to audit pushdown/broadcast/codegen
  * per SURVEY §5.
  *
  * Usage: runMain graft.tools.Explain <queryName|entry> [sfDir] [--run]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("entry")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    val df =
      if (name == "entry") SparkEntry.entry(spark)
      else SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (args.contains("--run")) println(s"rows=${df.count()}")
    // memo-backed operators hide their expensive shapes behind
    // checkpointed leaves; print each derivation built while
    // constructing/running this query (the plan-audit surface)
    graft.operators.Memo.builtQueryExecutions.toSeq.sortBy(_._1)
      .foreach { case (memoName, qe) =>
        println(s"\n=== memo derivation: $memoName ===")
        println(qe.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    spark.stop()
  }
}
