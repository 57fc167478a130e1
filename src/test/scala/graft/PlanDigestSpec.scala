package graft

/** Plan-digest regression lock (instance-level, complementing
  * PlanAuditSpec's class-level sweeps): every graded query's OPTIMIZED
  * logical plan is reduced to a structural signature — node kinds in
  * tree order, join types and hints, scanned tables, grouping arities,
  * window partition arities — and its digest is locked in
  * `PLAN_DIGESTS.txt`. A regression that the rule sweeps can't name
  * (a Filter that stopped reaching the scan, a new Join/Aggregate in a
  * hot path, a dropped broadcast hint) changes the digest and fails
  * HERE, before a bench run has to notice the slowdown.
  *
  * The signature deliberately excludes anything data-size-driven
  * (physical join strategy, AQE decisions, statistics) and anything
  * run-varying (expression ids, checkpoint RDD ids), so digests are
  * stable across machines and testdata regenerations; an INTENDED plan
  * change is re-locked by deleting the stale line (or the file) and
  * committing the regenerated digest the spec writes to
  * `PLAN_DIGESTS.txt.new`.
  */
class PlanDigestSpec extends SparkSpec {
  import org.apache.spark.sql.catalyst.plans.logical._
  import org.apache.spark.sql.execution.datasources.LogicalRelation

  private val dir = "/root/testdata/sf0.001"
  private val lockFile = java.nio.file.Paths.get("PLAN_DIGESTS.txt")

  private def tableOf(r: LogicalRelation): String = r.relation match {
    case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
      f.location.rootPaths.map(_.getName.stripSuffix(".parquet"))
        .mkString("+")
    case _ => "relation"
  }

  private def sig(n: LogicalPlan): String = n match {
    case j: Join =>
      val hint = Seq(
        j.hint.leftHint.map(h => s"L=${h.strategy.getOrElse("")}"),
        j.hint.rightHint.map(h => s"R=${h.strategy.getOrElse("")}"))
        .flatten.mkString(",")
      s"Join:${j.joinType}${if (hint.nonEmpty) s"[$hint]" else ""}"
    case r: LogicalRelation => s"Scan:${tableOf(r)}"
    case _: org.apache.spark.sql.execution.LogicalRDD => "MemoLeaf"
    case a: Aggregate => s"Aggregate:g${a.groupingExpressions.length}"
    case w: Window => s"Window:p${w.partitionSpec.length}"
    case e: Expand => s"Expand:${e.projections.length}"
    case g: Generate => s"Generate:${g.generator.getClass.getSimpleName}"
    case _: Filter => "Filter"
    case _: Project => "Project"
    case s: Sort => s"Sort:${if (s.global) "global" else "local"}"
    case l: GlobalLimit => "Limit"
    case _: LocalLimit => "LocalLimit"
    case d: Deduplicate => "Deduplicate"
    case _: Union => "Union"
    case r: Repartition => s"Repartition:${r.shuffle}"
    case _: RepartitionByExpression => "RepartitionByExpr"
    case other => other.nodeName
  }

  private def render(p: LogicalPlan, depth: Int = 0): Seq[String] =
    (("  " * depth) + sig(p)) +: p.children.flatMap(render(_, depth + 1))

  private def digest(p: LogicalPlan): String = {
    val text = render(p).mkString("\n")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(text.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
  }

  test("optimized-plan digests match the committed lock") {
    // order-invariance: memo hits swap derivation subtrees for
    // checkpointed leaves, and the RETURNED frame is the leaf on hit
    // AND miss alike — but invalidate + fixed order anyway so the memo
    // build jobs themselves run identically across suite orderings
    graft.operators.Memo.invalidate()
    val queryDigests = SparkEntry.queries.keys.toSeq.sorted.map { q =>
      // drop CacheManager state before EVERY plan build: optimizedPlan
      // substitutes InMemoryRelation for any fragment some earlier
      // suite (or earlier query in this sweep) happened to persist, so
      // digests would otherwise depend on suite ordering
      spark.catalog.clearCache()
      q -> digest(SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan)
    }
    // the memo DERIVATIONS' plans are where the expensive shapes live
    // (their checkpointed leaves hide them from every consumer's plan) —
    // lock them too, under `memo:` keys. Building the queries above
    // triggered every build once, in the same sorted order each run.
    val memoDigests = graft.operators.Memo.builtQueryExecutions.toSeq
      .sortBy(_._1)
      .map { case (name, qe) => s"memo:$name" -> digest(qe.optimizedPlan) }
    val current = queryDigests ++ memoDigests
    val rendered = current.map { case (q, d) => s"$q $d" }.mkString("", "\n", "\n")
    if (!java.nio.file.Files.exists(lockFile)) {
      // bootstrap: write the lock once; committing it arms the check
      java.nio.file.Files.write(lockFile, rendered.getBytes("UTF-8"))
      info(s"bootstrapped $lockFile with ${current.size} digests")
    } else {
      val locked = scala.io.Source.fromFile(lockFile.toFile, "UTF-8")
      val lockedMap =
        try locked.getLines().filter(_.nonEmpty)
          .map { l => val Array(q, d) = l.split(" ", 2); q -> d }.toMap
        finally locked.close()
      val drifted = current.collect {
        case (q, d) if lockedMap.contains(q) && lockedMap(q) != d =>
          s"$q: locked ${lockedMap(q)}, now $d"
      }
      val missing = current.collect {
        case (q, _) if !lockedMap.contains(q) => q
      }
      val stale = (lockedMap.keySet -- current.map(_._1)).toSeq.sorted
      if (drifted.nonEmpty || missing.nonEmpty || stale.nonEmpty)
        // leave the regenerated set next to the lock so an INTENDED
        // change is a file move + commit, not a hand edit
        java.nio.file.Files.write(
          java.nio.file.Paths.get("PLAN_DIGESTS.txt.new"),
          rendered.getBytes("UTF-8"))
      assert(drifted.isEmpty,
        "plan digests drifted (intended? mv PLAN_DIGESTS.txt.new " +
          "PLAN_DIGESTS.txt and commit):\n" + drifted.mkString("\n"))
      assert(missing.isEmpty,
        s"new queries missing a digest lock (mv PLAN_DIGESTS.txt.new " +
          s"PLAN_DIGESTS.txt): ${missing.mkString(",")}")
      assert(stale.isEmpty,
        s"locked digests for queries that no longer exist: " +
          stale.mkString(","))
    }
  }
}
