package graft.operators

import graft.SparkSpec

/** Null / empty / degenerate inputs through the text and dedup family —
  * at 100 TB every pathological row shape exists somewhere in the corpus.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val degenerate = Seq(
    (1L, null.asInstanceOf[String], "en", "src", 0L),
    (2L, "", "en", "src", 0L),
    (3L, "   ", "en", "src", 3L),
    (4L, "ab", "en", "src", 2L), // shorter than one shingle
    (5L, "the quick brown fox jumps over everything", "en", "src", 41L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("token/quality/fingerprint ops survive null and blank text") {
    assert(TextOps.tokenCount(degenerate).count() == 5)
    assert(TextOps.qualityScore(degenerate).count() == 5)
    assert(TextOps.langId(degenerate).count() == 5)
    val blankTokens = TextOps.tokenCount(degenerate)
      .filter($"doc_id" <= 3).collect()
    // null text propagates null counts; empty/whitespace normalize to 0
    assert(blankTokens.filter(!_.isNullAt(1)).forall(_.getLong(1) == 0L))
  }

  test("dedup family drops degenerate docs instead of crashing") {
    assert(DedupOps.withMinhashSignature(degenerate).count() == 1) // only doc 5
    assert(DedupOps.dedupMinhashLsh(degenerate).count() == 0)
    assert(DedupOps.dedupNgramJaccard(degenerate).count() == 0)
    assert(DedupOps.dedupSimhash(degenerate).count() == 0)
    assert(DedupOps.dedupExact(degenerate).count() >= 3) // null+groups still hash
  }

  test("operators accept empty inputs") {
    val empty = degenerate.limit(0)
    assert(TextOps.bigramTopK(empty).count() == 0)
    assert(DedupOps.dedupMinhashLsh(empty).count() == 0)
    assert(TextOps.docFingerprint(empty).count() == 0)
    assert(TextOps.piiRedact(empty).count() == 0)
    assert(PipelineOps.vocabCoverage(empty).count() == 0)
    assert(DedupOps.dedupContainment(empty).count() == 0)
    assert(TextOps.tfidfDocPairs(empty).count() == 0)
    assert(TextOps.templateFingerprint(empty).count() == 0)
  }

  test("session-5 operators survive degenerate and empty inputs") {
    // single real doc → no pairs anywhere; blank/null texts don't crash
    assert(DedupOps.dedupContainment(degenerate).count() == 0)
    assert(TextOps.tfidfDocPairs(degenerate).count() == 0)
    // empty string and whitespace mask to the same skeleton → one group;
    // the null-text group is its own (grouped, not join-dropped)
    assert(TextOps.templateFingerprint(degenerate).count() == 1)
    val evSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
    val ev = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, null, 1L, "view", 0.0, "{}"),
        org.apache.spark.sql.Row(2L, new java.sql.Timestamp(1000L), null,
          "click", 0.0, "{}"),
        org.apache.spark.sql.Row(3L, new java.sql.Timestamp(2000L), 2L,
          "purchase", 0.0, "{}")),
      evSchema)
    assert(AsOfOps.windowFunnel(ev).count() >= 1)       // runs, no crash
    assert(Analytics.kmvIntersection(ev).count() == 1)  // one audit row
    val emptyOrders = Seq.empty[(Long, java.sql.Timestamp, Double, String)]
      .toDF("o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority")
    assert(Analytics.robustPriceStats(emptyOrders).count() == 0)
    assert(TrendOps.acfDailyRevenue(emptyOrders).count() == 0)
  }

  test("piiRedact and vocabCoverage survive null and blank text") {
    // null text: synthesized-PII branches concat onto null → null counts
    // propagate; clean branch stays null — no crash either way
    assert(TextOps.piiRedact(degenerate).count() == 5)
    val clean = TextOps.piiRedact(degenerate)
      .filter($"doc_id" === 3L).head // % 5 == 3: untouched branch
    assert(!clean.getAs[Boolean]("has_pii"))
    assert(PipelineOps.vocabCoverage(degenerate).count() >= 5) // doc 5's tokens
  }

  test("round-3 text ops survive null, blank, and single-token text") {
    // inverted index / BPE / LM scoring must tolerate rows that produce
    // zero tokens or zero bigrams without dropping the whole job
    val inv = TextOps.invertedIndex(degenerate).collect()
    assert(inv.nonEmpty && inv.forall(_.getAs[Long]("df") >= 1L))
    val bpe = TextOps.bpePairCounts(degenerate).collect()
    assert(bpe.forall(_.getAs[Long]("pair_count") >= 1L))
    // only doc 5 has ≥ 2 tokens → exactly one scored doc
    val lm = TextOps.ngramLmScore(degenerate).collect()
    assert(lm.map(_.getLong(0)).toSeq == Seq(5L))
    // quality gate: null/blank/short text is rejected as too_short, never null verdict
    val gate = TextOps.qualityGate(degenerate).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(gate.size == 5 && !gate(1L) && !gate(2L) && !gate(3L) && !gate(4L))
  }

  test("round-4 ops survive degenerate and empty inputs") {
    val empty = degenerate.limit(0)
    // perplexity buckets: only doc 5 has bigrams → exactly one bucket row
    val pb = TextOps.perplexityBuckets(degenerate).collect()
    assert(pb.length == 1 && pb.head.getAs[Long]("n_docs") == 1L)
    assert(TextOps.perplexityBuckets(empty).count() == 0)
    // corpus stats: zero-token strata report zeros, never nulls/crashes
    val cs = TextOps.corpusStats(degenerate).collect()
    assert(cs.nonEmpty)
    assert(TextOps.corpusStats(empty).count() == 0)
    // method overlap: null/blank/short docs flag only via exact (or not
    // at all) and the job completes
    assert(DedupOps.dedupMethodOverlap(empty).count() == 0)
    val mo = DedupOps.dedupMethodOverlap(degenerate).collect()
    assert(mo.forall(_.getAs[Long]("n_methods") >= 1L))
  }

  test("a group of null-text duplicates is still an exact-dup group") {
    // md5(null) is NULL; a semi-join on the hash would silently drop the
    // group (NULL never equals NULL in a join) — the window formulation
    // groups NULLs together, matching the oracle's PARTITION BY
    val df = Seq(
      (1L, null.asInstanceOf[String], "en", "src", 0L),
      (2L, null.asInstanceOf[String], "en", "src", 0L),
      (3L, "some genuinely unique content", "en", "src", 29L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = DedupOps.dedupMethodOverlap(df).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L))
    out.foreach(r => assert(r.getAs[Boolean]("by_exact")))
  }

  test("parseTimestamps propagates null timestamps without crashing") {
    val df = Seq(
      (0L, null.asInstanceOf[java.sql.Timestamp], 1L, "x", 1.0, "{}"),
      (1L, java.sql.Timestamp.valueOf("2024-06-01 10:00:00"), 1L, "x", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = CleanOps.parseTimestamps(df).orderBy("event_id").collect()
    assert(out.length == 2)
    assert(out.head.isNullAt(2) && out.head.isNullAt(3)) // null in → null out
    assert(!out(1).isNullAt(3))
  }

  test("session additions survive empty and degenerate inputs") {
    import java.sql.Timestamp
    import org.apache.spark.sql.functions.col
    val emptyOrders = Seq.empty[(Long, Timestamp, Double)]
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    // snapshot diff of identical snapshots is empty
    val snap = Seq((1L, "O", 100L), (2L, "F", 200L))
      .toDF("o_orderkey", "o_orderstatus", "price_cents")
    assert(ChangeOps.snapshotDiff(snap, snap).count() == 0)
    // gap-fill of a single-day history is that one day
    val oneDay = Seq((1L, Timestamp.valueOf("2000-01-01 00:00:00"), 5.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    assert(TrendOps.dailyGapfill(oneDay).count() == 1)
    // skyline of one row is that row; of empty input, empty
    val one = Seq((1L, 1, 10.0, 5.0))
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
    assert(SkylineOps.priceQuantityFrontier(one).count() == 1)
    assert(SkylineOps.priceQuantityFrontier(one.limit(0)).count() == 0)
    // ABC with a single supplier: 100% of revenue -> class C by the
    // strict cumulative definition (cum == total > 95%)
    val solo = Seq((1L, 10.0)).toDF("l_suppkey", "l_extendedprice")
    assert(Analytics.supplierAbcClasses(solo).collect()(0).getString(2) == "C")
    // migration matrix over a single year emits nothing (no observed future)
    assert(Analytics.segmentMigrationMatrix(oneDay.withColumnRenamed(
      "o_orderkey", "o_custkey").select(col("o_custkey"), col("o_orderdate"),
      col("o_totalprice"))).count() == 0)
    // backlog with unshipped-only orders never closes
    val noShip = Seq.empty[(Long, Timestamp)].toDF("l_orderkey", "l_shipdate")
    val bl = TrendOps.orderBacklogTimeline(oneDay, noShip).collect()
    assert(bl.length == 1 && bl(0).getLong(3) == 1L)
  }

  test("round-6 rewrites and additions survive degenerate and empty inputs") {
    import java.sql.Timestamp
    // decomposed ABC on empty lineitem: empty, not a crash
    val noLines = Seq.empty[(Long, Double)].toDF("l_suppkey", "l_extendedprice")
    assert(Analytics.supplierAbcClasses(noLines).count() == 0)
    // quartiles when EVERY customer ties on quantized dollars: one group,
    // everyone lands in quartile 1 (ties never split)
    val tied = Seq((1L, Timestamp.valueOf("2000-01-01 00:00:00"), 100.0),
      (2L, Timestamp.valueOf("2000-01-02 00:00:00"), 100.4))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .withColumnRenamed("o_custkey", "o_custkey")
    val cust = Seq((1L, "x", 1, 0.0, "SEG"), (2L, "y", 1, 0.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders2 = Seq((10L, 1L, "O", 100.0, Timestamp.valueOf("2000-01-01 00:00:00"), "p"),
      (11L, 2L, "O", 100.4, Timestamp.valueOf("2000-01-02 00:00:00"), "p"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val qs = Analytics.customerSpendQuartiles(orders2, cust).collect()
    assert(qs.length == 2 && qs.forall(_.getAs[Int]("spend_quartile") == 1))
    // decile lift with one customer: one decile carrying 100%
    val oneCust = Seq((10L, 1L, "O", 50.0,
      Timestamp.valueOf("2000-01-01 00:00:00"), "p"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val lift = Analytics.spendDecileLift(oneCust).collect()
    assert(lift.length == 1 && lift(0).getAs[Long]("rev_share_micro") == 1000000L)
    // rolling anomalies with all-null timestamps: empty, not a crash
    val nullTs = Seq((1L, "T", 1.0, null.asInstanceOf[Timestamp]))
      .toDF("event_id", "event_type", "value", "ts")
    assert(TrendOps.rollingAnomalyFlags(nullTs).count() == 0)
    // mixture resample of an all-empty-text corpus: nothing survives
    // (every language rolls up to zero tokens), no division blowup
    val blank = Seq((1L, "", "en", "src", 0L), (2L, "  ", "fr", "src", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(PipelineOps.mixtureResample(blank).count() == 0)
    // token_pack on empty documents: empty
    assert(PipelineOps.tokenPack(blank.limit(0)).count() == 0)
    // PQ rerank on a corpus smaller than the shortlist still ranks
    val tiny = Seq.tabulate(4)(i =>
      (i.toLong, Seq.tabulate(64)(d => ((d + i) % 5 - 2).toFloat / 3f), 0))
      .toDF("vec_id", "embedding", "label")
    val rr = SimilarityOps.pqRerankAnn(tiny, nQueries = 2, k = 3)
    assert(rr.count() > 0)
    // codebook training on a corpus shorter than PqCent seeds
    // cyclically instead of crashing; geometry stays full
    val cb = SimilarityOps.trainPqCodebook(tiny, iters = 1)
    assert(cb.length == SimilarityOps.PqSub &&
      cb.forall(_.length == SimilarityOps.PqCent))
  }

  test("round-9 operators survive empty and degenerate inputs") {
    import java.sql.Timestamp
    val noOrders = Seq.empty[(Long, Timestamp, Double, String)]
      .toDF("o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority")
    // empty history: no CDF rows → no KS row, no cells → no shift rows
    assert(StatOps.ksOrderDrift(noOrders).count() == 0)
    assert(StatOps.priorityMixShift(noOrders).count() == 0)
    // one-sided history: every order before the cutoff → n_late = 0, the
    // d_micro division must not run on the empty side (no diff can beat
    // 0, so D = 0 over an empty opposite CDF)
    val oneSided = Seq((1L, Timestamp.valueOf("1997-01-01 00:00:00"), 10.0, "1-URGENT"))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority")
    val ks = StatOps.ksOrderDrift(oneSided).collect()
    assert(ks.length == 1 && ks(0).getAs[Long]("n_late") == 0L &&
      ks(0).getAs[Long]("d_micro") == 0L)
    // blank/empty corpora: octaves and diversity yield no rows, the MAD
    // profile of a single doc is (median = len, MAD 0, outliers 0)
    assert(TextOps.tokenRankOctaves(degenerate.limit(0)).count() == 0)
    assert(TextOps.vocabSimpson(degenerate.limit(0)).count() == 0)
    val solo = degenerate.filter($"doc_id" === 5L)
    val mad = TextOps.docLengthMad(solo).collect()(0)
    assert((mad.getLong(1), mad.getLong(2), mad.getLong(3), mad.getLong(4))
      == ((1L, 41L, 0L, 0L)))
    // ER with no fuzzy pair anywhere: empty cluster table, no crash
    val distinctNames = Seq((1L, "Alice Johnson", 1), (2L, "Zebra Quartz", 1))
      .toDF("c_custkey", "c_name", "c_nationkey")
    assert(AuditOps.erClusters(distinctNames).count() == 0)
    // IVM with an empty lineitem: all legs 0 rows / 0 revenue, and the
    // incremental total still equals the full recompute
    val orders1 = Seq((3L, "O")).toDF("o_orderkey", "o_orderstatus")
    val noLines = Seq.empty[(Long, Int, Double, Double)]
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    val legs = ChangeOps.deltaJoinMaintenance(orders1, noLines).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(legs.values.forall(_ == ((0L, 0L))))
    assert(legs("incremental_total") == legs("full_recompute"))
    // no conversions: quartile summary is empty, not a null row
    val noConv = Seq((1L, Timestamp.valueOf("2000-01-01 00:00:00"), 9L,
      "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(AsOfOps.conversionLatencyQuartiles(noConv).count() == 0)
  }

  test("round-10 operators survive empty and one-sided inputs") {
    import org.apache.spark.sql.functions.{col, to_date}
    val noOrders = Seq.empty[(Long, Long, String, Double)]
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
    val noLines = Seq.empty[(Long, Double, Double)]
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    val noDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // empty inputs: zero verdict rows everywhere, never a null row
    assert(StatOps.mannWhitneyU(noLines).count() == 0)
    assert(StatOps.kendallTauDaily(noOrders).count() == 0)
    assert(StatOps.runsTestDaily(noOrders).count() == 0)
    assert(Analytics.giniCustomerConcentration(noOrders).count() == 0)
    assert(AuditOps.backfillPlan(noOrders).count() == 0)
    assert(TextOps.sourceTermLift(noDocs).count() == 0)
    assert(PipelineOps.mixtureUpsample(noDocs).count() == 0)
    // one-sided rank sample (no discounted lines): U collapses to the
    // defined degenerate values and AUC is NULL, not a division error
    val oneSided = Seq((1L, 10.0, 0.0), (2L, 20.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    val u = StatOps.mannWhitneyU(oneSided).collect()(0)
    assert(u.getAs[Long]("n_a") == 0L && u.getAs[Long]("u2_a") == 0L)
    assert(u.isNullAt(u.fieldIndex("auc_micro")))
    // a single day: no pairs → kendall empty; one run of one sign
    val oneDay = Seq((1L, "1995-01-01", 1.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
    assert(StatOps.kendallTauDaily(oneDay).count() == 0)
    val runs = StatOps.runsTestDaily(oneDay).collect()(0)
    assert(runs.getAs[Long]("n_days") == 1L && runs.getAs[Long]("n_runs") == 1L)
    // single-month orders: a one-row spine, nothing missing
    val plan = AuditOps.backfillPlan(oneDay).collect()
    assert(plan.length == 1 && !plan(0).getBoolean(2))
  }

  test("round-12 operators survive degenerate and empty inputs") {
    import org.apache.spark.sql.functions._
    val noDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // empty corpus: empty vocab / empty release, never a crash or null row
    assert(UnigramLmOps.unigramLmVocab(noDocs).count() == 0)
    assert(UnigramLmOps.unigramEncode(noDocs).count() == 0)
    assert(AuditOps.dpReleaseCounts(noDocs).count() == 0)
    // null/blank texts: the encoder skips them, the trainer ignores them
    assert(UnigramLmOps.unigramEncode(degenerate).collect()
      .map(_.getLong(0)).toSet == Set(4L, 5L))
    // a null quasi-identifier class still releases deterministically
    // (null-salted hash → null uniform → the CASE ladder's clamp arm)
    val nullLang = (1 to 30).map(i => (i.toLong, "t",
      null.asInstanceOf[String], "srcX", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rel = AuditOps.dpReleaseCounts(nullLang).collect()
    assert(rel.length == 1 && rel(0).isNullAt(0) &&
      rel(0).getLong(2) == 30L + AuditOps.DpNoiseClampZ)
    // patterns: empty events → empty histograms/emissions
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, String, Double)]
      .toDF("user_id", "ts", "event_type", "value")
    assert(PatternOps.seqPatternMatch(noEvents).count() == 0)
    assert(PatternOps.seqPatternProgress(noEvents).count() == 0)
    // a user who never anchors reports level 0, not absence
    val noAnchor = Seq((1L, java.sql.Timestamp.valueOf("1995-01-01 00:00:00"),
      "purchase", 0.0)).toDF("user_id", "ts", "event_type", "value")
    val lvl = PatternOps.seqPatternMatch(noAnchor).collect()
    assert(lvl.length == 1 && lvl(0).getLong(0) == 0L)
    // discords: fewer than 2 non-overlapping windows → no profile rows
    val shortHist = (0 until 10).map { t =>
      (t.toLong, 1L, java.sql.Timestamp.valueOf(
        java.time.LocalDate.parse("1995-01-01").plusDays(t).atStartOfDay()),
        100.0)
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    assert(TrendOps.revenueDiscords(shortHist).count() == 0)
    val noOrders2 = Seq.empty[(Long, Long, java.sql.Timestamp, Double)]
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    assert(TrendOps.revenueDiscords(noOrders2).count() == 0)
  }
}
