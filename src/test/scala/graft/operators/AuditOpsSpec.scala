package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  test("joinSizeEstimate reports stats-only estimate vs exact join size") {
    val orders = Seq((1L, 10L), (2L, 10L), (3L, 20L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(Tuple1(1L), Tuple1(1L), Tuple1(1L))
      .toDF("l_orderkey")
    val customer = Seq(Tuple1(10L), Tuple1(20L)).toDF("c_custkey")
    val out = AuditOps.joinSizeEstimate(orders, lineitem, customer)
      .collect().map(r => r.getString(0) ->
        (1 to 7).map(i => BigDecimal(r.get(i).toString).toLongExact).toSeq)
      .toMap
    // orderkey edge: est = 3·3/max(3,1) = 3, exact = cl(1)·cr(1) = 1·3 = 3
    assert(out("orders.o_orderkey=lineitem.l_orderkey") ==
      Seq(3L, 3L, 3L, 1L, 3L, 3L, 0L))
    // custkey edge: est = 2·3/max(2,2) = 3, exact = 1·2 + 1·1 = 3
    assert(out("customer.c_custkey=orders.o_custkey") ==
      Seq(2L, 3L, 2L, 2L, 3L, 3L, 0L))
  }

  test("joinSizeEstimate: negative error is sign-safe across division conventions") {
    // correlated keys make exact(7) exceed the uniform estimate(6);
    // −10⁶/7 is where floor (−142858) and truncate (−142857) diverge —
    // the magnitude-plus-sign formulation must yield the truncate value
    // in BOTH engines regardless of their native // convention
    val orders = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(Tuple1(1L)).toDF("l_orderkey")
    val customer = Seq(Tuple1(10L), Tuple1(10L), Tuple1(20L)).toDF("c_custkey")
    val out = AuditOps.joinSizeEstimate(orders, lineitem, customer)
      .collect().map(r => r.getString(0) ->
        (1 to 7).map(i => BigDecimal(r.get(i).toString).toLongExact).toSeq)
      .toMap
    // est = 3·4 // max(2,2) = 6; exact = 2·3 + 1·1 = 7
    // err = −⌊(7−6)·10⁶ / 7⌋ = −142857 (never floor's −142858)
    assert(out("customer.c_custkey=orders.o_custkey") ==
      Seq(3L, 4L, 2L, 2L, 6L, 7L, -142857L))
  }

  test("DpGeomCdfMicro is a monotone micro-CDF with the closed-form median") {
    val ts = AuditOps.DpGeomCdfMicro
    assert(ts.map(_._1) == (-20 until 20))
    assert(ts.forall { case (_, t) => t >= 0L && t < 1000000L })
    assert(ts.map(_._2) == ts.map(_._2).sorted)
    // P(Z ≤ −1) = α/(1+α), P(Z ≤ 0) = 1/(1+α) at α = e⁻¹
    assert(ts.toMap.apply(-1) == 268941L)
    assert(ts.toMap.apply(0) == 731058L)
    // tail mass beyond the clamp is below micro resolution
    assert(ts.head._2 == 0L && ts.last._2 == 999999L)
  }

  test("dpReleaseCounts releases noisy class counts deterministically") {
    val docs = (
      (1 to 40).map(i => (i.toLong, "t", "en", "srcA", 10L)) ++
      (41 to 70).map(i => (i.toLong, "t", "de", "srcB", 10L)) ++
      Seq((71L, "t", "fr", "srcC", 10L))) // singleton class: must be withheld
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = AuditOps.dpReleaseCounts(docs)
    val rows = out.collect().map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // singleton class: true 1, noise bounded by ±20 but threshold-5
    // release requires noisy ≥ 5 — withheld here (its hash draws z = 0)
    assert(!rows.contains(("fr", "srcC")))
    // released classes: noise within the clamp, ε accounted on each row
    for (((_, _), (rel, eps)) <- rows) {
      assert(eps == AuditOps.DpEpsilonMicro)
      assert(rel >= 5L)
    }
    assert(math.abs(rows(("en", "srcA"))._1 - 40L) <= 20L)
    assert(math.abs(rows(("de", "srcB"))._1 - 30L) <= 20L)
    // pure function of the data: replay is bit-identical
    val replay = AuditOps.dpReleaseCounts(docs).collect().map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(replay == rows)
  }

  test("dpReleaseCounts: a secret salt changes the noise; default path unchanged") {
    val docs = (0 until 30).flatMap(c =>
      (1 to 30).map(i => ((c * 100 + i).toLong, "t", s"l$c", s"s$c", 10L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def release(salt: String) =
      AuditOps.dpReleaseCounts(docs, secretSalt = salt).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val pub = release("dp:")                 // the public oracle default
    val sec = release("k3y-from-a-csprng:")  // a stand-in secret salt
    // same salt → same release (explicit arg ≡ default arg)
    assert(pub == AuditOps.dpReleaseCounts(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap)
    // a different salt must redraw the noise on at least one class —
    // the adversary who knows only the public default cannot replay it
    val common = pub.keySet.intersect(sec.keySet)
    assert(common.nonEmpty && common.exists(k => pub(k) != sec(k)))
    // both releases still honor clamp and threshold
    assert(sec.values.forall(r => r >= 5L && math.abs(r - 30L) <= 20L))
  }

  test("dpReleaseCounts noise is not identically zero across classes") {
    val docs = (0 until 30).flatMap(c =>
      (1 to 30).map(i => ((c * 100 + i).toLong, "t", s"l$c", s"s$c", 10L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rel = AuditOps.dpReleaseCounts(docs).collect().map(_.getLong(2))
    assert(rel.exists(_ != 30L)) // some class must draw nonzero noise
    assert(rel.forall(r => math.abs(r - 30L) <= 20L))
  }

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("fkOrphans counts orphaned child rows and unreferenced parents") {
    val orders = Seq(
      (1L, 10L, "O", 100.0, ts("2024-01-01"), "1-URGENT"),
      (2L, 99L, "O", 200.0, ts("2024-01-02"), "1-URGENT")) // orphan cust 99
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val lineitem = Seq(
      (1L, 100L, 7L, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts("2024-01-03")),
      (3L, 100L, 7L, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts("2024-01-03"))) // orphan order 3
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val part = Seq((100L, "p", "b", "t", 1, 1.0), (200L, "q", "b", "t", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val supplier = Seq((7L, "s", 1, 0.0)).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val customer = Seq((10L, "c", 1, 0.0, "AUTO"), (20L, "d", 1, 0.0, "AUTO"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val nation = Seq((1, "FRANCE", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((0, "EUROPE")).toDF("r_regionkey", "r_name")

    val out = AuditOps.fkOrphans(lineitem, orders, part, supplier, customer,
      nation, region).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.size == 14)
    // lineitem order 3 has no parent order -> 1 orphan row / 1 key
    assert(out(("lineitem.l_orderkey->orders", "fk_orphan")) == ((1L, 1L)))
    // order for cust 99 -> orphan; customer 20 never ordered -> unreferenced
    assert(out(("orders.o_custkey->customer", "fk_orphan")) == ((1L, 1L)))
    assert(out(("orders.o_custkey->customer", "unreferenced_parent")) == ((1L, 1L)))
    // part 200 never shipped
    assert(out(("lineitem.l_partkey->part", "unreferenced_parent")) == ((1L, 1L)))
    // healthy edge: zero orphans
    assert(out(("nation.n_regionkey->region", "fk_orphan")) == ((0L, 0L)))
  }

  test("benfordAudit reports exact micro-unit shares vs the Benford table") {
    // 2 orders starting with 1, 1 with 9 -> shares 666666 / 333333
    val orders = Seq(
      (1L, 10L, "O", 100.0, ts("2024-01-01"), "x"),
      (2L, 10L, "O", 199.0, ts("2024-01-01"), "x"),
      (3L, 10L, "O", 900.0, ts("2024-01-01"), "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val lineitem = Seq(
      (1L, 100L, 7L, 1, 1.0, 55.5, 0.0, 0.0, "N", "O", ts("2024-01-03")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val out = AuditOps.benfordAudit(orders, lineitem).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out(("o_totalprice", 1L)) == ((2L, 666666L, 301029L, 365637L)))
    assert(out(("o_totalprice", 9L)) == ((1L, 333333L, 45757L, 287576L)))
    assert(out(("l_extendedprice", 5L)) == ((1L, 1000000L, 79181L, 920819L)))
  }

  test("benford expectation table matches the closed form") {
    assert(AuditOps.benfordExpMicro.head == ((1, 301029L)))
    assert(AuditOps.benfordExpMicro.map(_._2).sum >= 999990L) // floors sum just under 1e6
  }

  test("quantileSketchAudit exact nearest-rank values with in-band sketch") {
    // 1..100 dollars in one group: P50 = 50.00, P90 = 90.00
    val orders = (1 to 100).map(i =>
      (i.toLong, 1L, "O", i.toDouble, ts("2024-01-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r = AuditOps.quantileSketchAudit(orders).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 100L)
    assert(row.getDouble(2) == 50.0 && row.getDouble(3) == 90.0)
    assert(row.getBoolean(4) && row.getBoolean(5))
  }

  test("nameFuzzyPairs has full recall at distance 1 via symmetric delete") {
    val customer = Seq(
      (1L, "Customer#000000001", 1, 0.0, "AUTO"),
      (2L, "Customer#000000002", 1, 0.0, "AUTO"),  // dist 1 from #1 (subst)
      (3L, "Customer#000000092", 1, 0.0, "AUTO"),  // dist 1 from #2, 2 from #1
      (4L, "Customer#000001001", 1, 0.0, "AUTO"),  // dist 1 from #1 — NOT in
                                                   // #1's tail-prefix block
      (5L, "Customer#00000001", 1, 0.0, "AUTO"))   // deletion variant of #1
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val out = AuditOps.nameFuzzyPairs(customer).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).sorted
    assert(out.toSeq == Seq((1L, 2L, 1L), (1L, 4L, 1L), (1L, 5L, 1L),
      (2L, 3L, 1L), (4L, 5L, 1L)))
  }

  test("partitionStats emits manifest-grade min/max/null stats per month") {
    val li = Seq(
      (1L, 1L, 1L, 1, 5.0, 100.50, 0.0, 0.0, "N", "O", ts("1995-03-01")),
      (2L, 1L, 1L, 1, 9.0, 200.25, 0.0, 0.0, "N", "O", ts("1995-03-20")),
      (3L, 1L, 1L, 1, 2.0, 50.00, 0.0, 0.0, "N", "O", ts("1995-04-02")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val out = AuditOps.partitionStats(li).collect()
      .map(r => r.getString(0) -> r).toMap
    val mar = out("1995-03")
    assert(mar.getLong(1) == 2L && mar.getLong(2) == 5L && mar.getLong(3) == 9L)
    assert(mar.getDouble(4) == 100.50 && mar.getDouble(5) == 200.25)
    assert(mar.getDate(6).toString == "1995-03-01" &&
      mar.getDate(7).toString == "1995-03-20")
    assert(mar.getLong(8) == 0L)
    assert(out("1995-04").getLong(1) == 1L)
  }

  test("statsDrift accounts rows, nulls, ranges, and flags expansion per column") {
    import spark.implicits._
    val base = Seq((Some(1L), Some(10L)), (Some(2L), Some(20L)),
      (None, Some(30L))).toDF("a", "b")
    val cur = Seq((Some(5L), Some(15L)), (None, Some(25L)),
      (None, Some(12L)), (None, Some(18L))).toDF("a", "b")
    val out = AuditOps.statsDrift(base, cur, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 3L && a.getLong(2) == 4L) // rows
    assert(a.getLong(3) == 1L && a.getLong(4) == 3L) // nulls
    assert(a.getLong(5) == 1L && a.getLong(6) == 5L) // mins
    assert(a.getLong(7) == 2L && a.getLong(8) == 5L) // maxes
    // (3·10⁶ div 4) − (1·10⁶ div 3) = 750000 − 333333
    assert(a.getLong(9) == 416667L)
    assert(a.getBoolean(10)) // max moved above the baseline envelope
    val b = out("b")
    assert(b.getLong(9) == 0L && !b.getBoolean(10)) // inside the envelope
  }

  test("joinPlanAdvisor picks each strategy from the side stats") {
    import spark.implicits._
    def keys(ks: Long*) = ks.map(Tuple1(_)).toDF("k")
    val big = keys(1L, 2L, 3L, 4L, 5L)
    val out = AuditOps.joinPlanAdvisor(Seq(
      ("small_right", big, "k", keys(1L, 2L), "k"),
      ("small_left", keys(1L, 2L), "k", big, "k"),
      ("hot_key", keys(1L, 1L, 1L, 1L, 2L, 3L), "k", big, "k"),
      ("uniform", big, "k", big, "k")),
      broadcastRowLimit = 2, skewFactorMicro = 1500000).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("small_right").getAs[String]("recommended") == "broadcast_right")
    assert(out("small_left").getAs[String]("recommended") == "broadcast_left")
    // hot side: max_cnt 4 · ndv 3 / n 6 = 2× uniform ≥ 1.5× threshold
    assert(out("hot_key").getAs[Long]("skew_left_micro") == 2000000L)
    assert(out("hot_key").getAs[String]("recommended") == "shuffle_salted")
    assert(out("uniform").getAs[Long]("skew_left_micro") == 1000000L)
    assert(out("uniform").getAs[String]("recommended") == "shuffle_hash")
  }

  test("kAnonymityReport histograms equivalence classes and flags the at-risk mass") {
    // quasi-identifier = (lang, source, n_chars div 256): three classes
    // of sizes 1, 2, and 8 → size classes 0, 1, 3
    def doc(id: Long, lang: String, source: String, chars: Long) =
      (id, s"text $id", lang, source, chars)
    val df = (
      Seq(doc(1, "en", "web", 100)) ++                           // singleton
      Seq(doc(2, "de", "web", 100), doc(3, "de", "web", 130)) ++ // size 2
      (10L to 17L).map(i => doc(i, "en", "books", 600))          // size 8
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = AuditOps.kAnonymityReport(df, k = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map(
      0L -> ((1L, 1L, 1L)),   // one singleton class, its doc at risk
      1L -> ((1L, 2L, 2L)),   // one size-2 class, both docs at risk
      3L -> ((1L, 8L, 0L))))  // the size-8 class clears k = 5
    // doc accounting is lossless
    assert(out.values.map(_._2).sum == df.count())
  }

  test("lDiversityReport histograms sensitive-value diversity and flags homogeneous classes") {
    // classes = (source, n_chars div 256); sensitive = lang.
    // web/bucket0: langs {en, de} → diversity 2 over 3 docs (risk at l=3)
    // books/bucket2: langs {en, de, fr} → diversity 3 over 3 docs (clear)
    // web/bucket2: lang {en} ×2 → diversity 1 (the homogeneity attack)
    def doc(id: Long, lang: String, source: String, chars: Long) =
      (id, s"text $id", lang, source, chars)
    val df = Seq(
      doc(1, "en", "web", 100), doc(2, "de", "web", 120),
      doc(3, "en", "web", 200),
      doc(4, "en", "books", 600), doc(5, "de", "books", 610),
      doc(6, "fr", "books", 620),
      doc(7, "en", "web", 600), doc(8, "en", "web", 640))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = AuditOps.lDiversityReport(df, l = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out == Map(
      1L -> ((1L, 2L, true)),   // the single-language class
      2L -> ((1L, 3L, true)),   // two languages, still < l = 3
      3L -> ((1L, 3L, false)))) // diverse class clears the gate
    // doc accounting is lossless
    assert(out.values.map(_._2).sum == df.count())
  }

  test("nameFuzzyPairs and erClusters share one deletion-variant pair-graph build") {
    val customer = Seq(
      (1L, "AB", 1), (2L, "AC", 1), (3L, "AD", 1),
      (4L, "AB", 2), (5L, "XY", 2), (6L, "ZW", 2))
      .toDF("c_custkey", "c_name", "c_nationkey")
    graft.operators.Memo.invalidate()
    AuditOps.nameFuzzyPairs(customer).count()
    val first = graft.operators.Memo.drainBuildSeconds()
    assert(first.contains("fuzzy_name_pairs"), first.keys.toSeq.sorted.mkString(","))
    // the ER path must consume the SAME derivation — a second
    // fuzzy_name_pairs build would mean the memo key missed
    AuditOps.erClusters(customer).count()
    val second = graft.operators.Memo.drainBuildSeconds()
    assert(!second.contains("fuzzy_name_pairs"),
      s"er_clusters rebuilt the pair graph: ${second.keys.toSeq.sorted.mkString(",")}")
    assert(second.contains("er_clusters"))
    graft.operators.Memo.invalidate()
  }

  test("erClusters: nation-blocked dist-1 names resolve to one entity") {
    // AB/AC/AD in nation 1 are pairwise dist 1 → one cluster rooted at
    // the min custkey; the identical name in nation 2 must NOT join
    // (blocking), and the dist-2 pair never becomes a candidate
    val customer = Seq(
      (1L, "AB", 1), (2L, "AC", 1), (3L, "AD", 1),
      (4L, "AB", 2), (5L, "XY", 2), (6L, "ZW", 2))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val got = AuditOps.erClusters(customer).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false), (3L, 1L, 3L, false)))
  }

  test("backfillPlan: the month spine exposes the silently-skipped month") {
    import org.apache.spark.sql.functions.{col, to_date}
    val orders = Seq(
      (1L, "1995-01-15", 1.0), (2L, "1995-01-20", 1.0),
      (3L, "1995-03-02", 1.0)) // February never landed
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
    val got = AuditOps.backfillPlan(orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == Map(
      "1995-01" -> ((2L, false)),
      "1995-02" -> ((0L, true)),
      "1995-03" -> ((1L, false))))
  }

  test("fdAudit: exact hold/violation verdicts per candidate FD") {
    val customer = Seq((1L, "n1", 1), (2L, "n2", 1))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val part = Seq((1L, "B1", "T1"), (2L, "B1", "T2"), (3L, "B2", "T3"))
      .toDF("p_partkey", "p_brand", "p_type")
    val orders = Seq((1L, 10L, "O"), (2L, 10L, "F"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
    val documents = Seq((1L, "s1", "en"), (2L, "s1", "en"))
      .toDF("doc_id", "source", "lang")
    val got = AuditOps.fdAudit(customer, part, orders, documents).collect()
      .map(r => (r.getString(0) + "." + r.getString(1) + "->" + r.getString(2),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(got("customer.c_name->c_nationkey") == ((2L, 0L, 0L, true)))
    assert(got("part.p_brand->p_type") == ((2L, 1L, 2L, false)))
    assert(got("part.p_type->p_brand") == ((3L, 0L, 0L, true)))
    assert(got("orders.o_custkey->o_orderstatus") == ((1L, 1L, 2L, false)))
    assert(got("documents.source->lang") == ((1L, 0L, 0L, true)))
  }
}
