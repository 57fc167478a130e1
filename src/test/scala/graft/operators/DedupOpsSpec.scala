package graft.operators

import graft.SparkSpec

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private val base = "the quick brown fox jumps over the lazy dog again and again"

  test("dedupSubstrings merges overlapping dup windows into one maximal run") {
    // 20 shared tokens → 13 overlapping dup windows → ONE 20-token run;
    // a second 10-token shared passage merges to a 10-token run that
    // falls below SubstringMinTokens and is excluded from the verdict
    val common20 = (1 to 20).map(i => s"c$i").mkString(" ")
    val common10 = (1 to 10).map(i => s"d$i").mkString(" ")
    def fill(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val df = docs(
      1L -> s"${fill("a", 5)} $common20 ${fill("z", 5)} $common10",
      2L -> s"${fill("b", 5)} $common10 ${fill("y", 5)} $common20")
    val out = DedupOps.dedupSubstrings(df).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_islands") == 1L,
        s"overlapping windows must merge to one run: $r")
      assert(r.getAs[Long]("longest_run") == 20L)
      assert(r.getAs[Long]("dup_tokens") == 20L)
      assert(r.getAs[Long]("n_tokens") == 40L)
      assert(r.getAs[Boolean]("drop_doc"), "20/40 shared must trip the verdict")
    }
    // docs with only sub-minTokens runs produce no verdict row
    val small = docs(3L -> s"${fill("e", 6)} $common10",
      4L -> s"${fill("f", 6)} $common10")
    assert(DedupOps.dedupSubstrings(small).collect().isEmpty)
  }

  test("substringReport surfaces the duplicated text itself, grouped and ranked") {
    val common20 = (1 to 20).map(i => s"c$i").mkString(" ")
    val common16 = (1 to 16).map(i => s"d$i").mkString(" ")
    def fill(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    // the 20-token passage is shared by THREE docs, the 16-token one by
    // two — the report must rank the wider-spread snippet first and
    // reconstruct both texts exactly
    val df = docs(
      1L -> s"${fill("a", 5)} $common20 ${fill("z", 5)} $common16",
      2L -> s"${fill("b", 5)} $common20",
      3L -> s"$common20 ${fill("y", 5)} $common16")
    val out = DedupOps.substringReport(df).collect()
    assert(out.length == 2, out.mkString("\n"))
    val first = out(0)
    assert(first.getAs[String]("snippet") == common20)
    assert(first.getAs[Long]("n_docs") == 3L)
    assert(first.getAs[Long]("n_occurrences") == 3L)
    assert(first.getAs[Long]("run_tokens") == 20L)
    assert(first.getAs[Long]("example_doc_id") == 1L)
    val second = out(1)
    assert(second.getAs[String]("snippet") == common16)
    assert(second.getAs[Long]("n_docs") == 2L)
    // sub-minTokens shared passages never surface
    val small = docs(5L -> s"${fill("e", 6)} ${(1 to 10).map(i => s"f$i").mkString(" ")}",
      6L -> s"${fill("g", 6)} ${(1 to 10).map(i => s"f$i").mkString(" ")}")
    assert(DedupOps.substringReport(small).collect().isEmpty)
  }

  test("dedupSpans flags cross-document repeated 8-token passages") {
    val df = docs(
      1L -> "a b c d e f g h x",
      2L -> "y a b c d e f g h",
      3L -> "q w e r t u i o p",
      4L -> "too short")
    val out = DedupOps.dedupSpans(df).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"))))
      .toMap
    // docs 1/2 share the span "a b c d e f g h"; doc 3 has only unique
    // spans; doc 4 is below the window length and emits none.
    assert(out == Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L)), 3L -> ((2L, 0L))))
  }

  test("lshRecallReport scores the sketch pairs against blocked-exact truth") {
    val df = docs(
      1L -> base, 2L -> base, // exact dups: in both legs
      3L -> "totally different content words that share nothing at all")
    val r = DedupOps.lshRecallReport(df).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4)) == ((1L, 1L, 1L, 1000000L, 1000000L)))
  }

  test("dedupContainment finds asymmetric near-subset pairs Jaccard misses") {
    val small = "the quick brown fox jumps over the lazy dog"
    val big = small + " and then several additional trailing words arrive here today"
    val df = docs(
      1L -> small,      // contained in 2 (prefix ⇒ containment = 1.0)
      2L -> big,
      3L -> "completely unrelated content about something else entirely",
      4L -> small)      // exact dup of 1
    val out = DedupOps.dedupContainment(df).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    // every 5-gram of `small` is a 5-gram of `big`, so 1→2 and 4→2 are
    // full containments; 1↔4 are mutual; 2→1 fails (n_big ≫) and 3
    // pairs with nothing
    assert(out == Map((1L, 2L) -> 1.0, (4L, 2L) -> 1.0,
      (1L, 4L) -> 1.0, (4L, 1L) -> 1.0))
  }

  test("dedupExact groups identical normalized content") {
    val df = docs(1L -> base, 2L -> (base + " extra"), 3L -> s"  $base  ")
    val out = DedupOps.dedupExact(df).orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out.head.getLong(0) == 1L && out.head.getLong(2) == 2L) // 1 & 3 collapse
  }

  test("dedupMinhashLsh finds identical docs with est 1.0") {
    val df = docs(1L -> base, 2L -> base, 3L -> "completely different words entirely")
    val out = DedupOps.dedupMinhashLsh(df, minEst = 0.9).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L)
    assert(out.head.getDouble(2) == 1.0)
  }

  test("dedupNgramJaccard computes exact overlap on near-dups") {
    val df = docs(1L -> base, 2L -> (base + " x"), 3L -> "zzz yyy xxx www vvv")
    val out = DedupOps.dedupNgramJaccard(df, tau = 0.5).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getDouble(2) > 0.8)
  }

  test("dedupNgramJaccard prefix filtering loses no τ-pair vs the quadratic definition") {
    // sliding-window docs over a word pool: adjacent docs share 9 of 10
    // words in order (high shingle overlap), distant docs share few
    val pool = (0 until 30).map(k => f"w$k%02d")
    val rows = (0 until 20).map(i => (i.toLong + 1) -> pool.slice(i, i + 10).mkString(" "))
    val df = docs(rows: _*)
    // dfCap high so only the prefix filter shapes the candidate set —
    // the PPJoin guarantee says the final output must equal ALL τ-pairs
    val got = DedupOps.dedupNgramJaccard(df, tau = 0.5, dfCap = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def sh(s: String) =
      (0 to s.length - 5).map(j => s.substring(j, j + 5)).toSet
    val texts = rows.toMap
    val expect = (for {
      a <- 1L to 20L; b <- (a + 1) to 20L
      sa = sh(texts(a)); sb = sh(texts(b))
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.5
    } yield (a, b)).toSet
    assert(expect.nonEmpty && got == expect)
  }

  test("dedupSimhash pairs identical docs at hamming 0") {
    val df = docs(1L -> base, 2L -> base, 3L -> "unrelated corpus entry entirely different")
    val out = DedupOps.dedupSimhash(df).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L)
    assert(out.head.getLong(2) == 0L)
  }

  test("withMinhashSignature drops docs shorter than one shingle") {
    val df = docs(1L -> "abc", 2L -> base)
    assert(DedupOps.withMinhashSignature(df).count() == 1)
  }

  test("dedupIncremental flags incoming docs colliding with the existing corpus") {
    val existing = docs(1L -> base, 2L -> "unrelated existing material entirely",
      3L -> base)
    val incoming = docs(101L -> base, 102L -> "brand new unseen content here")
    val out = DedupOps.dedupIncremental(incoming, existing).collect()
    // only 101 collides; best match is the smallest colliding existing id
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 101L)
    assert(r.getLong(1) == 2L)                       // matches docs 1 and 3
    assert(r.getAs[Double]("best_est") == 1.0)
    assert(r.getAs[Long]("best_doc_ex") == 1L)       // tie → smallest id
  }

  test("LSH bucket cap keeps a degenerate corpus from going quadratic") {
    // 1000 identical docs would otherwise form 8 buckets of 1000 docs
    // each (≈4M joined rows); the cap drops them — exact dedup is the
    // operator responsible for identical content
    val df = (1L to 1000L).map(i => (i, base, "en", "src", base.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(DedupOps.dedupMinhashLsh(df).count() == 0L)
    // a small near-dup group below the cap still surfaces
    val mixed = docs(1L -> base, 2L -> base, 3L -> "something else entirely here")
    assert(DedupOps.dedupMinhashLsh(mixed, minEst = 0.9).count() == 1L)
  }

  test("dedupMethodOverlap flags identical docs by all three methods") {
    val df = docs(
      1L -> base,
      2L -> base,                               // identical → all methods
      3L -> "entirely unrelated text about completely different subject matter")
    val out = DedupOps.dedupMethodOverlap(df).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // doc 3 never flagged
    out.foreach { r =>
      assert(r.getAs[Boolean]("by_exact"))
      assert(r.getAs[Boolean]("by_minhash"))
      assert(r.getAs[Boolean]("by_simhash"))
      assert(r.getAs[Long]("n_methods") == 3L)
    }
  }

  test("sourceOverlap reports shared fingerprints + Jaccard per source pair") {
    val df = Seq(
      (1L, "shared doc", "en", "A", 10L), (2L, "only in a", "en", "A", 9L),
      (3L, "shared doc", "en", "B", 10L), (4L, "only in b", "en", "B", 9L),
      (5L, "lonely", "en", "C", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = DedupOps.sourceOverlap(df).orderBy("source_a", "source_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // every pair present, including zero-overlap ones
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    // A∩B = {"shared doc"}: jaccard = 1/(2+2−1) = 333333 micro
    assert(out(("A", "B")) == ((1L, 2L, 2L, 333333L)))
    assert(out(("A", "C")) == ((0L, 2L, 1L, 0L)))
    assert(out(("B", "C")) == ((0L, 2L, 1L, 0L)))
  }

  test("lshBandTuning: exact duplicates give certain recall at every banding") {
    // one j = 1.0 pair: s^r = 1e6, (1−s^r)^b = 0 → p = 1e6 exactly
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "A", 43L),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "A", 43L),
      (3L, "completely different content with zero overlap", "en", "B", 46L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = DedupOps.lshBandTuning(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set((16L, 2L), (8L, 4L), (4L, 8L)))
    assert(out.values.forall(_ == ((1L, 1000000L))))
  }

  test("lshBandTuning matches the stepwise fixed-point S-curve on partial overlaps") {
    // overlapping-but-unequal docs: jaccard strictly inside (0.5, 1), so
    // the unrolled micro-power path actually exercises intermediate
    // flooring; replicate the arithmetic directly from the exact pairs
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      (1L, base, "en", "A", 60L),
      (2L, base + " extra", "en", "A", 66L),
      (3L, "unrelated words entirely elsewhere", "en", "B", 34L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val js = DedupOps.dedupNgramJaccard(df).collect()
      .map(r => math.round(r.getAs[Double]("jaccard") * 1e6))
    assert(js.nonEmpty && js.exists(j => j > 500000L && j < 1000000L))
    def powM(x: Long, e: Int): Long =
      (2 to e).foldLeft(x)((a, _) => a * x / 1000000L)
    val out = DedupOps.lshBandTuning(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    for (((b, r), got) <- out) {
      val exp = js.map(j => 1000000L - powM(1000000L - powM(j, r.toInt), b.toInt))
        .sum / js.length
      assert(got == exp, s"config ($b,$r)")
    }
    // fewer rows per band → more forgiving banding → recall monotone
    assert(out((16L, 2L)) >= out((8L, 4L)) && out((8L, 4L)) >= out((4L, 8L)))
  }

  test("jaccardSimHistogram bins exact pairs; j = 1.0 clamps into the top bin") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "A", 43L),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "A", 43L),
      (3L, "nothing like the others at all", "en", "B", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = DedupOps.jaccardSimHistogram(df).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(out == Map(9L -> ((0.95, 1.0, 1L))))
  }

  test("dedupDegreeStats: a triangle of duplicates is three degree-2 docs") {
    val df = Seq(
      (1L, "identical payload text for the cluster", "en", "A", 38L),
      (2L, "identical payload text for the cluster", "en", "A", 38L),
      (3L, "identical payload text for the cluster", "en", "B", 38L),
      (4L, "a singleton document with its own words", "en", "B", 39L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = DedupOps.dedupDegreeStats(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(2L -> 3L))
  }

  test("dedupCascade attributes removals to the first matching stage") {
    val df = docs(
      1L -> "an exactly duplicated payload of shared words here",
      2L -> "an exactly duplicated payload of shared words here", // copy of 1
      3L -> "a completely different standalone document with other content")
    val out = DedupOps.dedupCascade(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 2 removed at the exact stage (8 tokens); docs 1 and 3 kept
    assert(out("1_exact") == ((1L, 8L, 333333L)))
    assert(out("kept") == ((2L, 16L, 666666L)))
    assert(out.keySet == Set("1_exact", "kept"))
  }
}
