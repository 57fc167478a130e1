package graft.operators

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.map { case (id, t, l) => (id, t, l, "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("templateFingerprint groups digit-masked opening skeletons") {
    val df = docs(
      // same first-8-token skeleton after digit masking, divergent tails
      (1L, "invoice 123 for customer alpha due on friday please remit promptly", "en"),
      (2L, "invoice 99954 for customer alpha due on friday thanks and goodbye", "en"),
      // differs within the first 8 tokens → own skeleton
      (3L, "invoice 55 for customer beta due on friday please remit", "en"),
      (4L, "no digits here", "en"),
      (5L, "no digits here", "en"))          // exact dup of 4
    val out = TextOps.templateFingerprint(df).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // two groups of 2 (reps 1 and 4); singletons filtered out
    assert(out == Set((2L, 1L, 1L), (2L, 1L, 4L)))
  }

  test("tfidfDocPairs weighs shared rare tokens, exact integer internals") {
    val df = docs(
      (1L, "alpha beta gamma", "en"),
      (2L, "alpha beta delta", "en"),
      (3L, "zeta eta theta", "en"))
    // N=3; df(alpha)=df(beta)=2 → wt=1500; unique tokens → wt=3000.
    // norm²(1)=norm²(2)=1500²·2+3000²=13.5e6; dot(1,2)=1500²·2=4.5e6;
    // sim = 4.5/13.5 = 1/3 → 0.3333. doc3 shares nothing.
    val out = TextOps.tfidfDocPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq((1L, 2L, 2L, 0.3333)))
  }

  test("tfidfDocPairs: df cap drops pairs sharing only common tokens") {
    val common = (1L to 9L).map(i => (i, s"filler$i shared", "en"))
    val df = docs(common: _*)
    // 'shared' df=9 > cap → no candidate token survives → no pairs
    assert(TextOps.tfidfDocPairs(df, dfCap = 5).count() == 0)
    // with the cap above df the pairs appear (sim = 1M/82M ≈ 0.0122)
    assert(TextOps.tfidfDocPairs(df, dfCap = 100, minSim = 0.01).count() == 36)
  }

  test("langId prefers the language with most stopword hits") {
    val df = docs(
      (1L, "the cat and the dog is in the house", "en"),
      (2L, "el perro y la casa de los gatos", "es"))
    val out = TextOps.langId(df).orderBy("doc_id").collect()
    assert(out.head.getAs[String]("predicted_lang") == "en")
    assert(out(1).getAs[String]("predicted_lang") == "es")
    assert(out.forall(_.getAs[Boolean]("is_match")))
  }

  test("tokenCount handles empty and multi-space text") {
    val df = docs((1L, "", "en"), (2L, "a  b   c", "en"))
    val out = TextOps.tokenCount(df).orderBy("doc_id").collect()
    assert(out.head.getLong(1) == 0L)
    assert(out(1).getLong(1) == 3L && out(1).getLong(3) == 3L)
  }

  test("qualityScore stays in [0,1] and rewards clean text") {
    val df = docs(
      (1L, Seq.fill(30)("the good and clean text of words").mkString(" "), "en"),
      (2L, "@#$% ^&* !!!", "en"))
    val out = TextOps.qualityScore(df).orderBy("doc_id").collect()
    val good = out.head.getAs[Double]("quality_score")
    val bad = out(1).getAs[Double]("quality_score")
    assert(good > bad && good <= 1.0 && bad >= 0.0)
  }

  test("bigramTopK counts adjacent token pairs with deterministic order") {
    val df = docs((1L, "a b a b c", "en"), (2L, "a b", "en"), (3L, "x", "en"))
    val out = TextOps.bigramTopK(df, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("contaminationCheck flags corpus docs overlapping the probe set") {
    val df = docs(
      (0L, "alpha beta gamma delta epsilon zeta", "en"),   // probe
      (10L, "alpha beta gamma delta epsilon other", "en"), // 4 shared bigrams
      (11L, "totally different words here now", "en"))
    val out = TextOps.contaminationCheck(df, nProbe = 5, minOverlap = 3).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 10L && out.head.getLong(1) == 0L)
    assert(out.head.getLong(2) == 4L)
  }

  test("gateReasonBreakdown attributes every doc to exactly one outcome per source") {
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "the small cat walks past the old house again today"
    val df = Seq(
      (1L, good, "en", "web", good.length.toLong),
      (2L, "tiny", "en", "web", 4L),            // too_short
      (3L, "tiny too", "en", "books", 8L),      // too_short
      (4L, good, "en", "books", good.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.gateReasonBreakdown(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(4)))).toMap
    assert(out.keySet == Set(("web", "pass"), ("web", "too_short"),
      ("books", "pass"), ("books", "too_short")))
    // each source splits 1/1 → 50% micro shares, and docs are conserved
    out.values.foreach { case (n, share) =>
      assert(n == 1L && share == 500000L)
    }
    assert(out.values.map(_._1).sum == df.count())
  }

  test("decontaminatedCorpus drops flagged docs and the probes themselves") {
    val df = docs(
      (0L, "alpha beta gamma delta epsilon zeta", "en"),   // probe
      (10L, "alpha beta gamma delta epsilon other", "en"), // contaminated
      (11L, "totally different words here now", "en"))     // clean
    val kept = TextOps.decontaminatedCorpus(df, nProbe = 5, minOverlap = 3)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L),
      s"probe 0 and contaminated 10 must both be excluded, got $kept")
    // schema mirrors the corpus materializations (survivors pattern)
    val cols = TextOps.decontaminatedCorpus(df).columns.toSeq
    assert(cols == Seq("doc_id", "lang", "source", "n_chars"))
  }

  test("rarityScore ranks rare-token docs above common-token docs") {
    val df = docs(
      (1L, "common common common common", "en"),
      (2L, "common uniqueword", "en"))
    val out = TextOps.rarityScore(df).orderBy("doc_id").collect()
    assert(out(1).getDouble(2) > out.head.getDouble(2))
  }

  test("docFingerprint groups identical content") {
    val df = docs((1L, "same text", "en"), (2L, "same text", "en"), (3L, "other", "en"))
    val out = TextOps.docFingerprint(df).orderBy("doc_id").collect()
    assert(out.head.getLong(2) == 2L && out(2).getLong(2) == 1L)
    assert(out.head.getLong(1) == out(1).getLong(1))
  }

  test("docKeyterms ranks rare-but-frequent terms above common ones") {
    // "zebra" appears twice in doc 1 only (df=1); "the" is in all 3 docs
    val df = docs(
      (1L, "the zebra saw the zebra", "en"),
      (2L, "the cat sat", "en"),
      (3L, "the dog ran", "en"))
    val out = TextOps.docKeyterms(df, k = 2).orderBy("doc_id", "rank").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.head.getAs[String]("tok") == "zebra")
    // zebra: tf=2, df=1 → 2*(3000 div 1)=6000; saw: tf=1, df=1 → 3000
    // (which outranks "the": tf=2, df=3 → 2*1000 = 2000)
    assert(d1.head.getAs[Long]("score") == 6000L)
    assert(d1(1).getAs[String]("tok") == "saw")
    assert(d1(1).getAs[Long]("score") == 3000L)
    assert(out.forall(_.getAs[Long]("rank") <= 2L))
  }

  test("repetitionReport flags duplicate-heavy bigram distributions") {
    val df = docs(
      (1L, "spam spam spam spam spam", "en"),  // 4 bigrams, 1 distinct
      (2L, "all fresh words in here", "en"),   // 4 bigrams, 4 distinct
      (3L, "solo", "en"))                      // < 2 tokens → no bigrams
    val out = TextOps.repetitionReport(df).orderBy("doc_id").collect()
    assert(out.length == 2)
    val spam = out.head
    assert(spam.getAs[Long]("n_bigrams") == 4L)
    assert(spam.getAs[Long]("n_distinct_bigrams") == 1L)
    assert(spam.getAs[Double]("dup_bigram_frac") == 0.75)
    assert(spam.getAs[Double]("top_bigram_frac") == 1.0)
    assert(spam.getAs[Boolean]("is_repetitive"))
    val fresh = out(1)
    assert(fresh.getAs[Double]("dup_bigram_frac") == 0.0)
    assert(!fresh.getAs[Boolean]("is_repetitive"))
  }

  test("piiRedact counts and masks synthesized emails, phones, and IPs") {
    // doc_id % 5 selects the injected PII kind: 0=email, 1=phone, 2=ip,
    // 3/4 untouched
    val df = docs((5L, "plain words", "en"), (6L, "plain words", "en"),
      (7L, "plain words", "en"), (8L, "plain words", "en"))
    val out = TextOps.piiRedact(df).orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(6))))
      .toMap
    assert(out(5L) == ((1L, 0L, 0L, true)))   // email injected
    assert(out(6L) == ((0L, 1L, 0L, true)))   // phone injected
    assert(out(7L) == ((0L, 0L, 1L, true)))   // ip injected
    assert(out(8L) == ((0L, 0L, 0L, false)))  // clean
    // redaction shrinks/changes the hash only where PII existed
    val byId = TextOps.piiRedact(df).orderBy("doc_id").collect()
    val cleanLen = "plain words".length.toLong
    assert(byId(3).getAs[Long]("redacted_len") == cleanLen)
    assert(byId.take(3).forall(_.getAs[Long]("redacted_len") > cleanLen))
  }

  test("qualityGate attributes the first failing rule and keeps clean docs") {
    val longClean = ("the quick brown fox jumps over the lazy dog and " * 5).trim
    val df = docs(
      (1L, longClean, "en"),                    // passes every rule
      (2L, "tiny", "en"),                       // too_short fires first
      (3L, ("zz@@@! " * 30).trim, "en"))        // long enough, special chars
    val out = TextOps.qualityGate(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Boolean]("keep"), Option(r.getAs[String]("reject_reason"))))).toMap
    assert(out(1L) == ((true, None)))
    assert(out(2L) == ((false, Some("too_short"))))
    assert(out(3L) == ((false, Some("special_chars"))))
  }

  test("invertedIndex emits df, tf, and a sorted bounded posting sample") {
    val df = docs((1L, "a b a", "en"), (2L, "b c", "en"))
    val out = TextOps.invertedIndex(df).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("df"), r.getAs[Long]("tf"),
          r.getAs[String]("posting_sample")))).toMap
    assert(out == Map(
      "a" -> ((1L, 2L, "1")),
      "b" -> ((2L, 2L, "1,2")),
      "c" -> ((1L, 1L, "2"))))
  }

  test("invertedIndex caps the posting sample") {
    val df = docs((1 to 9).map(i => (i.toLong, "tok", "en")): _*)
    val out = TextOps.invertedIndex(df, postingSample = 3).head
    assert(out.getAs[Long]("df") == 9L)
    assert(out.getAs[String]("posting_sample") == "1,2,3")
  }

  test("ngramLmScore is the exact mean scaled conditional bigram frequency") {
    val df = docs((1L, "a b a b", "en"), (2L, "x y", "en"))
    val out = TextOps.ngramLmScore(df).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("lm_score")))).toMap
    // doc 1 bigrams: "a b"×2 (C=2, C(a)=2 → 10⁶ each), "b a" (C=1, C(b)=2 → 5·10⁵)
    assert(out(1L) == ((3L, 833333.3333)))
    // doc 2: single unseen-elsewhere bigram → conditional frequency 1
    assert(out(2L) == ((1L, 1000000.0)))
  }

  test("langConfusion tabulates predicted vs actual with exact shares") {
    val df = docs(
      (1L, "the quick fox is in the den", "en"),  // en → en
      (2L, "el la de los y que", "es"),           // es → es
      (3L, "zzz qqq", "en"))                      // no stopwords → en tie-win
    val out = TextOps.langConfusion(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("share_micro")))).toMap
    assert(out(("en", "en")) == ((2L, 1000000L)))
    assert(out(("es", "es")) == ((1L, 1000000L)))
  }

  test("corpusStats aggregates exact per-stratum size accounting") {
    val df = Seq(
      (1L, "a b c", "en", "web", 5L),
      (2L, "dd ee", "en", "web", 5L),
      (3L, "", "en", "book", 0L)) // blank text → zero tokens, zero chars
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.corpusStats(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val web = out(("en", "web"))
    assert(web.getAs[Long]("n_docs") == 2L)
    assert(web.getAs[Long]("n_tokens") == 5L)
    assert(web.getAs[Long]("n_chars") == 10L)
    assert(web.getAs[Long]("chars_per_doc_micro") == 5000000L)
    val book = out(("en", "book"))
    assert(book.getAs[Long]("n_tokens") == 0L && book.getAs[Long]("n_chars") == 0L)
  }

  test("perplexityBuckets spans ordered non-overlapping ranges covering all docs") {
    val df = docs((1L, "a b a b a", "en"), (2L, "a b c d e", "en"),
      (3L, "z z z z", "en"), (4L, "q w e r t y", "en"), (5L, "m n", "en"))
    val out = TextOps.perplexityBuckets(df).orderBy("bucket").collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == 5L) // every doc in one bucket
    val ranges = out.map(r => (r.getLong(0),
      r.getAs[Long]("min_score_micro"), r.getAs[Long]("max_score_micro")))
    ranges.foreach { case (_, mn, mx) => assert(mn <= mx) }
    ranges.sliding(2).foreach {
      case Array((b1, _, mx1), (b2, mn2, _)) => assert(b1 < b2 && mx1 < mn2)
      case _ => ()
    }
  }

  test("perplexityBuckets never splits a score tie across buckets") {
    val df = docs((1L, "a b", "en"), (2L, "a b", "en"),
      (3L, "a b", "en"), (4L, "a b", "en"))
    val out = TextOps.perplexityBuckets(df).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getAs[Long]("n_docs") == 4L)
  }

  test("bpePairCounts weighs character pairs by word frequency") {
    val df = docs((1L, "aa ab aa", "en"), (2L, "ab b", "en"))
    val out = TextOps.bpePairCounts(df).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("pair_count")).toMap
    // aa ×2, ab ×2; single-char word "b" contributes nothing
    assert(out == Map("aa" -> 2L, "ab" -> 2L))
  }

  test("bpeLearnMerges learns merges in frequency order with BPE overlap rules") {
    graft.operators.Memo.invalidate()
    // words: aaab ×2, aab ×1.
    // round 1 pairs: (a,a) = 2·2+1 = 5, (a,b) = 2+1 = 3 → merge (a,a).
    //   aaab → [aa, a, b] (left-to-right non-overlap), aab → [aa, b]
    // round 2 pairs: (aa,a)=2, (a,b)=2, (aa,b)=1 → tie → lexicographic
    //   lhs picks (a,b): "a" < "aa".  aaab → [aa, ab]; aab unchanged.
    // round 3 pairs: (aa,ab)=2, (aa,b)=1 → merge (aa,ab).
    val df = docs((1L, "aaab aaab aab", "en"))
    val out = TextOps.bpeLearnMerges(df).orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "a", "a", 5L), (2L, "a", "b", 2L), (3L, "aa", "ab", 2L)))
  }

  test("bm25Search ranks multi-term matches above dilute single-term docs") {
    val df = docs(
      (1L, "spark join spark window", "en"),      // 3 query terms, short doc
      (2L, "spark the the the the the the the", "en"), // 1 term, diluted
      (3L, "the cat sat", "en"))                  // no query terms
    val out = TextOps.bm25Search(df).orderBy("rank").collect()
    assert(out.length == 2) // doc 3 matches nothing and is absent
    assert(out.head.getLong(1) == 1L && out.head.getLong(3) == 3L)
    assert(out(1).getLong(1) == 2L && out(1).getLong(3) == 1L)
    assert(out.head.getLong(2) > out(1).getLong(2) && out(1).getLong(2) > 0L)
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("tokenizerFertility: exact token-per-char micro ratios per language") {
    val df = docs(
      (1L, "a b c", "en"),      // 3 tokens / 5 chars
      (2L, "aa bb", "en"),      // 2 tokens / 5 chars
      (3L, "xyz", "fr"),        // 1 token  / 3 chars
      (4L, "   ", "de"))        // blank: excluded
    val out = TextOps.tokenizerFertility(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // en: 5 tokens / 10 chars → 5·10⁸ div 10 = 50_000_000
    assert(out == Map(
      "en" -> ((2L, 5L, 10L, 50000000L)),
      "fr" -> ((1L, 1L, 3L, 33333333L))))
  }

  test("dsirWeights matches a direct hashed-cell replication") {
    val df = docs(
      (1L, "apple banana apple", "en"),
      (2L, "apple cherry", "fr"),
      (3L, "banana banana apple", "en"))
    // independent replication of the full chain: md5-prefix cell hash,
    // add-one-smoothed target/raw ratios, floored integer micro averages
    def h32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val toks = Seq(
      1L -> Seq("apple", "banana", "apple"),
      2L -> Seq("apple", "cherry"),
      3L -> Seq("banana", "banana", "apple"))
    val lang = Map(1L -> "en", 2L -> "fr", 3L -> "en")
    val cells = toks.flatMap { case (d, ts) => ts.map(t => (d, h32(t) % 1024L)) }
    val rn = cells.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tn = cells.filter(c => lang(c._1) == "en")
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val rtot = cells.size.toLong
    val ttot = cells.count(c => lang(c._1) == "en").toLong
    def w(cell: Long): Long =
      ((BigInt(tn.getOrElse(cell, 0L) + 1) * (rtot + 1024) * 1000000) /
        (BigInt(rn(cell) + 1) * (ttot + 1024))).toLong
    val exp = cells.groupBy(_._1).map { case (d, cs) =>
      d -> (cs.map(c => BigInt(w(c._2))).sum / cs.size).toLong
    }
    val out = TextOps.dsirWeights(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    for ((d, ts) <- toks)
      assert(out(d) == ((lang(d), ts.size.toLong, exp(d))), s"doc $d")
    // the en-only vocabulary scores above the doc carrying a raw-only token
    assert(out(3L)._3 > out(2L)._3)
  }

  test("bpeEncode: learned merge collapses the merged pair everywhere, fertility exact") {
    // "aa" dominates: rounds=1 learns (a,a); "aaaa" -> 2 tokens, "ab" -> 2
    val df = docs(
      (1L, "aaaa aaaa ab", "en"),
      (2L, "aaaa", "en"))
    val out = TextOps.bpeEncode(df, rounds = 1).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_words"),
        r.getAs[Long]("n_bpe_tokens"), r.getAs[Long]("fertility_micro"))).toMap
    // doc 1: aaaa->aa,aa (2) + aaaa (2) + ab->a,b (2) = 6 tokens / 3 words
    assert(out(1L) == ((3L, 6L, 2000000L)))
    assert(out(2L) == ((1L, 2L, 2000000L)))
  }

  test("collocationPmi ranks the exclusive pair above the promiscuous one") {
    // "new york" always adjacent and exclusive; "of the" frequent but its
    // unigrams appear everywhere
    val df = docs(
      (1L, "new york of the city of the state", "en"),
      (2L, "new york of the harbor of the coast", "en"),
      (3L, "new york of the river of the bay", "en"))
    val out = TextOps.collocationPmi(df, minCount = 3, k = 5).collect()
    val top = out.head
    assert(top.getAs[String]("lhs") == "new" && top.getAs[String]("rhs") == "york")
    // lift(new york) = n_ab * N * 1e6 / (n_a * n_b) = 3 * 21 * 1e6 / (3*3)
    assert(top.getAs[Long]("lift_micro") == 7000000L)
    val ofThe = out.find(r => r.getAs[String]("lhs") == "of").get
    assert(ofThe.getAs[Long]("lift_micro") < top.getAs[Long]("lift_micro"))
  }

  test("ngramNovelty credits first-seen grams to the earliest doc") {
    val df = docs(
      (1L, "a b c d e", "en"),   // grams abc bcd cde — all first-seen
      (2L, "a b c d x", "en"))   // abc bcd seen in doc 1; cdx novel
    val out = TextOps.ngramNovelty(df, span = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((3L, 3L, 1000000L)))
    assert(out(2L) == ((3L, 1L, 333333L)))
  }

  test("heapsLaw counts new vocabulary per checkpoint bucket") {
    val df = docs(
      (0L, "a b", "en"), (1L, "b c", "en"),
      (2L, "c d", "en"), (3L, "", "en"))
    // mx=3 → bucket = id*2 div 4: {0,1}→0, {2,3}→1
    val out = TextOps.heapsLaw(df, checkpoints = 2).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, 2L, 4L, 3L, 4L, 3L),   // docs 0,1: toks a b b c; new vocab a b c
      (1L, 2L, 2L, 1L, 6L, 4L)))  // docs 2,3: toks c d; new vocab d
  }

  test("gateSoleReason isolates docs failing exactly one rule") {
    val df = docs(
      // 12 tokens (< 15) but healthy ratios → sole too_short
      (1L, "the cat sat on the mat with the dog near the door", "en"),
      // short AND special-heavy AND stopword-poor → multi-fail, no sole row
      (2L, "zz!! qq", "en"),
      // 17 tokens, stop-rich, awl 4.53 → passes, not rejected at all
      (3L, "the elephant walked slowly of the jungle and the monkey " +
        "jumped to the branches in the morning", "en"))
    val out = TextOps.gateSoleReason(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // n_rejected = 2 (docs 1 and 2); only doc 1 is a sole failure
    assert(out.toSeq == Seq(("too_short", 1L, 12L, 500000L)))
  }

  test("tokenRankOctaves: hand-computed spans, including a straddling one") {
    // freqs: x:2 (rank 1 → octave 0), y/z/w:1 (ranks 2-4, straddling
    // octave 1 = ranks 2-3 and octave 2 = rank 4)
    val df = docs((1L, "x x y z w", "en"))
    val got = TextOps.tokenRankOctaves(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 1L, 2L, 2L, 2L),
      (1L, 2L, 2L, 1L, 1L),
      (2L, 1L, 1L, 1L, 1L)))
    // mass conservation: octave masses sum to the corpus token count
    assert(got.map(_._3).sum == 5L)
  }

  test("piiDetectReport: per-source hit/doc counts from the shared synthesis") {
    // doc_id % 5 picks the injected PII kind: 0 → email, 1 → phone,
    // 2 → ipv4, 3/4 → clean
    val df = Seq(
      (0L, "alpha words", "en", "s1", 11L),
      (1L, "beta words", "en", "s1", 10L),
      (2L, "gamma words", "en", "s2", 11L),
      (3L, "delta words", "en", "s2", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.piiDetectReport(df).collect()
      .map(r => ((r.getString(0), r.getString(2)),
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("s1", "email")) == ((2L, 1L, 1L, 500000L)))
    assert(got(("s1", "phone")) == ((2L, 1L, 1L, 500000L)))
    assert(got(("s1", "ipv4")) == ((2L, 0L, 0L, 0L)))
    assert(got(("s2", "ipv4")) == ((2L, 1L, 1L, 500000L)))
    assert(got(("s2", "email")) == ((2L, 0L, 0L, 0L)))
  }

  test("vocabSimpson: exact collision probability and top-token share") {
    // s1: a a a b → λ = 3·2/(4·3) = 0.5, top share 3/4
    // s2: x y z  → λ = 0 (all singletons), top share 1/3
    val df = Seq(
      (1L, "a a a", "en", "s1", 5L), (2L, "b", "en", "s1", 1L),
      (3L, "x y z", "en", "s2", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.vocabSimpson(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got("s1") == ((4L, 2L, 500000L, 750000L)))
    assert(got("s2") == ((3L, 3L, 0L, 333333L)))
  }

  test("docLengthMad: exact median, MAD, and the 3-MAD outlier count") {
    // lengths 10,10,100,1000: median = smallest v with 2·cum ≥ 5 → 100;
    // |dev| = 90,90,0,900 → MAD 90; only 900 > 3·90
    val df = Seq(
      (1L, "t", "en", "s", 10L), (2L, "t", "en", "s", 10L),
      (3L, "t", "en", "s", 100L), (4L, "t", "en", "s", 1000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextOps.docLengthMad(df).collect()
    assert(r.length == 1)
    assert((r(0).getString(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3), r(0).getLong(4)) == (("s", 4L, 100L, 90L, 1L)))
  }

  test("sourceTermLift ranks each source's over-represented vocabulary exactly") {
    // s1: apple×2 banana; s2: banana×3 cherry → N=7, ns=3/4
    // lift(s1,apple) = 2·7e6 div (2·3) = 2333333 (top of s1)
    // lift(s2,cherry) = 1·7e6 div (1·4) = 1750000 (top of s2)
    val df = Seq(
      (1L, "apple apple banana", "en", "s1", 18L),
      (2L, "banana banana banana cherry", "en", "s2", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.sourceTermLift(df, k = 2, minTf = 1).collect()
      .map(r => ((r.getString(0), r.getLong(2)),
        (r.getString(1), r.getAs[Long]("lift_micro")))).toMap
    assert(out(("s1", 1L)) == (("apple", 2333333L)))
    assert(out(("s1", 2L)) == (("banana", 583333L)))
    assert(out(("s2", 1L)) == (("cherry", 1750000L)))
    assert(out(("s2", 2L)) == (("banana", 1312500L)))
  }
}
