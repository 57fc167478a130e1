package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.map { case (id, t, l) => (id, t, l, "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("docChunk emits strided overlapping windows with a kept tail") {
    // 10 tokens, chunk 4, stride 3 → starts 0,3,6,9; last chunk is 1 token
    val df = docs((1L, "a b c d e f g h i j", "en"))
    val out = PipelineOps.docChunk(df, chunkLen = 4, stride = 3)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getAs[Long]("start_tok")).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(out.map(_.getAs[Long]("chunk_tokens")).toSeq == Seq(4L, 4L, 4L, 1L))
    assert(out.head.getAs[String]("chunk_text") == "a b c d")
    assert(out.last.getAs[String]("chunk_text") == "j")
  }

  test("docChunk drops empty documents") {
    val df = docs((1L, "   ", "en"))
    assert(PipelineOps.docChunk(df).count() == 0)
  }

  test("vocabCoverage ranks by frequency and accumulates to 100%") {
    val df = docs((1L, "a a a b b c", "en"))
    val out = PipelineOps.vocabCoverage(df).orderBy("rank").collect()
    assert(out.map(_.getAs[String]("tok")).toSeq == Seq("a", "b", "c"))
    assert(out.map(_.getAs[Long]("tf")).toSeq == Seq(3L, 2L, 1L))
    assert(out.map(_.getAs[Double]("cum_coverage_pct")).toSeq == Seq(50.0, 83.3333, 100.0))
  }

  test("datasetSplit is a deterministic, exhaustive 80/10/10 partition") {
    val df = docs((0L until 300L).map(i => (i, s"tok$i words here", "en")): _*)
    val out = PipelineOps.datasetSplit(df).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // every doc lands in exactly one split
    assert(out.values.map(_._1).sum == 300L)
    assert(out.keySet == Set("train", "val", "test"))
    // hash-based: roughly 80/10/10, exactly reproducible
    assert(out("train")._1 > out("val")._1 && out("train")._1 > out("test")._1)
    val again = PipelineOps.datasetSplit(df).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(again == out.map { case (k, v) => k -> v._1 })
    // shares in exact micro-units sum to ≤ 10^6 (integer division floors)
    val shares = out.values.map(_._3).sum
    assert(shares <= 1000000L && shares > 999990L)
    // token accounting: 3 tokens per doc
    assert(out.values.map(_._2).sum == 900L)
  }

  test("stratifiedSample keeps every doc of a 100%-rate language") {
    val df = docs((0L until 20L).map(i => (i, s"doc $i", "de")): _*)
    assert(PipelineOps.stratifiedSample(df).count() == 20)
  }

  test("stratifiedSample is deterministic and subsamples the capped language") {
    val df = docs((0L until 200L).map(i => (i, s"doc $i", "en")): _*)
    val a = PipelineOps.stratifiedSample(df).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = PipelineOps.stratifiedSample(df).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // ~30% rate: exact count is hash-determined but must be a strict subset
    assert(a.nonEmpty && a.size < 200)
  }

  test("stratifiedSample drops unknown languages") {
    val df = docs((1L, "some text", "xx"))
    assert(PipelineOps.stratifiedSample(df).count() == 0)
  }

  test("mixtureReport shares sum to 100") {
    val df = docs((1L, "one two three", "en"), (2L, "uno dos", "es"),
      (3L, "ein zwei drei vier fuenf", "de"))
    val rows = PipelineOps.mixtureReport(df).collect()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == 10L)
    assert(math.abs(rows.map(_.getAs[Double]("token_share_pct")).sum - 100.0) < 0.02)
    val en = rows.find(_.getString(0) == "en").get
    assert(en.getAs[Long]("n_docs") == 1L && en.getAs[Double]("token_share_pct") == 30.0)
  }

  test("mixtureCube emits every rollup level from one pass") {
    val df = docs((1L, "one two three", "en"), (2L, "uno dos", "es"))
      .withColumn("source", org.apache.spark.sql.functions
        .when(org.apache.spark.sql.functions.col("doc_id") === 1L, "s1").otherwise("s2"))
    val rows = PipelineOps.mixtureCube(df).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    // 2 langs × 1 source each + 2 lang totals + 2 source totals + grand
    assert(rows.size == 7)
    assert(rows((None, None)) == ((2L, 5L)))              // grand total
    assert(rows((Some("en"), None)) == ((1L, 3L)))        // per-lang
    assert(rows((None, Some("s2"))) == ((1L, 2L)))        // per-source
    assert(rows((Some("es"), Some("s2"))) == ((1L, 2L)))  // finest grain
  }

  test("mixtureBalance solves rates toward the smallest language") {
    // en: 8 tokens across 4 docs; fr: 2 tokens in 1 doc (the floor)
    val df = docs(
      (1L, "a b", "en"), (2L, "c d", "en"), (3L, "e f", "en"), (4L, "g h", "en"),
      (5L, "u v", "fr"))
    val out = PipelineOps.mixtureBalance(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("fr").getAs[Long]("keep_rate_pct") == 100L)
    // rate 100 keeps every bucket (0..99 < 100)
    assert(out("fr").getAs[Long]("kept_docs") == 1L)
    assert(out("fr").getAs[Double]("realized_pct") == 100.0)
    assert(out("en").getAs[Long]("keep_rate_pct") == 25L) // floor(100*2/8)
    assert(out("en").getAs[Long]("kept_docs") <= 4L)
    assert(out("en").getAs[Long]("kept_tokens") ==
      2L * out("en").getAs[Long]("kept_docs"))
    // the draw is deterministic: a re-run realizes the identical sample
    val again = PipelineOps.mixtureBalance(df).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("kept_docs")).toMap
    assert(again("en") == out("en").getAs[Long]("kept_docs"))
  }

  test("tokenPack packs greedily in doc_id order within a stratum") {
    // budget 5: docs of 3,3,2 tokens → cum 3,6,8
    val df = docs((1L, "a b c", "en"), (2L, "d e f", "en"), (3L, "g h", "en"))
    val out = PipelineOps.tokenPack(df, budget = 5).orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("pack_id")).toSeq ==
      Seq("en/src/0", "en/src/0", "en/src/1"))
    assert(out.map(_.getAs[Long]("pack_offset")).toSeq == Seq(0L, 3L, 1L))
  }

  test("tokenPack (lang, source) strata pack independently with unique pack ids") {
    val df = Seq(
      (1L, "a b c d", "en", "web", 7L), (2L, "e f g h", "en", "book", 7L),
      (3L, "x y z w", "fr", "web", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = PipelineOps.tokenPack(df, budget = 4).collect()
    assert(out.map(_.getAs[String]("pack_id")).toSet ==
      Set("en/web/0", "en/book/0", "fr/web/0"))
    assert(out.forall(_.getAs[Long]("pack_offset") == 0L))
  }

  test("tokenPack segment decomposition is segDocs-invariant on real data") {
    // the two-level prefix-sum must equal the single-window form for ANY
    // segment width: tiny segments (every doc its own segment), mid, and
    // one-segment-per-stratum (degenerates to the naive window)
    val dir = "/root/testdata/sf0.001"
    val documents = graft.Tables.documents(spark, dir)
    def packed(segDocs: Long) =
      PipelineOps.tokenPack(documents, segDocs = segDocs)
        .orderBy("doc_id")
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[String]("pack_id"), r.getAs[Long]("pack_offset"))).toSeq
    val one = packed(1L)
    assert(one == packed(7L))
    assert(one == packed(1000000000L))
  }

  test("vocabCoverage prefix-bucket decomposition matches the dense rank contract") {
    // ranks must be the contiguous 1..V sequence ordered by (tf desc,
    // tok) even when tokens spread across many 2-char prefix buckets
    val df = docs((1L, "ab ac ba bb ca ab ba ab", "en"))
    val out = PipelineOps.vocabCoverage(df).orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
    // ab(3) > ba(2) > ac, bb, ca (1 each, tok order)
    assert(out.map(_.getAs[String]("tok")).toSeq ==
      Seq("ab", "ba", "ac", "bb", "ca"))
    assert(out.last.getAs[Double]("cum_coverage_pct") == 100.0)
  }

  test("mixtureResample keeps low-resource languages whole and down-samples the rest") {
    // en: 10 docs × 10 tokens = 100; fr: 2 docs × 2 tokens = 4
    // weights √: en 10, fr 2 → accept(en) = min(1, (10/12)/(100/104))
    // = 866666 micro; accept(fr) = min(1, (2/12)/(4/104)) = 1.0
    val rows = (1L to 10L).map(i => (i, "a b c d e f g h i j", "en")) ++
      Seq((11L, "x y", "fr"), (12L, "u v", "fr"))
    val df = docs(rows: _*)
    val out = PipelineOps.mixtureResample(df).collect()
    val byLang = out.groupBy(_.getString(1))
    // fr is below its temperature share: every doc survives at micro 1e6
    assert(byLang("fr").length == 2)
    assert(byLang("fr").forall(_.getAs[Long]("accept_micro") == 1000000L))
    // en down-samples under the exact threshold; fraction data-dependent
    assert(byLang.get("en").forall(_.forall(
      _.getAs[Long]("accept_micro") == 866666L)))
    assert(byLang.getOrElse("en", Array.empty).length < 10)
    // deterministic: the same corpus resamples to the same doc set
    val again = PipelineOps.mixtureResample(df).collect().map(_.getLong(0)).toSet
    assert(again == out.map(_.getLong(0)).toSet)
  }

  test("mixtureUpsample materializes exact repeat factors consistent with the resample") {
    // same fixture as the resample test: en ratio = 866666 micro (< 1),
    // fr ratio = 4333333 micro, capped at the ×4 repeat cap → exactly 4
    val rows = (1L to 10L).map(i => (i, "a b c d e f g h i j", "en")) ++
      Seq((11L, "x y", "fr"), (12L, "u v", "fr"))
    val df = docs(rows: _*)
    val out = PipelineOps.mixtureUpsample(df).collect()
    val byLang = out.groupBy(_.getString(1))
    // fr hits the cap: every doc exactly 4 copies, copy_id 1..4
    assert(byLang("fr").length == 8)
    assert(byLang("fr").forall(_.getAs[Long]("n_copies") == 4L))
    assert(byLang("fr").groupBy(_.getLong(0)).values.forall(
      _.map(_.getAs[Long]("copy_id")).sorted.toSeq == Seq(1L, 2L, 3L, 4L)))
    // languages at/above share: the ≥1-copy doc set IS the resample's
    // kept set (same salted draw), every copy count ∈ {0, 1}
    val enDocs = byLang.getOrElse("en", Array.empty)
    assert(enDocs.forall(_.getAs[Long]("n_copies") == 1L))
    val resampled = PipelineOps.mixtureResample(df).collect()
      .filter(_.getString(1) == "en").map(_.getLong(0)).toSet
    assert(enDocs.map(_.getLong(0)).toSet == resampled,
      "upsample's fractional draw must match the resample's acceptance")
    // per-doc copy accounting is exact everywhere
    assert(out.groupBy(_.getLong(0)).values.forall(g =>
      g.length == g.head.getAs[Long]("n_copies")))
  }

  test("curatedCorpus is the intersection of survivors, quality gate, and sample") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
    val curated = PipelineOps.curatedCorpus(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val survivors = DedupOps.dedupSurvivors(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sampled = PipelineOps.stratifiedSample(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val quality = TextOps.qualityScore(docs)
      .filter(org.apache.spark.sql.functions.col("quality_score") >= 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curated.nonEmpty)
    assert(curated == (survivors intersect sampled intersect quality))
  }

  test("dedupClusters labels transitive near-dup chains with the min doc_id") {
    val base = "the quick brown fox jumps over the lazy dog again and again more words here"
    // 1≈2 and 2≈3 via LSH (identical text), 9 unrelated → cluster {1,2,3}
    val df = docs((1L, base, "en"), (2L, base, "en"), (3L, base, "en"),
      (9L, "totally different content entirely unrelated words", "en"))
    val out = DedupOps.dedupClusters(df).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(_.getAs[Long]("cluster_id") == 1L))
    assert(out.forall(_.getAs[Long]("cluster_size") == 3L))
    assert(out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_representative")).toMap
      == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("dedupSurvivors keeps cluster representatives and untouched docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again more words here"
    val df = docs((1L, base, "en"), (2L, base, "en"), (3L, base, "en"),
      (9L, "totally different content entirely unrelated words", "en"))
    val out = DedupOps.dedupSurvivors(df).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 9L))
  }

  test("typeTokenRatio flags degenerate repetition") {
    val rep = Seq.fill(50)("spam").mkString(" ")
    val df = docs((1L, rep, "en"), (2L, "all tokens here are unique words", "en"))
    val out = TextOps.typeTokenRatio(df).orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("is_repetitive"))
    assert(out(0).getAs[Long]("n_distinct") == 1L)
    assert(!out(1).getAs[Boolean]("is_repetitive"))
    assert(out(1).getAs[Double]("ttr") == 1.0)
  }

  test("mixtureTemperature uses exact integer sqrt weights") {
    // "en": 16 tokens -> weight 4; "fr": 15 tokens -> isqrt 3 (floor-sqrt
    // correction must not bump it to 4); "de": 1 token -> weight 1
    val d = docs(
      (1L, ("tok " * 16).trim, "en"),
      (2L, ("tok " * 15).trim, "fr"),
      (3L, "tok", "de"))
    val out = PipelineOps.mixtureTemperature(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("en") == ((16L, 4L, 500000L)))  // 4/8 of weight mass
    assert(out("fr") == ((15L, 3L, 375000L)))
    assert(out("de") == ((1L, 1L, 125000L)))
  }

  test("tokenBudgetAlloc apportions exactly via largest remainder") {
    val d = Seq(
      (1L, "a b c d e f", "en", "src0", 11L),  // 6 tokens
      (2L, "a b c", "en", "src1", 5L),         // 3 tokens
      (3L, "x", "de", "src0", 1L))             // 1 token
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // budget 7, total 10: p = 42,21,7 → base 4,2,0, rem 2,1,7 → leftover 1
    // goes to the largest remainder (de/src0) — it gets a token despite a
    // zero base share; Σalloc = budget exactly
    val out = PipelineOps.tokenBudgetAlloc(d, budget = 7L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(("en", "src0")) == ((6L, 4L)))
    assert(out(("en", "src1")) == ((3L, 2L)))
    assert(out(("de", "src0")) == ((1L, 1L)))
    assert(out.values.map(_._2).sum == 7L)
  }

  test("sourceCapSample keeps at most cap docs per source, deterministically") {
    val d = ((1L to 20L).map(i => (i, s"t$i", "en", "srcA", 2L)) ++
      (21L to 25L).map(i => (i, s"t$i", "en", "srcB", 2L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = PipelineOps.sourceCapSample(d, cap = 8)
    val bySource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the oversized source is capped; the small one passes whole
    assert(bySource == Map("srcA" -> 8L, "srcB" -> 5L))
    // ranks are 1..k within each source and the draw is reproducible
    assert(out.filter(col("source") === "srcA")
      .agg(max("cap_rank")).head.getLong(0) == 8L)
    val again = PipelineOps.sourceCapSample(d, cap = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("splitLeakage flags exactly the near-dup pairs that cross the split") {
    // six identical docs: every pair is a j=1.0 near-dup; the crossing
    // set is fully determined by the hash split of the ids
    def splitOf(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:v1:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val b = java.lang.Long.parseLong(hex.take(8), 16) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val ids = (1L to 40L).toSeq
    val splits = ids.map(id => id -> splitOf(id)).toMap
    // pick a guaranteed split mix: 4 train docs + 2 non-train
    val chosen = ids.filter(id => splits(id) == "train").take(4) ++
      ids.filter(id => splits(id) != "train").take(2)
    assert(chosen.size == 6, s"ids 1..40 gave splits $splits")
    val df = docs(chosen.map(id =>
      (id, "the very same duplicated payload text", "en")): _*)
    val out = PipelineOps.splitLeakage(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getString(3), r.getDouble(4)))).toMap
    val expect = (for {
      a <- chosen; b <- chosen if a < b
      if splits(a) != splits(b)
    } yield (a, b) -> ((splits(a), splits(b), 1.0))).toMap
    assert(out == expect)
  }

  test("weightedSample is deterministic, bounded, and exact-integer ranked") {
    val df = (1L to 200L).map(i => (i, "x" * (1 + (i % 17)).toInt, "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = PipelineOps.weightedSample(df, k = 20).collect()
    val b = PipelineOps.weightedSample(df, k = 20).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.length == 20)
    // priorities ascend and equal the hash-div-weight recurrence
    val ps = a.map(_.getAs[Long]("priority_micro"))
    assert(ps.toSeq == ps.sorted.toSeq)
    a.foreach { r =>
      assert(r.getAs[Long]("weight_chars") > 0)
      assert(r.getAs[Long]("priority_micro") >= 0)
    }
  }

  test("curriculumPhases cuts by token budget in score-descending order") {
    // doc 1: 50 tokens, stop-rich → score 0.8; doc 2: 25 tokens, no
    // stops → score 0.4. total 75 tokens: doc 1 starts at cum 0 →
    // phase 0; doc 2 starts at 50 → 50*3 div 75 = 2.
    val df = docs(
      (1L, Seq.fill(25)("the cat").mkString(" "), "en"),
      (2L, (Seq.fill(6)("fox wolf bear lynx") :+ "elk").mkString(" "), "en"))
    val out = PipelineOps.curriculumPhases(df).orderBy("phase").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 1L, 50L, 8000L, 8000L),
      (2L, 1L, 25L, 4000L, 4000L)))
  }
}
