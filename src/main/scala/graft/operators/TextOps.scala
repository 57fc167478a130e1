package graft.operators

import graft.functions.{HashFns, TextFns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (SURVEY §2.D): language ID,
  * quality scoring, token counting, fingerprinting. Pure per-row column
  * expressions (codegen'd) — scales as a single scan.
  */
object TextOps {

  /** Stopword lists per language — shared with the oracle-SQL generator
    * ([[graft.Oracles]]); scoring is hit-count, argmax with fixed
    * preference order (en > es > de > fr) on ties.
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "los", "y", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une"))

  private def stopCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(_.asInstanceOf[Any]): _*))).cast("long")

  /** N-gram/stopword-heuristic language identification. */
  def langId(documents: DataFrame): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val scored = documents.select(
      (Seq(col("doc_id"), col("lang")) ++
        Stopwords.map { case (l, ws) => stopCount(toks, ws).as(s"s_$l") }): _*)
    val predicted =
      when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") &&
        col("s_en") >= col("s_fr"), lit("en"))
        .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), lit("es"))
        .when(col("s_de") >= col("s_fr"), lit("de"))
        .otherwise(lit("fr"))
    scored.withColumn("predicted_lang", predicted)
      .withColumn("is_match", col("predicted_lang") === col("lang"))
  }

  /** Language-ID confusion matrix — classifier evaluation against the
    * corpus's ground-truth lang column: (actual, predicted, n) plus the
    * per-cell share of the actual language's docs in exact integer
    * micro-units. The model-eval rollup every labeling pipeline reports.
    * One scan + a |langs|²-row rollup; the per-actual total reuses the
    * grouped output via a window over ≤ |langs| rows.
    */
  def langConfusion(documents: DataFrame): DataFrame =
    langId(documents)
      .groupBy(col("lang").as("actual_lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("actual_total",
        sum(col("n")).over(Window.partitionBy(col("actual_lang"))))
      .select(col("actual_lang"), col("predicted_lang"), col("n"),
        expr("(n * 1000000) div actual_total").as("share_micro"))

  /** Composite quality score from length / special-char ratio / stopword
    * ratio (ref pattern: airbnb_clean_data.py data_quality_score, made
    * real). All double math in a fixed order for oracle parity.
    */
  def qualityScore(documents: DataFrame): DataFrame = {
    val t = TextFns.normText(col("text"))
    val base = documents.select(
      col("doc_id"),
      length(t).cast("long").as("n_chars"),
      size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"),
      length(regexp_replace(t, "[^a-z ]", "")).cast("long").as("n_alpha_space"),
      stopCount(TextFns.tokens(col("text")), Stopwords.head._2).as("n_stop"))
    base.select(
      col("doc_id"), col("n_chars"), col("n_tokens"),
      round(col("n_stop").cast("double") / greatest(col("n_tokens"), lit(1L)), 4)
        .as("stop_ratio"),
      round((col("n_chars") - col("n_alpha_space")).cast("double") /
        greatest(col("n_chars"), lit(1L)), 4).as("special_ratio"),
      round((col("n_chars") - (col("n_tokens") - lit(1L))).cast("double") /
        greatest(col("n_tokens"), lit(1L)), 4).as("avg_word_len"))
      .withColumn("quality_score",
        round(lit(0.4) * least(col("n_tokens").cast("double") / lit(100.0), lit(1.0)) +
          lit(0.3) * (lit(1.0) - col("special_ratio")) +
          lit(0.3) * least(col("stop_ratio") * lit(4.0), lit(1.0)), 4))
  }

  /** Rule-based document filter with first-failing-rule attribution — the
    * FineWeb/Gopher-style quality gate: each doc either passes or carries
    * the name of the FIRST rule that rejected it (reject counts per rule
    * are then one grouped scan away). Built on the qualityScore columns;
    * pure column expressions, zero shuffles.
    */
  def qualityGate(documents: DataFrame): DataFrame =
    qualityScore(documents)
      .withColumn("reject_reason", gateReason)
      .withColumn("keep", col("reject_reason").isNull)
      .select("doc_id", "quality_score", "reject_reason", "keep")

  /** The gate's first-failing-rule attribution over [[qualityScore]]'s
    * feature columns — ONE definition shared with
    * [[graft.operators.ClassifierOps]] (which trains against the gate's
    * verdicts), so the label and the gate can never disagree.
    */
  private[operators] def gateReason: Column =
    // isNull: a NULL text yields NULL counts, and a bare `< 15` CASE
    // arm would skip every rule and let the doc through
    when(col("n_tokens").isNull || col("n_tokens") < 15, "too_short")
      .when(col("special_ratio") > 0.05, "special_chars")
      .when(col("stop_ratio") < 0.08, "low_stopword")
      .when(col("avg_word_len") < 3.0 || col("avg_word_len") > 10.0, "word_length")
      .otherwise(lit(null).cast("string"))

  /** Whitespace + regex token counting (the BPE-ish pass is the alnum-run
    * regex — a proxy for subword segmentation cost estimation).
    */
  def tokenCount(documents: DataFrame): DataFrame = {
    val t = TextFns.normText(col("text"))
    documents.select(
      col("doc_id"),
      size(TextFns.tokens(col("text"))).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(t, lit("[a-z0-9]+"), lit(0))).cast("long")
        .as("n_alnum_runs"),
      length(regexp_replace(t, " ", "")).cast("long").as("n_chars_nospace"))
  }

  /** One row per (doc, word-bigram): tokenize ONCE per row in a
    * projection, explode a position sequence (codegen generator), and
    * build each bigram with element_at on the materialized array — no
    * higher-order lambda. (The previous `transform` formulation ran
    * interpreted and re-evaluated the tokenize regex+split per bigram
    * element.)
    */
  private def bigramRows(df: DataFrame): DataFrame =
    df.select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
      .select(col("doc_id"),
        concat_ws(" ", element_at(col("toks"), col("i")),
          element_at(col("toks"), col("i") + 1)).as("bigram"))

  /** Top-k word bigrams across the corpus — the n-gram statistics pass
    * of a training-data pipeline (vocab building, contamination checks).
    * Bigrams are built per-row then count-aggregated with map-side
    * combine; the top-k order is fully tie-broken.
    */
  def bigramTopK(documents: DataFrame, k: Int = 20): DataFrame =
    bigramRows(OpUtils.spreadDocs(documents))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(k)

  /** Benchmark-contamination check: which corpus docs share suspiciously
    * many word bigrams with a probe set (here: the first `nProbe` docs
    * standing in for an eval benchmark). The probe side is tiny →
    * broadcast; the corpus explodes its bigrams once — the decontamination
    * sweep shape for a 100 TB pretraining corpus.
    */
  def contaminationCheck(documents: DataFrame, nProbe: Int = 5, minOverlap: Int = 3): DataFrame =
    // memoized: contamination_check AND decontaminated_corpus both need
    // this overlap table — one corpus bigram pass per session, not two
    Memo.cached(s"contamination:$nProbe:$minOverlap", documents) { docs =>
      def bigrams(df: DataFrame) = bigramRows(df).distinct()
      val probe = bigrams(docs.filter(col("doc_id") < nProbe))
        .select(col("doc_id").as("probe_id"), col("bigram"))
      val corpus = bigrams(OpUtils.spreadDocs(docs).filter(col("doc_id") >= nProbe))
      corpus.join(broadcast(probe), Seq("bigram"))
        .groupBy(col("doc_id"), col("probe_id"))
        .agg(count(lit(1)).as("n_shared_bigrams"))
        .filter(col("n_shared_bigrams") >= minOverlap)
    }

  /** Curation dashboard slice: per (source, gate outcome) doc counts,
    * token mass, and in-source share — WHY each source's documents drop,
    * not just how many ([[qualityGate]] gives the verdicts; this is the
    * rollup a curator reads to decide whether a source needs a fix or a
    * removal). One doc-grain co-keyed join to attach the source, one
    * map-side-combined rollup; the share window runs over the bounded
    * (source × reason) table.
    */
  def gateReasonBreakdown(documents: DataFrame): DataFrame = {
    val scored = qualityScore(OpUtils.spreadDocs(documents))
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_toks"),
        coalesce(gateReason, lit("pass")).as("reason"))
    scored
      .join(documents.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"), col("reason"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .withColumn("src_docs",
        sum(col("n_docs")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))))
      .select(col("source"), col("reason"), col("n_docs"), col("n_tokens"),
        expr("(n_docs * 1000000) div src_docs").as("share_micro"))
  }

  /** The decontamination sweep EXECUTED: the corpus minus every doc
    * [[contaminationCheck]] flags (≥ `minOverlap` shared bigrams with
    * any probe doc) — what a pretraining pipeline materializes after
    * the eval-benchmark overlap audit, mirroring `curated_corpus`'s
    * verdict→materialization pattern. One anti-join against the
    * (bounded) flagged-doc list; the probe stand-ins themselves are
    * excluded too (they ARE the benchmark).
    */
  def decontaminatedCorpus(documents: DataFrame, nProbe: Int = 5,
      minOverlap: Int = 3): DataFrame = {
    val flagged = contaminationCheck(documents, nProbe, minOverlap)
      .select(col("doc_id")).distinct()
    documents.filter(col("doc_id") >= nProbe)
      .join(flagged, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** Per-document n-gram repetition report (the Gopher-style repetition
    * quality filter): duplicate-bigram fraction and top-bigram fraction
    * flag boilerplate and degenerate generations. One explode + two
    * grouped aggregations, all map-side combinable — a single scan shape
    * at corpus scale. Docs with < 2 tokens have no bigrams and are
    * excluded (mirrored in the oracle).
    */
  def repetitionReport(documents: DataFrame, dupFracMin: Double = 0.2): DataFrame =
    bigramRows(OpUtils.spreadDocs(documents))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max(col("n")).as("top_bigram_n"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct_bigrams"),
        round((col("n_bigrams") - col("n_distinct_bigrams")).cast("double") /
          col("n_bigrams"), 4).as("dup_bigram_frac"),
        round(col("top_bigram_n").cast("double") / col("n_bigrams"), 4)
          .as("top_bigram_frac"))
      .withColumn("is_repetitive", col("dup_bigram_frac") >= dupFracMin)

  /** Corpus term-frequency table (tok, tf) — VOCABULARY-bounded, and
    * shared by rarity scoring, bigram-LM scoring and vocabulary coverage
    * in one session: derived once via [[Memo]] instead of re-exploding
    * the corpus per consumer (at 100 TB, three full token scans become
    * one).
    */
  private[operators] def corpusTf(documents: DataFrame): DataFrame =
    Memo.cached("corpus_tf", documents) { docs =>
      OpUtils.spreadDocs(docs)
        .select(explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("tf"))
    }

  /** Unigram rarity score — a perplexity proxy with exact integer
    * arithmetic (no float logs, whose libm rounding differs across
    * engines): per token, rarity = corpus_tokens div token_frequency;
    * per doc, the average rarity. Two aggregations: corpus term
    * frequencies (map-side combined), then a broadcast-joined re-scan.
    */
  def rarityScore(documents: DataFrame): DataFrame = {
    val toks = OpUtils.spreadDocs(documents)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
    val tf = corpusTf(documents)
    val total = tf.agg(sum(col("tf")).as("total"))
    toks
      .join(tf, Seq("tok"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), expr("total div tf").as("rarity"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("rarity")).as("sum_rarity"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("sum_rarity").cast("double") / col("n_tokens"), 4).as("avg_rarity"))
  }

  /** Per-document salient terms (TF-IDF shape): rank each document's
    * tokens by tf × an exact-integer idf surrogate, (n_docs·1000) div df
    * — integer arithmetic end-to-end, so both engines rank identically
    * (libm log rounding differs across engines; see rarityScore). Scale
    * shape: the (doc, tok) tf aggregation and the tf⋈df join are the
    * corpus-sized shuffles (both map-side combinable / key-partitioned);
    * the ranking window partitions by doc_id, so it parallelizes with
    * the corpus rather than capping on any small key.
    */
  def docKeyterms(documents: DataFrame, k: Int = 3): DataFrame = {
    val toks = OpUtils.spreadDocs(documents)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
    // eager checkpoint: the (doc, tok, tf) grain feeds BOTH the df
    // rollup and the score join, which schedule concurrently — profiled
    // r15: the tokenize+tf pass ran twice (2 × ~11 executor-seconds)
    val tf = Memo.managedCheckpoint(
      toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = documents
      .filter(length(TextFns.normText(col("text"))) > 0)
      .agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
    tf.join(df, Seq("tok"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", expr("tf * ((n_docs * 1000) div df)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** Type-token ratio (lexical diversity): distinct-token share of the
    * token stream, the standard repetition-detection quality filter
    * (boilerplate and degenerate generations score low). Pure per-row
    * expressions — a single scan at any scale.
    */
  def typeTokenRatio(documents: DataFrame, repetitiveBelow: Double = 0.3): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    documents.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"))
      .withColumn("ttr",
        round(col("n_distinct").cast("double") / greatest(col("n_tokens"), lit(1L)), 4))
      .withColumn("is_repetitive", col("ttr") < repetitiveBelow)
  }

  /** Template / boilerplate detection: fingerprint each document's
    * OPENING SKELETON — the digit-masked first `prefixTokens` tokens
    * (`order #1234 shipped ...` and `order #88 shipped ...` collapse to
    * one skeleton; generated pages and form letters share openings long
    * after their bodies diverge) — and report skeletons carried by ≥ 2
    * documents. This is the boilerplate-header detector a web-corpus
    * pipeline runs where exact dedup sees distinct texts. One codegen'd
    * scan (slice + regex mask + md5-prefix hash) and one
    * map-side-combined rollup; output is template-group-sized.
    */
  def templateFingerprint(documents: DataFrame, prefixTokens: Int = 8): DataFrame =
    OpUtils.spreadDocs(documents)
      .select(col("doc_id"), col("source"),
        HashFns.hash60(
          regexp_replace(
            array_join(slice(TextFns.tokens(col("text")), 1, prefixTokens), " "),
            "[0-9]+", "#"))
          .as("template_fp"))
      .groupBy(col("template_fp"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("rep_doc_id"))
      .filter(col("n_docs") >= 2)

  /** Content fingerprint (60-bit md5-prefix of normalized text — the
    * oracle-parity stand-in for a rolling hash) + duplicate-group size.
    */
  def docFingerprint(documents: DataFrame): DataFrame =
    OpUtils.spreadDocs(documents)
      .select(col("doc_id"), HashFns.hash60(TextFns.normText(col("text"))).as("fingerprint"))
      .withColumn("n_same_fp",
        count(lit(1)).over(Window.partitionBy(col("fingerprint"))))

  /** PII patterns shared with the oracle-SQL generator. Conservative
    * POSIX-compatible forms so both regex engines agree.
    */
  val PiiEmail = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PiiPhone = "\\d{3}-\\d{3}-\\d{4}"
  val PiiIp = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  /** PII detection + redaction — the scrub pass a training-data pipeline
    * runs before anything ships: count and mask emails / phone numbers /
    * IPv4 addresses with typed placeholders. Pure per-row regex column
    * expressions (one scan, codegen'd). PII strings are synthesized
    * deterministically from doc_id (the corpus itself is clean word
    * soup) so the oracle rebuilds the identical input; the redacted text
    * is emitted as an md5 so wide rows never hash-compare raw.
    * Replacement order: email → ip → phone (patterns are disjoint; the
    * order is fixed for engine parity).
    */
  def piiRedact(documents: DataFrame): DataFrame = {
    val dirty = documents.select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" contact agent"), col("doc_id").cast("string"),
          lit("@example.com now")))
        .when(col("doc_id") % 5 === 1,
          concat(col("text"), lit(" call 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" today")))
        .when(col("doc_id") % 5 === 2,
          concat(col("text"), lit(" server 10."),
            (col("doc_id") % 256).cast("string"),
            lit(".0."), (col("doc_id") % 200 + 1).cast("string"), lit(" logged")))
        .otherwise(col("text")).as("text"))
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), PiiEmail, "<EMAIL>"),
          PiiIp, "<IP>"),
        PiiPhone, "<PHONE>")
    dirty.select(
      col("doc_id"),
      regexp_count(col("text"), lit(PiiEmail)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(PiiPhone)).cast("long").as("n_phones"),
      regexp_count(col("text"), lit(PiiIp)).cast("long").as("n_ips"),
      md5(redacted).as("redacted_hash"),
      length(redacted).cast("long").as("redacted_len"))
      .withColumn("has_pii",
        col("n_emails") + col("n_phones") + col("n_ips") > 0)
  }

  /** Sparse TF-IDF cosine near-duplicate pairs — the classic IR
    * duplicate detector, and the sparse-vector complement of the dense
    * embedding family ([[DedupOps]] hashes exact token sets; this
    * weighs SHARED RARE tokens, so two docs sharing distinctive
    * vocabulary pair up even when their common boilerplate differs).
    * Weights are exact integers (w = tf · ((N·1000) div df), the same
    * idf surrogate [[docKeyterms]] uses — no libm logs), norms and dot
    * products are exact DECIMAL(38,0) sums, and the only float step is
    * the final sim = dot/√(n2a·n2b) from those exact integers
    * (correctly-rounded IEEE ops — engine-stable).
    *
    * Scale: per-doc tf and corpus df are map-side-combined rollups; the
    * candidate join is an inverted-index equi-join on the token,
    * restricted to tokens with df ≤ dfCap, so the blocking cost is
    * Σ_{df≤cap} df² — bounded by cap·Σdf — and stopwords (which carry
    * ~zero idf weight anyway) never join. The documented trade-off:
    * pairs sharing ONLY df>cap tokens are missed — by construction
    * those are low-signal pairs, the same recall contract as the
    * rare-shingle blocking in [[DedupOps.dedupNgramJaccard]].
    */
  def tfidfDocPairs(documents: DataFrame, dfCap: Long = 100,
      minSim: Double = 0.25): DataFrame = {
    // eager checkpoint: the (doc, tok, tf) grain feeds the df rollup,
    // the norms rollup and both sides of the cosine self-join — four
    // concurrent consumers, each otherwise re-running the tokenize pass
    val tf = Memo.managedCheckpoint(OpUtils.spreadDocs(documents)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))
    val w = tf.join(df, Seq("tok")).crossJoin(broadcast(nDocs))
      .withColumn("wt", expr("tf * ((n_docs * 1000) div df)"))
    val norms = w.groupBy(col("doc_id"))
      .agg(sum(col("wt").cast("decimal(38,0)") * col("wt")).as("norm2"))
    val idx = w.filter(col("df") <= dfCap)
      .select(col("tok"), col("doc_id"), col("wt"))
    val dots = idx.alias("a")
      .join(idx.alias("b"), col("a.tok") === col("b.tok") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.wt").cast("decimal(38,0)") * col("b.wt")).as("dot"),
        count(lit(1)).as("n_shared"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("norm2").as("n2a")), Seq("doc_a"))
      .join(norms.select(col("doc_id").as("doc_b"), col("norm2").as("n2b")), Seq("doc_b"))
      .withColumn("sim", col("dot").cast("double") /
        sqrt(col("n2a").cast("double") * col("n2b").cast("double")))
      .filter(col("sim") >= minSim)
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        round(col("sim"), 4).as("sim"))
  }

  /** Inverted index build: token → document frequency, total term
    * frequency, and a bounded posting-list sample (first `postingSample`
    * doc ids). The search-index construction pass of a corpus engine.
    * Scale shape: one explode scan → per-(token, doc) partial counts
    * (map-side combined) → per-token rank → per-token rollup. The posting
    * list is capped BEFORE the aggregation buffer: a row_number window
    * (partitioned by token, ordered by doc_id — it reuses the rollup's
    * own hash(tok) exchange, costing one sort and no extra shuffle)
    * marks the first `postingSample` doc ids, and collect_list gathers
    * only those (a stopword token's buffer holds ≤ postingSample ids,
    * never its full corpus-wide posting list). df/tf still aggregate
    * over all rows. Postings are projected as a joined string (driver
    * canonicalization is scalar-only).
    */
  def invertedIndex(documents: DataFrame, postingSample: Int = 5): DataFrame =
    OpUtils.spreadDocs(documents)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk",
        row_number().over(Window.partitionBy(col("tok")).orderBy(col("doc_id"))))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("df"),
        sum(col("n")).as("tf"),
        concat_ws(",",
          transform(
            sort_array(collect_list(when(col("rk") <= postingSample, col("doc_id")))),
            d => d.cast("string"))).as("posting_sample"))

  /** Most frequent adjacent character pairs — the inner statistic of a
    * BPE tokenizer-training merge step. The trick that makes BPE feasible
    * at corpus scale: pair counting runs over the DISTINCT-word frequency
    * table (vocabulary-sized), never the corpus — the corpus is touched
    * once to build word counts (map-side combined), then each distinct
    * word explodes its character pairs weighted by its count.
    */
  def bpePairCounts(documents: DataFrame, k: Int = 20): DataFrame =
    OpUtils.spreadDocs(documents)
      .select(explode(TextFns.tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .filter(length(col("word")) >= 2)
      .select(col("word"), col("n"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(expr("substring(word, i, 2)").as("pair"), col("n"))
      .groupBy(col("pair"))
      .agg(sum(col("n")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(k)

  /** Bigram language-model document score — the KenLM-perplexity-style
    * fluency signal of a quality pipeline, in EXACT integer math (no
    * libm logs, so the oracle agrees bit-for-bit): each bigram (a, b)
    * scores its scaled conditional frequency ⌊10⁶·C(ab)/C(a)⌋ and a doc
    * reports the mean over its bigrams (high = its word transitions are
    * common corpus-wide; word salad scores low). Two corpus-sized
    * grouped counts + two re-joins — the rarity_score shape extended to
    * transitions.
    */
  def ngramLmScore(documents: DataFrame): DataFrame =
    lmScoreParts(documents)
      .select(col("doc_id"), col("n_bigrams"),
        round(col("score_sum").cast("double") / col("n_bigrams"), 4).as("lm_score"))

  /** Per-doc bigram-LM raw parts: bigram count and the exact integer sum
    * of per-bigram scaled conditional frequencies ⌊10⁶·C(ab)/C(a)⌋ —
    * shared by [[ngramLmScore]] (rounded mean) and [[perplexityBuckets]]
    * (integer quantile bucketing).
    */
  private def lmScoreParts(documents: DataFrame): DataFrame =
    Memo.cached("lm_parts", documents)(lmScorePartsImpl)

  private def lmScorePartsImpl(documents: DataFrame): DataFrame = {
    val spread = OpUtils.spreadDocs(documents)
    val uni = corpusTf(documents)
      .select(col("tok").as("first_tok"), col("tf").as("cw"))
    // ONE tokenize+bigram pass rolled to the (doc, bigram) grain and
    // checkpointed: the per-occurrence form re-ran the corpus pass for
    // each of its two consumers (bigram totals + the score join), and
    // every downstream row count shrinks to the grain. Exact-integer
    // equivalence: Σ_occurrences score = Σ_grain cnt·score and
    // n_bigrams = Σ cnt — same values, same overflow class (ANSI longs).
    val db = Memo.managedCheckpoint(bigramRows(spread)
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("cnt")))
    val bgCounts = db.groupBy(col("bigram")).agg(sum(col("cnt")).as("cab"))
    db
      .withColumn("first_tok", substring_index(col("bigram"), " ", 1))
      .join(bgCounts, Seq("bigram"))
      .join(uni, Seq("first_tok"))
      .withColumn("score", expr("(cab * 1000000) div cw"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * col("score")).as("score_sum"))
  }

  /** Fluency-quantile buckets over the corpus — the "drop the
    * worst-perplexity quartile" curation step, in EXACT integer math.
    * Each doc's score is the integer mean bigram-LM score; docs are
    * assigned to `buckets` quantile buckets by the CDF of the
    * DISTINCT-SCORE table: bucket = ⌊(first_rank−1)·buckets / N⌋ + 1, so
    * a tie group lands wholly in its first member's bucket (never split —
    * deterministic without a per-doc total order). Scale shape: the only
    * global window runs over distinct scores (bounded — micro-unit
    * integers), never the corpus; the corpus-sized work is the same two
    * grouped passes as [[ngramLmScore]] plus one map-side-combined
    * count per score. An exact global ntile would need a corpus-wide
    * single-partition sort — this is the formulation that survives
    * 100 TB.
    */
  def perplexityBuckets(documents: DataFrame, buckets: Int = 4): DataFrame = {
    val doc = lmScoreParts(documents)
      .select(col("doc_id"), expr("score_sum div n_bigrams").as("score_micro"))
    OpUtils.cdfBuckets(doc, "score_micro", buckets)
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("n_docs"),
        min(col("score_micro")).as("min_score_micro"),
        max(col("score_micro")).as("max_score_micro"))
  }

  /** Corpus composition report: per (lang, source) stratum — doc count,
    * whitespace-token and raw-character totals, and mean doc length in
    * exact character micro-units (multiply-then-integer-divide; no float
    * division, so the value is engine-stable). The mixture/size
    * accounting pass before a training run. One map-side-combined
    * grouped scan; sums widen to decimal so 100 TB character totals
    * cannot overflow the ×10⁶ scaling.
    */
  def corpusStats(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"), col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("toks"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(col("chars")).as("n_chars"),
        expr("(cast(sum(chars) as decimal(38,0)) * 1000000) div count(1)")
          .as("chars_per_doc_micro"))

  /** Iterative BPE merge learning — the actual tokenizer-training loop
    * (Sennrich et al.): `rounds` times, count adjacent symbol pairs
    * across the word-frequency table, pick the most frequent pair
    * (ties: lexicographic), and merge it everywhere. Words are
    * represented as strings with every symbol WRAPPED in unit
    * separators (`␟sym␟`, so two separators stand between adjacent
    * symbols) and one merge round is exactly
    * `replace(s, ␟l␟␟r␟, ␟lr␟)`: the pattern can only match whole
    * symbols (a boundary-crossing match would need a separator inside a
    * symbol), consecutive pair occurrences share no characters, and
    * left-to-right non-overlapping `replace` IS the BPE merge rule in
    * both engines — no custom expression needed, and the oracle unrolls
    * the identical recurrence.
    *
    * Scale: ONE corpus scan builds the word-frequency rollup
    * (map-side combined, vocabulary-sized — checkpoint-pinned so the
    * loop never re-reads the corpus); every round then works on vocab
    * rows: a pair-explode bounded by word length, a 1-row argmax
    * broadcast back, and a per-row replace. That is the published
    * scalable recipe — BPE training never iterates over the corpus,
    * only over the vocabulary.
    */
  def bpeLearnMerges(documents: DataFrame, rounds: Int = 3): DataFrame = {
    val sep = "\u001f"
    val words0 = Memo.cached("bpe_words", documents) { docs =>
      OpUtils.spreadDocs(docs)
        .select(explode(TextFns.tokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .filter(length(col("word")) >= 2)
        .select(regexp_replace(col("word"), "(.)", sep + "$1" + sep)
          .as("s"), col("n"))
    }
    def top1(words: DataFrame): DataFrame =
      words.select(split(trim(col("s"), sep), sep + sep).as("ts"), col("n"))
        .filter(size(col("ts")) >= 2)
        .select(col("ts"), col("n"),
          explode(sequence(lit(1), size(col("ts")) - 1)).as("i"))
        .select(element_at(col("ts"), col("i")).as("lhs"),
          element_at(col("ts"), col("i") + 1).as("rhs"), col("n"))
        .groupBy(col("lhs"), col("rhs")).agg(sum(col("n")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .limit(1)
    val (_, merges) = (1 to rounds).foldLeft((words0, Seq.empty[DataFrame])) {
      case ((words, acc), r) =>
        val t = top1(words)
          .select(lit(r.toLong).as("merge_rank"), col("lhs"), col("rhs"),
            col("pair_count"))
        val merged = words.crossJoin(broadcast(t.select(col("lhs"), col("rhs"))))
          .select(replace(col("s"),
            concat(lit(sep), col("lhs"), lit(sep + sep), col("rhs"), lit(sep)),
            concat(lit(sep), col("lhs"), col("rhs"), lit(sep))).as("s"),
            col("n"))
        (merged, acc :+ t)
    }
    merges.reduce(_.unionByName(_))
  }

  /** Collocation mining by pointwise-mutual-information LIFT — which
    * word pairs co-occur adjacently far more than their unigram
    * frequencies predict (the phrase-detection pass behind
    * word2phrase/Gensim Phrases, used to protect multi-word entities
    * before tokenization). PMI's log is monotone in the lift ratio
    * P(ab)/(P(a)P(b)) = C(ab)·N / (C(a)·C(b)), so ranking by the EXACT
    * integer lift (micro-units, DECIMAL(38) intermediates — corpus-scale
    * count products pass 2⁶³) orders pairs identically to PMI with no
    * libm anywhere (the repo-wide oracle-parity policy).
    *
    * Scale: the corpus is touched twice through memoized rollups
    * ([[corpusTf]] unigrams + the bigram explode), both map-side
    * combined; the lift join runs on the VOCABULARY-sized tables, and
    * the final top-k is a bounded TakeOrdered, never a global sort.
    */
  def collocationPmi(documents: DataFrame, minCount: Long = 3, k: Int = 30): DataFrame = {
    val spread = OpUtils.spreadDocs(documents)
    val pairs = spread
      .select(TextFns.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
      .select(element_at(col("toks"), col("i")).as("lhs"),
        element_at(col("toks"), col("i") + 1).as("rhs"))
    val pairCounts = pairs.groupBy(col("lhs"), col("rhs"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val uni = corpusTf(documents)
    val total = pairs.agg(count(lit(1)).as("n_total"))
    pairCounts
      .crossJoin(broadcast(total))
      .join(uni.select(col("tok").as("lhs"), col("tf").as("n_a")), Seq("lhs"))
      .join(uni.select(col("tok").as("rhs"), col("tf").as("n_b")), Seq("rhs"))
      .select(col("lhs"), col("rhs"), col("n_ab"), col("n_a"), col("n_b"),
        expr("""cast((cast(n_ab as decimal(38,0)) * n_total * 1000000)
               | div (cast(n_a as decimal(38,0)) * n_b) as bigint)"""
          .stripMargin.replaceAll("\n", " ")).as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("lhs"), col("rhs"))
      .limit(k)
  }

  /** BPE ENCODING — the apply side of [[bpeLearnMerges]], completing the
    * tokenizer loop (learn → encode): the learned merge table (tiny,
    * bounded by `rounds`, so collecting it to the driver is the right
    * move — it becomes literal patterns broadcast inside the plan, the
    * same shape as shipping a tokenizer vocab to every executor) is
    * applied to every word of every document with the same
    * separator-wrapped `replace` recurrence the learner used, then each
    * doc reports its BPE token count and fertility (BPE tokens per word,
    * exact integer micro-units — the tokenizer-efficiency metric).
    *
    * Scale: one corpus scan; the merge chain is `rounds` nested
    * codegen'd `replace` calls per word — no joins, no shuffles beyond
    * the final per-doc rollup (map-side combined).
    */
  def bpeEncode(documents: DataFrame, rounds: Int = 3): DataFrame = {
    val sep = "\u001f"
    // driver-side collect is bounded by `rounds` (3 rows), never by data
    val merges = bpeLearnMerges(documents, rounds)
      .orderBy(col("merge_rank"))
      .select(col("lhs"), col("rhs")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val words = OpUtils.spreadDocs(documents)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("word"))
    val wrapped = regexp_replace(col("word"), "(.)", sep + "$1" + sep)
    val encoded = merges.foldLeft(wrapped) { case (c, (l, r)) =>
      replace(c, lit(sep + l + sep + sep + r + sep), lit(sep + l + r + sep))
    }
    words
      .select(col("doc_id"),
        size(split(trim(encoded, sep), sep + sep)).cast("long").as("ntok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("ntok")).as("n_bpe_tokens"),
        expr("(sum(ntok) * 1000000) div count(1)").as("fertility_micro"))
  }

  /** Fixed query-term set for [[bm25Search]] — shared with the oracle. */
  val Bm25Terms: Seq[String] = Seq("spark", "join", "window", "scan", "stream", "vector")

  /** BM25 ranked retrieval of the top `topN` documents for a fixed
    * conjunctive term set — the classic lexical-retrieval scorer shape
    * (Robertson/Okapi; idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))) with
    * one deliberate substitution: the idf factor is the exact ODDS
    * RATIO (N−df+½)/(df+½) — the very quantity whose log classic BM25
    * takes — rather than its logarithm. The surrogate is strictly
    * monotone in the classic idf, so per-term document ordering is
    * identical; only the relative weighting between rare and common
    * terms stretches. The payoff: no `ln` anywhere, so the score never
    * depends on two engines' libm producing bit-identical doubles
    * (the repo-wide exact-math policy; see rarity_score/ngram_lm_score).
    *
    * With k1 = k1Num/k1Den and b = bNum/bDen, clearing every fraction
    * gives one integer ratio per (doc, term):
    *
    *   score_micro = ⌊ (2(N−df)+1) · (k1Num+k1Den)·bDen · tf · Σdl · 10⁶
    *                 ÷ ( (2df+1) · (k1Den·bDen·tf·Σdl
    *                     + k1Num·(bDen−bNum)·Σdl + k1Num·bNum·dl·N) ) ⌋
    *
    * computed in DECIMAL(38,0) (corpus token totals × 10⁶ pass 2⁶³ at
    * lake scale; ANSI mode makes a pathological overflow loud), floored
    * ONCE, cast to long, then summed per doc — exact in both engines.
    *
    * Scale: one corpus scan; term filter before the (doc, term) rollup
    * (map-side combined, ≤|terms| rows per doc); df and the corpus
    * length stats are tiny broadcasts; the global top-N compiles to
    * TakeOrderedAndProject (per-partition partial top-N, never a global
    * sort).
    */
  def bm25Search(documents: DataFrame, terms: Seq[String] = Bm25Terms,
      k1Num: Int = 6, k1Den: Int = 5, bNum: Int = 3, bDen: Int = 4,
      topN: Int = 20): DataFrame = {
    val docs = OpUtils.spreadDocs(documents)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("doc_id"), col("ts"), size(col("ts")).cast("long").as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = docs.select(col("doc_id"), col("dl"), explode(col("ts")).as("term"))
      .filter(col("term").isin(terms.map(_.asInstanceOf[Any]): _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val tfNum = (k1Num + k1Den) * bDen   // tf-saturation numerator coeff
    val tfDen = k1Den * bDen             // · tf·Σdl in the denominator
    val cConst = k1Num * (bDen - bNum)   // · Σdl  (the (1−b) term)
    val cLen = k1Num * bNum              // · dl·N (the length norm)
    val perTerm = tf.join(broadcast(df), Seq("term")).crossJoin(broadcast(stats))
      .withColumn("score_micro_term",
        expr("cast((cast(2 * (n_docs - df) + 1 as decimal(38,0)) * " +
          s"($tfNum * tf) * sum_dl * 1000000) div " +
          "(cast(2 * df + 1 as decimal(38,0)) * " +
          s"(($tfDen * tf) * sum_dl + $cConst * sum_dl + $cLen * dl * n_docs)) " +
          "as bigint)"))
    val scored = perTerm.groupBy(col("doc_id"))
      .agg(sum(col("score_micro_term")).as("score_micro"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(topN)
    scored.withColumn("rank", row_number().over(
        Window.orderBy(col("score_micro").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("score_micro"), col("n_terms_hit"))
  }

  /** Tokenizer fertility per language: tokens per 100 characters — the
    * budgeting constant that converts a byte/char corpus estimate into a
    * token count per language (CJK-like scripts differ several-fold from
    * alphabetic ones; training-mixture math that ignores this misassigns
    * the budget). One scan, map-side-combined rollup to |langs| rows;
    * exact integer micro ratio (DECIMAL(38,0) — token×10⁸ products cross
    * 2⁶³ at corpus scale).
    */
  def tokenizerFertility(documents: DataFrame): DataFrame =
    OpUtils.spreadDocs(documents)
      .select(col("lang"), TextFns.tokens(col("text")).as("ts"),
        length(TextFns.normText(col("text"))).cast("long").as("chars"))
      .filter(col("chars") > 0)
      .select(col("lang"), size(col("ts")).cast("long").as("toks"), col("chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"), sum(col("chars")).as("n_chars"),
        expr("cast((cast(sum(toks) as decimal(38,0)) * 100000000) div sum(chars) as bigint)")
          .as("tokens_per_100_chars_micro"))

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): rank raw documents by
    * how target-like their hashed-unigram distribution is. Each token
    * hashes into one of `buckets` cells; the per-token importance ratio
    * p_target(cell)/p_raw(cell) uses add-one smoothing; a document's
    * score is its MEAN per-token ratio (length-normalized, so long docs
    * aren't favored). The published method multiplies ratios (sums
    * logs) — here the per-token ratios are AVERAGED instead: monotone
    * agreement on which cells look target-like, but every quantity stays
    * an exact integer micro-unit (repo-wide policy: no cross-engine
    * libm-log gamble; see [[bm25Search]]'s idf surrogate for the same
    * move), at the cost of the heavier tail-emphasis the product form
    * has. Target = the corpus's `lang = targetLang` slice, the common
    * "select web data that looks like my curated set" setup.
    *
    * Scale: one tokenize pass; cell stats are two map-side-combined
    * rollups to a FIXED `buckets`-sized frame (broadcast — bounded by
    * the literal, not the corpus); the per-doc score is one more
    * map-side-combined rollup. Nothing shuffles at token grain except
    * the (cell)-keyed stats.
    */
  def dsirWeights(documents: DataFrame, targetLang: String = "en",
      buckets: Int = 1024): DataFrame = {
    val toks = OpUtils.spreadDocs(documents)
      .select(col("doc_id"), col("lang"),
        explode(TextFns.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("lang"),
        pmod(HashFns.hash32(col("tok")), lit(buckets.toLong)).as("cell"))
    val raw = toks.groupBy(col("cell")).agg(count(lit(1)).as("rn"))
    val tgt = toks.filter(col("lang") === targetLang)
      .groupBy(col("cell")).agg(count(lit(1)).as("tn"))
    val totals = toks.agg(count(lit(1)).as("rtot"),
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("ttot"))
    val weights = raw.join(tgt, Seq("cell"), "left")
      .select(col("cell"), col("rn"), coalesce(col("tn"), lit(0L)).as("tn"))
      .crossJoin(broadcast(totals))
      .select(col("cell"), expr(
        s"cast((cast(tn + 1 as decimal(38,0)) * (rtot + $buckets) * 1000000) div " +
          s"(cast(rn + 1 as decimal(38,0)) * (ttot + $buckets)) as bigint)")
        .as("w_micro"))
    toks.join(broadcast(weights), Seq("cell"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("w_micro").cast("decimal(38,0)")).as("sw"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr("cast(sw div n_tokens as bigint)").as("dsir_avg_micro"))
  }

  /** Per-document n-gram novelty — the memorization/recency curation
    * signal: how much of a document is text the corpus has NOT seen in
    * any earlier document (by doc_id order, the ingestion order in this
    * corpus). Every [[DedupOps.SpanTokens]]-token window hashes row-local
    * ([[graft.functions.SpanHash]], zero exchange, same stream the span
    * dedups ride); a window occurrence is FIRST-SEEN when its hash's
    * global minimum doc_id is this document. Low novelty = boilerplate
    * or near-copy of earlier data; high = genuinely new text.
    *
    * Scale: cross-doc first-occurrence is one map-side-combined min() on
    * the 64-bit hash; the rejoin shuffles only (hash, doc_id) pairs; the
    * per-doc rollup partitions on doc_id. No span text ever shuffles.
    */
  def ngramNovelty(documents: DataFrame,
      span: Int = DedupOps.SpanTokens): DataFrame = {
    val grams = OpUtils.spreadDocs(documents)
      .select(col("doc_id"),
        explode(graft.functions.SpanHash.spanHashes(
          TextFns.tokens(col("text")), span)).as("h"))
    val first = grams.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_first_seen"))
      .select(col("doc_id"), col("n_grams"), col("n_first_seen"),
        expr("n_first_seen * 1000000 div n_grams").as("novelty_micro"))
  }

  /** Heaps-law vocabulary-growth curve: the corpus in ingestion order
    * (doc_id) cut into `checkpoints` equal-width id buckets; per bucket,
    * the document/token mass, the NEW vocabulary first seen there, and
    * the cumulative token/vocab totals — the sub-linear vocab-vs-tokens
    * curve that sizes tokenizer vocabularies and detects synthetic or
    * template-heavy corpora (whose curves flatten early).
    *
    * Scale: first-occurrence per token is a map-side-combined min of the
    * quantized bucket (bucket is monotone in doc_id, so min(bucket) =
    * bucket(min doc)); every rollup lands on the `checkpoints`-bounded
    * grain before the cumulative windows run — the two-level pattern, no
    * corpus-grain window anywhere.
    */
  def heapsLaw(documents: DataFrame, checkpoints: Int = 20): DataFrame = {
    val mx = documents.agg(max(col("doc_id")).as("mx"))
    val docs = documents.crossJoin(broadcast(mx))
      .select(col("doc_id"),
        expr(s"(doc_id * $checkpoints) div (mx + 1)").as("bucket"),
        col("text"))
    val toks = OpUtils.spreadDocs(docs)
      .select(col("bucket"), explode(TextFns.tokens(col("text"))).as("tok"))
    val perBucket = docs.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
    val tokMass = toks.groupBy(col("bucket")).agg(count(lit(1)).as("n_tokens"))
    val vocabNew = toks.groupBy(col("tok"))
      .agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("vocab_new"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .join(tokMass, Seq("bucket"), "left")
      .join(vocabNew, Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("vocab_new"), lit(0L)).as("vocab_new"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("cum_vocab", sum(col("vocab_new")).over(w))
  }

  /** Marginal gate attribution — which single rule does the rejecting:
    * documents failing EXACTLY ONE of [[gateReason]]'s four rules, by
    * rule, with their token mass and share of all rejected docs. The
    * first-failing attribution in [[qualityGate]] over-credits early
    * rules; this is the ablation view ("dropping only this rule would
    * admit these docs") a curator needs before relaxing a threshold.
    * Rule predicates are the gate's own, evaluated independently.
    *
    * Scale: pure column work per doc, one map-side-combined rollup to a
    * ≤4-row frame; the rejected-total is an ungrouped (1-row) aggregate
    * broadcast back.
    */
  def gateSoleReason(documents: DataFrame): DataFrame = {
    val flagged = qualityScore(documents).select(
      (col("n_tokens").isNull || col("n_tokens") < 15).as("f_short"),
      coalesce(col("special_ratio") > 0.05, lit(false)).as("f_special"),
      coalesce(col("stop_ratio") < 0.08, lit(false)).as("f_stop"),
      coalesce(col("avg_word_len") < 3.0 || col("avg_word_len") > 10.0,
        lit(false)).as("f_awl"),
      coalesce(col("n_tokens"), lit(0L)).as("ntok"))
      .withColumn("n_fail",
        col("f_short").cast("long") + col("f_special").cast("long") +
          col("f_stop").cast("long") + col("f_awl").cast("long"))
      .filter(col("n_fail") >= 1)
    val total = flagged.agg(count(lit(1)).as("n_rejected"))
    flagged.filter(col("n_fail") === 1)
      .withColumn("reason",
        when(col("f_short"), "too_short")
          .when(col("f_special"), "special_chars")
          .when(col("f_stop"), "low_stopword")
          .otherwise("word_length"))
      .groupBy(col("reason"))
      .agg(count(lit(1)).as("n_sole_docs"), sum(col("ntok")).as("n_sole_tokens"))
      .crossJoin(broadcast(total))
      .select(col("reason"), col("n_sole_docs"), col("n_sole_tokens"),
        expr("n_sole_docs * 1000000 div n_rejected").as("sole_share_micro"))
  }

  /** Zipf rank-octave profile of the token frequency distribution: how
    * many distinct tokens, and how much token MASS, sit at ranks
    * [2ᵒ, 2ᵒ⁺¹) — the log-binned rank/frequency curve a corpus health
    * check reads instead of eyeballing a Zipf plot (a healthy natural-
    * language mix loses roughly a constant factor of mass per octave;
    * boilerplate floods the low octaves, synthetic junk fattens the
    * tail).
    *
    * Ranks are never materialized per token: the vocab rolls up to the
    * FREQUENCY-OF-FREQUENCY table (f, m = #tokens with that f) — at most
    * O(√(2N)) rows for N total tokens, since distinct frequencies with
    * multiplicity sum to N — rank spans come from one cumulative window
    * over that table ordered by (f desc), and each span splits across
    * the ≤64 octaves it straddles by exploding its floor-log₂ range
    * (length(bin(rank))−1, the exact integer log₂ shared with
    * k_anonymity_report). Ties rank in one block (same f ⇒ adjacent
    * ranks), so the result is total-order-free and engine-stable.
    */
  def tokenRankOctaves(documents: DataFrame): DataFrame = {
    val freq = OpUtils.spreadDocs(documents)
      .select(explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
    val fof = freq.groupBy(col("f")).agg(count(lit(1)).as("m"))
    val w = Window.orderBy(col("f").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = fof
      .withColumn("rank_end", sum(col("m")).over(w))
      .withColumn("rank_start", col("rank_end") - col("m") + 1)
    spans
      .withColumn("o", explode(expr(
        "sequence(length(bin(rank_start)) - 1, length(bin(rank_end)) - 1)")))
      .withColumn("lo", greatest(col("rank_start"),
        expr("shiftleft(cast(1 as bigint), o)")))
      .withColumn("hi", least(col("rank_end"),
        expr("shiftleft(cast(1 as bigint), o + 1) - 1")))
      .withColumn("cnt", col("hi") - col("lo") + 1)
      .groupBy(col("o").cast("long").as("rank_octave"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("f")).as("token_mass"),
        max(col("f")).as("max_freq"), min(col("f")).as("min_freq"))
  }

  /** Per-source PII exposure breakdown — the triage report over the same
    * deterministic dirty-corpus synthesis and shared regex patterns as
    * [[piiRedact]] (which scrubs; this AUDITS, per source and PII type,
    * before/after a scrub is scheduled). One codegen'd scan, rollup to
    * |sources|×3 rows, unpivoted via stack.
    */
  def piiDetectReport(documents: DataFrame): DataFrame = {
    val dirty = documents.select(col("source"),
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" contact agent"), col("doc_id").cast("string"),
          lit("@example.com now")))
        .when(col("doc_id") % 5 === 1,
          concat(col("text"), lit(" call 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" today")))
        .when(col("doc_id") % 5 === 2,
          concat(col("text"), lit(" server 10."),
            (col("doc_id") % 256).cast("string"),
            lit(".0."), (col("doc_id") % 200 + 1).cast("string"), lit(" logged")))
        .otherwise(col("text")).as("text"))
    val counted = dirty.select(col("source"),
      regexp_count(col("text"), lit(PiiEmail)).cast("long").as("h_email"),
      regexp_count(col("text"), lit(PiiPhone)).cast("long").as("h_phone"),
      regexp_count(col("text"), lit(PiiIp)).cast("long").as("h_ip"))
    counted.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("h_email") > 0, 1L).otherwise(0L)).as("d_email"),
        sum(col("h_email")).as("s_email"),
        sum(when(col("h_phone") > 0, 1L).otherwise(0L)).as("d_phone"),
        sum(col("h_phone")).as("s_phone"),
        sum(when(col("h_ip") > 0, 1L).otherwise(0L)).as("d_ip"),
        sum(col("h_ip")).as("s_ip"))
      .select(col("source"), col("n_docs"),
        expr("""stack(3,
          'email', d_email, s_email,
          'phone', d_phone, s_phone,
          'ipv4',  d_ip,    s_ip) AS (pii_type, n_docs_hit, n_hits)"""))
      .withColumn("docs_hit_micro",
        expr("n_docs_hit * 1000000 div n_docs"))
  }

  /** Per-source lexical diversity via the unbiased Simpson index
    * λ = Σ f(f−1) / (N(N−1)) — the repeat-collision probability of two
    * sampled tokens, the division-light entropy surrogate (entropy's log
    * is a libm parity gamble; Simpson is exact integer arithmetic all
    * the way to one integral division). High λ or a fat top-token share
    * flags a template-flooded or synthetic source; healthy prose sits
    * near the corpus baseline. Output: tokens, types, λ·10⁶ and the
    * top-token share·10⁶ per source.
    *
    * Scale: ONE map-side-combined (source, token) rollup, then a
    * source-grain re-rollup; Σf(f−1) runs in DECIMAL(38,0) (Σf² crosses
    * 2⁶³ at corpus scale).
    */
  def vocabSimpson(documents: DataFrame): DataFrame =
    OpUtils.spreadDocs(documents)
      .select(col("source"), explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("f"))
      .groupBy(col("source"))
      .agg(sum(col("f")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("f").cast("decimal(38,0)") * (col("f") - 1)).as("ff"),
        max(col("f")).as("max_f"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        expr("""cast(case when n_tokens >= 2 then (ff * 1000000) div
          (cast(n_tokens as decimal(19,0)) * (n_tokens - 1)) else 0 end
          as bigint)""").as("simpson_micro"),
        expr("(max_f * 1000000) div n_tokens").as("top_share_micro"))

  /** Robust per-source document-length profile: exact median and MAD
    * (median absolute deviation) of n_chars, plus the count of length
    * outliers beyond median ± 3·MAD — the curation screen that catches a
    * source whose scraper started emitting truncated stubs or
    * concatenated mega-pages (mean/stddev would let one mega-page mask a
    * thousand stubs).
    *
    * Both medians are exact order statistics (smallest v with
    * 2·cum ≥ n+1) computed on per-(source, value) COUNT tables — the
    * length domain is bounded by the document schema, not by SF, so the
    * cumulative windows ride bounded grids; rows are never sorted
    * globally. No division anywhere.
    */
  def docLengthMad(documents: DataFrame): DataFrame = {
    val counts = documents.groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("m"))
    def medianOf(grid: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("source")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("source"))
      grid
        .withColumn("cum", sum(col("m")).over(w))
        .withColumn("n", sum(col("m")).over(wAll))
        .filter(col("cum") * 2 >= col("n") + 1)
        .groupBy(col("source"), col("n"))
        .agg(min(col("v")).as("med"))
    }
    val med = medianOf(counts)
    val devs = documents.join(med, Seq("source"))
      .groupBy(col("source"), abs(col("n_chars") - col("med")).as("v"))
      .agg(count(lit(1)).as("m"))
    val mad = medianOf(devs).select(col("source"), col("med").as("mad"))
    documents.join(med, Seq("source")).join(mad, Seq("source"))
      .groupBy(col("source"), col("n").as("n_docs"),
        col("med").as("median_chars"), col("mad").as("mad_chars"))
      .agg(sum(when(abs(col("n_chars") - col("med")) > col("mad") * 3, 1L)
        .otherwise(0L)).as("n_outliers"))
  }

  /** Distinctive terms per source by exact share LIFT — corpus keyness
    * ("what vocabulary makes source X itself"), the profile a mixture
    * designer reads before weighting sources: for each (source, token),
    * lift = (token's share of the source) / (token's share of the
    * corpus) as an exact micro-unit ratio — >1e6 means over-represented
    * — reported for the top `k` lifted tokens per source above a
    * minimum corpus frequency (rare-token lifts are noise). Integer
    * arithmetic end to end in DECIMAL(38,0) (token-count cross products
    * pass 2⁶³ at corpus scale); no logs, so the oracle agrees bit for
    * bit.
    *
    * Scale: one tokenize pass rolled map-side to (source, tok) grain —
    * vocabulary×sources-bounded, not corpus-bounded; the corpus and
    * source margins are re-rollups of that table; the per-source rank
    * compiles to WindowGroupLimit (partial top-k below the exchange),
    * and the `source` partition domain is the source enum.
    */
  def sourceTermLift(documents: DataFrame, k: Int = 10,
      minTf: Long = 5L): DataFrame = {
    require(k >= 1 && minTf >= 1)
    // eager checkpoint: the (source, tok) grain feeds FOUR consumers
    // (st itself, tokTot, srcTot, nTot) whose stages schedule
    // concurrently — profiled r15: the tokenize+rollup pass ran 4×
    // (~30 executor-seconds duplicated) because nothing pinned this
    // vocabulary×sources-bounded frame (~19k rows at sf0.1)
    val st = Memo.managedCheckpoint(OpUtils.spreadDocs(documents)
      .select(col("source"), explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("a")))
    val tokTot = st.groupBy(col("tok")).agg(sum(col("a")).as("tf"))
    val srcTot = st.groupBy(col("source")).agg(sum(col("a")).as("ns"))
    val nTot = st.agg(sum(col("a")).as("n"))
    val lifted = st
      .join(tokTot.filter(col("tf") >= minTf), Seq("tok"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(nTot))
      .withColumn("lift_micro", expr(
        """cast((cast(a as decimal(38,0)) * n * 1000000) div
          |(cast(tf as decimal(38,0)) * ns) as bigint)""".stripMargin))
    lifted
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("lift_micro").desc, col("tok"))))
      .filter(col("rank") <= k)
      .select(col("source"), col("tok"), col("rank").cast("long").as("rank"),
        col("a").as("tf_source"), col("tf").as("tf_corpus"),
        col("lift_micro"))
  }
}
