package graft.operators

import graft.functions.{HashFns, TextFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a pretraining-data pipeline runs after
  * cleaning/dedup (SURVEY §2.D): reproducible stratified sampling,
  * data-mixture reporting, and sequence packing. All single-scan,
  * map-side-combined shapes — the only shuffles are the grouped
  * aggregations themselves.
  */
object PipelineOps {

  /** Per-language sampling keep-rate in percent (downsample the dominant
    * languages — the classic mixture-rebalancing step). Shared with the
    * oracle-SQL generator.
    */
  val SampleRatePct: Seq[(String, Int)] =
    Seq("en" -> 30, "zh" -> 60, "de" -> 100, "es" -> 100, "fr" -> 100)

  /** Salt for the sampling hash — versioning the salt re-draws the whole
    * sample deterministically (the reproducibility contract).
    */
  val SampleSalt = "strat:"

  /** Deterministic hash-based stratified sampling: keep a document iff
    * md5-prefix(salt || doc_id) mod 100 falls under its language's rate.
    * No RNG, no shuffle, no state — any executor (or engine) re-derives
    * the same sample, which is what makes a 100 TB sample auditable.
    */
  def stratifiedSample(documents: DataFrame): DataFrame = {
    val bucket = HashFns.hash32(concat(lit(SampleSalt), col("doc_id").cast("string"))) % 100
    val rate = SampleRatePct.tail.foldLeft(
      when(col("lang") === SampleRatePct.head._1, lit(SampleRatePct.head._2))) {
      case (acc, (l, r)) => acc.when(col("lang") === l, lit(r))
    }.otherwise(lit(0))
    documents
      .select(col("doc_id"), col("lang"), bucket.cast("long").as("sample_bucket"),
        rate.cast("long").as("keep_rate_pct"))
      .filter(col("sample_bucket") < col("keep_rate_pct"))
  }

  /** Salt for the per-source cap ranking — same versioned-redraw
    * contract as [[SampleSalt]].
    */
  val CapSalt = "cap:v1:"

  /** Per-source frequency cap — the domain-cap step of web-corpus
    * curation (no single domain may dominate the mixture): keep at most
    * `cap` documents per source, chosen by deterministic salted-hash
    * rank (a reproducible uniform draw, not "first seen wins" — which at
    * 100 TB would bias toward crawl order). The row_number ≤ cap filter
    * compiles to WindowGroupLimit, so every map task keeps only `cap`
    * rows per source BEFORE the shuffle — a hot domain with billions of
    * docs never single-partitions the sort.
    */
  def sourceCapSample(documents: DataFrame, cap: Int = 10): DataFrame = {
    val h = HashFns.hash32(concat(lit(CapSalt), col("doc_id").cast("string")))
    documents
      .select(col("doc_id"), col("source"), h.as("h"))
      .withColumn("cap_rank", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id")))
        .cast("long"))
      .filter(col("cap_rank") <= cap)
      .select(col("doc_id"), col("source"), col("cap_rank"))
  }

  /** Salt for the weighted-priority draw — same versioned-redraw
    * contract as [[SampleSalt]].
    */
  val WeightSalt = "wsamp:v1:"

  /** Deterministic WEIGHTED sampling — the "sample documents
    * proportional to length/quality" step of corpus curation, as a
    * priority draw: each doc gets priority ⌊h·10⁶ / w⌋ (h = salted
    * 32-bit hash, w = its character count), and the k smallest
    * priorities win — an Efraimidis–Spirtakis-style weighted priority
    * sample with a linear race in place of the exponential one (the
    * ranking key is a monotone integer surrogate, so the draw is exact,
    * reproducible, and engine-replayable with NO float math — same
    * policy as the other samplers; heavier docs draw systematically
    * smaller priorities, lighter docs still win occasionally).
    *
    * Scale: priority is a pure column expression; the global k-smallest
    * is a bounded TakeOrdered (every partition forwards ≤ k rows), never
    * a corpus-wide sort. Empty docs (w = 0) are excluded — they cannot
    * race.
    */
  def weightedSample(documents: DataFrame, k: Int = 50): DataFrame = {
    val w = length(TextFns.normText(col("text"))).cast("long")
    val h = HashFns.hash32(concat(lit(WeightSalt), col("doc_id").cast("string")))
    documents
      .select(col("doc_id"), w.as("weight_chars"), h.as("h"))
      .filter(col("weight_chars") > 0)
      .select(col("doc_id"), col("weight_chars"),
        expr("(h * 1000000) div weight_chars").as("priority_micro"))
      .orderBy(col("priority_micro"), col("doc_id"))
      .limit(k)
  }

  /** Salt for the train/val/test assignment hash — bump to re-draw every
    * split deterministically (same contract as [[SampleSalt]]).
    */
  val SplitSalt = "split:v1:"

  /** Deterministic train/val/test split (80/10/10 by hashed doc_id) +
    * per-(lang, split) accounting — the reproducible holdout assignment
    * every training pipeline needs: no RNG, no state, any engine
    * re-derives the same membership, and a doc's split never changes as
    * the corpus grows (it depends only on the doc's own id).
    *
    * Scale: split assignment is a pure column expression; the rollup is
    * one map-side-combined grouped scan to ≤ |langs|·3 rows; the share
    * window runs over ≤ 3 rows per language.
    */
  /** The 80/10/10 hash split assignment as a pure function of the doc
    * id — shared by [[datasetSplit]] and [[splitLeakage]] so the two can
    * never disagree about where a document lives.
    */
  def splitOf(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bucket =
      HashFns.hash32(concat(lit(SplitSalt), docId.cast("string"))) % 100
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
  }

  def datasetSplit(documents: DataFrame): DataFrame = {
    val split = splitOf(col("doc_id"))
    documents
      .select(col("lang"), split.as("split"),
        size(TextFns.tokens(col("text"))).cast("long").as("n"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
      .withColumn("doc_share_micro",
        expr("(n_docs * 1000000) div (sum(n_docs) over (partition by lang))"))
  }

  /** Eval-split leakage audit: near-duplicate pairs that CROSS the
    * train/val/test boundary of [[datasetSplit]]'s hash assignment —
    * the contamination that silently inflates eval scores (a test doc
    * whose near-copy sits in train survives every exact-dedup pass and
    * every per-split check; only the pair graph × split assignment
    * sees it). Returns each crossing pair with both splits and its
    * exact Jaccard; an empty result is the release gate.
    *
    * Scale: rides the memoized exact-Jaccard pair graph; the split is a
    * per-row hash of the id (no join), so the audit costs one pass over
    * the BOUNDED pair list beyond the shared derivation.
    */
  def splitLeakage(documents: DataFrame): DataFrame =
    DedupOps.dedupNgramJaccard(documents)
      .withColumn("split_a", splitOf(col("doc_a")))
      .withColumn("split_b", splitOf(col("doc_b")))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
        col("jaccard"))

  /** Data-mixture report: per-language doc/token counts and each
    * language's share of all corpus tokens (window SUM OVER () — the
    * same %-of-total shape as the warehouse queries, over text stats).
    */
  def mixtureReport(documents: DataFrame): DataFrame = {
    val grouped = documents
      .select(col("lang"), size(TextFns.tokens(col("text"))).cast("long").as("n"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
    grouped.select(col("lang"), col("n_docs"), col("n_tokens"),
      round(col("n_tokens").cast("double") * lit(100.0).cast("double") /
        sum(col("n_tokens")).over(Window.partitionBy()).cast("double"), 4)
        .as("token_share_pct"))
  }

  /** Mixture report across EVERY (lang, source) rollup level in one pass
    * — CUBE gives per-lang, per-source, per-(lang, source), and the grand
    * total from a single scan (the 4 separate dashboards a mixture
    * curator actually reads). The cube expansion happens inside the
    * aggregation (map-side combined partials per grouping set); at 100 TB
    * this is one fact scan instead of four.
    */
  def mixtureCube(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"), col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("n"))
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))

  /** Salt for the rebalancing sample — distinct from [[SampleSalt]] so
    * the two samples are independent deterministic draws.
    */
  val BalanceSalt = "bal:"

  /** Mixture rebalancing solver + realized outcome: per language, the
    * keep rate that equalizes token mass down to the smallest language
    * (rate_pct = floor(100 · min_tokens / lang_tokens)), then the sample
    * that rate actually draws under the same auditable md5-bucket
    * contract as [[stratifiedSample]], with achieved doc/token counts.
    * Unlike the fixed [[SampleRatePct]] table, these rates are SOLVED
    * from the corpus — the step a pipeline runs when the target mixture
    * is "uniform across languages". Scale shape: two map-side-combined
    * aggregations over one doc-stats scan; the language-count-sized rate
    * table broadcasts back; nothing corpus-sized shuffles twice.
    */
  def mixtureBalance(documents: DataFrame): DataFrame = {
    val stats = documents.select(col("doc_id"), col("lang"),
      size(TextFns.tokens(col("text"))).cast("long").as("n"))
    val perLang = stats.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
    val minTok = perLang.agg(min(col("n_tokens")).as("min_tokens"))
    val rates = perLang.crossJoin(broadcast(minTok))
      .withColumn("keep_rate_pct",
        floor((lit(100.0) * col("min_tokens").cast("double")) /
          col("n_tokens").cast("double")).cast("long"))
    val kept = stats
      .join(broadcast(rates.select(col("lang"), col("keep_rate_pct"))), Seq("lang"))
      .filter(HashFns.hash32(concat(lit(BalanceSalt), col("doc_id").cast("string")))
        % 100 < col("keep_rate_pct"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("kept_docs"), sum(col("n")).as("kept_tokens"))
    rates.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("keep_rate_pct"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        round((coalesce(col("kept_tokens"), lit(0L)).cast("double") * lit(100.0)) /
          col("n_tokens").cast("double"), 4).as("realized_pct"))
  }

  /** Chunking geometry: window length and stride in tokens (overlap =
    * ChunkTokens - ChunkStride). Shared with the oracle-SQL generator.
    */
  val ChunkTokens = 32
  val ChunkStride = 24

  /** Overlapping fixed-token chunking (context-window / RAG prep): each
    * document emits windows of `ChunkTokens` tokens every `ChunkStride`
    * tokens, with the trailing partial window kept. Pure per-row
    * generator expressions (sequence + slice — no interpreted lambdas,
    * no shuffle at all): embarrassingly parallel at any corpus size.
    */
  def docChunk(documents: DataFrame, chunkLen: Int = ChunkTokens,
      stride: Int = ChunkStride): DataFrame = {
    val ts = col("ts")
    documents
      .select(col("doc_id"), TextFns.tokens(col("text")).as("ts"))
      .filter(size(ts) > 0)
      .select(col("doc_id"), ts,
        posexplode(sequence(lit(0), size(ts) - 1, lit(stride)))
          .as(Seq("chunk_id", "start_tok")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(chunkLen), size(ts) - col("start_tok")).cast("long").as("chunk_tokens"),
        concat_ws(" ", slice(ts, col("start_tok") + 1, lit(chunkLen))).as("chunk_text"))
  }

  /** Vocabulary coverage report: tokens ranked by corpus frequency with
    * the cumulative share of all token occurrences — the "how big must
    * the vocab be to cover X%" analysis behind tokenizer design.
    *
    * Scale shape: the corpus-sized work is the map-side-combined term-
    * frequency aggregation. The global (tf desc, tok) ranking then
    * decomposes WITHOUT any vocabulary-sized single-partition window:
    * within a tf-group every token has the same tf, so global rank =
    * (tokens in higher-tf groups) + rank within the group, and the
    * running tf sum = (occurrences in higher-tf groups) + rank×tf.
    * The only unpartitioned window runs over the distinct-tf GROUP table
    * (zipfian: ~O(√corpus) rows). The within-group rank gets a second
    * decomposition level of its own — a zipfian tf=1 group holds ~half
    * the vocabulary, so ranking it in one partition would still sort
    * ~50M rows in one task at web scale: tokens bucket by their 2-char
    * prefix (bounded domain, order-refining), the per-token row_number
    * partitions by (tf, prefix), and the cross-prefix rank offset rides
    * a window over (tf, prefix) SUMMARIES partitioned by tf.
    */
  def vocabCoverage(documents: DataFrame): DataFrame = {
    val tf = TextOps.corpusTf(documents)
      .withColumn("seg", substring(col("tok"), 1, 2))
    // distinct-tf group table: token count and occurrence mass per tf
    val groups = tf.groupBy(col("tf"))
      .agg(count(lit(1)).as("n_toks"))
      .withColumn("occ", col("tf") * col("n_toks"))
    val wg = Window.orderBy(col("tf").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = groups.select(col("tf"),
      coalesce(sum(col("n_toks")).over(wg), lit(0L)).as("rank_offset"),
      coalesce(sum(col("occ")).over(wg), lit(0L)).as("occ_offset"),
      sum(col("occ")).over(Window.partitionBy()).as("total_occ"))
    // within-tf prefix-bucket offsets: tokens in strictly-earlier
    // 2-char-prefix buckets of the same tf group ((tf, seg) summary
    // grain — per-tf partitions bounded by the prefix domain)
    val wSeg = Window.partitionBy(col("tf")).orderBy(col("seg"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val segOffsets = tf.groupBy(col("tf"), col("seg"))
      .agg(count(lit(1)).as("seg_toks"))
      .withColumn("seg_rank_offset",
        coalesce(sum(col("seg_toks")).over(wSeg), lit(0L)))
      .select(col("tf"), col("seg"), col("seg_rank_offset"))
    val wt = Window.partitionBy(col("tf"), col("seg")).orderBy(col("tok"))
    tf.join(offsets, Seq("tf")).join(segOffsets, Seq("tf", "seg"))
      .withColumn("rn",
        (col("seg_rank_offset") + row_number().over(wt)).cast("long"))
      .select(col("tok"), col("tf"),
        (col("rank_offset") + col("rn")).as("rank"),
        round((col("occ_offset") + col("rn") * col("tf")).cast("double") *
          lit(100.0) / col("total_occ").cast("double"), 4)
          .as("cum_coverage_pct"))
  }

  /** Temperature-scaled mixture weights (α = 0.5): the multilingual
    * up/down-sampling standard — sampling ∝ p^α flattens the language
    * distribution so low-resource languages aren't drowned. p^0.5 is the
    * EXACT integer square root of the token count (floor-sqrt with a
    * ±1 correction step, so libm rounding at perfect-square boundaries
    * can never flip it in either engine), and every share is integer
    * micro-units over window totals that span ≤ |langs| rows.
    */
  /** Per-language token totals with the exact-integer-sqrt temperature
    * weight (α = 0.5) — the shared core of [[mixtureTemperature]] (the
    * report) and [[mixtureResample]] (the execution), so the two can
    * never disagree about a weight.
    */
  private def langWeights(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"), size(TextFns.tokens(col("text"))).cast("long").as("n"))
      .groupBy(col("lang"))
      .agg(sum(col("n")).as("n_tokens"))
      // exact isqrt: sqrt is correctly rounded, but FLOOR of it can land
      // one off right at k² boundaries — correct both directions
      .withColumn("s1", expr("cast(floor(sqrt(cast(n_tokens as double))) as bigint)"))
      .withColumn("weight", expr(
        """case when (s1 + 1) * (s1 + 1) <= n_tokens then s1 + 1
          |     when s1 * s1 > n_tokens then s1 - 1
          |     else s1 end""".stripMargin))

  def mixtureTemperature(documents: DataFrame): DataFrame = {
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    langWeights(documents)
      .withColumn("tot_w", sum(col("weight")).over(wAll))
      .withColumn("tot_t", sum(col("n_tokens")).over(wAll))
      .select(col("lang"), col("n_tokens"), col("weight"),
        expr("(weight * 1000000) div tot_w").as("share_micro"),
        expr("(n_tokens * 1000000) div tot_t").as("natural_share_micro"))
  }

  /** Salt for the mixture-resample acceptance hash — bump to re-draw
    * (same contract as [[SampleSalt]]/[[SplitSalt]]).
    */
  val MixSalt = "mix:v1:"

  /** EXECUTE the temperature mixture — the resampling step
    * [[mixtureTemperature]] only reports: each language is
    * deterministically down-sampled to its α=0.5 share, acceptance
    * p_L = min(1, (w_L/Σw) / (t_L/Σt)) decided per document by the
    * shared salted id hash. No RNG — any engine re-derives the same
    * corpus, and a document's verdict never changes as other languages
    * grow. Languages at/below their temperature share keep every doc
    * (the no-duplication variant; upsampling low-resource languages is
    * a repeat-factor at training time, not row duplication here).
    * Exact integer arithmetic: the acceptance threshold is a micro-unit
    * ratio in DECIMAL(38,0) (w·Σt·10⁶ crosses 2⁶³ at lake scale).
    *
    * Scale: one tokenize rollup to ≤|langs| rows broadcast back, then
    * ONE codegen'd filter pass over the corpus — no shuffle of
    * document rows at all.
    */
  def mixtureResample(documents: DataFrame): DataFrame = {
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val accept = langWeights(documents)
      .filter(col("n_tokens") > 0)
      .withColumn("tot_w", sum(col("weight")).over(wAll))
      .withColumn("tot_t", sum(col("n_tokens")).over(wAll))
      .select(col("lang"), expr(
        """cast(least(1000000,
          |  (cast(weight as decimal(38,0)) * tot_t * 1000000) div
          |  (cast(n_tokens as decimal(38,0)) * tot_w)) as bigint)""".stripMargin)
        .as("accept_micro"))
    documents
      .join(broadcast(accept), Seq("lang"))
      .filter(HashFns.hash32(concat(lit(MixSalt), col("doc_id").cast("string")))
        % 1000000 < col("accept_micro"))
      .select(col("doc_id"), col("lang"), col("source"), col("accept_micro"))
  }

  /** UPSAMPLE leg of the temperature mixture — the repeat-factor side
    * [[mixtureResample]] deliberately leaves to training time, made
    * executable: every document materializes ⌈ratio⌉-or-⌊ratio⌋ copies
    * where ratio_L = (w_L/Σw)/(t_L/Σt) is the language's temperature
    * ratio, capped at `maxRepeat` (repeating data-constrained languages
    * beyond a few epochs stops helping — the standard repeat cap). The
    * fractional part resolves per document via the SAME salted hash
    * draw as [[mixtureResample]]'s acceptance, so E[copies] = ratio
    * exactly and, for languages AT/ABOVE their share (ratio ≤ 1), the
    * set of documents with ≥1 copy is bit-for-bit the resample's kept
    * set — the two legs are one consistent mixture, not two samplers.
    * All thresholds are exact micro-unit integers (DECIMAL(38,0)
    * internals); no RNG anywhere.
    *
    * Scale: ≤|langs| ratio rows broadcast back onto the corpus, one
    * codegen'd sequence-explode pass; output size is Σ copies — the
    * corpus times the mixture's own expansion factor, which is the
    * point. No document row ever shuffles.
    */
  def mixtureUpsample(documents: DataFrame, maxRepeat: Int = 4): DataFrame = {
    require(maxRepeat >= 1, s"maxRepeat must be >= 1, got $maxRepeat")
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val ratio = langWeights(documents)
      .filter(col("n_tokens") > 0)
      .withColumn("tot_w", sum(col("weight")).over(wAll))
      .withColumn("tot_t", sum(col("n_tokens")).over(wAll))
      .select(col("lang"), expr(
        s"""cast(least(${maxRepeat}L * 1000000,
           |  (cast(weight as decimal(38,0)) * tot_t * 1000000) div
           |  (cast(n_tokens as decimal(38,0)) * tot_w)) as bigint)""".stripMargin)
        .as("ratio_micro"))
    documents
      .join(broadcast(ratio), Seq("lang"))
      .withColumn("n_copies",
        expr("ratio_micro div 1000000") +
          when(HashFns.hash32(concat(lit(MixSalt), col("doc_id").cast("string")))
            % 1000000 < expr("ratio_micro % 1000000"), 1L).otherwise(0L))
      // sequence(1, 0) would step BACKWARD in Spark — guard the empty case
      .withColumn("copy_id", explode(when(col("n_copies") >= 1L,
        expr("sequence(1L, n_copies)")).otherwise(array())))
      .select(col("doc_id"), col("lang"), col("source"),
        col("copy_id").cast("long").as("copy_id"), col("n_copies"))
  }

  /** End-to-end curation verdict — the composition a pipeline actually
    * materializes as its training corpus: near-duplicate SURVIVORS
    * (MinHash-LSH + connected components) ∩ QUALITY gate ∩ reproducible
    * stratified SAMPLE. Each leg is its own oracle-checked operator; the
    * composition is three left-semi joins on doc_id, so the big text
    * columns never flow through any shuffle — only doc_id key sets do.
    */
  def curatedCorpus(documents: DataFrame, qualityMin: Double = 0.5): DataFrame = {
    val survivors = DedupOps.dedupSurvivors(documents).select("doc_id")
    val quality = TextOps.qualityScore(documents)
      .filter(col("quality_score") >= qualityMin).select("doc_id")
    val sampled = stratifiedSample(documents).select("doc_id")
    documents
      .join(survivors, Seq("doc_id"), "left_semi")
      .join(quality, Seq("doc_id"), "left_semi")
      .join(sampled, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** Tokens a single training sequence holds — packing budget. */
  val PackBudget = 256

  /** Sequence packing: assign documents (in deterministic doc_id order,
    * stratified by (language, source)) to fixed-token-budget packs via a
    * running token total; a doc whose tokens straddle a boundary spills
    * into the next pack (greedy contiguous packing). Pack ids are offset
    * per stratum ("lang/source/N") so they stay globally unique without
    * any cross-stratum coordination.
    *
    * Scale: a per-stratum running sum caps parallelism at the stratum
    * count (~100 here) — a monolingual 100 TB corpus would pack in one
    * task. The running sum factors exactly through doc_id SEGMENTS of
    * `segDocs` ids each: the within-segment window partitions by
    * (lang, source, segment) — bounded rows per partition — and the
    * cross-segment token offset rides a window over SEGMENT SUMMARIES
    * only (a segDocs-fold smaller table; the pattern recurses if even
    * that is too long). Identical output to the single-window form,
    * since segment order refines doc_id order.
    */
  def tokenPack(documents: DataFrame, budget: Int = PackBudget,
      segDocs: Long = 1024L): DataFrame = {
    val base = documents
      .select(col("doc_id"), col("lang"), col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("seg", expr(s"doc_id div $segDocs"))
    // level 1: per-segment token totals → running offset over strictly-
    // earlier segments of the same stratum (segment-summary grain)
    val wPrior = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("seg")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("lang"), col("source"), col("seg"))
      .agg(sum(col("n_tokens")).as("seg_tokens"))
      .withColumn("seg_offset",
        coalesce(sum(col("seg_tokens")).over(wPrior), lit(0L)))
      .select(col("lang"), col("source"), col("seg"), col("seg_offset"))
    // level 2: within-segment running sum, partitioned by segment
    val wIn = Window.partitionBy(col("lang"), col("source"), col("seg"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("in_cum", sum(col("n_tokens")).over(wIn))
      .join(offsets, Seq("lang", "source", "seg"))
      .withColumn("cum_tokens", col("seg_offset") + col("in_cum"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
        concat_ws("/", col("lang"), col("source"),
          expr(s"(cum_tokens - n_tokens) div $budget")).as("pack_id"),
        ((col("cum_tokens") - col("n_tokens")) % budget).as("pack_offset"))
  }

  /** Proportional token-budget apportionment across (lang, source)
    * strata — "we can afford B training tokens; how many come from each
    * stratum?" — via EXACT largest-remainder (Hamilton) rounding: base
    * share ⌊B·avail/T⌋ per stratum, the Σbase→B shortfall distributed to
    * the largest remainders (ties to stratum name). Σalloc = B exactly,
    * no float ever enters. B·avail runs in DECIMAL(38,0): at lake scale
    * (B, avail ~ 10¹³) the product crosses 2⁶³.
    *
    * Scale: one map-side-combined rollup of the corpus to |strata| rows;
    * the apportionment windows run on that stratum table, never on docs.
    */
  def tokenBudgetAlloc(documents: DataFrame, budget: Long = 1000000L): DataFrame = {
    val strata = documents
      .select(col("lang"), col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("toks"))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("toks")).as("avail_tokens"))
    val all = Window.partitionBy()
    strata
      .withColumn("total", sum(col("avail_tokens")).over(all))
      .withColumn("p",
        lit(budget).cast("decimal(38,0)") * col("avail_tokens"))
      .withColumn("base", expr("cast(p div total as bigint)"))
      .withColumn("rem", expr("cast(p % total as bigint)"))
      .withColumn("rr", row_number().over(
        Window.orderBy(col("rem").desc, col("lang"), col("source"))))
      .withColumn("leftover", lit(budget) - sum(col("base")).over(all))
      .select(col("lang"), col("source"), col("avail_tokens"),
        (col("base") + when(col("rr") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc_tokens"))
  }

  /** Curriculum phase assignment — quality-ordered training schedule:
    * documents ranked by [[TextOps.qualityScore]] descending, cut into
    * `phases` contiguous chunks of roughly equal TOKEN budget (the
    * anneal-on-best-data-last recipe run in reverse: phase 0 is the
    * highest-quality third). A score tie-group lands wholly in the phase
    * of its first token, so assignment is deterministic without any
    * per-document total order. Per phase: doc/token mass and the score
    * range actually covered.
    *
    * Scale: the quantized-score CDF pattern — scores are 4-dp-rounded
    * (≤ 10001 distinct values at any SF), so the only window runs over
    * the bounded distinct-score table, never the corpus; the token total
    * is an ungrouped 1-row broadcast.
    */
  def curriculumPhases(documents: DataFrame, phases: Int = 3): DataFrame = {
    val scored = TextOps.qualityScore(documents).select(
      expr("cast(round(quality_score * 10000) as bigint)").as("score_q"),
      col("n_tokens"))
    val byScore = scored.groupBy(col("score_q"))
      .agg(count(lit(1)).as("nd"), sum(col("n_tokens")).as("nt"))
    val tot = scored.agg(sum(col("n_tokens")).as("ttot"))
    byScore.crossJoin(broadcast(tot))
      .withColumn("cum_before", coalesce(sum(col("nt")).over(
        Window.orderBy(col("score_q").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("phase",
        least(expr(s"(cum_before * $phases) div greatest(ttot, 1)"),
          lit(phases - 1L)))
      .groupBy(col("phase"))
      .agg(sum(col("nd")).as("n_docs"), sum(col("nt")).as("n_tokens"),
        max(col("score_q")).as("max_score_q"),
        min(col("score_q")).as("min_score_q"))
  }
}
