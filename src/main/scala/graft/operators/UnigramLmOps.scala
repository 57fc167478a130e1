package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer TRAINING — Kudo 2018's
  * alternative to BPE (TextOps.bpeLearnMerges): fix a candidate piece
  * vocabulary, then EM-iterate "segment every word by the current piece
  * likelihoods (E), re-estimate piece likelihoods from the segmentation
  * counts (M)". This is the hard-EM (Viterbi-EM) variant: the E-step
  * takes each word's single best segmentation — the standard scalable
  * approximation of the forward-backward E-step.
  *
  * Construction, engine-exact:
  *   - Candidate vocab (FIXED across EM rounds, as in SentencePiece):
  *     every observed character, plus the top-`VocabMulti` multi-char
  *     substrings (length 2..[[MaxPieceLen]]) by occurrence count, ties
  *     lexicographic. Characters are never pruned, so every word always
  *     has at least one segmentation.
  *   - Piece likelihoods are exact integer nano-units
  *     p = max(1, ⌊10⁹·c/Σc⌋) (the floor-at-1 keeps unused pieces
  *     representable without −∞ log handling).
  *   - The Viterbi DP is UNROLLED over word positions (the
  *     Durbin–Levinson discipline): b_j = best segmentation score of the
  *     first j characters = max over piece lengths l of
  *     b_{j−l} · (p(piece ending at j) / 10⁹), computed in DOUBLE. No
  *     libm anywhere: every factor is an exactly-representable integer
  *     scaled by the exact constant 10⁻⁹, and IEEE ×/compare on
  *     identical expression trees is bit-identical across engines — the
  *     oracle unrolls the same recurrence text, generated from this
  *     object. Backpointers prefer the LONGEST piece on exact ties.
  *   - Words longer than [[MaxWordLen]] chars are excluded from
  *     training (the SentencePiece max-length discipline; bounds the
  *     unrolled DP).
  *
  * Scale: the corpus is scanned ONCE (the Memo-pinned word-frequency
  * rollup, map-side combined); candidate counting, both EM rounds, and
  * the DP all run on VOCABULARY-sized tables — piece-probability tables
  * broadcast, never a corpus re-read. Exactly the published recipe:
  * tokenizer training iterates over word types, not tokens.
  */
object UnigramLmOps {
  val MaxWordLen = 12
  val MaxPieceLen = 4
  val VocabMulti = 40

  /** All (end-position j, piece-length l) lookup slots of the DP. */
  def slots: Seq[(Int, Int)] =
    for { j <- 1 to MaxWordLen; l <- 1 to math.min(MaxPieceLen, j) } yield (j, l)

  // ------------------------------------------------------------------
  // Engine-agnostic scalar SQL for the unrolled DP — the SAME text goes
  // into the Spark plan (expr) and the generated DuckDB oracle, so the
  // IEEE double arithmetic is bit-identical by construction.
  // ------------------------------------------------------------------

  /** Score of extending b_{j−l} with the piece of length l ending at j. */
  def candSql(j: Int, l: Int): String = {
    val b = if (j - l == 0) "1.0" else s"b_${j - l}"
    s"($b * (CAST(COALESCE(p_${j}_$l, 0) AS DOUBLE) / 1000000000.0))"
  }

  /** b_j = best score over admissible piece lengths. */
  def bSql(j: Int): String = {
    val cands = (1 to math.min(MaxPieceLen, j)).map(l => candSql(j, l))
    if (cands.size == 1) cands.head else s"greatest(${cands.mkString(", ")})"
  }

  /** Backpointer: the piece length achieving b_j, longest-first on exact
    * ties (equality against greatest() is exact — b_j IS one of the
    * candidates bit-for-bit).
    */
  def bpSql(j: Int): String = {
    val ls = (2 to math.min(MaxPieceLen, j)).reverse
    if (ls.isEmpty) "1"
    else ls.map(l => s"WHEN ${candSql(j, l)} = b_$j THEN $l")
      .mkString("CASE ", " ", " ELSE 1 END")
  }

  /** Dynamic index into the unrolled backpointers: bp at position `pos`. */
  private def lenAtSql(posCol: String): String =
    (1 to MaxWordLen).map(j => s"WHEN $j THEN bp_$j")
      .mkString(s"CASE $posCol ", " ", " END")

  /** Reconstruction step t: piece length consumed at the current pos. */
  def lenSql(t: Int): String =
    s"CASE WHEN pos_${t - 1} >= 1 THEN ${lenAtSql(s"pos_${t - 1}")} END"

  def pieceColSql(t: Int): String =
    s"CASE WHEN pos_${t - 1} >= 1 THEN " +
      s"substring(w, pos_${t - 1} - len_$t + 1, len_$t) END"

  def posSql(t: Int): String =
    s"CASE WHEN pos_${t - 1} >= 1 THEN pos_${t - 1} - len_$t ELSE 0 END"

  // ------------------------------------------------------------------

  /** Word-frequency rollup: the single corpus touch. */
  private def words(documents: DataFrame): DataFrame =
    Memo.cached("unigram_words", documents) { docs =>
      OpUtils.spreadDocs(docs)
        .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
        .filter(length(col("w")).between(1, MaxWordLen))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
    }

  /** (piece, c0): occurrence counts of every candidate substring. */
  private def subCounts(ws: DataFrame): DataFrame =
    ws.select(col("w"), col("n"),
        explode(sequence(lit(1), length(col("w")))).as("j"))
      .select(col("w"), col("n"), col("j"),
        explode(sequence(lit(1), least(lit(MaxPieceLen), col("j")))).as("l"))
      .select(expr("substring(w, j - l + 1, l)").as("piece"), col("n"))
      .groupBy(col("piece")).agg(sum(col("n")).as("c0"))

  /** M-step: nano-unit likelihoods from counts (col `c`), floor-at-1. */
  private def probs(counts: DataFrame): DataFrame = {
    val total = counts.agg(sum(col("c")).as("tot"))
    counts.crossJoin(broadcast(total))
      .select(col("piece"),
        expr("""greatest(1L, cast((cast(c as decimal(38,0)) * 1000000000)
               | div nullif(tot, 0) as bigint))"""
          .stripMargin.replaceAll("\n", " ")).as("p_nano"))
  }

  /** One row per word with its Viterbi segmentation under `p` (piece_1
    * .. piece_MaxWordLen, unused = NULL): lookup slots pivot to one row
    * per word (42 columns at MaxWordLen 12), then the unrolled DP +
    * backpointer walk. Vocab-sized — shared by the trainer's E-step and
    * the encoder.
    */
  private def segmented(ws: DataFrame, p: DataFrame): DataFrame = {
    // ONE codegen'd DP expression per word against the driver-collected
    // vocab (bounded: |chars| + VocabMulti pieces — the codebook-collect
    // convention). The former shape exploded every (word, j, l) slot
    // through a broadcast join, pivoted 42 probability columns, and
    // stacked ~60 sequential withColumn layers of DP/backpointer/
    // reconstruction expressions — Catalyst ANALYSIS of that tower, not
    // the vocabulary-sized work, dominated both EM rounds (~3.3 s each
    // at sf0.1 with well under 0.5 s of task time). The expression
    // replays the identical IEEE recurrence (see UnigramSeg's
    // equivalence notes); the DuckDB oracle still unrolls the same
    // recurrence text from the *Sql generators above.
    // sorted by piece so the vocab (and SegVocab's order-sensitive
    // equals/hashCode, hence the expression's plan identity) is canonical
    // run-to-run — the collect order of a shuffled aggregation is not
    // (r14 advice; lookup is a HashMap, results were never affected)
    val vp = p.select(col("piece"), col("p_nano")).collect()
      .sortBy(_.getString(0))
    val vocab = new graft.functions.SegVocab(
      vp.map(_.getString(0)), vp.map(_.getLong(1)), MaxPieceLen, MaxWordLen)
    ws.select(col("w"), col("n"),
        graft.functions.UnigramSeg.segment(col("w"), vocab).as("__seg"))
      .select(col("w") +: col("n") +:
        (1 to MaxWordLen).map(t =>
          element_at(col("__seg"), t).as(s"piece_$t")): _*)
  }

  /** E-step: weighted piece counts of the Viterbi segmentation. */
  private def eStep(seg: DataFrame): DataFrame =
    seg
      .select(col("n"), explode(array(
        (1 to MaxWordLen).map(t => col(s"piece_$t")): _*)).as("piece"))
      .filter(col("piece").isNotNull)
      .groupBy(col("piece")).agg(sum(col("n")).as("c"))

  /** Counts for the FIXED vocab: E-step counts, zero where unused. */
  private def onVocab(vocab: DataFrame, c: DataFrame): DataFrame =
    vocab.select(col("piece"))
      .join(c, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("c"), lit(0L)).as("c"))

  private def vocab0(documents: DataFrame): DataFrame = {
    val sub = subCounts(words(documents))
    sub.filter(length(col("piece")) === 1)
      .unionByName(sub.filter(length(col("piece")) >= 2)
        .orderBy(col("c0").desc, col("piece")).limit(VocabMulti))
  }

  /** Round-1 segmentation frame (under the raw-substring-count init
    * likelihoods) — Memo-shared: the trainer reads its counts, and the
    * round-2 derivation re-enters it.
    */
  private def seg1(documents: DataFrame): DataFrame =
    Memo.cached("unigram_seg1", documents) { docs =>
      val v = vocab0(docs)
      segmented(words(docs), probs(v.select(col("piece"), col("c0").as("c"))))
    }

  /** Round-2 segmentation frame (under the round-1-trained likelihoods)
    * — Memo-shared by the trainer's final E-step and [[unigramEncode]].
    */
  private def seg2(documents: DataFrame): DataFrame =
    Memo.cached("unigram_seg2", documents) { docs =>
      val p1 = probs(onVocab(vocab0(docs), eStep(seg1(docs))))
      segmented(words(docs), p1)
    }

  /** The graded trainer: 2 unrolled EM rounds over the fixed candidate
    * vocab. Output (bounded: |chars| + VocabMulti rows): each piece with
    * its raw substring count, both rounds' Viterbi counts, and the final
    * nano likelihood — the "EM moves mass from substring counts to a
    * consistent segmentation" readout.
    */
  def unigramLmVocab(documents: DataFrame): DataFrame = {
    val v = vocab0(documents)
    val c1 = onVocab(v, eStep(seg1(documents)))
    val c2 = onVocab(v, eStep(seg2(documents)))
    val p2 = probs(c2)
    v
      .join(c1.select(col("piece"), col("c").as("em1_count")), Seq("piece"))
      .join(c2.select(col("piece"), col("c").as("em2_count")), Seq("piece"))
      .join(p2, Seq("piece"))
      .select(col("piece"), length(col("piece")).cast("long").as("piece_len"),
        col("c0").cast("long").as("init_count"),
        col("em1_count"), col("em2_count"), col("p_nano"))
  }

  /** The ENCODE side, completing the tokenizer loop (learn → encode),
    * the unigram twin of TextOps.bpeEncode/tokenizerFertility: every
    * document's eligible words segment through the ROUND-2 trained
    * model, and the doc reports word count, piece count, and fertility
    * (pieces per word, exact integer micro-units — the
    * tokenizer-efficiency metric). Words over [[MaxWordLen]] chars are
    * outside the trained model and excluded, mirroring training.
    *
    * Scale: the corpus explode joins a BROADCAST vocab-sized
    * (word → piece-count) table — the per-word DP is never recomputed
    * per occurrence, the ship-the-tokenizer shape; one map-side-combined
    * per-doc rollup.
    */
  def unigramEncode(documents: DataFrame): DataFrame = {
    val nPieces = (1 to MaxWordLen)
      .map(t => s"CASE WHEN piece_$t IS NOT NULL THEN 1 ELSE 0 END")
      .mkString("CAST(", " + ", " AS BIGINT)")
    val wp = seg2(documents).select(col("w"), expr(nPieces).as("n_pieces"))
    OpUtils.spreadDocs(documents)
      .select(col("doc_id"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .filter(length(col("w")).between(1, MaxWordLen))
      .join(broadcast(wp), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_pieces"))
      .withColumn("fertility_micro",
        expr("(n_pieces * 1000000) div n_words"))
  }
}
