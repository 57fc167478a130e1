package graft.operators

import graft.functions.{HashFns, TextFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines (SURVEY §2.D).
  *
  * Scale design: nothing here cross-joins the corpus. Exact dedup is one
  * hash-groupBy; MinHash signatures are computed per-row inside codegen'd
  * array folds (no explode, no shuffle) and candidate pairs come from LSH
  * band-bucket equi-joins; n-gram Jaccard bounds its shingle join with a
  * document-frequency cap; SimHash pairs come from Hamming-band buckets
  * (pigeonhole: ≤3 differing bits over 4 bands ⇒ one band collides).
  */
object DedupOps {
  import HashFns._

  /** Exact dedup via content-hash groupBy (ref: glue_job_clean_311.py:131
    * dropDuplicates — here with group stats kept, Redshift-style).
    */
  def dedupExact(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), md5(TextFns.normText(col("text"))).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("content_hash"), col("n_copies"))

  /** Per-row MinHash signature (array<long>, K=32) — a single codegen'd
    * projection: shingle-hash array → K independent affine-hash minima.
    */
  def withMinhashSignature(documents: DataFrame): DataFrame = {
    val hashes = TextFns.shingleHashes(col("text"), 5)
    val sig = array((0 until MinhashK).map { i =>
      array_min(transform(col("shingle_hashes"),
        x => (lit(minhashA(i)) * x + lit(minhashB(i))) % lit(MinhashP)))
    }: _*)
    documents
      .select(col("doc_id"), hashes.as("shingle_hashes"))
      .filter(size(col("shingle_hashes")) > 0)
      .select(col("doc_id"), sig.as("sig"))
  }

  /** MinHash + LSH candidate pairs with estimated Jaccard ≥ minEst.
    * Bands×Rows = 8×4; pairs surface through a (band, key) equi-join —
    * work is bounded by bucket sizes, never O(corpus²).
    */
  def dedupMinhashLsh(documents: DataFrame, minEst: Double = 0.5): DataFrame = {
    val sigs = withMinhashSignature(documents)
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      explode(array((0 until MinhashBands).map { b =>
        struct(lit(b).as("band"),
          concat_ws(":", (0 until MinhashRows).map(r =>
            element_at(col("sig"), b * MinhashRows + r + 1)): _*).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band"), col("key"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("key"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          m => m)).cast("double") / lit(MinhashK.toDouble), 4).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minEst)
  }

  /** Exact n-gram Jaccard near-dup pairs. Candidates = pairs sharing at
    * least one shingle whose document frequency ≤ dfCap (rare-shingle
    * blocking — the cap is what keeps the join linear at 100 TB); Jaccard
    * is then computed exactly on the full distinct-shingle sets.
    */
  def dedupNgramJaccard(documents: DataFrame, tau: Double = 0.5, dfCap: Int = 50): DataFrame = {
    val sets = documents
      .select(col("doc_id"),
        array_distinct(TextFns.shingleHashes(col("text"), 5)).as("hs"))
      .filter(size(col("hs")) > 0)
    val exploded = sets.select(col("doc_id"), explode(col("hs")).as("x"))
    val rare = exploded.groupBy(col("x"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .select("x")
    val keptPost = exploded.join(rare, Seq("x"))
    val cands = keptPost.select(col("x"), col("doc_id").as("doc_a"))
      .join(keptPost.select(col("x"), col("doc_id").as("doc_b")), Seq("x"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    cands
      .join(sets.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("long").as("inter"),
        size(col("hs_a")).cast("long").as("na"),
        size(col("hs_b")).cast("long").as("nb"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  private val SimhashBits = 60
  private val SimhashBands = 4
  private val SimhashBandBits = 15

  /** Per-doc 60-bit SimHash over the token multiset: explode tokens, one
    * shuffle with map-side partial aggregation of the 60 sign counters,
    * then reassemble bits with literal shifts (all codegen'd).
    */
  def withSimhash(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), HashFns.hash60(col("tok")).as("h"))
    val aggCols = (0 until SimhashBits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$j")
    }
    val sums = toks.groupBy(col("doc_id")).agg(aggCols.head, aggCols.tail: _*)
    val sim = (0 until SimhashBits).map { j =>
      when(col(s"b$j") >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    sums.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs within Hamming distance maxHamming (≤3 is
    * exact w.r.t. the 4-band pigeonhole; larger values are LSH-style
    * candidates-only recall, which the oracle mirrors).
    */
  def dedupSimhash(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sims = withSimhash(documents)
    val banded = sims.select(col("doc_id"), col("simhash"),
      explode(array((0 until SimhashBands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * SimhashBandBits)
            .bitwiseAND(lit((1L << SimhashBandBits) - 1)).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band"), col("key"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("key"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
