package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2.D): brute-force cosine top-k as the exact baseline, and a
  * signed-random-projection LSH bucketed variant as the scale path.
  *
  * Scale design: the query set is the small side and is broadcast; the
  * corpus is scanned once. The LSH variant buckets both sides on sign-bit
  * prefixes so per-bucket candidate lists stay bounded — that's the plan
  * that survives a billion-vector corpus where brute force cannot.
  */
object SimilarityOps {

  /** Per-(label, dimension) embedding statistics — the feature-drift /
    * column-profile audit for vector columns: counts and EXACT
    * micro-unit sums per dimension (floats quantized by truncation, so
    * both engines agree bit-for-bit; the mean alone is projected as a
    * rounded double). One posexplode scan, map-side combined into
    * |labels|·dims rows; sums are decimal-widened so 100 TB of vectors
    * cannot overflow the accumulator.
    */
  def embedDimStats(embeddings: DataFrame): DataFrame =
    embeddings
      .filter(col("embedding").isNotNull)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .filter(!isnan(col("v")))
      .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
        expr("cast(cast(v as double) * 1000000 as bigint)").as("micro"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("micro").cast("decimal(38,0)")).as("sum_d"))
      .select(col("label"), col("dim"), col("n_vecs"),
        col("sum_d").cast("long").as("sum_micro"),
        round(col("sum_d").cast("double") / col("n_vecs").cast("double"), 2)
          .as("mean_micro"))

  /** Brute-force cosine top-k for each query vector (vec_id < nQueries). */
  def bruteCosineTopK(embeddings: DataFrame, nQueries: Int = 20, k: Int = 5): DataFrame = {
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val sims = embeddings.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorFns.cosine(col("q_emb"), col("embedding")), 6).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Nearest-neighbor MARGIN audit — the serving-confidence profile of
    * the exact top-k: per query, the best and second-best cosine and
    * their margin, with the ambiguity flag (margin < 0.05) that tells a
    * retrieval stack which answers deserve a rerank or an abstention.
    * A healthy index shows wide margins; mass near zero means the
    * corpus has near-duplicate clusters (see the dedup family) or the
    * embedding space is collapsing. Cosines follow the embed-family
    * parity policy (round 6dp at production); the margin is a
    * difference of grid-rounded values re-rounded at 6dp, so both
    * engines land on the same grid point.
    *
    * Scale: reuses [[bruteCosineTopK]]'s broadcast-queries shape — the
    * corpus is scanned once, only the nQueries×2 ranked rows fold into
    * the per-query pivot.
    */
  def embedMarginAudit(embeddings: DataFrame, nQueries: Int = 20): DataFrame =
    bruteCosineTopK(embeddings, nQueries, 2)
      .groupBy(col("query_id"))
      .agg(
        min(when(col("rank") === 1L, col("neighbor_id"))).as("top1_id"),
        min(when(col("rank") === 1L, col("cosine_sim"))).as("top1_sim"),
        min(when(col("rank") === 2L, col("cosine_sim"))).as("top2_sim"))
      .withColumn("margin_r6",
        round(col("top1_sim") - col("top2_sim"), 6))
      .withColumn("is_ambiguous", col("margin_r6") < 0.05)

  /** Maximal-marginal-relevance DIVERSIFIED retrieval (Carbonell &
    * Goldstein '98, λ=½): greedily pick `k` results that balance
    * relevance to the query against redundancy with what's already
    * picked — mmr(c) = rel(c) − max over selected s of cos(c, s). The
    * training-data use: retrieval-based curation that would otherwise
    * return k near-copies of the same document.
    *
    * Scale shape: the CORPUS-side work is one distributed relevance
    * shortlist (broadcast 1-row query, bounded TakeOrdered — never a
    * global sort); the greedy loop then runs `k` bounded steps over the
    * N-row shortlist (≤ k·N² cosines on 20 rows) — the
    * rerank-a-shortlist architecture every production retrieval stack
    * uses, so the iterative part never touches the corpus. All cosines
    * round at 6dp the moment they're produced (the embed-family parity
    * policy); ties break on vec_id.
    *
    * The greedy loop itself is DRIVER-LOCAL plain arithmetic over the
    * collected ≤ `shortlistN`-row shortlist (bounded by construction):
    * running it as k Spark jobs over a 20-row frame was pure scheduler
    * overhead at any scale. The driver-side cosine replays the codegen'd
    * [[graft.functions.DotProductUtil]] fold and Spark's HALF_UP
    * `round(_, 6)` exactly, so the output is bit-identical to the former
    * distributed loop (spec-locked) and to the oracle.
    */
  def mmrRerank(embeddings: DataFrame, queryId: Long = 0L,
      shortlistN: Int = 20, k: Int = 5): DataFrame = {
    val spark = embeddings.sparkSession
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    val shortlist = embeddings
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("embedding"),
        round(VectorFns.cosine(col("q_emb"), col("embedding")), 6).as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(shortlistN)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
      .sortBy { case (id, _, rel) => (-rel, id) }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var acc = 0.0; var i = 0
      while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    def cos(a: Array[Float], b: Array[Float]): Double =
      round6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    var selected = Vector.empty[(Long, Long, Double, Double)]
    var selEmb = Vector.empty[Array[Float]]
    (1 to math.min(k, shortlist.length)).foreach { step =>
      val selIds = selected.map(_._2).toSet
      // argmax of (mmr_score desc, vec_id asc): candidates scan in
      // vec_id order and only a STRICTLY better score displaces the
      // incumbent — the smaller id wins ties, as the old limit(1) did
      var best: (Long, Double, Double) = null
      shortlist.iterator
        .filter { case (id, _, _) => !selIds.contains(id) }
        .toSeq.sortBy(_._1)
        .foreach { case (id, emb, rel) =>
          val score =
            if (selEmb.isEmpty) rel
            else rel - selEmb.map(s => cos(s, emb)).max
          if (best == null || score > best._3) best = (id, rel, score)
        }
      selected :+= ((step.toLong, best._1, best._2, best._3))
      selEmb :+= shortlist.find(_._1 == best._1).get._2
    }
    import spark.implicits._
    selected.toDF("step", "vec_id", "relevance", "mmr_score")
  }

  private val Planes = 16
  val Dim = 64

  /** Deterministic pseudo-random hyperplane weights, shared with the
    * oracle: w(p,i) = ((1103515245*(p*Dim+i) + 12345) mod 65536)/65536 - 0.5
    * — exact dyadic rationals, so both engines compute identical doubles.
    */
  def planeWeight(p: Int, i: Int): Double =
    ((1103515245L * (p * Dim + i) + 12345L) % 65536L).toDouble / 65536.0 - 0.5

  /** 16-bit sign-projection LSH bucket for each embedding. The plane
    * weights are dyadic rationals with ≤17 mantissa bits, so shipping
    * them as float arrays into the codegen'd dot product is lossless.
    */
  def withLshBucket(embeddings: DataFrame): DataFrame = {
    val bucket = (0 until Planes).map { p =>
      val w = (0 until Dim).map(i => planeWeight(p, i).toFloat)
      val dotp = graft.functions.DotProduct.dotF(col("embedding"), typedlit(w))
      when(dotp >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    embeddings.withColumn("bucket", bucket)
  }

  val IvfCells = 16

  /** Deterministic pseudo-random IVF centroid weights in [-1, 1) —
    * dyadic rationals (12-bit numerators), float-exact, shared with the
    * oracle-SQL generator.
    */
  def centroidWeight(k: Int, i: Int): Double =
    ((69069L * (k * Dim + i) + 12345L) % 4096L).toDouble / 2048.0 - 1.0

  /** Squared L2 norm of centroid k, left-fold — interpolated into the
    * oracle SQL as a literal so both engines use the identical double.
    */
  def centroidNorm2(k: Int): Double =
    (0 until Dim).map(i => centroidWeight(k, i) * centroidWeight(k, i))
      .foldLeft(0.0)(_ + _)

  /** Assign each embedding to its nearest centroid of `centroids` (and
    * second nearest, for nprobe=2 queries). distance² ranking uses
    * |c|² - 2·v·c (the |v|² term is argmin-invariant); ties break to the
    * smallest cell id. The centroid weights ship as broadcast literals
    * into the codegen'd dot product — one scan, no shuffle.
    */
  def withCells(embeddings: DataFrame, centroids: Seq[Seq[Float]]): DataFrame = {
    // ONE codegen'd assignment expression replaying the former
    // 16-score-column + two argmin/mask layers bit-for-bit (identical
    // double math and tie rules — see IndexEncode's equivalence notes):
    // the wide column plan's Catalyst handling, not its arithmetic,
    // dominated Lloyd's-loop cost, and the content-hashed geometry
    // reference keeps one compiled class serving every iteration.
    val cc = graft.functions.IndexEncode.cells(
      col("embedding"), cellGeometry(centroids))
    embeddings
      .select(col("vec_id"), col("embedding"), cc.as("__cc"))
      .select(col("vec_id"), col("embedding"),
        element_at(col("__cc"), 1).as("cell"),
        element_at(col("__cc"), 2).as("cell2"))
  }

  /** Content-hashed geometry handoff; norms are the same left-fold
    * doubles the score columns inlined.
    */
  private def cellGeometry(centroids: Seq[Seq[Float]]): graft.functions.CellGeometry =
    new graft.functions.CellGeometry(
      centroids.map(_.toArray).toArray,
      centroids.map(_.foldLeft(0.0)((acc, x) =>
        acc + x.toDouble * x.toDouble)).toArray)

  /** Assign each embedding to its nearest fixed pseudo-random IVF
    * centroid (the oracle-replicable variant — see [[centroidWeight]]).
    * `keep` names extra input columns to carry through the assignment
    * (e.g. a metadata label for filtered search).
    */
  def withIvfCells(embeddings: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    // same single-expression assignment as [[withCells]], against the
    // fixed dyadic centroids (float-exact, so the geometry norms equal
    // [[centroidNorm2]]'s doubles bit-for-bit)
    val cc = graft.functions.IndexEncode.cells(
      col("embedding"), cellGeometry(FixedIvfCentroids))
    embeddings
      .select(Seq(col("vec_id"), col("embedding"), cc.as("__cc")) ++
        keep.map(col): _*)
      .select(Seq(col("vec_id"), col("embedding"),
        element_at(col("__cc"), 1).as("cell"),
        element_at(col("__cc"), 2).as("cell2")) ++ keep.map(col): _*)
  }

  /** The session-shared IVF cell assignment ([[withIvfCells]] through
    * [[Memo.cached]]): every index consumer — the ANN probes, the
    * SemDeDup verdicts, the balance audit, the k-NN labeler — reads ONE
    * eagerly-checkpointed encoder scan per session per input instead of
    * re-encoding (and, worse, RACING: a lazily-persisted encoder read
    * from both sides of a probe join recomputes the scan per concurrent
    * consumer — the round-13 pair_medians pathology). This is also the
    * production shape: an IVF index is a materialized artifact, not a
    * per-query derivation.
    */
  def ivfCelled(embeddings: DataFrame, keep: Seq[String] = Nil): DataFrame =
    Memo.cached(
      if (keep.isEmpty) "ivf_cells" else s"ivf_cells:${keep.mkString(",")}",
      embeddings)(withIvfCells(_, keep))

  /** Session-shared LSH bucket assignment ([[withLshBucket]] memoized —
    * same rationale as [[ivfCelled]]).
    */
  def lshBucketed(embeddings: DataFrame): DataFrame =
    Memo.cached("lsh_buckets", embeddings)(withLshBucket)

  /** IVF index health audit — per-cell occupancy of the fixed index:
    * inverted-list length, corpus share, and load factor vs the even
    * 1/k share, plus the hot-cell flag (≥ 2× even share). The
    * production question it answers: nprobe=2 probe cost is
    * proportional to the PROBED cells' sizes, so a skewed inverted
    * index quietly turns "2/16 of the corpus" into half of it — this
    * is the report an index operator reads before and after
    * retraining. One codegen'd encoder scan → k-row map-side-combined
    * rollup; shares are exact integer micro units against a 1-row
    * total broadcast back.
    */
  def ivfCellBalance(embeddings: DataFrame): DataFrame = {
    val counts = ivfCelled(embeddings)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
    val total = counts.agg(sum(col("n_vecs")).as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(col("cell").cast("long").as("cell"), col("n_vecs"),
        expr("(n_vecs * 1000000) div n_total").as("share_micro"),
        expr(s"(n_vecs * $IvfCells * 1000000) div n_total")
          .as("load_factor_micro"),
        expr(s"n_vecs * $IvfCells >= 2 * n_total").as("hot"))
  }

  /** Embedding-space drift audit: each label's centroid vs the global
    * corpus centroid, as the EXACT integer squared distance between
    * truncated-micro means — the "did one source/language drift away
    * from the corpus" check a vector-store operator alerts on (the
    * embedDimStats profile reduced to one actionable number per label).
    * Means are sign-branched integer divisions of exact micro sums, so
    * both engines agree bit-for-bit; one posexplode scan, |labels|·64
    * and 64-row rollups, 64-row broadcast back.
    */
  def embedCentroidDrift(embeddings: DataFrame): DataFrame = {
    val per = embeddings
      .filter(col("embedding").isNotNull)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .filter(!isnan(col("v")))
      .select(col("label"), col("pos"),
        expr("cast(cast(v as double) * 1000000 as bigint)").as("micro"))
    // sign-branched truncating division: Spark `div` truncates toward
    // zero, DuckDB `//` floors — they agree only on the non-negative
    // magnitude (the repo-wide exact-division convention)
    def meanMicro(sm: String, n: String) =
      s"CASE WHEN $sm >= 0 THEN cast($sm div $n as bigint) " +
        s"ELSE -cast((-$sm) div $n as bigint) END"
    val lab = per.groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("micro").cast("decimal(38,0)")).as("sm"))
      .select(col("label"), col("pos"), expr(meanMicro("sm", "n")).as("ml"))
    val glob = per.groupBy(col("pos"))
      .agg(count(lit(1)).as("gn"),
        sum(col("micro").cast("decimal(38,0)")).as("gsm"))
      .select(col("pos"), expr(meanMicro("gsm", "gn")).as("mg"))
    val nv = embeddings.filter(col("embedding").isNotNull)
      .groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
    lab.join(broadcast(glob), Seq("pos"))
      .groupBy(col("label"))
      .agg(sum(expr("(ml - mg) * (ml - mg)")).as("d2"))
      .join(nv, Seq("label"))
      .select(col("label"), col("n_vecs"),
        col("d2").cast("long").as("drift_micro2"))
  }

  /** IVF-bucketed ANN: corpus partitioned by nearest centroid, queries
    * probe their 2 nearest cells (nprobe=2), exact cosine re-ranking
    * within the probed lists. At a billion vectors the per-query work is
    * 2/IvfCells of the corpus instead of all of it.
    */
  def ivfAnn(embeddings: DataFrame, nQueries: Int = 20, k: Int = 3): DataFrame = {
    val celled = ivfCelled(embeddings)
    val corpus = celled.select(col("vec_id"), col("embedding"), col("cell"))
    val queries = celled.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(array(col("cell"), col("cell2"))).as("cell"))
    val sims = corpus.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorFns.cosine(col("q_emb"), col("embedding")), 6).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Contrastive training-pair mining — the negative-sampling stage of
    * embedding-model training data prep. Per anchor (the standard
    * vec_id < nQueries query set): the top `hardK` HARD negatives (most
    * cosine-similar same-cell vectors that are NOT near-duplicates —
    * cosine < dupCos excludes positives-in-disguise) and one
    * deterministic EASY negative drawn hash-uniformly from OUTSIDE the
    * anchor's probed cells (no RNG: argmin of the 60-bit md5 of
    * "anchor:candidate", reproducible in the oracle). Hard negatives
    * ride the same cell-bounded join as [[ivfAnn]] (per-anchor work is
    * one cell, not the corpus); the easy-negative leg is a labeled
    * broadcast-anchors × corpus scan — the same acceptable shape as the
    * brute-force ANN baseline, one corpus pass for the whole anchor
    * set.
    */
  def contrastivePairs(embeddings: DataFrame, nQueries: Int = 20,
      hardK: Int = 2, dupCos: Double = 0.99): DataFrame = {
    val celled = ivfCelled(embeddings)
    val anchors = celled.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("a_emb"),
        col("cell").as("a_cell"), col("cell2").as("a_cell2"))
    val hard = celled.select(col("vec_id"), col("embedding"), col("cell"))
      .join(broadcast(anchors), col("cell") === col("a_cell") &&
        col("vec_id") =!= col("anchor_id"))
      .withColumn("cosine_sim",
        round(VectorFns.cosine(col("a_emb"), col("embedding")), 6))
      .filter(col("cosine_sim") < dupCos)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("anchor_id"))
          .orderBy(col("cosine_sim").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= hardK)
      .select(col("anchor_id"), lit("hard_neg").as("pair_type"),
        col("vec_id").as("other_id"), col("cosine_sim"), col("rank"))
    val easy = celled.select(col("vec_id"), col("embedding"), col("cell"))
      .join(broadcast(anchors),
        col("cell") =!= col("a_cell") && col("cell") =!= col("a_cell2"))
      .withColumn("pick", graft.functions.HashFns.hash60(
        concat(col("anchor_id").cast("string"), lit(":"),
          col("vec_id").cast("string"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("anchor_id"))
          .orderBy(col("pick"), col("vec_id"))).cast("long"))
      .filter(col("rank") === 1)
      .select(col("anchor_id"), lit("easy_neg").as("pair_type"),
        col("vec_id").as("other_id"),
        round(VectorFns.cosine(col("a_emb"), col("embedding")), 6)
          .as("cosine_sim"),
        col("rank"))
    hard.unionByName(easy)
  }

  /** Lloyd's k-means over the embedding corpus — the trained-centroid
    * IVF index the fixed pseudo-random variant approximates. Fully
    * distributed: assignment broadcasts k centroid literals into the
    * codegen'd dot product (one scan); the update is a posexplode +
    * per-(cell, dim) grouped mean (map-side combined). Only k centroid
    * rows reach the driver per iteration — a dim-table-sized collect,
    * never data. Deterministic init: the first k vectors by vec_id.
    * No oracle (centroids are data-dependent floats); quality is
    * spec-gated by recall against the exact brute-force baseline.
    */
  def trainIvfCentroids(embeddings: DataFrame, k: Int = IvfCells,
      iters: Int = 4): Array[Array[Float]] = {
    // narrow training projection materialized ONCE (the trainPqCodebook
    // treatment): init + every Lloyd iteration re-scan it, and the
    // parquet array decode (or an upstream derivation) would otherwise
    // be re-paid per pass
    val base = Memo.managedCheckpoint(
      embeddings.select(col("vec_id"), col("embedding")))
    var centroids: Array[Array[Float]] = base.orderBy(col("vec_id")).limit(k)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    for (_ <- 0 until iters) {
      // update step: one hash aggregate straight off the assignment scan
      // — 64 per-dimension avg columns grouped by cell (map-side
      // combined to ≤ k rows), not the former 64-row posexplode per
      // vector + two shuffles; the per-(cell, dim) value stream and
      // order are unchanged
      val assigned = withCells(base, centroids.map(_.toSeq).toSeq)
        .groupBy(col("cell"))
        .agg(avg(element_at(col("embedding"), 1).cast("double")).as("m0"),
          (1 until Dim).map(i =>
            avg(element_at(col("embedding"), i + 1).cast("double"))
              .as(s"m$i")): _*)
        .collect()
      val next = centroids.map(_.clone())
      assigned.foreach { r =>
        val cell = r.getInt(0)
        next(cell) = Array.tabulate(Dim)(i => r.getDouble(1 + i).toFloat)
      }
      centroids = next // cells that lost every vector keep their centroid
    }
    centroids
  }

  /** ANN over the TRAINED IVF index: same nprobe=2 probe + exact cosine
    * re-rank as [[ivfAnn]], but against Lloyd's centroids — the quality
    * path; the fixed-centroid variant remains the oracle-checked one.
    */
  def ivfTrainedAnn(embeddings: DataFrame, nQueries: Int = 20, k: Int = 3,
      iters: Int = 4): DataFrame = {
    val centroids = trainIvfCentroids(embeddings, IvfCells, iters)
    // eager checkpoint, not lazy persist: corpus and query sides of the
    // probe join race an unpopulated cache (the pair_medians pathology)
    val celled = Memo.managedCheckpoint(
      withCells(embeddings, centroids.map(_.toSeq).toSeq))
    val corpus = celled.select(col("vec_id"), col("embedding"), col("cell"))
    val queries = celled.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(array(col("cell"), col("cell2"))).as("cell"))
    val sims = corpus.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorFns.cosine(col("q_emb"), col("embedding")), 6).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Int8 scalar quantization of the embedding column — the storage path
    * a 100 TB vector store actually ships (4× smaller than float32, and
    * the asymmetric-distance scan reads int8). Per-dimension min/max
    * over the corpus (one map-side-combined aggregation, 64 tiny rows
    * broadcast back), code = round((v - min) / scale) in [0, 255], plus
    * the per-vector max reconstruction error as the quality audit. The
    * re-assembly window is per-vector over 64 rows — bounded, parallel.
    * The codes are projected as one comma-joined string (`q_codes`): the
    * correctness driver canonicalizes scalar columns only, and a joined
    * string is a lossless, order-preserving rendering of the int8 vector.
    */
  def embedQuantize(embeddings: DataFrame): DataFrame = {
    val exploded = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("vec_id"), col("i"), col("v").cast("double").as("v"))
    val dims = exploded.groupBy(col("i"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .withColumn("scale", (col("mx") - col("mn")) / lit(255.0))
    val coded = exploded.join(broadcast(dims), Seq("i"))
      .withColumn("q",
        when(col("scale") === 0.0, lit(0))
          .otherwise(round((col("v") - col("mn")) / col("scale")).cast("int")))
      .withColumn("err", abs(col("v") - (col("mn") + col("q") * col("scale"))))
    coded.groupBy(col("vec_id"))
      .agg(
        concat_ws(",",
          transform(sort_array(collect_list(struct(col("i"), col("q")))),
            s => s.getField("q").cast("string"))).as("q_codes"),
        round(max(col("err")), 6).as("max_err"))
  }

  /** kNN majority-vote label classifier over the embedding space — the
    * model-free quality/domain classifier of a curation pipeline (label
    * docs by their nearest labeled neighbors). Candidates come from the
    * nprobe=2 IVF cells (same index as [[ivfAnn]]), so per-query work is
    * 2/IvfCells of the corpus; votes aggregate per (query, label) and the
    * argmax is a bounded per-query window with a deterministic tiebreak.
    */
  def knnLabel(embeddings: DataFrame, documents: DataFrame,
      nQueries: Int = 50, k: Int = 5): DataFrame = {
    val labels = documents.select(col("doc_id"), col("lang"))
    val celled = ivfCelled(embeddings)
    val corpus = celled.select(col("vec_id"), col("embedding"), col("cell"))
    val queries = celled.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(array(col("cell"), col("cell2"))).as("cell"))
    val sims = corpus.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorFns.cosine(col("q_emb"), col("embedding")), 6).as("cosine_sim"))
    val nnW = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    val nn = sims.withColumn("rank", row_number().over(nnW)).filter(col("rank") <= k)
    val votes = nn
      .join(labels, col("neighbor_id") === col("doc_id"))
      .groupBy(col("query_id"), col("lang"))
      .agg(count(lit(1)).as("n_votes"))
    val voteW = Window.partitionBy(col("query_id"))
      .orderBy(col("n_votes").desc, col("lang"))
    votes.withColumn("vr", row_number().over(voteW)).filter(col("vr") === 1)
      .join(labels.select(col("doc_id").as("q_doc"),
        col("lang").as("actual_lang")),
        col("query_id") === col("q_doc"))
      .select(col("query_id"), col("lang").as("predicted_lang"),
        col("n_votes"), col("actual_lang"),
        (col("lang") === col("actual_lang")).as("is_correct"))
  }

  /** LSH-bucketed ANN: candidates share the full 16-bit bucket; top-k by
    * exact cosine within candidates (recall < 1 by design — mirrored by
    * the oracle).
    */
  def lshAnn(embeddings: DataFrame, nQueries: Int = 20, k: Int = 3): DataFrame = {
    val bucketed = lshBucketed(embeddings)
    val queries = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("bucket"))
    val sims = bucketed.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorFns.cosine(col("q_emb"), col("embedding")), 6).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Embedding-column validation — the vector analog of the null
    * profile: per label, vector count, NaN/zero-vector counts (a NaN
    * component poisons the self-dot into NaN; a zero vector breaks
    * cosine), and the squared-norm range. One scan; the norm comes from
    * the codegen'd strict-left-fold dot product so both engines see
    * bit-identical doubles.
    */
  def embedNormCheck(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"),
        VectorFns.dot(col("embedding"), col("embedding")).as("n2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        // isnan, not n2 =!= n2: Spark SQL defines NaN = NaN as TRUE
        // (non-IEEE), so the self-inequality trick silently never fires
        sum(when(isnan(col("n2")), 1L).otherwise(0L)).as("n_nan"),
        sum(when(col("n2") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        round(min(col("n2")), 6).as("min_norm2"),
        round(max(col("n2")), 6).as("max_norm2"))

  /** ANN index evaluation: per-query recall of BOTH approximate indexes
    * (sign-projection LSH, IVF nprobe=2) against the exact brute-force
    * top-k — the "which index is good enough to ship" report every
    * vector pipeline runs before swapping exact search out. Recall in
    * exact integer micro-units (hit counts, no float division). The
    * exact leg is the (labeled) brute-force baseline — the evaluation
    * runs on a SAMPLE of queries precisely so that leg stays affordable
    * at corpus scale. (On this corpus it shows the honest picture: the
    * 16-plane LSH bucket is too selective for global top-3 recall; IVF
    * wins.)
    */
  def annRecallReport(embeddings: DataFrame, nQueries: Int = 20, k: Int = 3): DataFrame = {
    val exact = bruteCosineTopK(embeddings, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val lsh = lshAnn(embeddings, nQueries, k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit_lsh"))
    val ivf = ivfAnn(embeddings, nQueries, k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit_ivf"))
    exact
      .join(lsh, Seq("query_id", "neighbor_id"), "left")
      .join(ivf, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit_lsh"), lit(0L))).as("n_hit_lsh"),
        sum(coalesce(col("hit_ivf"), lit(0L))).as("n_hit_ivf"))
      .withColumn("recall_lsh_micro", expr("(n_hit_lsh * 1000000) div n_exact"))
      .withColumn("recall_ivf_micro", expr("(n_hit_ivf * 1000000) div n_exact"))
  }

  /** nprobe operating-point sweep — the recall/cost curve an IVF index
    * operator actually consults before picking a serving configuration:
    * for each nprobe ∈ {1, 2, 4, 8}, the aggregate top-k recall against
    * the exact brute-force baseline AND the scan cost (candidates
    * touched, absolute and as a micro-share of corpus × queries). Where
    * [[annRecallReport]] judges two fixed index configs,
    * this walks ONE index's whole probe ladder — recall rises with
    * nprobe, cost rises linearly, and the report shows the knee.
    *
    * Per query the FULL cell ranking (|cells| rows, dim-sized) is
    * computed once and every probe level reads its prefix — nprobe = p
    * probes exactly the p nearest inverted lists, the IVF contract.
    * Candidates are enumerated once for the widest level and filtered
    * per level (cell_rank ≤ nprobe), so the sweep costs one cell-bounded
    * join, not |levels| joins. Cosines round to 6dp before ranking with
    * neighbor-id ties (the shared output convention, engine-stable).
    *
    * Scale: query side is a broadcast (|queries| × max-nprobe rows); the
    * candidate join is inverted-list-bounded like [[ivfAnn]]; the ranked
    * windows partition per (nprobe, query); the exact leg is the same
    * sampled brute-force baseline [[annRecallReport]] already pays.
    */
  def annNprobeSweep(embeddings: DataFrame, nQueries: Int = 20,
      k: Int = 3, probes: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    import embeddings.sparkSession.implicits._
    require(probes.nonEmpty && probes.max <= IvfCells)
    val scores = (0 until IvfCells).map { c =>
      val wgt = (0 until Dim).map(i => centroidWeight(c, i).toFloat)
      (lit(centroidNorm2(c)) - lit(2.0) *
        graft.functions.DotProduct.dotF(col("embedding"), typedlit(wgt)))
        .as(s"s$c")
    }
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("cell"))
    val qcells = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id") +:
        col("embedding").as("q_emb") +: scores: _*)
      .select(col("query_id"), col("q_emb"),
        posexplode(array((0 until IvfCells).map(c => col(s"s$c")): _*))
          .as(Seq("cell", "dist")))
      .withColumn("cell_rank", row_number().over(wq).cast("long"))
      .filter(col("cell_rank") <= probes.max)
      .select(col("query_id"), col("q_emb"), col("cell"), col("cell_rank"))
    val cands = ivfCelled(embeddings)
      .select(col("vec_id"), col("embedding"), col("cell"))
      .join(broadcast(qcells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cell_rank"),
        round(VectorFns.cosine(col("q_emb"), col("embedding")), 6)
          .as("cosine_sim"))
    val probesDf = probes.map(_.toLong).toDF("nprobe")
    val sw = cands.crossJoin(broadcast(probesDf))
      .filter(col("cell_rank") <= col("nprobe"))
    val wr = Window.partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    val approx = sw
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("nprobe"), col("query_id"), col("neighbor_id"),
        lit(1L).as("hit"))
    val hits = bruteCosineTopK(embeddings, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
      .crossJoin(broadcast(probesDf))
      .join(approx, Seq("nprobe", "query_id", "neighbor_id"), "left")
      .groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    sw.groupBy(col("nprobe"))
      .agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("scanned"))
      .join(hits, Seq("nprobe"))
      .crossJoin(broadcast(embeddings.agg(count(lit(1)).as("n_corpus"))))
      .select(col("nprobe"), col("n_queries"), col("scanned"),
        expr("(scanned * 1000000) div (n_corpus * n_queries)")
          .as("scanned_share_micro"),
        col("n_exact"), col("n_hit"),
        expr("(n_hit * 1000000) div n_exact").as("recall_micro"))
  }

  /** Per-label centroid-distance outliers — prototypicality filtering:
    * the vectors farthest from their label's centroid are mislabeled /
    * atypical candidates a curation pass reviews first (the embedding
    * analog of quality gating). NaN-poisoned vectors are excluded up
    * front (they'd corrupt the centroid itself).
    *
    * Exactness: components quantize to integer micro-units (same
    * truncation as [[embedDimStats]]); the squared deviation avoids the
    * mean's division entirely via (xᵢ·n − Σx)² — every sum is an exact
    * DECIMAL(38,0) integer (BIGINT crosses 2⁶³ once n reaches corpus
    * scale), so the ranking is merge-order- and engine-stable. The only
    * float op is the final display division.
    *
    * Scale: one posexplode rollup to |labels|·64 stat rows (map-side
    * combined, broadcast back), one per-vector rollup, then a ranked
    * window whose rank ≤ k filter Spark rewrites to WindowGroupLimit —
    * partial top-k per map task BEFORE the shuffle, so no label's full
    * vector population ever sorts in one place.
    */
  def embedOutliers(embeddings: DataFrame, topK: Int = 20): DataFrame = {
    val quant = embeddings
      .filter(col("embedding").isNotNull &&
        !expr("exists(embedding, v -> isnan(cast(v as double)))"))
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("label"), (col("pos") + 1).cast("long").as("dim"),
        expr("cast(cast(v as double) * 1000000 as bigint)").as("micro"))
    val stats = quant.groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("micro").cast("decimal(38,0)")).as("s"))
    val devTerm = col("micro").cast("decimal(38,0)") * col("n") - col("s")
    val perVec = quant.join(broadcast(stats), Seq("label", "dim"))
      .groupBy(col("label"), col("vec_id"))
      .agg(sum(devTerm * devTerm).as("dev2"), max(col("n")).as("n"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("dev2").desc, col("vec_id"))
    perVec
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("label"), col("vec_id"), col("rank"),
        round(col("dev2").cast("double") /
          ((col("n") * col("n")).cast("decimal(38,0)") * lit(1000000000000L))
            .cast("double"), 6).as("outlier_score"))
  }

  /** Deterministic Lloyd k-means over the embedding column — the
    * centroid-training step of an IVF index (the scale path of
    * [[ivfAnn]]) run as a first-class batch operator: seeds are the `k`
    * lowest vec_ids, then `iters` assign/recompute rounds, reporting
    * per-cluster membership and mean squared distance.
    *
    * Exactness: components quantize to integer micro-units (the
    * [[embedDimStats]] truncation), distances are exact integer sums of
    * squared micro differences, centroid recompute is floor(mean) — so
    * assignment and the oracle's unrolled recurrence agree exactly;
    * ties break to the lowest centroid id. The only float display op is
    * the final mean division.
    *
    * Scale: points stay in long format (vec_id, dim, micro) — each
    * assignment joins the broadcast k·64-row centroid table and
    * map-side combines per-(vec, centroid) partial squared sums, so the
    * shuffle carries k rows per vector, not k·dim; recompute is one
    * map-side-combined rollup back to k·64 rows. Centroids remain
    * DataFrames end-to-end (no collect); the fixed iteration count
    * unrolls statically into one DAG, the PageRank loop shape.
    * (floor(Σ/n) is computed in doubles: exact while |Σmicro| < 2⁵³,
    * i.e. up to ~10⁹ unit-scale vectors per cluster; beyond that the
    * recompute moves to DECIMAL division at the same semantics.)
    */
  def embedKmeans(embeddings: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val points = embeddings
      .filter(col("embedding").isNotNull &&
        !expr("exists(embedding, v -> isnan(cast(v as double)))"))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
        expr("cast(cast(v as double) * 1000000 as bigint)").as("p"))
    // eager memo checkpoint: the unrolled Lloyd's DAG launches every
    // level's broadcast-centroid job concurrently at action start, and
    // racing scans of a lazily-persisted `points` would each re-explode
    // the corpus (the pair_medians pathology); Memo (vs a per-call
    // checkpoint) pays the explode once per session per input
    val pointsP = Memo.cached("kmeans_points", embeddings)(_ => points)
    val c0 = pointsP.filter(col("vec_id") < k)
      .select(col("vec_id").cast("long").as("cid"), col("dim"), col("p").as("c"))
    def assign(cent: DataFrame): DataFrame =
      pointsP.join(broadcast(cent), Seq("dim"))
        .groupBy(col("vec_id"), col("cid"))
        .agg(sum((col("p") - col("c")) * (col("p") - col("c"))).as("d2"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d2"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"), col("m.d2").as("d2"))
    def recompute(asg: DataFrame): DataFrame =
      pointsP.join(asg.select("vec_id", "cid"), Seq("vec_id"))
        .groupBy(col("cid"), col("dim"))
        .agg(floor(sum(col("p")).cast("double") / count(lit(1))).cast("long").as("c"))
    val last = (1 until iters).foldLeft(assign(c0))((a, _) => assign(recompute(a)))
    last.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("d2").cast("decimal(38,0)")).as("sd2"))
      .select(col("cid").as("cluster_id"), col("n_members"),
        round(col("sd2").cast("double") / col("n_members") / 1e12, 6)
          .as("mean_sqdist"))
  }

  // ------------------------------------------------------- product quant

  /** PQ codebook geometry: 8 subspaces × 8 dims, 16 centroids each —
    * a 64-dim float vector (256 B) compresses to 8 four-bit codes (4 B,
    * byte-stored here). At 10¹¹ vectors that is the difference between
    * an in-memory index and not having one.
    */
  val PqSub = 8
  val PqCent = 16

  /** Deterministic PQ centroid weight for (subspace m, centroid j,
    * in-subspace dim i) — dyadic 12-bit rationals like
    * [[centroidWeight]], float-exact, seed disjoint per (m, j, i).
    */
  def pqWeight(m: Int, j: Int, i: Int): Double =
    ((69069L * ((m * PqCent + j) * Dim + m * 8 + i) + 12345L) % 4096L)
      .toDouble / 2048.0 - 1.0

  /** ‖c_{m,j}‖², left-fold, shared with the oracle as a literal. */
  def pqCentNorm2(m: Int, j: Int): Double =
    (0 until 8).map(i => pqWeight(m, j, i) * pqWeight(m, j, i))
      .foldLeft(0.0)(_ + _)

  /** A PQ codebook: codebook(m)(j) = the 8 in-subspace weights of
    * centroid j of subspace m, as floats (the storage precision).
    */
  type PqCodebook = IndexedSeq[IndexedSeq[IndexedSeq[Float]]]

  /** The deterministic pseudo-random codebook — the oracle-replicable
    * baseline ([[trainPqCodebook]] is the quality path).
    */
  lazy val FixedPqCodebook: PqCodebook =
    IndexedSeq.tabulate(PqSub, PqCent, 8)((m, j, i) => pqWeight(m, j, i).toFloat)

  /** ‖codebook(m)(j)‖² in double, left-fold (== [[pqCentNorm2]] for the
    * fixed codebook — its dyadic weights are float-exact).
    */
  private def cbNorm2(cb: PqCodebook, m: Int, j: Int): Double =
    cb(m)(j).map(w => w.toDouble * w.toDouble).foldLeft(0.0)(_ + _)

  /** Per-vector PQ codes against `codebook`: each 8-dim subvector maps
    * to its nearest subspace centroid (argmin over 16 squared
    * distances; ties to the smallest index, identical in the oracle).
    * One codegen'd scan, no shuffle — encoding is embarrassingly
    * parallel; the codebook rides along as 128 literal weight arrays.
    */
  def withPqCodes(embeddings: DataFrame,
      codebook: PqCodebook = FixedPqCodebook): DataFrame = {
    val keep = embeddings.columns.toSeq
    // ONE codegen'd encoder expression (identical double math, argmin
    // ties to the smallest j — see IndexEncode's equivalence notes), not
    // 128 score columns + 8 argmin when-chains: the wide column plan was
    // correct but its Catalyst handling (analysis + optimization +
    // codegen bookkeeping) measured ~0.3-0.4 s PER JOB, and a Lloyd's
    // training loop plans one per iteration — plan overhead, not
    // arithmetic, dominated the whole training family. The geometry
    // rides a content-hashed reference, so the generated source is
    // byte-identical across codebooks and one compile serves every
    // iteration. Input columns pass through so the encoder composes
    // with the IVF cell assignment in ONE scan (ivfPqAnn).
    val codes = graft.functions.IndexEncode.pqCodes(
      col("embedding"), pqGeometry(codebook))
    embeddings.select(keep.map(col) :+ codes.as("__pq_codes"): _*)
      .select(keep.map(col) ++ (0 until PqSub).map(m =>
        element_at(col("__pq_codes"), m + 1).as(s"code$m")): _*)
  }

  /** Content-hashed geometry handoff for the single-expression encoder:
    * norms are the SAME left-fold doubles [[cbNorm2]] always produced.
    */
  private def pqGeometry(codebook: PqCodebook): graft.functions.PqGeometry =
    new graft.functions.PqGeometry(
      Array.tabulate(PqSub, PqCent, 8)((m, j, i) => codebook(m)(j)(i)),
      Array.tabulate(PqSub, PqCent)((m, j) => cbNorm2(codebook, m, j)))

  /** Per-subspace Lloyd's k-means over the corpus subvectors — the
    * codebook training FAISS runs before PQ-encoding anything (Jégou et
    * al. 2011 §III): without it the pseudo-random codebook quantizes to
    * ~12% top-3 recall; trained, the same 4-byte codes reach the
    * shippable regime. Fully distributed, mirroring
    * [[trainIvfCentroids]]: assignment is the codegen'd
    * [[withPqCodes]] scan against the current codebook (all 8 subspaces
    * in the SAME pass), the update one subspace-grain explode (8 rows
    * per vector) + a per-(subspace, centroid) grouped mean over 8 dim
    * columns (map-side combined). Only 8×16 rows × 8 dims = 1024
    * centroid cells reach the driver per iteration.
    * Deterministic init: subvectors of the first PqCent vectors by
    * vec_id; a centroid that loses every vector keeps its value.
    */
  def trainPqCodebook(embeddings: DataFrame, iters: Int = 4): PqCodebook = {
    // Materialize the narrow training projection ONCE: the init scan and
    // every Lloyd iteration re-read this frame, and the input is often an
    // expensive derivation (a 64×64 rotation under opqTrain, a residual
    // projection under trainAnnModel) that a lazy plan would recompute
    // per scan — `iters`+1 times (round 14 measured the rotation alone
    // as ~6 redundant passes per OPQ alternation).
    val base = Memo.managedCheckpoint(
      embeddings.select(col("vec_id"), col("embedding")))
    val init = base.orderBy(col("vec_id")).limit(PqCent)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toIndexedSeq)
    require(init.nonEmpty, "cannot train a PQ codebook on an empty corpus")
    // a corpus shorter than PqCent seeds cyclically (like
    // trainIvfCentroids' graceful short init, the geometry stays full)
    var cb: PqCodebook = IndexedSeq.tabulate(PqSub, PqCent, 8)(
      (m, j, i) => init(j % init.length)(m * 8 + i))
    for (_ <- 0 until iters) {
      // update step: ONE explode to subspace grain (8 rows/vector, not
      // the former 64 via a second posexplode), 8 avg columns per
      // (subspace, centroid) — the same per-dimension value stream in
      // the same order, 8× fewer rows through the aggregation
      val subStruct = array((0 until PqSub).map(m =>
        struct(lit(m).as("m"), col(s"code$m").as("j"),
          slice(col("embedding"), m * 8 + 1, 8).as("sv"))): _*)
      val means = withPqCodes(base, cb)
        .select(explode(subStruct).as("e"))
        .select(col("e.m").as("m"), col("e.j").as("j"), col("e.sv").as("sv"))
        .groupBy(col("m"), col("j"))
        .agg(avg(element_at(col("sv"), 1).cast("double")).as("c0"),
          (1 until 8).map(i =>
            avg(element_at(col("sv"), i + 1).cast("double")).as(s"c$i")): _*)
        .collect()
      val next = Array.tabulate(PqSub, PqCent, 8)((m, j, i) => cb(m)(j)(i))
      means.foreach { r =>
        val m = r.getInt(0); val j = r.getInt(1)
        var i = 0
        while (i < 8) { next(m)(j)(i) = r.getDouble(2 + i).toFloat; i += 1 }
      }
      cb = IndexedSeq.tabulate(PqSub, PqCent, 8)((m, j, i) => next(m)(j)(i))
    }
    cb
  }

  // ------------------------------------------- residual (IVFADC) coding

  /** The 8-dim slice of coarse centroid `c` for subspace `m`. */
  private def centSub(centroids: Seq[Seq[Float]], c: Int, m: Int): IndexedSeq[Float] =
    (0 until 8).map(i => centroids(c)(m * 8 + i)).toIndexedSeq

  /** ‖C_c[sub m] + cb_{m,j}‖² in double, left-fold — the shifted-centroid
    * norm constant of residual coding (see [[withResidualPqCodes]]);
    * computed driver-side and inlined as a literal in BOTH engines.
    */
  def residualShiftNorm2(centroids: Seq[Seq[Float]], codebook: PqCodebook,
      c: Int, m: Int, j: Int): Double =
    (0 until 8).map { i =>
      val t = centroids(c)(m * 8 + i).toDouble + codebook(m)(j)(i).toDouble
      t * t
    }.foldLeft(0.0)(_ + _)

  /** Cell-indexed LITERAL lookups for residual coding's cell-dependent
    * terms. A 16-branch when-chain here exploded the plan (128 score
    * columns × 16 branches broke whole-stage codegen and ran the scan
    * ~6× slower); `element_at` over a literal array is one O(1) lookup
    * per row and keeps the expression tree raw-coding-sized.
    */
  private def centSubByCell(centroids: Seq[Seq[Float]],
      m: Int): org.apache.spark.sql.Column =
    element_at(typedlit(centroids.indices.map(c =>
      centSub(centroids, c, m))), col("cell") + 1)

  private def shiftNormByCell(centroids: Seq[Seq[Float]], codebook: PqCodebook,
      m: Int, j: Int): org.apache.spark.sql.Column =
    element_at(typedlit(centroids.indices.map(c =>
      residualShiftNorm2(centroids, codebook, c, m, j))), col("cell") + 1)

  /** RESIDUAL PQ codes (IVFADC proper — Jégou et al. 2011 §IV): each
    * vector codes x − C(cell) rather than x, so the 16 subspace
    * centroids only need to cover the WITHIN-cell spread instead of the
    * whole space — the standard fix for the raw-vector encoding's low
    * recall. Expressed without materializing the residual: with the
    * shifted centroid t_{c,m,j} = C_c[sub m] + cb_{m,j},
    * argmin_j ‖(x−C)_m − cb_{m,j}‖² = argmin_j (‖t‖² − 2·⟨x_m, C_c,m⟩
    * − 2·⟨x_m, cb_{m,j}⟩) — the ‖x_m‖² term is constant in j. Every
    * constant (‖t‖², the centroid slices, the codebook) is a
    * driver-side literal, and both dot products are the codegen'd
    * float-array left-fold — so the fixed-geometry path stays
    * bit-replayable in the SQL oracle (dyadic centroids + dyadic
    * codebook make every t float-exact). One scan, no shuffle; the
    * per-row cost over raw coding is 8 extra dots (the matching CASE
    * branch per subspace).
    *
    * `celled` must expose `embedding` and `cell`; input columns pass
    * through like [[withPqCodes]].
    */
  def withResidualPqCodes(celled: DataFrame, centroids: Seq[Seq[Float]],
      codebook: PqCodebook = FixedPqCodebook): DataFrame = {
    val keep = celled.columns.toSeq
    val dCols = (0 until PqSub).map { m =>
      val sub = slice(col("embedding"), m * 8 + 1, 8)
      graft.functions.DotProduct.dotF(sub, centSubByCell(centroids, m))
        .as(s"dc$m")
    }
    val based = celled.select(keep.map(col) ++ dCols: _*)
    val scoreCols = for (m <- 0 until PqSub; j <- 0 until PqCent) yield {
      val sub = slice(col("embedding"), m * 8 + 1, 8)
      (shiftNormByCell(centroids, codebook, m, j) -
        lit(2.0) * col(s"dc$m") - lit(2.0) *
        graft.functions.DotProduct.dotF(sub, typedlit(codebook(m)(j))))
        .as(s"s${m}_$j")
    }
    val scored = based.select(keep.map(col) ++ scoreCols: _*)
    val codeCols = (0 until PqSub).map { m =>
      val mn = least((0 until PqCent).map(j => col(s"s${m}_$j")): _*)
      (0 until PqCent).foldRight(lit(-1): org.apache.spark.sql.Column) {
        (j, rest) => when(col(s"s${m}_$j") === mn, lit(j)).otherwise(rest)
      }.as(s"code$m")
    }
    scored.select(keep.map(col) ++ codeCols: _*)
  }

  /** Per-(query, probed cell) RESIDUAL ADC lookup tables: `lut_m[j]` =
    * ‖(q − C_cell)_m − cb_{m,j}‖², decomposed like the encoder
    * (⟨q_m,q_m⟩ − 2·⟨q_m, C_cell,m⟩ − 2·⟨q_m, cb_{m,j}⟩ + ‖t‖²). Input
    * rows must expose `embedding` and the PROBED `cell` (post-explode),
    * so each probe leg gets the LUT of the cell it scans — residual
    * estimates stay comparable across a query's probed cells because
    * they all approximate ‖q − x‖².
    */
  private def residualLutCols(centroids: Seq[Seq[Float]],
      codebook: PqCodebook): Seq[org.apache.spark.sql.Column] =
    (0 until PqSub).map { m =>
      val sub = slice(col("embedding"), m * 8 + 1, 8)
      val dq = graft.functions.DotProduct.dotF(sub, centSubByCell(centroids, m))
      array((0 until PqCent).map { j =>
        graft.functions.DotProduct.dotF(sub, sub) -
          lit(2.0) * dq -
          lit(2.0) * graft.functions.DotProduct.dotF(sub,
            typedlit(codebook(m)(j))) +
          shiftNormByCell(centroids, codebook, m, j)
      }: _*).as(s"lut$m")
    }

  /** Fixed coarse centroids as float rows (= [[FixedAnnModel]].centroids;
    * dyadic, float-exact — the oracle-replayable geometry).
    */
  lazy val FixedIvfCentroids: Seq[Seq[Float]] =
    (0 until IvfCells).map(k => (0 until Dim).map(i => centroidWeight(k, i).toFloat))

  /** Per-query ADC lookup tables: `lut_m[j]` = ‖q_m − c_{m,j}‖², one
    * 16-double array per subspace, computed from the query's own
    * subvectors. Shared by the flat and IVF-routed PQ probes.
    */
  private def pqLutCols(
      codebook: PqCodebook): Seq[org.apache.spark.sql.Column] =
    (0 until PqSub).map { m =>
      val sub = slice(col("embedding"), m * 8 + 1, 8)
      array((0 until PqCent).map { j =>
        graft.functions.DotProduct.dotF(sub, sub) -
          lit(2.0) * graft.functions.DotProduct.dotF(sub,
            typedlit(codebook(m)(j))) +
          // StableConst, not lit: the probe plan template is re-instan-
          // tiated per codebook (fixed/trained/OPQ legs in one query),
          // and an inline double would force a fresh janino compile of
          // the whole LUT projection each time (see withPqCodes)
          graft.functions.StableConst(cbNorm2(codebook, m, j))
      }: _*).as(s"lut$m")
    }

  /** Top-k of `sims(query_id, neighbor_id, adc)` per query with the ADC
    * distance = Σ_m lut_m[code_m] (fixed left-fold order, shared with
    * the oracle) and ties to the smaller neighbor id.
    */
  private def pqTopK(candidates: DataFrame, k: Int): DataFrame = {
    val adc = (0 until PqSub)
      .map(m => element_at(col(s"lut$m"), col(s"code$m") + 1))
      .reduceLeft(_ + _)
    val sims = candidates
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(adc, 6).as("adc_dist2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist2"), col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_dist2"))
  }

  /** IVF-PQ ANN — the production composition (FAISS's IVFADC): the IVF
    * cell assignment prunes the candidate list to the query's two
    * nearest cells, and within those cells candidates are ranked by the
    * PQ asymmetric distance over 4-byte RESIDUAL codes — each vector
    * quantizes x − centroid(cell), not x ([[withResidualPqCodes]]), so
    * the codebook spends its 16 centroids per subspace on the
    * within-cell spread (Jégou 2011 §IV; raw-vector coding is why the
    * untrained recall used to sit near the floor). Both index
    * structures derive in ONE encoder scan ([[withIvfCells]] →
    * [[withResidualPqCodes]], codes pass cells through); the probe join
    * is cell-keyed like [[ivfAnn]] but moves codes instead of 256-byte
    * vectors — at 10¹¹ vectors the candidate scan is 2/16 of the corpus
    * at 1/64 the bytes.
    */
  /** Stable memo-key suffix for a codebook: the fixed baseline by name,
    * a trained one by its content hash (Seq hashCode is deterministic
    * for identical float contents, so re-training to the same codebook
    * re-hits the memo).
    */
  private def cbId(cb: PqCodebook): String =
    if (cb eq FixedPqCodebook) "fixed" else (cb.hashCode & 0x7fffffff).toHexString

  /** Session-shared flat-PQ code scan ([[withPqCodes]] memoized, keyed
    * by codebook — see [[ivfCelled]] for why index encoders memoize).
    */
  def pqCoded(embeddings: DataFrame,
      codebook: PqCodebook = FixedPqCodebook): DataFrame =
    Memo.cached(s"pq_codes:${cbId(codebook)}", embeddings)(
      withPqCodes(_, codebook))

  /** Session-shared IVF+residual-PQ index scan (cells + 4-byte residual
    * codes in one encoder pass, memoized per codebook — see
    * [[ivfCelled]]).
    */
  def ivfPqCoded(embeddings: DataFrame,
      codebook: PqCodebook = FixedPqCodebook,
      keep: Seq[String] = Nil): DataFrame =
    Memo.cached(s"ivfpq_codes:${cbId(codebook)}" +
        (if (keep.isEmpty) "" else keep.mkString(":", ",", "")),
      embeddings)(e =>
        withResidualPqCodes(withIvfCells(e, keep), FixedIvfCentroids, codebook))

  def ivfPqAnn(embeddings: DataFrame, nQueries: Int = 20, k: Int = 3,
      codebook: PqCodebook = FixedPqCodebook): DataFrame = {
    val both = ivfPqCoded(embeddings, codebook)
    val corpus = both.select(col("cell") +: col("vec_id") +:
      (0 until PqSub).map(m => col(s"code$m")): _*)
    // residual LUTs are per PROBED cell, so the cell explode happens
    // BELOW the LUT projection (each probe leg sees its own cell's LUT)
    val queries = both.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding"),
        explode(array(col("cell"), col("cell2"))).as("cell"))
      .select(col("query_id") +: col("cell") +:
        residualLutCols(FixedIvfCentroids, codebook): _*)
    pqTopK(corpus.join(broadcast(queries), Seq("cell")), k)
  }

  /** Metadata-filtered IVF-PQ ANN — "top-k neighbors WITH label = X":
    * each query searches only corpus vectors sharing its own `label`.
    * The label predicate joins INSIDE the cell-keyed probe (part of the
    * broadcast-hash-join condition), so non-matching candidates are
    * dropped before any ADC arithmetic or ranking — pre-filtering, not
    * the recall-losing post-filter of an unfiltered top-k. At 10¹¹
    * vectors the candidate scan is still 2/16 of the corpus at 4 bytes
    * a row; the filter only shrinks it further.
    */
  def filteredIvfPqAnn(embeddings: DataFrame, nQueries: Int = 20, k: Int = 3,
      codebook: PqCodebook = FixedPqCodebook): DataFrame = {
    val both = ivfPqCoded(embeddings, codebook, keep = Seq("label"))
    val corpus = both.select(col("cell") +: col("vec_id") +: col("label") +:
      (0 until PqSub).map(m => col(s"code$m")): _*)
    val queries = both.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding"),
        col("label").as("q_label"),
        explode(array(col("cell"), col("cell2"))).as("cell"))
      .select(col("query_id") +: col("q_label") +: col("cell").as("q_cell") +:
        (residualLutCols(FixedIvfCentroids, codebook)): _*)
    val probed = corpus.join(broadcast(queries),
      col("cell") === col("q_cell") && col("label") === col("q_label"))
    pqTopK(probed, k)
  }

  /** PQ asymmetric-distance ANN (Jégou et al. 2011): the corpus is
    * scanned as CODES ONLY (the full vectors never leave the encoder),
    * each query precomputes its 8×16 distance lookup table, and the
    * approximate distance is eight table lookups + adds per candidate.
    * Top-k per query on the ADC distance, ties to the smaller id.
    *
    * Scale: the ANN regime IVF/LSH can't reach — when even the pruned
    * candidate lists are too big to read at full precision, the 4-byte
    * codes are what the scan touches; here the whole corpus is scanned
    * (the flat-PQ baseline; [[ivfPqAnn]] adds the cell routing).
    * One broadcast of the query LUTs; per-query state is 128 doubles.
    */
  def pqAnn(embeddings: DataFrame, nQueries: Int = 20, k: Int = 3,
      codebook: PqCodebook = FixedPqCodebook): DataFrame = {
    val coded = pqCoded(embeddings, codebook)
    val corpus = coded.select(
      col("vec_id") +: (0 until PqSub).map(m => col(s"code$m")): _*)
    val queries = coded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id") +: pqLutCols(codebook): _*)
    pqTopK(corpus.crossJoin(broadcast(queries)), k)
  }

  /** PQ-index quality audit — per-query recall of the flat-PQ and
    * IVF-PQ probes against the EXACT full-precision squared-L2 top-k
    * (the metric PQ approximates), completing the honest-quantification
    * set ([[annRecallReport]] does the same for LSH/IVF over cosine).
    * The production question it answers: what does ranking on 4-byte
    * codes cost in neighbors found, and how much more does the IVF
    * routing drop on top.
    *
    * Scale: the exact leg is the brute-force baseline shape (broadcast
    * queries × corpus, one pass); both probe legs are the audited
    * indexes themselves.
    */
  def pqRecallReport(embeddings: DataFrame, nQueries: Int = 20, k: Int = 3): DataFrame = {
    val exact = exactL2TopK(embeddings, nQueries, k)
    val flat = pqAnn(embeddings, nQueries, k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit_pq"))
    val routed = ivfPqAnn(embeddings, nQueries, k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit_ivfpq"))
    exact
      .join(flat, Seq("query_id", "neighbor_id"), "left")
      .join(routed, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit_pq"), lit(0L))).as("n_hit_pq"),
        sum(coalesce(col("hit_ivfpq"), lit(0L))).as("n_hit_ivfpq"))
      .withColumn("recall_pq_micro", expr("(n_hit_pq * 1000000) div n_exact"))
      .withColumn("recall_ivfpq_micro",
        expr("(n_hit_ivfpq * 1000000) div n_exact"))
  }

  /** Exact squared-L2 distance of `embedding` against query column `q`
    * — left-fold dot products in double, shared by every PQ probe and
    * audit so the probes and the ground truth they are graded against
    * can never diverge on fold order or rounding.
    */
  private def sqL2(q: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.DotProduct.dotF(col("embedding"), col("embedding")) -
      lit(2.0) * graft.functions.DotProduct.dotF(q, col("embedding")) +
      graft.functions.DotProduct.dotF(q, q)

  /** Exact squared-L2 top-k (query_id, neighbor_id) pairs for the first
    * `nQueries` vectors — the brute-force ground-truth leg of the PQ
    * recall audits (one definition; the audits and specs all call it).
    */
  def exactL2TopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d"), col("neighbor_id"))
    embeddings.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(sqL2(col("q")), 6).as("d"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
  }

  // --------------------------------------------------- ANN index model

  /** The trainable structure an ANN index is built against: IVF coarse
    * centroids (cell routing) + PQ codebook (in-cell code ranking).
    * Everything the index store persists besides the codes themselves.
    */
  case class AnnModel(centroids: Seq[Seq[Float]], codebook: PqCodebook)

  /** The deterministic fixed model — what an index uses before any
    * training has run (oracle-replicable, low recall).
    */
  lazy val FixedAnnModel: AnnModel = AnnModel(
    (0 until IvfCells).map(k => (0 until Dim).map(i => centroidWeight(k, i).toFloat)),
    FixedPqCodebook)

  /** The corpus as RESIDUAL vectors x − C(cell) under `centroids` —
    * what an IVFADC codebook must train on (training on raw vectors
    * quantizes the wrong distribution: the codes store residuals).
    * Per-row zip_with against the assigned cell's centroid literal;
    * float subtraction, one scan, no shuffle.
    */
  private def residualVectors(embeddings: DataFrame,
      centroids: Seq[Seq[Float]]): DataFrame = {
    val nc = centroids.size
    val centArr = (0 until nc).foldRight(
      lit(null).cast("array<float>"): org.apache.spark.sql.Column) {
      (c, rest) => when(col("cell") === c,
        typedlit(centroids(c).toIndexedSeq)).otherwise(rest)
    }
    withCells(embeddings, centroids)
      .select(col("vec_id"),
        zip_with(col("embedding"), centArr, (x, c) => x - c).as("embedding"))
  }

  /** Train both halves of the index model on the current corpus —
    * distributed Lloyd's for the IVF cells, then per-subspace k-means
    * for the PQ codebook over the RESIDUALS x − C(cell) those centroids
    * induce (IVFADC trains on what it codes); only centroid cells ever
    * reach the driver.
    */
  def trainAnnModel(embeddings: DataFrame, ivfIters: Int = 4,
      pqIters: Int = 2): AnnModel = {
    val centroids =
      trainIvfCentroids(embeddings, IvfCells, ivfIters).map(_.toSeq).toSeq
    AnnModel(centroids,
      trainPqCodebook(residualVectors(embeddings, centroids), pqIters))
  }

  /** Slim index rows (vec_id, cell, code0..7) for `embeddings` under
    * `model` — ONE codegen'd encoder scan, 4 B of codes per vector; the
    * full vectors never land in the index.
    */
  def encodeSlim(embeddings: DataFrame, model: AnnModel): DataFrame =
    withResidualPqCodes(withCells(embeddings, model.centroids),
        model.centroids, model.codebook)
      .select(col("vec_id") +: col("cell") +:
        (0 until PqSub).map(m => col(s"code$m")): _*)

  /** ADC search over a slim coded index built with `model`: queries
    * (vec_id, embedding) route through the model's cells (nprobe=2) and
    * precompute their LUTs from its codebook; candidates rank by the
    * 8-lookup ADC distance. The corpus side touches CODES only — this
    * is the probe the streamed/retrained index store serves.
    */
  def annCodesSearch(index: DataFrame, queries: DataFrame, model: AnnModel,
      k: Int = 3): DataFrame = {
    val q = withCells(queries, model.centroids)
      .select(col("vec_id").as("query_id"), col("embedding"),
        explode(array(col("cell"), col("cell2"))).as("cell"))
      .select(col("query_id") +: col("cell") +:
        residualLutCols(model.centroids, model.codebook): _*)
    pqTopK(index.join(broadcast(q), Seq("cell")), k)
  }

  /** PQ shortlist + exact re-rank (the FAISS refine pattern,
    * IndexRefineFlat): the ADC scan over 4-byte codes shortlists the
    * top-`shortlist` candidates per query, full-precision vectors are
    * fetched for THOSE ids only, and the exact squared-L2 picks the
    * final top-k. This is how production PQ ships — the code scan pays
    * 4 B/vector over the corpus, the refine pays 256 B over `shortlist`
    * rows per query (point lookups at 10¹¹-vector scale), and the
    * re-rank erases most of the ADC distortion: on this corpus the
    * trained codebook goes ~23% → ~73% top-3 recall through a
    * 32-candidate shortlist.
    */
  def pqRerankAnn(embeddings: DataFrame, nQueries: Int = 20, k: Int = 3,
      shortlist: Int = 32,
      codebook: PqCodebook = FixedPqCodebook): DataFrame = {
    val cand = pqAnn(embeddings, nQueries, shortlist, codebook)
      .select(col("query_id"), col("neighbor_id"))
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("l2_dist2"), col("neighbor_id"))
    cand
      .join(embeddings.select(col("vec_id").as("neighbor_id"),
        col("embedding")), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(sqL2(col("q")), 6).as("l2_dist2"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("l2_dist2"))
  }

  /** Hybrid lexical+vector retrieval via reciprocal-rank fusion — the
    * standard production RAG composition (Cormack/Clarke/Büttcher 2009;
    * what Elasticsearch/Vespa/Weaviate ship as "hybrid search"): for
    * each query, fuse the BM25 lexical shortlist and the IVF-PQ vector
    * shortlist by RRF score Σ_legs ⌊10⁹/(rrfK + rank_leg)⌋, a leg a doc
    * is absent from contributing 0. Both legs already exist
    * ([[graft.operators.TextOps.bm25Search]]'s exact integer odds-ratio
    * scorer; [[ivfPqAnn]]'s residual-coded IVFADC probe); this operator
    * is the composition. Ranks — not raw scores — are what fuse, so the
    * incommensurable score scales (BM25 micro-units vs ADC distances)
    * never meet, and the whole fusion is exact integer nano-units both
    * engines replay bit-for-bit. Ties break on doc_id; the lexical leg
    * is the repo's fixed conjunctive term set (the one BM25 query
    * convention — per-query text would need a query-text corpus the
    * data model doesn't carry), the vector leg is per-query.
    *
    * Scale: both legs are the already-audited shortlist shapes (BM25's
    * TakeOrdered top-N; the cell-pruned coded probe). The fusion
    * itself touches ≤ nQueries·2·shortlist rows: the lexical list
    * broadcast-crosses the nQueries-row query spine (both bounded by
    * LITERALS, not the corpus — the deliberate-small-crossJoin
    * convention), the full-outer merge is per-(query, doc), and the
    * final top-k is a bounded per-query window.
    */
  def hybridSearchRrf(documents: DataFrame, embeddings: DataFrame,
      nQueries: Int = 20, shortlist: Int = 20, rrfK: Int = 60,
      topK: Int = 10): DataFrame = {
    val lex = graft.operators.TextOps.bm25Search(documents, topN = shortlist)
      .select(col("doc_id"), col("rank").as("lex_rank"))
    val vec = ivfPqAnn(embeddings, nQueries, shortlist)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("vec_rank"))
    // the query spine comes from the embeddings filter, not the vector
    // leg's output, so a query whose probe finds nothing still gets its
    // lexical results instead of vanishing from the report
    val spine = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"))
    val lexPerQ = spine.crossJoin(broadcast(lex))
    val fused = vec.join(lexPerQ, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_score_nano",
        coalesce(expr(s"1000000000 div ($rrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000000 div ($rrfK + vec_rank)"), lit(0L)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score_nano").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_score_nano"), col("lex_rank"), col("vec_rank"))
  }

  /** Recall audit of the TRAINED-codebook PQ index (the quality gate
    * [[trainPqCodebook]] exists to pass): one summary row comparing the
    * trained shortlist+re-rank probe ([[pqRerankAnn]]) and the fixed
    * pseudo-random flat-ADC baseline against the exact squared-L2
    * top-k. The exact columns (query/pair counts, fixed-codebook
    * recall) are deterministic and oracle-replayable; the
    * trained-codebook quality lands as tolerance-band booleans
    * (the approx_distincts convention, since k-means centroids are
    * data-dependent floats no SQL oracle can re-derive): the trained
    * index must reach `floorMicro` recall AND beat the fixed baseline.
    */
  def pqTrainedRecall(embeddings: DataFrame, nQueries: Int = 20, k: Int = 3,
      floorMicro: Long = 500000L, iters: Int = 2): DataFrame = {
    val exact = exactL2TopK(embeddings, nQueries, k)
    val fixed = pqAnn(embeddings, nQueries, k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit_fixed"))
    // the trained codebook is Memo-shared (keyed by the corpus plan +
    // iteration count): without it every invocation — each bench pass,
    // each downstream consumer — re-pays `iters` Lloyd's scans over the
    // corpus; with it training runs once per session per input and
    // reports as its own `memo:pq_codebook` bench line item
    val trainedCb = Memo.cachedModel(s"pq_codebook:iters=$iters",
      Seq(embeddings))(trainPqCodebook(embeddings, iters))
    val trained = pqRerankAnn(embeddings, nQueries, k, codebook = trainedCb)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit_trained"))
    exact
      .join(fixed, Seq("query_id", "neighbor_id"), "left")
      .join(trained, Seq("query_id", "neighbor_id"), "left")
      .agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit_fixed"), lit(0L))).as("nf"),
        sum(coalesce(col("hit_trained"), lit(0L))).as("nt"))
      .select(col("n_queries"), col("n_exact"),
        expr("(nf * 1000000) div n_exact").as("recall_fixed_micro"),
        expr(s"(nt * 1000000) div n_exact >= $floorMicro")
          .as("trained_ge_floor"),
        (col("nt") >= col("nf")).as("trained_ge_fixed"))
  }

  // ------------------------------------------------- OPQ rotation (OPQ-P)

  /** Parametric OPQ rotation (Ge et al., "Optimized Product
    * Quantization", CVPR 2013 §5): R = the PCA eigenbasis with BALANCED
    * EIGENVALUE ALLOCATION — principal directions are dealt (variance
    * descending) to the subspace with the smallest current eigenvalue
    * log-product that still has a free slot, so every 8-dim subspace
    * carries a comparable share of the corpus variance and the 16
    * per-subspace centroids stop starving on low-energy axes. Built
    * from the exact distributed covariance ([[PcaOps]]: one
    * upper-triangle moment rollup, 2 080 cells to the driver) + the
    * deterministic cyclic Jacobi sweep — O(Dim³) driver scalar work,
    * corpus touched once. Returned as the 64 rotation ROWS in float
    * (storage precision), ready to inline as literals.
    */
  def opqRotation(embeddings: DataFrame): Seq[Seq[Float]] = {
    val (vals, vecs) = PcaOps.jacobiEigen(PcaOps.covarianceMatrix(embeddings))
    val cap = Dim / PqSub
    val used = Array.fill(PqSub)(0)
    val logProd = Array.fill(PqSub)(0.0)
    val slots = Array.fill(PqSub)(List.empty[Int])
    for (i <- 0 until Dim) { // eigenvalues arrive sorted descending
      val m = (0 until PqSub).filter(used(_) < cap)
        .minBy(s => (logProd(s), s))
      slots(m) = i :: slots(m)
      used(m) += 1
      logProd(m) += math.log(math.max(vals(i), 1e-300))
    }
    slots.toSeq.flatMap(_.reverse)
      .map(i => vecs(i).map(_.toFloat).toSeq)
  }

  /** Apply a rotation (rows as float literals) to the embedding column:
    * y_i = ⟨row_i, x⟩, one codegen'd scan — 64 strict-left-fold dots, no
    * shuffle. vec_id and every other column pass through, so the
    * rotated frame drops into any encoder unchanged. Orthogonal
    * rotations preserve L2, so exact neighbors computed on the RAW
    * corpus remain the ground truth for a probe run in rotated space.
    */
  def withRotation(embeddings: DataFrame, rows: Seq[Seq[Float]]): DataFrame = {
    val keep = embeddings.columns.toSeq.filterNot(_ == "embedding")
    embeddings.select(keep.map(col) :+
      array(rows.map(r =>
        graft.functions.DotProduct.dotF(col("embedding"), typedlit(r))
          .cast("float")): _*).as("embedding"): _*)
  }

  /** Orthogonal Procrustes solve: the orthogonal R maximizing tr(Rᵀ·M)
    * (equivalently minimizing Σ‖R·x − d‖² for M = Σ d·xᵀ), via
    * R = U·Vᵀ with M = U·Σ·Vᵀ. The SVD reduces to the symmetric eigen
    * problem MᵀM = V·Σ²·Vᵀ ([[PcaOps.jacobiEigen]], deterministic) and
    * U = M·V·Σ⁻¹. A zero singular value means the data never touches
    * that direction; its U column falls back to the V column (keeps the
    * factor well-defined; any orthogonal completion is optimal there).
    * Driver-side O(Dim³) scalar work, like every dim-sized solve here.
    */
  private def procrustesRotation(m: Array[Array[Double]]): Array[Array[Double]] = {
    val n = m.length
    val mtm = Array.tabulate(n, n)((i, j) =>
      (0 until n).foldLeft(0.0)((acc, k) => acc + m(k)(i) * m(k)(j)))
    val (lam, vRows) = PcaOps.jacobiEigen(mtm)
    val sig = lam.map(l => math.sqrt(math.max(l, 0.0)))
    val u = Array.ofDim[Double](n, n)
    for (c <- 0 until n) {
      if (sig(c) > 1e-9 * sig(0).max(1e-300)) {
        for (i <- 0 until n)
          u(i)(c) = (0 until n).foldLeft(0.0)(
            (acc, k) => acc + m(i)(k) * vRows(c)(k)) / sig(c)
      } else for (i <- 0 until n) u(i)(c) = vRows(c)(i)
    }
    Array.tabulate(n, n)((i, j) =>
      (0 until n).foldLeft(0.0)((acc, c) => acc + u(i)(c) * vRows(c)(j)))
  }

  /** Non-parametric OPQ training (Ge et al. 2013 §4): alternate
    * codebook training in the current rotated space with a Procrustes
    * update of the rotation toward the codebook's reconstructions —
    * both steps monotonically reduce the SAME quantization distortion
    * E‖R·x − decode(encode(R·x))‖², which plain PQ minimizes with R
    * frozen at I. Initialized from the parametric rotation
    * ([[opqRotation]], the paper's recommended warm start).
    *
    * Scale shape per alternation: the codebook step is
    * [[trainPqCodebook]]'s `iters` corpus scans; the rotation step
    * needs only the cross-moment M = Σ decode(code(x))·xᵀ, which
    * assembles from the BOUNDED sufficient statistic
    * S[m][c][j] = Σ_{code_m = c} x_j (8·16·64 = 8 192 cells, one
    * map-side-combined scan — the reconstruction is block-constant per
    * (subspace, code), so M = Σ_c cb[m][c] ⊗ S[m][c] driver-side and
    * the corpus never materializes decoded vectors). Everything that
    * reaches the driver is dim- or codebook-sized.
    */
  def opqTrain(embeddings: DataFrame, alternations: Int = 2,
      iters: Int = 2): (Seq[Seq[Float]], PqCodebook) = {
    var rot: Seq[Seq[Float]] = opqRotation(embeddings)
    var cb: PqCodebook = FixedPqCodebook
    val withRaw = embeddings.select(col("vec_id"), col("embedding"),
      col("embedding").as("raw"))
    for (t <- 0 until alternations) {
      // materialize the rotated corpus ONCE per alternation: every scan
      // under it (codebook init + `iters` Lloyd passes + the
      // cross-moment pass) re-reads this frame, and a lazy plan would
      // re-pay the 64×64 rotation dots on each — measured ~6 redundant
      // rotation passes per alternation before this checkpoint
      val rotated = Memo.managedCheckpoint(withRotation(withRaw, rot))
      cb = trainPqCodebook(rotated, iters)
      if (t < alternations - 1) {
        // S[m][c][j] = Σ_{code_m = c} x_j via ONE subspace-grain explode
        // (8 rows/vector carrying the raw array, not the former
        // 64×8 = 512 rows from posexplode(raw) × code explode) + 64 sum
        // columns grouped by (m, c) — same value stream per cell, 64×
        // fewer rows through the aggregation
        val s = withPqCodes(rotated, cb)
          .select(col("raw"), explode(array((0 until PqSub).map(m =>
            struct(lit(m).as("m"), col(s"code$m").as("c"))): _*)).as("mc"))
          .groupBy(col("mc.m").as("m"), col("mc.c").as("c"))
          .agg(sum(element_at(col("raw"), 1).cast("double")).as("s0"),
            (1 until Dim).map(j =>
              sum(element_at(col("raw"), j + 1).cast("double"))
                .as(s"s$j")): _*)
          .collect()
        val big = Array.ofDim[Double](Dim, Dim)
        s.foreach { r =>
          val m = r.getInt(0); val c = r.getInt(1)
          var j = 0
          while (j < Dim) {
            val sv = r.getDouble(2 + j)
            var i = 0
            while (i < 8) {
              big(m * 8 + i)(j) += cb(m)(c)(i).toDouble * sv; i += 1
            }
            j += 1
          }
        }
        val next = procrustesRotation(big)
        rot = next.toSeq.map(_.toSeq.map(_.toFloat))
      }
    }
    (rot, cb)
  }

  /** Recall audit of OPQ (learned rotation + trained codebook,
    * [[opqTrain]]) against plain trained PQ — the one standard
    * ANN-stack stage [[pqTrainedRecall]] left out: both candidates
    * encode the corpus flat-ADC (no re-rank, so the CODEBOOK geometry
    * is what's measured; the fixed pseudo-random codebook is the
    * oracle-replayable baseline column), the OPQ leg training and
    * probing entirely in rotated space. A wider sample than the other
    * recall audits (50 queries × top-5 = 250 hit trials) because this
    * audit pins an ORDERING between two trained indexes, not just a
    * floor — at 60 trials a one-hit swing flips the verdict. Exact
    * columns replay in SQL; the data-dependent trained legs land as
    * tolerance-band booleans (the [[pqTrainedRecall]] convention): OPQ
    * must reach `floorMicro` recall AND match-or-beat plain trained PQ
    * (R = I is in OPQ's search space; the spec pins the same
    * invariant). Measured at 3 alternations × 4 Lloyd iters (round 14):
    * hits/250 OPQ vs PQ = 64/55 (sf0.001), 65/57 (sf0.01), 39/32
    * (sf0.1), with quantization distortion lower at every SF (252 vs
    * 277, 251 vs 276, 1143 vs 1185) — at 2×2 the distortion win was
    * already there but the recall ordering sat inside sampling noise,
    * which is why the defaults buy the extra training.
    */
  def opqTrainedRecall(embeddings: DataFrame, nQueries: Int = 50, k: Int = 5,
      floorMicro: Long = 100000L, alternations: Int = 3,
      iters: Int = 4): DataFrame = {
    val exact = exactL2TopK(embeddings, nQueries, k)
    val fixed = pqAnn(embeddings, nQueries, k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit_fixed"))
    val trainedCb = Memo.cachedModel(s"pq_codebook:iters=$iters",
      Seq(embeddings))(trainPqCodebook(embeddings, iters))
    val pqFlat = pqAnn(embeddings, nQueries, k, codebook = trainedCb)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit_pq"))
    val (rot, opqCb) = Memo.cachedModel(
      s"opq_model:alt=$alternations,iters=$iters", Seq(embeddings))(
      opqTrain(embeddings, alternations, iters))
    val opqFlat = pqAnn(withRotation(embeddings, rot), nQueries, k,
        codebook = opqCb)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit_opq"))
    exact
      .join(fixed, Seq("query_id", "neighbor_id"), "left")
      .join(pqFlat, Seq("query_id", "neighbor_id"), "left")
      .join(opqFlat, Seq("query_id", "neighbor_id"), "left")
      .agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit_fixed"), lit(0L))).as("nf"),
        sum(coalesce(col("hit_pq"), lit(0L))).as("np"),
        sum(coalesce(col("hit_opq"), lit(0L))).as("no"))
      .select(col("n_queries"), col("n_exact"),
        expr("(nf * 1000000) div n_exact").as("recall_fixed_micro"),
        expr(s"(no * 1000000) div n_exact >= $floorMicro")
          .as("opq_ge_floor"),
        (col("no") >= col("np")).as("opq_ge_trained_pq"))
  }

  /** Recall audit of TRAINED residual IVF-PQ (IVFADC proper — the
    * quality gate residual encoding + residual-trained codebooks exist
    * to pass): one summary row comparing the trained index probe
    * ([[encodeSlim]] + [[annCodesSearch]] under [[trainAnnModel]]'s
    * residual-trained geometry) and the fixed pseudo-random residual
    * baseline ([[ivfPqAnn]]) against the exact squared-L2 top-k. The
    * exact columns are deterministic and oracle-replayable; the trained
    * quality lands as tolerance-band booleans (the pq_trained_recall
    * convention — k-means geometry is data-dependent floats no SQL
    * oracle can re-derive): the trained index must reach `floorMicro`
    * recall AND beat the fixed baseline.
    */
  def ivfadcTrainedRecall(embeddings: DataFrame, nQueries: Int = 20,
      k: Int = 3, floorMicro: Long = 100000L, ivfIters: Int = 4,
      pqIters: Int = 2): DataFrame = {
    val exact = exactL2TopK(embeddings, nQueries, k)
    val fixed = ivfPqAnn(embeddings, nQueries, k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit_fixed"))
    // Memo-shared like the PQ codebook: the whole trained-index family
    // (this audit, the lifecycle retrain) pays Lloyd's once per session
    val model = Memo.cachedModel(s"ann_model:ivf=$ivfIters,pq=$pqIters",
      Seq(embeddings))(trainAnnModel(embeddings, ivfIters, pqIters))
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"))
    val trained =
      annCodesSearch(encodeSlim(embeddings, model), queries, model, k)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit_trained"))
    exact
      .join(fixed, Seq("query_id", "neighbor_id"), "left")
      .join(trained, Seq("query_id", "neighbor_id"), "left")
      .agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit_fixed"), lit(0L))).as("nf"),
        sum(coalesce(col("hit_trained"), lit(0L))).as("nt"))
      .select(col("n_queries"), col("n_exact"),
        expr("(nf * 1000000) div n_exact").as("recall_fixed_micro"),
        expr(s"(nt * 1000000) div n_exact >= $floorMicro")
          .as("trained_ge_floor"),
        (col("nt") >= col("nf")).as("trained_ge_fixed"))
  }

  /** Per-dimension p1/p99 clipping bounds + outlier mass — the
    * preprocessing audit run before quantizing or PQ-encoding an
    * embedding column (a single wild dimension wrecks a shared scalar
    * quantizer; clip bounds are what `embed_quantize`-style codecs
    * should actually calibrate on). Exact quantiles via the
    * quantized-domain CDF: values truncate to a milli grid (≤ ~2·10³
    * distinct cells per dim for unit-normalized embeddings — bounded by
    * the VALUE domain, not the corpus), per-(dim, milli) counts
    * cumulative-sum within dim, and the p1/p99 ranks probe the bounded
    * cell table. Reports, per dim: value count, both bounds, and the
    * mass strictly outside them.
    *
    * Scale: one explode scan → map-side-combined (dim, milli) rollup;
    * every window/join after that runs on the domain-bounded cell grid.
    */
  def embedClipBounds(embeddings: DataFrame): DataFrame = {
    val vals = embeddings
      .filter(col("embedding").isNotNull)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .filter(!isnan(col("v")))
      .select((col("pos") + 1).cast("long").as("dim"),
        expr("cast(cast(v as double) * 1000 as bigint)").as("milli"))
    val cells = vals.groupBy(col("dim"), col("milli"))
      .agg(count(lit(1)).as("cnt"))
    val nPer = cells.groupBy(col("dim")).agg(sum(col("cnt")).as("n_vals"))
    val w = Window.partitionBy(col("dim")).orderBy(col("milli"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = cells.withColumn("cum", sum(col("cnt")).over(w))
      .join(nPer, Seq("dim"))
    val lo = ranked.filter(col("cum") >= expr("(n_vals + 99) div 100"))
      .groupBy(col("dim")).agg(min(col("milli")).as("lo_milli"))
    val hi = ranked.filter(col("cum") >= expr("(n_vals * 99 + 99) div 100"))
      .groupBy(col("dim")).agg(min(col("milli")).as("hi_milli"))
    val bounds = lo.join(hi, Seq("dim"))
    val clip = cells.join(bounds, Seq("dim"))
      .groupBy(col("dim"))
      .agg(sum(when(col("milli") < col("lo_milli"), col("cnt"))
        .otherwise(0L)).as("n_clip_lo"),
        sum(when(col("milli") > col("hi_milli"), col("cnt"))
          .otherwise(0L)).as("n_clip_hi"))
    nPer.join(bounds, Seq("dim")).join(clip, Seq("dim"))
      .select(col("dim"), col("n_vals"), col("lo_milli"), col("hi_milli"),
        col("n_clip_lo"), col("n_clip_hi"))
  }
}
