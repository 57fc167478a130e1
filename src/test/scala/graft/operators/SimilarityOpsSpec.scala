package graft.operators

import graft.SparkSpec

class SimilarityOpsSpec extends SparkSpec {

  test("contrastivePairs emits ≤hardK hard + exactly 1 easy negative per anchor") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = SimilarityOps.contrastivePairs(emb, nQueries = 5).collect()
    val byAnchor = out.groupBy(r => (r.getLong(0), r.getString(1)))
    byAnchor.foreach { case ((a, t), rows) =>
      if (t == "hard_neg") {
        assert(rows.length <= 2, s"anchor $a has ${rows.length} hard negs")
        rows.foreach(r => assert(r.getDouble(3) < 0.99))
      } else assert(rows.length == 1, s"anchor $a has ${rows.length} easy negs")
    }
    // every anchor that produced pairs has its easy negative
    val anchors = out.map(_.getLong(0)).toSet
    anchors.foreach { a =>
      assert(byAnchor.contains((a, "easy_neg")), s"anchor $a lacks easy neg")
    }
  }
  test("OPQ: learned rotation is orthogonal, beats trained PQ on distortion AND recall") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (rot, opqCb) = SimilarityOps.opqTrain(emb, alternations = 3, iters = 4)
    // rotation rows orthonormal at float precision: R·Rᵀ ≈ I
    for (a <- 0 until 8; b <- 0 until 8) { // spot-check an 8×8 corner + diag
      val dot = rot(a).zip(rot(b)).map { case (x, y) => x.toDouble * y.toDouble }.sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-4, s"RRt($a,$b)=$dot")
    }
    (0 until 64).foreach { a =>
      val n = rot(a).map(x => x.toDouble * x.toDouble).sum
      assert(math.abs(n - 1.0) < 1e-4, s"row $a norm $n")
    }
    // the graded booleans (floor + OPQ ≥ trained PQ) must hold — the
    // oracle forces them TRUE, so this is the gate's local twin
    val row = SimilarityOps.opqTrainedRecall(emb).head()
    assert(row.getBoolean(3), "opq_ge_floor")
    assert(row.getBoolean(4), "opq_ge_trained_pq")
    // distortion (the objective OPQ optimizes) strictly below plain
    // trained PQ's at the same Lloyd budget
    def distortion(frame: org.apache.spark.sql.DataFrame,
        cb: SimilarityOps.PqCodebook): Double =
      frame.select(((0 until SimilarityOps.PqSub).map { m =>
        val sub = slice(col("embedding"), m * 8 + 1, 8)
        least((0 until SimilarityOps.PqCent).map { j =>
          val w = cb(m)(j).map(x => x.toDouble * x.toDouble).sum
          lit(w) - lit(2.0) *
            graft.functions.DotProduct.dotF(sub, typedlit(cb(m)(j)))
        }: _*)
      }.reduce(_ + _) + graft.functions.DotProduct.dotF(col("embedding"),
        col("embedding"))).as("d"))
        .agg(sum(col("d"))).head().getDouble(0)
    val pqCb = SimilarityOps.trainPqCodebook(emb, 4)
    val dPq = distortion(emb, pqCb)
    val dOpq = distortion(SimilarityOps.withRotation(emb, rot), opqCb)
    assert(dOpq < dPq, s"OPQ distortion $dOpq must undercut PQ $dPq")
  }

  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.map { case (id, v) => (id, v, 0) }.toDF("vec_id", "embedding", "label")

  test("ivfCellBalance accounts for every vector with exact micro shares") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = SimilarityOps.ivfCellBalance(emb).collect()
    val total = emb.count()
    assert(out.map(_.getAs[Long]("n_vecs")).sum == total,
      "every vector must land in exactly one cell")
    out.foreach { r =>
      val n = r.getAs[Long]("n_vecs")
      assert(r.getAs[Long]("share_micro") == n * 1000000L / total)
      assert(r.getAs[Long]("load_factor_micro") == n * 16L * 1000000L / total)
      assert(r.getAs[Boolean]("hot") == (n * 16 >= 2 * total))
      assert(r.getAs[Long]("cell") >= 0 && r.getAs[Long]("cell") < 16)
    }
  }

  test("embedCentroidDrift is zero for identical labels and positive for a shifted one") {
    val near = Seq.tabulate(64)(_ => 0.5f)
    val far = Seq.tabulate(64)(_ => -0.5f)
    val df = Seq(
      (0L, near, "a"), (1L, near, "a"),
      (2L, near, "b"), (3L, near, "b"),
      (4L, far, "c"), (5L, far, "c"))
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.embedCentroidDrift(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // global mean sits between the clusters: a and b drift equally,
    // c (the minority direction at 2/6 of the mass) drifts more
    assert(out.keySet == Set("a", "b", "c"))
    assert(out("a")._1 == 2L && out("c")._1 == 2L)
    assert(out("a")._2 == out("b")._2, "identical labels must drift identically")
    assert(out("c")._2 > out("a")._2, "the shifted label must drift further")
    // one homogeneous label == the global centroid → zero drift
    val same = Seq((0L, near, "x"), (1L, near, "x"))
      .toDF("vec_id", "embedding", "label")
    val zero = SimilarityOps.embedCentroidDrift(same).collect()
    assert(zero.length == 1 && zero.head.getLong(2) == 0L)
  }

  test("bruteCosineTopK ranks an identical vector first with sim 1.0") {
    val v = Seq.tabulate(64)(i => (i % 7).toFloat + 1f)
    val w = Seq.tabulate(64)(i => (63 - i % 11).toFloat + 1f)
    val df = vecs(0L -> v, 30L -> v, 31L -> w)
    val out = SimilarityOps.bruteCosineTopK(df, nQueries = 1, k = 2)
      .orderBy("rank").collect()
    assert(out.length == 2)
    assert(out.head.getLong(1) == 30L && out.head.getDouble(2) == 1.0)
    assert(out(1).getDouble(2) < 1.0)
  }

  test("embedMarginAudit: wide margin confident, duplicate corpus ambiguous") {
    val v = Seq.tabulate(64)(i => (i % 7).toFloat + 1f)
    val w = Seq.tabulate(64)(i => (63 - i % 11).toFloat + 1f)
    // query 0: one identical neighbor (sim 1.0) and one far one → a
    // wide, unambiguous margin
    val confident = SimilarityOps.embedMarginAudit(
      vecs(0L -> v, 30L -> v, 31L -> w), nQueries = 1).collect()(0)
    assert(confident.getAs[Long]("top1_id") == 30L)
    assert(confident.getAs[Double]("top1_sim") == 1.0)
    assert(!confident.getAs[Boolean]("is_ambiguous"))
    assert(confident.getAs[Double]("margin_r6") >= 0.05)
    // duplicate corpus vectors: top1 == top2 → margin 0, ambiguous
    val dup = SimilarityOps.embedMarginAudit(
      vecs(0L -> v, 30L -> w, 31L -> w), nQueries = 1).collect()(0)
    assert(dup.getAs[Double]("margin_r6") == 0.0)
    assert(dup.getAs[Boolean]("is_ambiguous"))
    // a single-neighbor corpus has no runner-up: margin NULL, flag NULL
    val solo = SimilarityOps.embedMarginAudit(
      vecs(0L -> v, 30L -> w), nQueries = 1).collect()(0)
    assert(solo.isNullAt(solo.fieldIndex("margin_r6")))
    assert(solo.isNullAt(solo.fieldIndex("is_ambiguous")))
  }

  test("mmrRerank demotes the near-duplicate a pure relevance top-k would keep") {
    def axis(i: Int, j: Int): Seq[Float] =
      Seq.tabulate(64)(d => if (d == i || d == j) 0.7f else 0f)
    val q = Seq.tabulate(64)(d => if (d == 0) 1f else 0f)
    // 10 and 11 are IDENTICAL (rel .707 each, mutual sim 1.0); 12 is
    // equally relevant but orthogonal to them; 13 is irrelevant but
    // orthogonal to everything
    val df = vecs(0L -> q, 10L -> axis(0, 1), 11L -> axis(0, 1),
      12L -> axis(0, 2),
      13L -> Seq.tabulate(64)(d => if (d == 3) 1f else 0f))
    val out = SimilarityOps.mmrRerank(df, queryId = 0L, shortlistN = 4, k = 3)
      .orderBy("step").collect()
    assert(out.map(_.getAs[Long]("step")).toSeq == Seq(1L, 2L, 3L))
    // step 1: relevance tie (10, 11, 12) → smallest id
    assert(out(0).getAs[Long]("vec_id") == 10L)
    // step 2: the duplicate 11 scores .707−1.0 < 0 — diversity picks 12
    assert(out(1).getAs[Long]("vec_id") == 12L)
    // step 3: even the irrelevant-but-novel 13 (mmr 0) beats the dup
    assert(out(2).getAs[Long]("vec_id") == 13L)
    // mmr_score of later steps is relevance minus redundancy — bounded
    out.drop(1).foreach { r =>
      assert(r.getAs[Double]("mmr_score") <= r.getAs[Double]("relevance"))
    }
  }

  test("planeWeight is deterministic and centered") {
    val ws = for (p <- 0 until 16; i <- 0 until 64) yield SimilarityOps.planeWeight(p, i)
    assert(ws.forall(w => w >= -0.5 && w < 0.5))
    assert(math.abs(ws.sum / ws.size) < 0.05)
  }

  test("ivfAnn probes the right cells and finds the identical vector") {
    val v = Seq.tabulate(64)(i => (i % 5).toFloat - 2f)
    val df = vecs(0L -> v, 40L -> v)
    val out = SimilarityOps.ivfAnn(df, nQueries = 1, k = 3).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 40L && out.head.getDouble(2) == 1.0)
  }

  test("withIvfCells assigns deterministic distinct primary/secondary cells") {
    val v = Seq.tabulate(64)(i => (i % 5).toFloat - 2f)
    val r = SimilarityOps.withIvfCells(vecs(0L -> v)).head
    val (cell, cell2) = (r.getInt(2), r.getInt(3))
    assert(cell >= 0 && cell < 16 && cell2 >= 0 && cell2 < 16 && cell != cell2)
  }

  test("dedupEmbedCosine pairs identical embeddings at sim 1.0") {
    val v = Seq.tabulate(64)(i => (i % 9).toFloat - 4f)
    val w = Seq.tabulate(64)(i => (i % 3).toFloat + 1f)
    val df = vecs(1L -> v, 2L -> v, 3L -> w)
    val out = DedupOps.dedupEmbedCosine(df).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L)
    assert(out.head.getDouble(2) == 1.0)
  }

  test("dedupSemantic removes the higher-id member of a same-cell near-dup pair") {
    val v = Seq.tabulate(64)(i => (i % 9).toFloat - 4f)
    val w = Seq.tabulate(64)(i => (i % 3).toFloat + 1f)
    val df = vecs(1L -> v, 2L -> v, 3L -> w)
    val out = DedupOps.dedupSemantic(df).orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("is_removed")).toMap
    // identical 1/2 share a cell: 2 (the higher id) is removed, 1 kept
    assert(out == Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("dedupSemanticTrained keeps the verdict contract on trained cells") {
    // identical pair must still collapse (k-means cannot split equal
    // vectors), keep-first policy holds, and on real data every removal
    // has a lower-id same-cell witness at >= minCos — the SemDeDup
    // contract independent of which cells the training produced
    val v = Seq.tabulate(64)(i => (i % 9).toFloat - 4f)
    val w = Seq.tabulate(64)(i => (i % 3).toFloat + 1f)
    val small = vecs(1L -> v, 2L -> v, 3L -> w)
    val out = DedupOps.dedupSemanticTrained(small, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("is_removed")).toMap
    assert(out(1L) == false && out(2L) == true)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val verdicts = DedupOps.dedupSemanticTrained(emb, minCos = 0.3, iters = 2)
    assert(verdicts.count() == emb.count(), "one verdict per vector")
    // removed ⇒ witness exists: re-derive pairs from the verdict frame
    val cells = verdicts.select("vec_id", "cell")
    val vecsDf = emb.select("vec_id", "embedding")
    val joined = cells.as("x").join(cells.as("y"), "cell")
      .filter(org.apache.spark.sql.functions.col("x.vec_id") <
        org.apache.spark.sql.functions.col("y.vec_id"))
      .select(org.apache.spark.sql.functions.col("x.vec_id").as("a"),
        org.apache.spark.sql.functions.col("y.vec_id").as("b"))
      .join(vecsDf.withColumnRenamed("vec_id", "a")
        .withColumnRenamed("embedding", "ea"), "a")
      .join(vecsDf.withColumnRenamed("vec_id", "b")
        .withColumnRenamed("embedding", "eb"), "b")
      .filter(org.apache.spark.sql.functions.round(
        graft.functions.VectorFns.cosine(
          org.apache.spark.sql.functions.col("ea"),
          org.apache.spark.sql.functions.col("eb")), 6) >= 0.3)
      .select("b").distinct()
      .collect().map(_.getLong(0)).toSet
    val removed = verdicts.filter("is_removed")
      .collect().map(_.getLong(0)).toSet
    assert(removed == joined,
      "removed set must be exactly the vectors with a lower-id same-cell witness")
  }

  test("lshAnn buckets identical vectors together") {
    val v = Seq.tabulate(64)(i => (i % 5).toFloat - 2f)
    val df = vecs(0L -> v, 40L -> v)
    val out = SimilarityOps.lshAnn(df, nQueries = 1, k = 3).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 40L && out.head.getDouble(2) == 1.0)
  }

  test("embedQuantize codes land in [0,255] with bounded reconstruction error") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = SimilarityOps.embedQuantize(emb).collect()
    assert(out.length == emb.count())
    // q_codes is the comma-joined int8 vector (driver-hashable scalar form)
    assert(out.forall(_.getString(1).split(',').forall { q =>
      val n = q.toInt; n >= 0 && n <= 255
    }))
    assert(out.forall(_.getString(1).split(',').length == 64))
    // per-dim error is at most scale/2 = span/510
    val span = emb
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("embedding")).as("v"))
      .agg(org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.col("v")) -
        org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.col("v")))
      .head().getFloat(0)
    val bound = span / 510.0 + 1e-9
    assert(out.forall(_.getDouble(2) <= bound),
      s"max_err must be within half a quantization step ($bound)")
  }

  test("knnLabel predicts by majority vote of IVF-cell neighbors") {
    import spark.implicits._
    val v = Seq.tabulate(64)(i => (i % 5).toFloat - 2f)
    val w = Seq.tabulate(64)(i => (i % 5).toFloat - 2.01f) // near v
    val emb = vecs(0L -> v, 40L -> v, 41L -> w)
    val labels = Seq((0L, "fr"), (40L, "en"), (41L, "en"))
      .toDF("doc_id", "lang")
      .withColumn("text", org.apache.spark.sql.functions.lit("x"))
    val out = SimilarityOps.knnLabel(emb, labels, nQueries = 1, k = 2).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("predicted_lang") == "en")
    assert(out.head.getAs[Long]("n_votes") == 2L)
    assert(out.head.getAs[String]("actual_lang") == "fr")
    assert(!out.head.getAs[Boolean]("is_correct"))
  }

  test("trained IVF clusters real testdata with high recall vs brute force") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val exact = SimilarityOps.bruteCosineTopK(emb, nQueries = 20, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = SimilarityOps.ivfTrainedAnn(emb, nQueries = 20, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect trained).size.toDouble / exact.size
    assert(recall >= 0.6, s"trained-IVF recall@3 too low: $recall")
    // training must actually move centroids off the init vectors: every
    // cell pair assignment is still valid (cell != cell2, both in range)
    val cells = SimilarityOps.withCells(emb,
      SimilarityOps.trainIvfCentroids(emb).map(_.toSeq).toSeq).collect()
    assert(cells.forall(r => r.getInt(2) >= 0 && r.getInt(2) < 16))
    assert(cells.forall(r => r.getInt(2) != r.getInt(3)))
    val distinctCells = cells.map(_.getInt(2)).distinct.length
    assert(distinctCells >= 8, s"degenerate clustering: $distinctCells cells used")
  }

  test("annRecallReport compares both indexes against the exact top-k") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val out = SimilarityOps.annRecallReport(emb).collect()
    assert(out.length == 20) // one row per sampled query
    out.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 3L)
      assert(r.getAs[Long]("recall_ivf_micro") ==
        r.getAs[Long]("n_hit_ivf") * 1000000L / 3L)
    }
    // the honest comparison this report exists for: on this corpus the
    // nprobe=2 IVF index recalls a substantial fraction of the true
    // top-3; the all-16-planes LSH bucket is too selective to compete
    val ivf = out.map(_.getAs[Long]("n_hit_ivf")).sum.toDouble / 60
    val lsh = out.map(_.getAs[Long]("n_hit_lsh")).sum.toDouble / 60
    assert(ivf >= 0.2, s"IVF recall@3 collapsed: $ivf")
    assert(lsh <= ivf, s"expected IVF >= LSH on this corpus: $lsh vs $ivf")
  }

  test("annNprobeSweep walks a monotone recall/cost ladder") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val out = SimilarityOps.annNprobeSweep(emb).collect()
      .map(r => r.getAs[Long]("nprobe") ->
        (r.getAs[Long]("scanned"), r.getAs[Long]("n_hit"),
          r.getAs[Long]("n_exact"), r.getAs[Long]("recall_micro"),
          r.getAs[Long]("scanned_share_micro"))).toMap
    assert(out.keySet == Set(1L, 2L, 4L, 8L))
    // cost and recall are monotone non-decreasing in nprobe — probing a
    // SUPERSET of inverted lists can only add candidates and hits
    val ladder = Seq(1L, 2L, 4L, 8L).map(out)
    assert(ladder.map(_._1) == ladder.map(_._1).sorted, "scan cost not monotone")
    assert(ladder.map(_._2) == ladder.map(_._2).sorted, "recall not monotone")
    out.foreach { case (_, (_, hit, ex, rec, share)) =>
      assert(ex == 60L) // 20 queries × top-3
      assert(rec == hit * 1000000L / ex)
      assert(share >= 0L && share <= 1000000L)
    }
    // nprobe=2 must agree with the fixed-config IVF leg of
    // annRecallReport (same index, same probe depth, same queries)
    val fixedIvf = SimilarityOps.annRecallReport(emb).collect()
      .map(_.getAs[Long]("n_hit_ivf")).sum
    assert(out(2L)._2 == fixedIvf,
      s"sweep nprobe=2 ${out(2L)._2} != annRecallReport IVF $fixedIvf")
  }

  test("embedNormCheck flags NaN and zero vectors per label") {
    import spark.implicits._
    val bad = Seq(
      (1L, Array.fill(64)(0.5f), "a"),
      (2L, Array.fill(64)(0.0f), "a"),          // zero vector
      (3L, Array.fill(64)(Float.NaN), "a"),     // NaN vector
      (4L, Array.fill(64)(1.0f), "b"))
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.embedNormCheck(bad).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_vecs") == 3L)
    assert(a.getAs[Long]("n_nan") == 1L && a.getAs[Long]("n_zero") == 1L)
    val b = out("b")
    assert(b.getAs[Long]("n_nan") == 0L)
    assert(b.getAs[Double]("min_norm2") == 64.0 && b.getAs[Double]("max_norm2") == 64.0)
  }

  test("embedDimStats sums exact truncated micro-units per dimension") {
    val rows = Seq(
      (1L, Seq.tabulate(64)(i => if (i == 0) 0.25f else 1f), 7),
      (2L, Seq.tabulate(64)(i => if (i == 0) 0.5f else -1f), 7))
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.embedDimStats(rows).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(1L) == ((2L, 750000L, 375000.0)))   // 0.25 + 0.5
    assert(out(2L) == ((2L, 0L, 0.0)))             // 1 + (-1)
    assert(out.size == 64)
  }

  test("embedOutliers ranks the far-from-centroid vector first, skips NaN") {
    // three near-identical vectors + one far outlier + one NaN-poisoned
    val base = Seq.tabulate(64)(_ => 1f)
    val rows = Seq(
      (1L, base, 7), (2L, base, 7), (3L, base, 7),
      (4L, Seq.tabulate(64)(_ => 3f), 7),
      (5L, Seq.tabulate(64)(i => if (i == 0) Float.NaN else 1f), 7))
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.embedOutliers(rows, topK = 2).orderBy("rank").collect()
    assert(out.length == 2)
    assert(out.head.getLong(1) == 4L && out.head.getLong(2) == 1L)
    // centroid = (3·1 + 3)/4 = 1.5; outlier dev² = 64·(3−1.5)² = 144.0
    assert(out.head.getDouble(3) == 144.0)
    // the three base vectors tie at 64·0.25 = 16; vec 1 wins the tiebreak
    assert(out(1).getLong(1) == 1L && out(1).getDouble(3) == 16.0)
    // NaN vector excluded entirely (it appears in no ranking)
    assert(!SimilarityOps.embedOutliers(rows, topK = 5).collect()
      .exists(_.getLong(1) == 5L))
  }

  test("embedKmeans converges two separated blobs onto their seed centroids") {
    // vec_ids 0,1 seed the two centroids; 0,2,3 cluster near 1.0 and
    // 1,4,5 near -1.0 — after one recompute each point stays with its
    // blob and the mean squared distance is the within-blob spread
    def const(x: Float) = Seq.tabulate(64)(_ => x)
    val df = vecs(
      0L -> const(1.0f), 2L -> const(1.1f), 3L -> const(0.9f),
      1L -> const(-1.0f), 4L -> const(-1.1f), 5L -> const(-0.9f))
    val out = SimilarityOps.embedKmeans(df, k = 2, iters = 2)
      .orderBy("cluster_id").collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 3L))
    // centroid of {1.0, 1.1, 0.9} = 1.0 in every dim → mean sqdist =
    // (0 + 64·0.1² + 64·0.1²)/3 ≈ 0.426667 (micro-quantized)
    out.foreach(r => assert(math.abs(r.getDouble(2) - 64 * 2.0 / 300) < 1e-3))
  }

  test("embedKmeans ties break to the lowest centroid id") {
    def const(x: Float) = Seq.tabulate(64)(_ => x)
    // both seeds identical: every point is equidistant to cid 0 and 1 —
    // all mass lands on cluster 0 and cluster 1 keeps only... nothing,
    // so exactly one output row with every member
    val df = vecs(0L -> const(1.0f), 1L -> const(1.0f), 2L -> const(1.0f))
    val out = SimilarityOps.embedKmeans(df, k = 2, iters = 2).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 0L && out.head.getLong(1) == 3L)
    assert(out.head.getDouble(2) == 0.0)
  }

  test("pqAnn matches a direct codebook replication (codes + ADC distances)") {
    import SimilarityOps.{pqWeight, pqCentNorm2, PqSub, PqCent}
    val vs = Seq(
      0L -> Seq.tabulate(64)(i => ((i % 5) - 2).toFloat / 4f),
      1L -> Seq.tabulate(64)(i => ((i % 9) - 4).toFloat / 8f),
      2L -> Seq.tabulate(64)(i => ((i % 3) - 1).toFloat / 2f),
      3L -> Seq.tabulate(64)(i => ((i % 5) - 2).toFloat / 4f)) // dup of 0
    // replicate the full chain with the same left-fold double arithmetic
    def dot8(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
    def codes(v: Seq[Float]): Seq[Int] = (0 until PqSub).map { m =>
      val sub = (0 until 8).map(i => v(m * 8 + i).toDouble)
      val d = (0 until PqCent).map { j =>
        val w = (0 until 8).map(i => pqWeight(m, j, i).toFloat.toDouble)
        pqCentNorm2(m, j) - 2.0 * dot8(sub, w)
      }
      d.indexOf(d.min)
    }
    def adc(q: Seq[Float], c: Seq[Int]): Double =
      (0 until PqSub).map { m =>
        val sub = (0 until 8).map(i => q(m * 8 + i).toDouble)
        val j = c(m)
        val w = (0 until 8).map(i => pqWeight(m, j, i).toFloat.toDouble)
        dot8(sub, sub) - 2.0 * dot8(sub, w) + pqCentNorm2(m, j)
      }.reduceLeft(_ + _)
    val expect = (for {
      (q, qv) <- vs.take(4) if q < 2 // nQueries = 2
      (n, nv) <- vs if n != q
    } yield (q, n, math.rint(adc(qv, codes(nv)) * 1e6) / 1e6))
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(3).zipWithIndex
          .map { case ((q, n, d), i) => (q, (i + 1).toLong, n, d) }
      }.toSet
    val got = SimilarityOps.pqAnn(vecs(vs: _*), nQueries = 2, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expect)
    // the duplicate vector shares vector 0's codes, so its ADC distance
    // to query 0 equals query 0's own reconstruction error — rank 1
    val top0 = got.filter(t => t._1 == 0L && t._2 == 1L)
    assert(top0.head._3 == 3L)
  }

  test("ivfPqAnn probes within cells and ranks by the residual (IVFADC) ADC distance") {
    import SimilarityOps.{pqWeight, PqSub, PqCent, FixedIvfCentroids,
      FixedPqCodebook, residualShiftNorm2}
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val ivfpq = SimilarityOps.ivfPqAnn(emb, nQueries = 5).collect()
    assert(ivfpq.groupBy(_.getLong(0)).values.forall(_.length == 3))
    val celled = SimilarityOps.withIvfCells(emb).collect()
    val probed = celled.map(r => r.getLong(0) ->
      Set(r.getInt(2), r.getInt(3))).toMap
    val homeCell = celled.map(r => r.getLong(0) -> r.getInt(2)).toMap
    val vecOf = celled.map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toIndexedSeq).toMap
    // every returned neighbor lives in one of the query's probed cells
    ivfpq.foreach { r =>
      assert(probed(r.getLong(0)).contains(homeCell(r.getLong(2))),
        s"query ${r.getLong(0)} neighbor ${r.getLong(2)} outside probed cells")
    }
    // driver-side recompute of the residual chain: neighbor codes are
    // the argmin over shifted centroids C(home cell) + cb; the query's
    // LUT is the residual ADC w.r.t. the SAME cell — the returned
    // distance must equal this to the rounded 6 places, pair for pair
    def dot8(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
    def sub8(v: IndexedSeq[Float], m: Int) =
      (0 until 8).map(i => v(m * 8 + i).toDouble)
    def centSub(c: Int, m: Int) =
      (0 until 8).map(i => FixedIvfCentroids(c)(m * 8 + i).toDouble)
    def cbSub(m: Int, j: Int) =
      (0 until 8).map(i => pqWeight(m, j, i).toFloat.toDouble)
    def residualCodes(v: IndexedSeq[Float], cell: Int): Seq[Int] =
      (0 until PqSub).map { m =>
        val s = sub8(v, m)
        val d = (0 until PqCent).map { j =>
          residualShiftNorm2(FixedIvfCentroids, FixedPqCodebook, cell, m, j) -
            2.0 * dot8(s, centSub(cell, m)) - 2.0 * dot8(s, cbSub(m, j))
        }
        d.indexOf(d.min)
      }
    def residualAdc(q: IndexedSeq[Float], cell: Int, codes: Seq[Int]): Double =
      (0 until PqSub).map { m =>
        val s = sub8(q, m)
        val j = codes(m)
        dot8(s, s) - 2.0 * dot8(s, centSub(cell, m)) -
          2.0 * dot8(s, cbSub(m, j)) +
          residualShiftNorm2(FixedIvfCentroids, FixedPqCodebook, cell, m, j)
      }.reduceLeft(_ + _)
    ivfpq.foreach { r =>
      val (q, n, got) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val cell = homeCell(n)
      val want = math.rint(
        residualAdc(vecOf(q), cell, residualCodes(vecOf(n), cell)) * 1e6) / 1e6
      assert(got == want, s"pair ($q, $n): got $got, recomputed $want")
    }
  }

  test("pqRecallReport recounts the probes' hits against exact L2 exactly") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rep = SimilarityOps.pqRecallReport(emb, nQueries = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(rep.size == 5)
    // independent recount: intersect each probe's pair set with an
    // exact-L2 top-k computed via the brute path's own arithmetic
    val flat = SimilarityOps.pqAnn(emb, nQueries = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val routed = SimilarityOps.ivfPqAnn(emb, nQueries = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    for ((q, (nExact, hitPq, hitIvfpq, rPq, rIvfpq)) <- rep) {
      assert(nExact == 3L)
      assert(rPq == hitPq * 1000000L / 3L && rIvfpq == hitIvfpq * 1000000L / 3L)
      assert(hitPq <= 3L && hitIvfpq <= 3L)
      // hits can only come from pairs the probes actually returned
      assert(hitPq <= flat.count(_._1 == q) && hitIvfpq <= routed.count(_._1 == q))
    }
  }

  test("trainPqCodebook lifts shortlist+rerank recall past the floor on real data") {
    // the quality gate the training exists to pass: trained codebook +
    // 32-candidate exact re-rank must reach ≥50% top-3 recall AND beat
    // the fixed pseudo-random baseline (~12% flat / ~28% reranked here)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val row = SimilarityOps.pqTrainedRecall(emb).collect().head
    assert(row.getAs[Long]("n_queries") == 20L)
    assert(row.getAs[Long]("n_exact") == 60L)
    assert(row.getAs[Boolean]("trained_ge_floor"),
      "trained PQ recall must clear the 50% floor")
    assert(row.getAs[Boolean]("trained_ge_fixed"))
  }

  test("trainPqCodebook is deterministic and keeps the codebook geometry") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb1 = SimilarityOps.trainPqCodebook(emb, iters = 2)
    val cb2 = SimilarityOps.trainPqCodebook(emb, iters = 2)
    assert(cb1 == cb2, "same data must train the same codebook")
    assert(cb1.length == SimilarityOps.PqSub)
    assert(cb1.forall(_.length == SimilarityOps.PqCent))
    assert(cb1.forall(_.forall(_.length == 8)))
    assert(cb1 != SimilarityOps.FixedPqCodebook, "training must move centroids")
  }

  test("filteredIvfPqAnn equals the unfiltered probe over the label-restricted corpus") {
    // cell assignment and PQ coding are per-row, so pre-filtering the
    // probe by label must give EXACTLY the result of running the
    // unfiltered IVF-PQ probe on the same-label subset of the corpus
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = SimilarityOps.filteredIvfPqAnn(emb, nQueries = 20, k = 3).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(labels(r.getLong(2)) == labels(r.getLong(0)),
        s"query ${r.getLong(0)} got a neighbor with a different label")
    }
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSet
    val expect = labels.values.toSeq.distinct.flatMap { l =>
      SimilarityOps.ivfPqAnn(
        emb.filter(org.apache.spark.sql.functions.col("label") === l),
        nQueries = 20, k = 3).collect()
    }.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expect,
      s"filtered probe diverged: only-got=${(got -- expect).take(3)} " +
        s"only-expected=${(expect -- got).take(3)}")
  }

  test("pqRerankAnn re-ranks its own shortlist by exact L2") {
    // every reranked neighbor must come from the ADC shortlist, and the
    // per-query ranks must be 1..k ordered by the exact distance
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val shortlist = SimilarityOps.pqAnn(emb, nQueries = 5, k = 32).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val out = SimilarityOps.pqRerankAnn(emb, nQueries = 5).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(shortlist.contains((r.getLong(0), r.getLong(2))),
        "rerank must draw from the ADC shortlist")
    }
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to rows.length))
      assert(sorted.map(_.getDouble(3)).toSeq ==
        sorted.map(_.getDouble(3)).sorted.toSeq)
    }
  }

  test("embedClipBounds: exact p1/p99 ranks and strictly-outside mass") {
    // 100 one-dim vectors at milli 0..99 (offset +0.5 keeps the float
    // truncation away from integer boundaries): p1 rank = 1 → lo = 0,
    // p99 rank = 99 → hi = 98, exactly one value (99) above.
    val df = vecs((0L until 100L).map(i =>
      i -> Seq((i + 0.5f) / 1000f)): _*)
    val r = SimilarityOps.embedClipBounds(df).collect()
    assert(r.length == 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3), r(0).getLong(4), r(0).getLong(5)) ==
      ((1L, 100L, 0L, 98L, 0L, 1L)))
  }
}
