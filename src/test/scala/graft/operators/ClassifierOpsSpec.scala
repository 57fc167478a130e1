package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // a mixed-quality corpus: gate-passing prose vs short / low-stopword /
  // special-heavy rejects, with enough rows for training to move
  private def corpus = {
    val good = (1L to 40L).map { i =>
      (i, ("the quick brown fox jumps over the lazy dog and runs " * (2 + (i % 4).toInt)).trim)
    }
    val short = (41L to 55L).map(i => (i, s"tiny doc $i"))
    val nostop = (56L to 70L).map { i =>
      (i, ("zebra quartz vortex jumbo glyph nymph " * 5).trim + s" $i")
    }
    val special = (71L to 80L).map { i =>
      (i, ("ok@@@!! $$%% " * 12).trim + s" $i")
    }
    docs((good ++ short ++ nostop ++ special): _*)
  }

  test("aucMicro reproduces the hand-computed rank-sum AUC with ties") {
    // scores/labels: (1,n) (1,y) (2,n) (3,y):
    // U = 0.5 (tied neg at 1) + 2 (both negs below 3) = 2.5 → AUC 0.625
    val scored = Seq((1L, false), (1L, true), (2L, false), (3L, true))
      .toDF("s", "y")
    assert(ClassifierOps.aucMicro(scored, "auc").head().getLong(0) == 625000L)
    // perfect separation → exactly 1.0
    val sep = Seq((1L, false), (2L, false), (3L, true), (4L, true)).toDF("s", "y")
    assert(ClassifierOps.aucMicro(sep, "auc").head().getLong(0) == 1000000L)
  }

  test("features quantize onto the integer grid and null/blank text maps to zeros") {
    val df = docs((1L, ("the a of and to in is word " * 4).trim))
      .unionByName(Seq((2L, null.asInstanceOf[String], "en", "src", 0L),
        (3L, "", "en", "src", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = ClassifierOps.features(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    // null text: every feature 0 (all-NULL measures coalesce), label false
    Seq("f_len", "f_special", "f_stop", "f_awl")
      .foreach(c => assert(out(2L).getAs[Long](c) == 0L, s"$c of null doc"))
    assert(!out(2L).getAs[Boolean]("y"))
    // blank text: zero counts except avg_word_len, which the formula
    // pins at 1.0 for the empty doc ((0 − (0−1)) / max(0,1)) → 500
    Seq("f_len", "f_special", "f_stop")
      .foreach(c => assert(out(3L).getAs[Long](c) == 0L, s"$c of blank doc"))
    assert(out(3L).getAs[Long]("f_awl") == 500L)
    assert(!out(3L).getAs[Boolean]("y"))
    // real doc: 32 tokens → f_len = 640; bounded grid everywhere
    assert(out(1L).getAs[Long]("f_len") == 640L)
    out.values.foreach { r =>
      assert(r.getAs[Long]("f_special") >= 0 && r.getAs[Long]("f_special") <= 10000)
      assert(r.getAs[Long]("f_awl") >= 0 && r.getAs[Long]("f_awl") <= 10000)
    }
  }

  test("training is deterministic across partitionings (integer-quantized sums)") {
    val feats = ClassifierOps.features(corpus)
    val w7 = ClassifierOps.trainQualityLr(feats.repartition(7))
    val w3 = ClassifierOps.trainQualityLr(feats.repartition(3))
    assert(w7.toSeq == w3.toSeq, "weights must be bit-identical")
  }

  test("trained model clears the AUC floor and beats the fixed baseline") {
    val out = ClassifierOps.qualityClassifierScore(corpus).head()
    assert(out.getAs[Long]("n_docs") == 80L)
    assert(out.getAs[Long]("n_keep") == 40L)
    assert(out.getAs[Long]("n_drop") == 40L)
    assert(out.getAs[Boolean]("trained_auc_ge_floor"),
      "trained AUC must clear the floor on separable gate labels")
    assert(out.getAs[Boolean]("trained_ge_fixed"))
    // the fixed baseline is informative on this corpus (the toy classes
    // are linearly separable, so it may even reach 1.0 — the interesting
    // gap shows on the real testdata, where it sits near 0.73)
    val fixed = out.getAs[Long]("auc_fixed_micro")
    assert(fixed > 400000L && fixed <= 1000000L, s"fixed AUC $fixed")
  }

  test("qualityCalibration partitions the corpus into consistent deciles") {
    val out = ClassifierOps.qualityCalibration(corpus).collect()
    val feats = ClassifierOps.features(corpus)
    val nDocs = feats.count()
    val nKeep = feats.filter(col("y")).count()
    // every doc lands in exactly one decile; keeps are conserved
    assert(out.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(out.map(_.getAs[Long]("n_keep")).sum == nKeep)
    out.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert(d >= 1 && d <= 10, s"decile out of range: $r")
      assert(r.getAs[Long]("keep_rate_micro") ==
        r.getAs[Long]("n_keep") * 1000000L / r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("bucket_lo") <= r.getAs[Long]("bucket_hi"))
    }
    // deciles' score ranges are disjoint and ordered
    val sorted = out.sortBy(_.getAs[Long]("decile"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("bucket_hi") < b.getAs[Long]("bucket_lo"),
          "decile score ranges must be disjoint and increasing")
      case _ => ()
    }
    // the fixed ranker is informative on this corpus: the top decile's
    // keep rate beats the bottom decile's
    assert(sorted.last.getAs[Long]("keep_rate_micro") >
      sorted.head.getAs[Long]("keep_rate_micro"))
  }

  test("a degenerate single-class corpus still trains without diverging") {
    val allGood = docs((1L to 20L).map { i =>
      (i, ("the quick brown fox jumps over the lazy dog and runs " * 3).trim)
    }: _*)
    val w = ClassifierOps.trainQualityLr(ClassifierOps.features(allGood))
    assert(w.forall(v => !v.isNaN && !v.isInfinite && math.abs(v) < 100.0),
      s"ridge must keep weights bounded: ${w.mkString(",")}")
  }
}
