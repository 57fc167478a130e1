package graft.functions

import graft.SparkSpec
import graft.operators.{SimilarityOps, UnigramLmOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The round-14 single-expression encoders (PqEncodeExpr,
  * CellAssignExpr, UnigramSegExpr) replaced wide column-algebra plans
  * for PLAN-handling cost only — results must be bit-identical. Each
  * test here rebuilds the ORIGINAL column form inline (the unigram one
  * from the same *Sql generators the DuckDB oracle still uses) and
  * asserts row-for-row equality on deterministic synthetic data that
  * includes the tie cases the argmin/backpointer rules exist for.
  */
class EncoderEquivalenceSpec extends SparkSpec {
  import SimilarityOps.{Dim, PqSub, PqCent}

  // deterministic synthetic embeddings, incl. an all-zero vector (ties
  // every centroid pair that shares a norm) and exact centroid copies
  private def vecs: DataFrame = {
    import spark.implicits._
    val rows = (0 until 40).map { id =>
      val v = (0 until Dim).map { i =>
        if (id == 0) 0.0f
        else (((id * 31 + i * 7) % 13) - 6).toFloat / 4.0f
      }
      (id.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("PqEncodeExpr matches the 128-score-column argmin form") {
    val cb = SimilarityOps.FixedPqCodebook
    val viaExpr = SimilarityOps.withPqCodes(vecs, cb)
      .select(col("vec_id") +: (0 until PqSub).map(m => col(s"code$m")): _*)
    // the former column algebra, verbatim
    def cbNorm2(m: Int, j: Int): Double =
      cb(m)(j).map(w => w.toDouble * w.toDouble).foldLeft(0.0)(_ + _)
    val scoreCols = for (m <- 0 until PqSub; j <- 0 until PqCent) yield {
      val sub = slice(col("embedding"), m * 8 + 1, 8)
      (lit(cbNorm2(m, j)) - lit(2.0) *
        DotProduct.dotF(sub, typedlit(cb(m)(j)))).as(s"s${m}_$j")
    }
    val scored = vecs.select(col("vec_id") +: scoreCols: _*)
    val codeCols = (0 until PqSub).map { m =>
      val mn = least((0 until PqCent).map(j => col(s"s${m}_$j")): _*)
      (0 until PqCent).foldRight(lit(-1): org.apache.spark.sql.Column) {
        (j, rest) => when(col(s"s${m}_$j") === mn, lit(j)).otherwise(rest)
      }.as(s"code$m")
    }
    val viaColumns = scored.select(col("vec_id") +: codeCols: _*)
    assert(viaExpr.exceptAll(viaColumns).isEmpty &&
      viaColumns.exceptAll(viaExpr).isEmpty)
  }

  test("CellAssignExpr matches the two-layer least/mask column form") {
    // duplicated centroids force exact score ties through both layers
    val cents: Seq[Seq[Float]] = (0 until 8).map { k =>
      val base = k / 2 // pairs of identical centroids
      (0 until Dim).map(i => (((base * 17 + i * 3) % 9) - 4).toFloat / 2.0f)
    }
    val viaExpr = SimilarityOps.withCells(vecs, cents)
      .select("vec_id", "cell", "cell2")
    val n = cents.size
    val scores = cents.zipWithIndex.map { case (w, k) =>
      val norm2 = w.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      (lit(norm2) - lit(2.0) *
        DotProduct.dotF(col("embedding"), typedlit(w))).as(s"s$k")
    }
    val withScores = vecs.select(col("*") +: scores: _*)
    val m = least((0 until n).map(k => col(s"s$k")): _*)
    val cell = (0 until n).foldRight(lit(-1): org.apache.spark.sql.Column) {
      (k, rest) => when(col(s"s$k") === col("__m"), lit(k)).otherwise(rest)
    }
    val masked = (0 until n).map(k =>
      when(col(s"s$k") === col("__m"), lit(Double.MaxValue))
        .otherwise(col(s"s$k")).as(s"t$k"))
    val m2 = least((0 until n).map(k => col(s"t$k")): _*)
    val cell2 = (0 until n).foldRight(lit(-1): org.apache.spark.sql.Column) {
      (k, rest) => when(col(s"t$k") === col("__m2"), lit(k)).otherwise(rest)
    }
    val viaColumns = withScores
      .withColumn("__m", m).withColumn("cell", cell)
      .select(col("*") +: masked: _*)
      .withColumn("__m2", m2).withColumn("cell2", cell2)
      .select("vec_id", "cell", "cell2")
    assert(viaExpr.exceptAll(viaColumns).isEmpty &&
      viaColumns.exceptAll(viaExpr).isEmpty)
  }

  test("UnigramSegExpr matches the unrolled column DP (oracle recurrence)") {
    import spark.implicits._
    import UnigramLmOps.{MaxPieceLen, MaxWordLen, slots, bSql, bpSql, lenSql, pieceColSql, posSql}
    // words with repeated substrings so multi-char pieces tie against
    // chains of shorter ones; vocab gives 'ab'/'aba'/'abab' equal-ish
    // mass to exercise the longest-piece tie rule
    val words = Seq("ababab", "abcabc", "aaaa", "x", "abababababab",
      "bcbcbcab", "cccab").map(w => (w, 1L)).toDF("w", "n")
    val vocabPairs = Seq(
      "a" -> 250000000L, "b" -> 250000000L, "c" -> 125000000L,
      "x" -> 1L, "ab" -> 62500000L, "ba" -> 62500000L, "bc" -> 31250000L,
      "aba" -> 15625000L, "bab" -> 15625000L, "abab" -> 15625000L,
      "cc" -> 15625000L)
    val p = vocabPairs.toDF("piece", "p_nano")
    // the shipped path (expression)
    val vocab = new SegVocab(vocabPairs.map(_._1).toArray,
      vocabPairs.map(_._2).toArray, MaxPieceLen, MaxWordLen)
    val viaExpr = words.select(col("w"),
        UnigramSeg.segment(col("w"), vocab).as("__seg"))
      .select(col("w") +: (1 to MaxWordLen).map(t =>
        element_at(col("__seg"), t).as(s"piece_$t")): _*)
    // the former column form, from the same *Sql generators the oracle uses
    val looked = words
      .select(col("w"), col("n"),
        explode(sequence(lit(1), length(col("w")))).as("j"))
      .select(col("w"), col("n"), col("j"),
        explode(sequence(lit(1), least(lit(MaxPieceLen), col("j")))).as("l"))
      .withColumn("piece", expr("substring(w, j - l + 1, l)"))
      .join(broadcast(p), Seq("piece"), "left")
      .groupBy(col("w"), col("n"))
      .agg(
        max(when(col("j") === slots.head._1 && col("l") === slots.head._2,
          col("p_nano"))).as(s"p_${slots.head._1}_${slots.head._2}"),
        slots.tail.map { case (j, l) =>
          max(when(col("j") === j && col("l") === l, col("p_nano")))
            .as(s"p_${j}_$l")
        }: _*)
    val dp = (1 to MaxWordLen).foldLeft(looked) { (df, j) =>
      df.withColumn(s"b_$j", expr(bSql(j)))
        .withColumn(s"bp_$j", expr(bpSql(j)))
    }
    val rec = (1 to MaxWordLen).foldLeft(
      dp.withColumn("pos_0", expr("CAST(length(w) AS INT)"))) { (df, t) =>
      df.withColumn(s"len_$t", expr(lenSql(t)))
        .withColumn(s"piece_$t", expr(pieceColSql(t)))
        .withColumn(s"pos_$t", expr(posSql(t)))
    }
    val viaColumns = rec.select(col("w") +:
      (1 to MaxWordLen).map(t => col(s"piece_$t")): _*)
    assert(viaExpr.exceptAll(viaColumns).isEmpty &&
      viaColumns.exceptAll(viaExpr).isEmpty)
  }
}
