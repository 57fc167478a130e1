package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "alpha beta gamma", "en", "web", 16L),
    (1L, "delta", "en", "web", 5L),
    (2L, "epsilon zeta eta theta iota kappa", "en", "book", 33L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("multimodalMeta is pure column work — no typed serialization in the plan") {
    val plan = MultimodalOps.multimodalMeta(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject"),
      "meta must not leave codegen for column-expressible work")
    assert(!plan.contains("MapPartitions"))
  }

  test("column meta and the codec-slot decode path agree") {
    val cols = MultimodalOps.multimodalMeta(docs)
      .orderBy("doc_id").collect().map(_.toSeq)
    val typed = MultimodalOps.decodeWithCodec(spark, docs)
      .toDF().orderBy("doc_id").collect().map(_.toSeq)
    assert(cols.toSeq == typed.toSeq)
  }

  test("resizePlan fits the longest side into the target box") {
    val r = MultimodalOps.resizePlan(docs, targetBox = 96)
      .filter(col("doc_id") === 0L).head
    val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
    val (tw, th) = (r.getAs[Int]("target_w"), r.getAs[Int]("target_h"))
    assert(math.max(tw, th) <= 96)
    val scale = r.getAs[Long]("scale_pct")
    assert(tw == w * scale / 100 && th == h * scale / 100)
  }

  test("frameSample emits every 5th frame with integer byte offsets") {
    val out = MultimodalOps.frameSample(docs).collect()
    // doc_id 2 is the only video row (doc_id % 3 == 2)
    assert(out.forall(_.getLong(0) == 2L))
    assert(out.map(_.getInt(1)).toSeq.sorted == out.map(_.getInt(1)).toSeq)
    assert(out.map(_.getInt(1)).forall(_ % 5 == 0))
  }

  test("blockhash60: empty → sentinel; local edit → small hamming; unrelated → large") {
    import graft.functions.BlockHashUtil.blockhash60
    assert(blockhash60(Array.emptyByteArray) == Long.MinValue)
    val base = ("the quick brown fox jumps over the lazy dog " * 8).getBytes("UTF-8")
    val edited = base.clone(); edited(10) = 'X'.toByte
    val near = java.lang.Long.bitCount(blockhash60(base) ^ blockhash60(edited))
    assert(near <= 3, s"one-byte edit should perturb few blocks, got $near")
    val other = ("completely different payload with other content entirely " * 8)
      .getBytes("UTF-8")
    val far = java.lang.Long.bitCount(blockhash60(base) ^ blockhash60(other))
    assert(far > 10, s"unrelated payloads should differ widely, got $far")
  }

  test("multimodalNearDedup surfaces exact and near pairs with the exact flag split") {
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val rows = Seq(
      (0L, base, "en", "web", 1L),                         // image
      (3L, base, "en", "web", 1L),                         // image, exact dup of 0
      (6L, base.updated(10, 'X'), "en", "web", 1L),        // image, near dup of 0
      (1L, "completely different audio payload text here " * 8, "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = MultimodalOps.multimodalNearDedup(rows).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Boolean]("is_exact_dup"), r.getAs[Long]("hamming"))).toSet
    assert(out.exists { case (a, b, ex, h) => a == 0L && b == 3L && ex && h == 0L })
    assert(out.exists { case (a, b, ex, _) => a == 0L && b == 6L && !ex })
    assert(out.exists { case (a, b, ex, _) => a == 3L && b == 6L && !ex })
    assert(out.size == 3) // the audio row pairs with nothing
  }

  test("multimodalDedup groups identical payloads and counts wasted bytes") {
    val withDup = Seq(
      (0L, "same bytes", "en", "web", 10L),
      (3L, "same bytes", "en", "web", 10L),  // same media_type (both % 3 == 0)
      (6L, "same bytes", "en", "web", 10L),
      (1L, "unique", "en", "web", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = MultimodalOps.multimodalDedup(withDup).collect()
    assert(out.length == 1) // the unique payload never surfaces
    val r = out.head
    assert(r.getAs[String]("media_type") == "image")
    assert(r.getAs[Long]("keep_doc_id") == 0L)
    assert(r.getAs[Long]("n_copies") == 3L)
    assert(r.getAs[Long]("wasted_bytes") == 20L) // 2 redundant × 10 bytes
  }

  test("multimodalDedupClusters collapses a dup family to one byte-accounted row") {
    // docs 3 and 6 are byte-identical images (doc_id % 3 == 0); the
    // audio/video singletons never enter the pair graph
    val df = Seq(
      (1L, "unrelated audio payload content one", "en", "w", 35L),
      (2L, "some other video payload content two", "en", "w", 36L),
      (3L, "the shared duplicated media payload", "en", "w", 35L),
      (6L, "the shared duplicated media payload", "en", "w", 35L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = MultimodalOps.multimodalDedupClusters(df).collect()
    assert(out.length == 1)
    val r = out(0)
    val len = "the shared duplicated media payload".getBytes("UTF-8").length
    assert(r.getAs[String]("media_type") == "image")
    assert(r.getAs[Long]("cluster_id") == 3L)
    assert(r.getAs[Long]("n_members") == 2L)
    assert(r.getAs[Long]("bytes_total") == 2L * len)
    assert(r.getAs[Long]("bytes_wasted") == len.toLong)
  }
}
