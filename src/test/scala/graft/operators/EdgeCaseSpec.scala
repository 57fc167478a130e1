package graft.operators

import graft.SparkSpec

/** Null / empty / degenerate inputs through the text and dedup family —
  * at 100 TB every pathological row shape exists somewhere in the corpus.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val degenerate = Seq(
    (1L, null.asInstanceOf[String], "en", "src", 0L),
    (2L, "", "en", "src", 0L),
    (3L, "   ", "en", "src", 3L),
    (4L, "ab", "en", "src", 2L), // shorter than one shingle
    (5L, "the quick brown fox jumps over everything", "en", "src", 41L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("token/quality/fingerprint ops survive null and blank text") {
    assert(TextOps.tokenCount(degenerate).count() == 5)
    assert(TextOps.qualityScore(degenerate).count() == 5)
    assert(TextOps.langId(degenerate).count() == 5)
    val blankTokens = TextOps.tokenCount(degenerate)
      .filter($"doc_id" <= 3).collect()
    // null text propagates null counts; empty/whitespace normalize to 0
    assert(blankTokens.filter(!_.isNullAt(1)).forall(_.getLong(1) == 0L))
  }

  test("dedup family drops degenerate docs instead of crashing") {
    assert(DedupOps.withMinhashSignature(degenerate).count() == 1) // only doc 5
    assert(DedupOps.dedupMinhashLsh(degenerate).count() == 0)
    assert(DedupOps.dedupNgramJaccard(degenerate).count() == 0)
    assert(DedupOps.dedupSimhash(degenerate).count() == 0)
    assert(DedupOps.dedupExact(degenerate).count() >= 3) // null+groups still hash
  }

  test("operators accept empty inputs") {
    val empty = degenerate.limit(0)
    assert(TextOps.bigramTopK(empty).count() == 0)
    assert(DedupOps.dedupMinhashLsh(empty).count() == 0)
    assert(TextOps.docFingerprint(empty).count() == 0)
  }
}
