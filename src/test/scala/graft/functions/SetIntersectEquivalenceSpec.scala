package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 set-similarity rewrites replaced physical computation only —
  * results must be bit-identical:
  *  - [[DistinctShinglesExpr]] now emits SORTED arrays and the verifies
  *    count intersections with [[SortedIntersectCountExpr]]'s linear
  *    merge instead of size(array_intersect(...));
  *  - MinHash signatures derive from the distinct-shingle arrays via
  *    [[MinhashFromShinglesExpr]] (min over the distinct set == min over
  *    the positional multiset).
  * Each test pins the new form against the old one on deterministic
  * synthetic text that includes the degenerate cases (empty, shorter
  * than one shingle, all-identical characters, heavy repetition).
  */
class SetIntersectEquivalenceSpec extends SparkSpec {

  // deterministic texts: repetition-heavy, shared fragments, degenerates
  private val texts: Seq[String] = {
    val base = Seq(
      "", "abc", "abcd", "aaaaaaaaaaaa", "the quick brown fox",
      "the quick brown fox jumps over the lazy dog",
      "abab" * 12, "license boilerplate header " * 5)
    val rnd = base ++ (0 until 40).map { i =>
      (0 until 30 + (i * 13) % 50)
        .map(j => ('a' + ((i * 31 + j * 17) % 9)).toChar).mkString
    }
    rnd
  }

  private def docs = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("sortedIntersectCount over sorted shingle sets == size(array_intersect)") {
    val sets = docs.select(col("doc_id"),
      MinhashSig.distinctShingles(col("text"), 5).as("xs"))
      .filter(col("xs").isNotNull)
    val pairs = sets.select(col("doc_id").as("a"), col("xs").as("xs_a"))
      .crossJoin(sets.select(col("doc_id").as("b"), col("xs").as("xs_b")))
    val rows = pairs.select(col("a"), col("b"),
      MinhashSig.sortedIntersectCount(col("xs_a"), col("xs_b")).as("merged"),
      size(array_intersect(col("xs_a"), col("xs_b"))).cast("long").as("legacy"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"pair (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("distinct-shingle arrays are sorted ascending") {
    val rows = docs.select(
      MinhashSig.distinctShingles(col("text"), 5).as("xs"))
      .filter(col("xs").isNotNull).collect()
    rows.foreach { r =>
      val xs = r.getSeq[Long](0)
      assert(xs == xs.sorted, s"unsorted: $xs")
      assert(xs.distinct == xs, s"duplicates: $xs")
    }
  }

  test("signatureFromShingles(distinctShingles(t)) == signature(t)") {
    val both = docs.select(
      MinhashSig.signature(col("text"), 5).as("direct"),
      MinhashSig.signatureFromShingles(
        MinhashSig.distinctShingles(col("text"), 5)).as("derived"))
      .filter(col("direct").isNotNull)
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }
}
