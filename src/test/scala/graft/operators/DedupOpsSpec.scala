package graft.operators

import graft.SparkSpec

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private val base = "the quick brown fox jumps over the lazy dog again and again"

  test("dedupExact groups identical normalized content") {
    val df = docs(1L -> base, 2L -> (base + " extra"), 3L -> s"  $base  ")
    val out = DedupOps.dedupExact(df).orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out.head.getLong(0) == 1L && out.head.getLong(2) == 2L) // 1 & 3 collapse
  }

  test("dedupMinhashLsh finds identical docs with est 1.0") {
    val df = docs(1L -> base, 2L -> base, 3L -> "completely different words entirely")
    val out = DedupOps.dedupMinhashLsh(df, minEst = 0.9).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L)
    assert(out.head.getDouble(2) == 1.0)
  }

  test("dedupNgramJaccard computes exact overlap on near-dups") {
    val df = docs(1L -> base, 2L -> (base + " x"), 3L -> "zzz yyy xxx www vvv")
    val out = DedupOps.dedupNgramJaccard(df, tau = 0.5).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getDouble(2) > 0.8)
  }

  test("dedupSimhash pairs identical docs at hamming 0") {
    val df = docs(1L -> base, 2L -> base, 3L -> "unrelated corpus entry entirely different")
    val out = DedupOps.dedupSimhash(df).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L)
    assert(out.head.getLong(2) == 0L)
  }

  test("withMinhashSignature drops docs shorter than one shingle") {
    val df = docs(1L -> "abc", 2L -> base)
    assert(DedupOps.withMinhashSignature(df).count() == 1)
  }
}
