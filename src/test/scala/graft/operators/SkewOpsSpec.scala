package graft.operators

import graft.SparkSpec

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on a skewed key distribution") {
    // hot key 1L carries most rows
    val left = (Seq.fill(500)(1L) ++ (2L to 50L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val right = (1L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).orderBy("k", "v")
      .collect().map(_.toString).toSeq
    val salted = SkewOps.saltedJoin(left, right, "k").orderBy("k", "v")
      .collect().map(_.toString).toSeq
    assert(salted == plain)
    assert(salted.size == 549)
  }

  test("keySkewReport measures the hot key, nulls, and uniform baselines") {
    // 10 rows: key 7 holds 5 of them, two nulls, three singletons
    val skewed = (Seq.fill(5)(Some(7L)) ++ Seq(None, None) ++
      Seq(Some(1L), Some(2L), Some(3L))).map(Tuple1(_)).toDF("k")
    val uniform = (1L to 8L).map(Tuple1(_)).toDF("u")
    val out = SkewOps.keySkewReport(Seq(
      ("s.k", skewed, "k"), ("u.u", uniform, "u")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getLong(5), r.getLong(6)))).toMap
    // hot key 7: 5/10 rows over 5 distinct keys (incl. the null group)
    assert(out("s.k") == ((10L, 5L, 5L, "7", 500000L, 2500000L)))
    // uniform: every key once → skew factor exactly 10⁶, min key wins
    assert(out("u.u") == ((8L, 8L, 1L, "1", 125000L, 1000000L)))
  }
}
