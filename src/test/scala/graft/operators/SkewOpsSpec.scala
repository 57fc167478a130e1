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
}
