package graft

/** End-to-end smoke: every declared query runs against sf0.001 and the
  * flagship entry returns rows (the driver's t1 contract).
  */
class EntrySmokeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query and vice versa (weaker rows-only ops aside)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without query: ${o.diff(q)}")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      assert(fn(spark, dir).count() >= 0)
    }
  }
}
