package graft.plans

import graft.SparkSpec
import graft.functions.{Geohash, GeohashEncode}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The geohash-prefix → bounding-box optimizer rule: exact results,
  * pushed scan filters, and safety at grid edges / clamped coordinates.
  */
class GeohashPushdownSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_geo").toString
    // a lat/lon grid around New York plus far-away and out-of-range rows
    val rows = (for {
      i <- 0 until 40; j <- 0 until 40
    } yield ((i * 40 + j).toLong, 40.0 + i * 0.05, -74.5 + j * 0.05)) ++
      Seq((9001L, -33.86, 151.21), // Sydney
        (9002L, -95.0, -190.0),    // out of range: clamps into the 0-cell
        (9003L, 51.5, -0.12),      // London
        (9004L, Double.NaN, -74.0)) // NaN lat: encodes into lat-cell 0
    rows.toDF("id", "lat", "lon").write.parquet(s"$d/geo")
    d
  }

  private def geo = spark.read.parquet(s"$dir/geo")

  private def expected(prefix: String): Set[Long] =
    geo.collect().filter { r =>
      GeohashEncode.encode(r.getDouble(1), r.getDouble(2), 7)
        .toString.startsWith(prefix)
    }.map(_.getLong(0)).toSet

  test("prefix filter matches brute force AND pushes lat/lon ranges to the scan") {
    val q = geo.filter(Geohash.geohash(col("lat"), col("lon"), 7)
      .startsWith("dr"))
    assert(q.collect().map(_.getLong(0)).toSet == expected("dr"))
    val p = q.queryExecution.executedPlan.toString
    // the PushedFilters list renders truncated, so assert the lat bound
    // reached the scan and all four range conjuncts exist in the filter
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(lat"),
      s"bounding box must reach the parquet scan:\n${p.take(800)}")
    assert("lat#\\d+ >= ".r.findFirstIn(p).isDefined &&
      "lat#\\d+ <= ".r.findFirstIn(p).isDefined &&
      "lon#\\d+ >= ".r.findFirstIn(p).isDefined &&
      "lon#\\d+ <= ".r.findFirstIn(p).isDefined,
      s"all four range conjuncts must be derived:\n${p.take(800)}")
  }

  test("equality form derives the same pushdown") {
    val target = GeohashEncode.encode(40.7, -74.0, 5).toString
    val q = geo.filter(Geohash.geohash(col("lat"), col("lon"), 5) === target)
    val exact = geo.collect().filter(r =>
      GeohashEncode.encode(r.getDouble(1), r.getDouble(2), 5).toString == target)
      .map(_.getLong(0)).toSet
    assert(q.collect().map(_.getLong(0)).toSet == exact)
    assert(q.queryExecution.executedPlan.toString.contains("GreaterThanOrEqual(lat"))
  }

  test("edge-cell prefixes keep clamped coordinates (no bound on the grid edge)") {
    // row 9002 clamps to the all-zero cell; its prefix filter must still
    // return it, so the 0-cell derives NO lower bounds
    val q = geo.filter(Geohash.geohash(col("lat"), col("lon"), 7)
      .startsWith("00"))
    assert(q.collect().map(_.getLong(0)).toSet == expected("00"))
    assert(q.collect().map(_.getLong(0)).contains(9002L))
  }

  test("NaN coordinates survive the rewrite (0-cell derives no bounds at all)") {
    // NaN lat encodes into lat-cell 0 but fails EVERY comparison — so
    // the 0-cell must derive neither bound, or the rewrite would drop a
    // row the exact predicate accepts
    val nanHash = GeohashEncode.encode(Double.NaN, -74.0, 7).toString
    val q = geo.filter(Geohash.geohash(col("lat"), col("lon"), 7)
      .startsWith(nanHash.take(3)))
    val ids = q.collect().map(_.getLong(0)).toSet
    assert(ids == expected(nanHash.take(3)) && ids.contains(9004L))
  }

  test("boundary coordinates survive the margin (superset box, exact decider)") {
    // points exactly ON prefix-cell boundaries: the widened box must not
    // lose them however the doubles round
    val d2 = Files.createTempDirectory("graft_geo2").toString
    val pts = Seq((1L, 45.0, -90.0), (2L, 45.0, -89.999999), (3L, 44.999999, -90.0))
    pts.toDF("id", "lat", "lon").write.parquet(s"$d2/b")
    val df = spark.read.parquet(s"$d2/b")
    for (prefix <- Seq("c", "cb", "9z", "f0")) {
      val got = df.filter(Geohash.geohash(col("lat"), col("lon"), 6)
        .startsWith(prefix)).collect().map(_.getLong(0)).toSet
      val want = pts.filter { case (_, la, lo) =>
        GeohashEncode.encode(la, lo, 6).toString.startsWith(prefix)
      }.map(_._1).toSet
      assert(got == want, s"prefix $prefix")
    }
  }

  test("illegal and over-long prefixes leave the plan unrewritten but exact") {
    // 'a' and 'i' are not in the geohash alphabet; a prefix longer than
    // the precision can never match
    val q1 = geo.filter(Geohash.geohash(col("lat"), col("lon"), 7)
      .startsWith("ai"))
    assert(q1.count() == 0)
    val q2 = geo.filter(Geohash.geohash(col("lat"), col("lon"), 3)
      .startsWith("dr5ru7x9"))
    assert(q2.count() == 0)
  }
}
