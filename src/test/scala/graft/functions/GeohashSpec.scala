package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GeohashExpr correctness: against an independent bisection-loop
  * implementation (the textbook algorithm with `>= mid`, which the
  * closed-form floor scaling must equal), plus edge clamps and SQL
  * registration.
  */
class GeohashSpec extends SparkSpec {

  /** Independent reference: classic bisection with >= (floor semantics). */
  private def bisect(lat: Double, lon: Double, precision: Int): String = {
    val b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    var (latLo, latHi) = (-90.0, 90.0)
    var (lonLo, lonHi) = (-180.0, 180.0)
    val sb = new StringBuilder
    var bits = 0; var ch = 0; var even = true
    while (sb.length < precision) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch |= (1 << (4 - bits)); lonLo = mid } else lonHi = mid
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch |= (1 << (4 - bits)); latLo = mid } else latHi = mid
      }
      even = !even
      bits += 1
      if (bits == 5) { sb.append(b32(ch)); bits = 0; ch = 0 }
    }
    sb.toString
  }

  test("matches independent bisection implementation on random coords") {
    val rng = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val lat = rng.nextDouble() * 179.98 - 89.99
      val lon = rng.nextDouble() * 359.98 - 179.99
      // closed-form floor scaling can differ from bisection only when
      // accumulated midpoint arithmetic hits representability limits;
      // for randomly-drawn doubles they agree
      assert(GeohashEncode.encode(lat, lon, 7).toString == bisect(lat, lon, 7),
        s"($lat, $lon)")
    }
  }

  test("well-known value: Jutland q-region") {
    // geohash.org canonical example: (57.64911, 10.40744) -> u4pruydqqvj
    assert(GeohashEncode.encode(57.64911, 10.40744, 11).toString == "u4pruydqqvj")
  }

  test("lower precisions are exact prefixes (grid-blocking relies on it)") {
    val rng = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val lat = rng.nextDouble() * 179.98 - 89.99
      val lon = rng.nextDouble() * 359.98 - 179.99
      val p7 = GeohashEncode.encode(lat, lon, 7).toString
      (1 to 6).foreach { p =>
        assert(GeohashEncode.encode(lat, lon, p).toString == p7.take(p))
      }
    }
  }

  test("clamps out-of-range coordinates instead of overflowing") {
    assert(GeohashEncode.encode(95.0, 185.0, 7).toString ==
      GeohashEncode.encode(90.0, 180.0, 7).toString)
  }

  test("column API and SQL registration agree") {
    import spark.implicits._
    val df = Seq((40.7128, -74.0060)).toDF("lat", "lon")
    val viaColumn = df.select(Geohash.geohash(col("lat"), col("lon"), 7)).head.getString(0)
    df.createOrReplaceTempView("coords")
    val viaSql = spark.sql("SELECT graft_geohash(lat, lon, 7) FROM coords").head.getString(0)
    assert(viaColumn == viaSql)
    assert(viaColumn == bisect(40.7128, -74.0060, 7))
  }

  test("null propagates") {
    import spark.implicits._
    val df = Seq((Some(40.0), None: Option[Double])).toDF("lat", "lon")
    assert(df.select(Geohash.geohash(col("lat"), col("lon"), 7)).head.isNullAt(0))
  }
}
