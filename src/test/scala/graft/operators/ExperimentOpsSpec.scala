package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class ExperimentOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, t: Long, user: Long, typ: String, v: Double) =
    (id, new Timestamp(t * 1000L), user, typ, v, "{}")

  test("abCupedReadout: theta pins the pre/post boundary, Y=X degenerates to 0") {
    // t0 = 0; split at exactly 15 days. u1 purchases $1 pre and $2 AT
    // the split second (>= split → post): X=100c, Y=200c. u2 never
    // purchases: X=Y=0. Pooled: vx=10000, cxy=20000 → θ=2; vy=40000 →
    // ρ² = 4·10⁸/(10⁴·4·10⁴) = 1. A boundary purchase mis-bucketed to
    // the pre period would flip θ to 0.
    val split = 15L * 86400L
    val evs = Seq(
      ev(1, 0, 1, "view", 0.0),
      ev(2, 100, 1, "purchase", 1.0),
      ev(3, split, 1, "purchase", 2.0),
      ev(4, 50, 2, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = ExperimentOps.abCupedReadout(evs).collect()(0)
    assert(r.getAs[Long]("n_users_a") + r.getAs[Long]("n_users_b") == 2L)
    assert(r.getAs[Double]("theta_r6") == 2.0)
    assert(r.getAs[Double]("var_reduction_r6") == 1.0)
    // Y = X exactly per user → θ = 1 and the CUPED effect collapses to
    // 0 bit-exactly (raw effect minus 1·the same arm X difference)
    val same = Seq(
      ev(1, 0, 1, "view", 0.0),
      ev(2, 100, 1, "purchase", 3.0), ev(3, split + 5, 1, "purchase", 3.0),
      ev(4, 200, 2, "purchase", 7.0), ev(5, split + 9, 2, "purchase", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r2 = ExperimentOps.abCupedReadout(same).collect()(0)
    assert(r2.getAs[Double]("theta_r6") == 1.0)
    assert(r2.getAs[Long]("n_users_a") + r2.getAs[Long]("n_users_b") == 2L)
    if (r2.getAs[Long]("n_users_a") > 0 && r2.getAs[Long]("n_users_b") > 0)
      assert(r2.getAs[Double]("effect_cuped_cents_r4") == 0.0)
    // constant covariate → zero variance → θ and the CUPED leg NULL,
    // the raw effect still reported
    val const = Seq(
      ev(1, 0, 1, "view", 0.0),
      ev(2, split + 5, 1, "purchase", 3.0),
      ev(3, split + 9, 2, "purchase", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r3 = ExperimentOps.abCupedReadout(const).collect()(0)
    assert(r3.isNullAt(r3.fieldIndex("theta_r6")))
    assert(r3.isNullAt(r3.fieldIndex("effect_cuped_cents_r4")))
  }

  /** BigInt mirror of the exact Wilson formula (z = 49/25). */
  private def wilson(n: Long, c: Long): (Long, Long) = {
    def isqrt(x: BigInt): BigInt = {
      var s = BigInt(math.sqrt(x.toDouble).toLong)
      while ((s + 1) * (s + 1) <= x) s += 1
      while (s * s > x) s -= 1
      s
    }
    val an = (BigInt(2500) * c * (n - c) + BigInt(2401) * n) * n
    val s = isqrt(an)
    val num = BigInt(1250) * n * c + BigInt(2401) * n
    val den = BigInt(1250) * n * n + BigInt(4802) * n
    (((num - 49 * s) * 1000000 / den).toLong,
      ((num + 49 * s) * 1000000 / den).toLong)
  }

  test("abWilsonBounds: exact-integer Wilson intervals per arm") {
    import org.apache.spark.sql.functions.lit
    // 60 users, one event each; users 1..12 purchase, the rest view
    val evs = (1 to 60).map { u =>
      (u.toLong, new Timestamp(1704067200000L + u * 1000L), u.toLong,
        if (u <= 12) "purchase" else "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = ExperimentOps.abWilsonBounds(evs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out.keySet == Set(0L, 1L))
    for ((_, (n, c, p, lo, hi)) <- out) {
      assert(p == c * 1000000L / n)
      val (elo, ehi) = wilson(n, c)
      assert((lo, hi) == (elo, ehi))
      // Wilson containment: p̂ strictly inside, bounds inside [0, 1]
      assert(lo <= p && p <= hi && lo >= 0L && hi <= 1000000L)
      // sanity vs the textbook double formula; the floor-isqrt shifts a
      // bound by at most 49/den (one integer step of s), plus 1 for the
      // two independent floors
      val (nn, cc) = (n.toDouble, c.toDouble)
      val z2 = 3.8416
      val ctr = (cc + z2 / 2) / (nn + z2)
      val rad = 1.96 * math.sqrt(cc * (nn - cc) / nn + z2 / 4) / (nn + z2)
      val slack = 49.0 * 1e6 / (1250.0 * nn * nn + 4802.0 * nn) + 2
      assert(math.abs(lo - 1e6 * (ctr - rad)) <= slack)
      assert(math.abs(hi - 1e6 * (ctr + rad)) <= slack)
    }
    // boundary exactness: all-convert → hi = 10⁶ exactly; none → lo = 0
    val all = evs.withColumn("event_type", lit("purchase"))
    assert(ExperimentOps.abWilsonBounds(all).collect()
      .forall(r => r.getLong(5) == 1000000L))
    val none = evs.withColumn("event_type", lit("view"))
    assert(ExperimentOps.abWilsonBounds(none).collect()
      .forall(r => r.getLong(4) == 0L))
  }
}
