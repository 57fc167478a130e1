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
}
