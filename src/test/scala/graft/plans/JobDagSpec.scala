package graft.plans

import graft.SparkSpec
import graft.plans.JobDag._

class JobDagSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def names(rs: Seq[Result]) = rs.map(_.name)

  test("warehouse build runs every job in dependency order") {
    var ran = Vector.empty[String]
    val jobs = JobDag.warehouseBuild(spark, dir, df => {
      assert(df.count() > 0)
    }).map(j => j.copy(run = () => { ran :+= j.name; j.run() }))
    val rs = JobDag.run(jobs)
    assert(rs.forall(_.status == Succeeded), rs)
    assert(ran == names(rs).toVector)
    def pos(n: String) = ran.indexOf(n)
    assert(pos("dim_date") < pos("fact_orders"))
    assert(pos("dim_customer_geo") < pos("fact_orders"))
    assert(pos("fact_orders") < pos("fact_lineitem"))
    assert(pos("fact_lineitem") < pos("fk_audit"))
  }

  test("a failed job skips its transitive dependents but not independent branches") {
    var ran = Vector.empty[String]
    def ok(n: String, deps: String*) = Job(n, deps, () => ran :+= n)
    val boom = Job("dim_date", Nil,
      () => throw new RuntimeException("source missing"), retries = 0)
    val rs = JobDag.run(Seq(
      boom, ok("dim_customer_geo"),
      ok("fact_orders", "dim_date", "dim_customer_geo"),
      ok("fact_lineitem", "fact_orders"),
      ok("geo_audit", "dim_customer_geo")))
    val byName = rs.map(r => r.name -> r.status).toMap
    assert(byName("dim_date").isInstanceOf[Failed])
    // transitive skip names the ROOT failure, not the intermediate skip
    assert(byName("fact_orders") == Skipped("dim_date"))
    assert(byName("fact_lineitem") == Skipped("dim_date"))
    // the independent branch still ran to completion
    assert(byName("dim_customer_geo") == Succeeded)
    assert(byName("geo_audit") == Succeeded)
    assert(ran == Vector("dim_customer_geo", "geo_audit"))
  }

  test("a transiently-failing job is retried and succeeds") {
    var attempts = 0
    val flaky = Job("flaky", Nil, () => {
      attempts += 1
      if (attempts == 1) throw new RuntimeException("transient")
    }, retries = 1)
    val rs = JobDag.run(Seq(flaky, Job("after", Seq("flaky"), () => ())))
    assert(rs.forall(_.status == Succeeded))
    assert(attempts == 2)
  }

  test("retries exhaust: attempts are counted and the failure is terminal") {
    var attempts = 0
    val dead = Job("dead", Nil, () => {
      attempts += 1; throw new RuntimeException(s"always ($attempts)")
    }, retries = 2)
    val rs = JobDag.run(Seq(dead))
    rs.head.status match {
      case Failed(e, n) =>
        assert(n == 3 && attempts == 3)
        assert(e.getMessage.contains("always"))
      case other => fail(s"expected Failed, got $other")
    }
  }

  test("malformed graphs are rejected before anything runs") {
    var ran = false
    val r = () => { ran = true }
    intercept[IllegalArgumentException] {
      JobDag.run(Seq(Job("a", Seq("ghost"), r)))
    }
    intercept[IllegalArgumentException] {
      JobDag.run(Seq(Job("a", Seq("b"), r), Job("b", Seq("a"), r)))
    }
    intercept[IllegalArgumentException] {
      JobDag.run(Seq(Job("a", Nil, r), Job("a", Nil, r)))
    }
    assert(!ran)
  }

  test("execution order is deterministic: lexicographic among ready jobs") {
    def noop(n: String, deps: String*) = Job(n, deps, () => ())
    val jobs = Seq(noop("zeta"), noop("alpha"), noop("mid", "zeta", "alpha"))
    assert(names(JobDag.run(jobs)) == Seq("alpha", "zeta", "mid"))
    assert(names(JobDag.run(jobs.reverse)) == Seq("alpha", "zeta", "mid"))
  }
}
