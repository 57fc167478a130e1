package graft.operators

import graft.functions.Md5Prefix
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture operators: classify the delta between two
  * snapshots of the same keyed table — the nightly "what changed"
  * feed every warehouse publishes downstream (ref: the incremental
  * load loops of nyc_hybrid_etl_pipeline.py:184-223, generalized from
  * append-only to full insert/update/delete detection).
  *
  * Scale: one full-outer hash join on the key — both snapshots shuffle
  * once on the same key, AQE handles skew; no window, no driver state.
  * At 100 TB this is the canonical CDC merge shape (a sort-merge join
  * over two bucketed-by-key snapshots would avoid even the shuffle when
  * both sides come from [[graft.sources.Sinks.writeBucketed]] layouts).
  */
object ChangeOps {

  /** Diff two keyed order snapshots into an insert/update/delete feed.
    * Unchanged rows are dropped (the overwhelming majority at scale —
    * the filter runs post-join, before any further shuffle). Prices are
    * compared in exact cents; the projection emits rounded doubles
    * (decimal outputs are driver-hash-unsafe, SURVEY §6).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      key: String = "o_orderkey"): DataFrame = {
    val o = oldSnap.select(col(key).as("old_key"),
      col("o_orderstatus").as("old_status"), col("price_cents").as("old_cents"))
    val n = newSnap.select(col(key).as("new_key"),
      col("o_orderstatus").as("new_status"), col("price_cents").as("new_cents"))
    o.join(n, col("old_key") === col("new_key"), "full_outer")
      .withColumn("change_type",
        when(col("old_key").isNull, lit("insert"))
          .when(col("new_key").isNull, lit("delete"))
          .when(col("old_status") =!= col("new_status") ||
            col("old_cents") =!= col("new_cents"), lit("update")))
      .filter(col("change_type").isNotNull)
      .select(coalesce(col("old_key"), col("new_key")).as("o_orderkey"),
        col("change_type"), col("old_status"), col("new_status"),
        round(col("old_cents") / 100.0, 2).as("old_price"),
        round(col("new_cents") / 100.0, 2).as("new_price"))
  }

  /** Deterministic snapshot pair derived from `orders`, used by the
    * `snapshot_diff` query: the "old" snapshot drops every 7th key, the
    * "new" snapshot drops every 5th key (inserts + deletes), bumps every
    * 3rd price by exactly 10% in integer cents, and flips every 11th
    * status (updates) — every change class exercised, all arithmetic
    * exact so the oracle reproduces it bit-for-bit.
    */
  def orderSnapshots(orders: DataFrame): (DataFrame, DataFrame) = {
    val base = orders.select(col("o_orderkey"), col("o_orderstatus"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        .as("price_cents"))
    val old = base.filter(col("o_orderkey") % 7 =!= 0)
    val neu = base.filter(col("o_orderkey") % 5 =!= 0)
      .withColumn("price_cents",
        when(col("o_orderkey") % 3 === 0,
          expr("(price_cents * 110) div 100")).otherwise(col("price_cents")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 11 === 0, lit("X"))
          .otherwise(col("o_orderstatus")))
    (old, neu)
  }

  /** Order-invariant table fingerprints — the replication / migration
    * integrity check: does the copy hold EXACTLY the source's rows,
    * without sorting either side? Each row canonicalizes to a
    * delimiter-joined string (decimals and dates stringified, which both
    * engines render identically), hashes to a 60-bit md5-prefix, and the
    * table folds to (row count, XOR of hashes, SUM of hashes mod 10¹⁸).
    * XOR alone is blind to even-multiplicity duplicates; the additive
    * sum catches those — together a practical content checksum.
    *
    * Scale: one projection-only scan per table, fully codegen'd, folded
    * by commutative aggregates (map-side combined, three rows total out,
    * no shuffle beyond the final 1-row combines) — the ONLY shape that
    * verifies a 100 TB copy without moving data. Result is independent
    * of partitioning and row order by construction.
    */
  def tableFingerprint(orders: DataFrame, lineitem: DataFrame,
      customer: DataFrame): DataFrame = {
    val mod = lit(1000000000000000000L).cast("decimal(38,0)")
    def fp(name: String, df: DataFrame, canon: Column): DataFrame =
      df.select(Md5Prefix.md5PrefixLong(canon, 15).as("h"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("xor_fp"),
          (sum(col("h").cast("decimal(38,0)")) % mod).cast("long").as("sum_fp"))
        .select(lit(name).as("table_name"), col("n_rows"), col("xor_fp"),
          col("sum_fp"))
    fp("orders", orders, concat_ws("|",
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").cast("string"),
        to_date(col("o_orderdate")).cast("string"), col("o_orderpriority")))
      .unionAll(fp("lineitem", lineitem, concat_ws("|",
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity").cast("long"),
        col("l_extendedprice").cast("decimal(18,2)").cast("string"),
        col("l_returnflag"), col("l_linestatus"),
        to_date(col("l_shipdate")).cast("string"))))
      .unionAll(fp("customer", customer, concat_ws("|",
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal").cast("decimal(18,2)").cast("string"),
        col("c_mktsegment"))))
  }

  /** Incremental view maintenance of a join view — the delta-join
    * identity ΔV = ΔO⋈L ∪ O⋈ΔL ∪ ΔO⋈ΔL that keeps a materialized join
    * current with delta-sized work instead of a full recompute (the
    * standard IVM decomposition; deltas are simulated by deterministic
    * key splits of the fact tables). Emits one accounting row per leg
    * plus the incremental total and the full recompute: the two last
    * rows carrying identical exact counts/cents IS the correctness
    * evidence, visible in the output rather than asserted off-line.
    *
    * Scale: the base⋈base leg is the already-materialized view (billed
    * once, not per refresh); each refresh pays only the three delta
    * legs, whose delta side is broadcastable at any base size. Cents
    * sum exactly (decimal → long), so leg totals add associatively to
    * the full total, engine- and partitioning-independent.
    */
  def deltaJoinMaintenance(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val o = orders.select(col("o_orderkey"), (col("o_orderkey") % 10 === 0).as("d"))
    val l = lineitem.select(col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("decimal(18,4)").as("p"),
      (col("l_orderkey") % 7 === 0).as("d"))
    def leg(name: String, oldO: Boolean, newO: Boolean,
        oldL: Boolean, newL: Boolean): DataFrame = {
      val os = o.filter(if (oldO && newO) lit(true)
        else if (newO) col("d") else !col("d"))
      val ls = l.filter(if (oldL && newL) lit(true)
        else if (newL) col("d") else !col("d"))
      os.join(ls, col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("n_rows"),
          coalesce((sum(col("p")) * 1000000).cast("long"), lit(0L))
            .as("revenue_micro"))
        .select(lit(name).as("leg"), col("n_rows"), col("revenue_micro"))
    }
    val legs = leg("old_view", true, false, true, false)
      .unionByName(leg("delta_orders_join", false, true, true, false))
      .unionByName(leg("delta_lineitem_join", true, false, false, true))
      .unionByName(leg("delta_both_join", false, true, false, true))
    val incTotal = legs.agg(sum(col("n_rows")).as("n_rows"),
        sum(col("revenue_micro")).as("revenue_micro"))
      .select(lit("incremental_total").as("leg"), col("n_rows"),
        col("revenue_micro"))
    legs.unionByName(incTotal)
      .unionByName(leg("full_recompute", true, true, true, true))
  }
}
