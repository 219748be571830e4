package graft.queries

import graft.operators.{Aggregators, Joins}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-checked queries over the TPC-H-ish star schema (FIXTURES.md):
  * SURVEY §2.3 joins J1-J8, §2.4 aggregations A1-A9, §2.5 windows W1-W4,
  * §2.6 sorts/limits/set ops, §2.1 S2/S3 incremental-scan predicates.
  *
  * Determinism: decimal-exact aggregates via QU helpers, timestamps as
  * epoch micros, every query ends with a total ORDER BY (FIXTURES.md).
  *
  * Scale notes: dims (customer/supplier/nation/region/bands) are
  * explicitly broadcast; fact-fact joins shuffle on their keys with AQE;
  * window queries partition by high-cardinality keys (no lit(0) windows).
  */
object StarQueries {
  import QU._

  private def ts(s: String) = to_timestamp(lit(s))

  /** j08/j08b shared inputs. Purchases are PRE-DEDUPED to the max value
    * per (user_id, ts): Spark's asofJoin breaks equal-ts ties on the
    * payload struct deterministically, but DuckDB's ASOF JOIN tie-break
    * among equal-timestamp right rows is unspecified — without the
    * dedup the oracle would be nondeterministically flaky the moment
    * the fixture carries such a tie (it currently doesn't). */
  private def asofParts(s: org.apache.spark.sql.SparkSession, d: String) = {
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("p_value"))
      .select(col("user_id"), col("ts"), col("p_value"), col("ts").as("p_ts"))
    (clicks, purchases)
  }
  private def asofOut(df: org.apache.spark.sql.DataFrame) =
    df.select(col("event_id"), col("user_id"), micros(col("ts")).as("ts_us"),
        col("value"), col("p_value"), micros(col("p_ts")).as("p_ts_us"))
      .orderBy(col("event_id"))
  private val asofOracle =
    """WITH clicks AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'), purch AS (SELECT user_id, ts, MAX(value) AS value FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us, c.value AS value, p.value AS p_value, epoch_us(p.ts) AS p_ts_us FROM clicks c ASOF LEFT JOIN purch p ON c.user_id = p.user_id AND c.ts >= p.ts ORDER BY c.event_id"""

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // ---- flagship: S14 scan + P1-P3 + J1/J2 + A1 + total order ----
    ("q01_flagship", (s, d) => {
      Tables.lineitem(s, d).where(col("l_shipdate") < ts("1998-09-01"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("c_mktsegment"))
    }, Some("""SELECT c_mktsegment, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue, COUNT(*) AS n_items FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey WHERE l_shipdate < TIMESTAMP '1998-09-01' GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- A1: hash group-by with partial aggregation (TPC-H Q1 shape) ----
    ("a01_groupby", (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some("""SELECT l_returnflag, l_linestatus, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty, COUNT(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),

    // ---- A2: global aggregate ----
    ("a02_global", (s, d) => {
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("sum_price"),
        micros(min(col("l_shipdate"))).as("min_ship_us"),
        micros(max(col("l_shipdate"))).as("max_ship_us"))
    }, Some("""SELECT COUNT(*) AS n, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, epoch_us(MIN(l_shipdate)) AS min_ship_us, epoch_us(MAX(l_shipdate)) AS max_ship_us FROM lineitem""")),

    // ---- A3: count distinct ----
    ("a03_count_distinct", (s, d) => {
      Tables.orders(s, d).groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus"))
    }, Some("""SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- A4: approx distinct (HLL) — engine-specific sketch, no oracle;
    // driver records rows-only. Exactness is cross-checked in the test
    // suite against countDistinct at sf0.001 (rsd bound). ----
    ("a04_approx_distinct", (s, d) => {
      Tables.orders(s, d).groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey"), 0.01).as("approx_cust"))
        .orderBy(col("o_orderstatus"))
    }, None),

    // ---- A4 contract: the HLL estimate must land within a generous
    // error band of the exact distinct count. The sketch itself is
    // engine-specific (rows-only above), but "exact count" and "estimate
    // within bound" are oracle-checkable: DuckDB recomputes the exact
    // side independently and the boolean pins the estimate. HLL register
    // merges are commutative maxes, so the estimate is deterministic
    // under any partitioning — safe to hash-compare. rsd=0.01; bound is
    // 5% + 10 absolute, far outside observed error yet far inside
    // usefulness. ----
    // Plan shape: dedup (status, custkey) first, then count + sketch the
    // already-distinct pairs — the HLL sketch is duplicate-insensitive,
    // so the estimate is identical, and the plan avoids the Expand that
    // `countDistinct` alongside another aggregate forces (measured 3-4×
    // slower; Expand also doubles the shuffled rows, which is the wrong
    // slope at 100 TB).
    ("a04b_approx_distinct_bound", (s, d) => {
      // count(col), not count(*) over a NULL-filtered frame: both forms
      // exclude NULL custkeys (COUNT(DISTINCT) parity), but a pre-filter
      // would also DROP a status group whose custkeys are all NULL,
      // while the oracle's GROUP BY keeps it with exact_cust = 0
      Tables.orders(s, d).select(col("o_orderstatus"), col("o_custkey"))
        .distinct()
        .groupBy(col("o_orderstatus"))
        .agg(count(col("o_custkey")).as("exact_cust"),
          approx_count_distinct(col("o_custkey"), 0.01).as("approx_cust"))
        .select(col("o_orderstatus"), col("exact_cust"),
          (abs(col("approx_cust") - col("exact_cust"))
            <= col("exact_cust") * 0.05 + 10).as("within_bound"))
        .orderBy(col("o_orderstatus"))
    }, Some("""SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS exact_cust, true AS within_bound FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- A5: rollup ----
    ("a05_rollup", (s, d) => {
      Tables.lineitem(s, d).rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }, Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // ---- A5b: cube (all grouping-set combinations) ----
    ("a05b_cube", (s, d) => {
      Tables.lineitem(s, d).cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }, Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // ---- A6: pivot (conditional aggregation in the oracle). na.fill:
    // a (returnflag, linestatus) combo absent from the data pivots to
    // NULL in Spark but 0 under the oracle's COUNT(*) FILTER — current
    // fixtures carry all combos, TPC-H-faithful data would not ----
    ("a06_pivot", (s, d) => {
      Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("F", "O"))
        .orderBy(col("l_returnflag"))
    }, Some("""SELECT l_returnflag, COUNT(*) FILTER (l_linestatus = 'F') AS "F", COUNT(*) FILTER (l_linestatus = 'O') AS "O" FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- A7: collect_list (order-normalized with array_sort; rendered
    // as a joined string because the driver compare can't hash arrays) ----
    ("a07_collect", (s, d) => {
      Tables.nation(s, d).groupBy(col("n_regionkey"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("names"))
        .orderBy(col("n_regionkey"))
    }, Some("""SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS names FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // ---- A8: exact percentiles (linear interpolation both engines;
    // one flat double column per quantile — arrays break the compare) ----
    ("a08_percentile", (s, d) => {
      Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.25D)").as("q25"),
          expr("percentile(l_quantity, 0.5D)").as("q50"),
          expr("percentile(l_quantity, 0.75D)").as("q75"))
        .orderBy(col("l_returnflag"))
    }, Some("""SELECT l_returnflag, quantile_cont(l_quantity, 0.25) AS q25, quantile_cont(l_quantity, 0.5) AS q50, quantile_cont(l_quantity, 0.75) AS q75 FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- A8b: approx-percentile error-bound contract (the a04b pattern
    // for quantiles). At 100 TB the exact `percentile` materializes each
    // group's full value multiset in one task — the approx sketch
    // (Greenwald-Khanna, bounded size, map-side mergeable partials) is
    // the form that survives; this query CERTIFIES its rank-error
    // guarantee instead of exempting it from oracles: with accuracy
    // 10000 the rank error is ≤0.01%, so the approx median must lie
    // within the exact [p49, p51] band (checked in-engine); DuckDB
    // independently recomputes the exact median and expects every
    // within_bound true. ----
    ("a08b_approx_percentile_bound", (s, d) => {
      Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5D)").as("exact_p50"),
          expr("percentile(l_quantity, 0.49D)").as("__lo"),
          expr("percentile(l_quantity, 0.51D)").as("__hi"),
          expr("approx_percentile(l_quantity, 0.5D, 10000)").as("__approx"))
        .select(col("l_returnflag"), col("exact_p50"),
          (col("__approx") >= col("__lo") && col("__approx") <= col("__hi"))
            .as("within_bound"))
        .orderBy(col("l_returnflag"))
    }, Some("""SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS exact_p50, true AS within_bound FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- A9: custom typed Aggregator via functions.udaf (integer-exact
    // cents x quantity so partial-aggregation order cannot matter) ----
    ("a09_weighted_mean", (s, d) => {
      val wm = udaf(Aggregators.weightedMean)
      Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(wm(round(col("l_extendedprice") * 100).cast("long"),
          col("l_quantity").cast("long")).as("w_mean"))
        .orderBy(col("l_returnflag"))
    }, Some("""SELECT l_returnflag, CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0 / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS w_mean FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- W1: ranking functions ----
    ("w01_rank", (s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        row_number().over(w).as("rn"), rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"), ntile(4).over(w).as("quartile"))
        .orderBy(col("o_orderkey"))
    }, Some("""SELECT o_orderkey, o_custkey, row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk, ntile(4) OVER w AS quartile FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) ORDER BY o_orderkey""")),

    // ---- W2: lag/lead/first/last (frames spelled explicitly) ----
    ("w02_lag_lead", (s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wCur = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_totalprice")).over(wCur).as("first_price"),
        last(col("o_totalprice")).over(wFull).as("last_price"))
        .orderBy(col("o_orderkey"))
    }, Some("""SELECT o_orderkey, o_custkey, lag(o_totalprice, 1) OVER w AS prev_price, lead(o_totalprice, 1) OVER w AS next_price, first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price, last_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) ORDER BY o_orderkey""")),

    // ---- W3: running frame aggregate (decimal-exact running sum) ----
    ("w03_running", (s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_spend"),
        count(lit(1)).over(w).as("n_so_far"))
        .orderBy(col("o_orderkey"))
    }, Some("""SELECT o_orderkey, o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_spend, COUNT(*) OVER w AS n_so_far FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) ORDER BY o_orderkey""")),

    // ---- W5: distribution analytics (percent_rank/cume_dist/nth_value) ----
    ("w05_analytic", (s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).select(col("o_orderkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        nth_value(col("o_totalprice"), 2).over(wFull).as("second_price"))
        .orderBy(col("o_orderkey"))
    }, Some("""SELECT o_orderkey, percent_rank() OVER w AS pr, cume_dist() OVER w AS cd, nth_value(o_totalprice, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) ORDER BY o_orderkey""")),

    // ---- W4: top-k per group ----
    ("w04_topk_per_group", (s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }, Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // ---- §2.6: global sort + limit (TakeOrderedAndProject) ----
    ("o01_topk_global", (s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }, Some("""SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // ---- §2.6: set operations ----
    ("o02_union", (s, d) => {
      val o = Tables.orders(s, d)
      o.where(col("o_orderstatus") === "F").select(col("o_custkey"))
        .union(o.where(col("o_orderstatus") === "P").select(col("o_custkey")))
        .distinct().orderBy(col("o_custkey"))
    }, Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' UNION SELECT o_custkey FROM orders WHERE o_orderstatus = 'P' ORDER BY o_custkey""")),

    ("o03_intersect", (s, d) => {
      val o = Tables.orders(s, d)
      o.where(col("o_orderstatus") === "F").select(col("o_custkey"))
        .intersect(o.where(col("o_orderstatus") === "P").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }, Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'P' ORDER BY o_custkey""")),

    ("o04_except", (s, d) => {
      val o = Tables.orders(s, d)
      o.where(col("o_orderstatus") === "F").select(col("o_custkey"))
        .except(o.where(col("o_orderstatus") === "P").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }, Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'P' ORDER BY o_custkey""")),

    ("o05_distinct", (s, d) => {
      Tables.lineitem(s, d).select(col("l_returnflag"), col("l_linestatus"))
        .distinct().orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus""")),

    // ---- J1: broadcast hash join (dim explicitly shipped) ----
    ("j01_broadcast", (s, d) => {
      Joins.broadcastJoin(Tables.lineitem(s, d), Tables.supplier(s, d).withColumnRenamed("s_suppkey", "l_suppkey"), Seq("l_suppkey"))
        .groupBy(col("s_name"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("s_name"))
    }, Some("""SELECT s_name, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY s_name ORDER BY s_name""")),

    // ---- J2: shuffle equi join (fact-fact) ----
    ("j02_equi", (s, d) => {
      Joins.equiJoin(
        Tables.lineitem(s, d).withColumnRenamed("l_orderkey", "o_orderkey"),
        Tables.orders(s, d), Seq("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }, Some("""SELECT o_orderpriority, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue, COUNT(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- J3: left outer join (zero-order customers kept) ----
    ("j03_outer", (s, d) => {
      Tables.customer(s, d).join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    }, Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey ORDER BY c_custkey""")),

    // ---- J4: left semi (EXISTS) ----
    ("j04_semi", (s, d) => {
      Tables.customer(s, d).join(
        Tables.orders(s, d).where(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }, Some("""SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P') ORDER BY c_custkey""")),

    // ---- J5: left anti (NOT EXISTS) ----
    ("j05_anti", (s, d) => {
      Tables.customer(s, d).join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }, Some("""SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey""")),

    // ---- J6: cross/theta join (non-equi pair enumeration, tiny dims) ----
    ("j06_theta", (s, d) => {
      val n1 = Tables.nation(s, d).select(col("n_nationkey").as("k1"),
        col("n_name").as("name1"), col("n_regionkey").as("r1"))
      val n2 = Tables.nation(s, d).select(col("n_nationkey").as("k2"),
        col("n_name").as("name2"), col("n_regionkey").as("r2"))
      n1.crossJoin(n2)
        .where(col("r1") === col("r2") && col("k1") < col("k2"))
        .select(col("r1").as("regionkey"), col("name1"), col("name2"))
        .orderBy(col("regionkey"), col("name1"), col("name2"))
    }, Some("""SELECT n1.n_regionkey AS regionkey, n1.n_name AS name1, n2.n_name AS name2 FROM nation n1, nation n2 WHERE n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey ORDER BY regionkey, name1, name2""")),

    // ---- J7: range/interval join against a broadcast band dim ----
    ("j07_range", (s, d) => {
      import s.implicits._
      val bands = Seq((0.0, 100000.0, "b0_low"), (100000.0, 200000.0, "b1_mid"),
        (200000.0, 300000.0, "b2_high"), (300000.0, 1e9, "b3_top"))
        .toDF("lo", "hi", "band")
      Joins.rangeJoin(Tables.orders(s, d), broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("band"))
    }, Some("""SELECT band, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM orders JOIN (VALUES (0.0, 100000.0, 'b0_low'), (100000.0, 200000.0, 'b1_mid'), (200000.0, 300000.0, 'b2_high'), (300000.0, 1000000000.0, 'b3_top')) AS b(lo, hi, band) ON o_totalprice >= lo AND o_totalprice < hi GROUP BY band ORDER BY band""")),

    // ---- J8: as-of join (latest purchase at-or-before each click),
    // vs DuckDB's native ASOF LEFT JOIN. Shared prep/projection/oracle
    // with j08b — the pair exists to assert the two operator variants
    // agree, so their inputs must be literally the same code ----
    ("j08_asof", (s, d) => {
      val (clicks, purchases) = asofParts(s, d)
      Joins.asofJoin(clicks, purchases, "user_id", "ts", "ts", Seq("p_value", "p_ts"))
        .transform(asofOut)
    }, Some(asofOracle)),

    // ---- J8b: as-of join, narrow-sort variant (same semantics, sort
    // carries only key/ts/id/payload; left payload re-attached by id) ----
    ("j08b_asof_narrow", (s, d) => {
      val (clicks, purchases) = asofParts(s, d)
      Joins.asofJoinNarrow(clicks, purchases, "user_id", "ts", "ts", "event_id",
        Seq("p_value", "p_ts"))
        .transform(asofOut)
    }, Some(asofOracle)),

    // ---- J8c: as-of join, time-bucketed two-pass variant — the hot-key
    // scale form (per-task work bounded by bucket population, carry-in
    // recovered via a per-bucket summary + prefix window). Same inputs,
    // projection and DuckDB ASOF oracle as j08/j08b: the three variants
    // must be result-identical ----
    ("j08c_asof_bucketed", (s, d) => {
      val (clicks, purchases) = asofParts(s, d)
      Joins.asofJoinBucketed(clicks, purchases, "user_id", "ts", "ts",
        Seq("p_value", "p_ts"), bucketSeconds = 86400L)
        .transform(asofOut)
    }, Some(asofOracle)),

    // ---- S2: incrementing-mode scan (predicate pushed to parquet) ----
    ("s02_incrementing", (s, d) => {
      Tables.incrementingScan(Tables.events(s, d), "event_id", 9000L)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, user_id, event_type FROM events WHERE event_id > 9000 ORDER BY event_id""")),

    // ---- S4: query-mode source — user SQL evaluated by the engine,
    // exactly what the Confluent source's `query=` config pushes to the
    // database (dispatched via ConnectorConfig.sourceScan) ----
    ("s04_query_source", (s, d) => {
      graft.sources.ConnectorConfig.sourceScan(s, d,
        graft.sources.ConnectorConfig.Config("q-src", Map(
          "query" -> "SELECT o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'")))
        .orderBy(col("o_custkey"), col("o_totalprice"))
    }, Some("""SELECT o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F' ORDER BY o_custkey, o_totalprice""")),

    // ---- §2.6: sortWithinPartitions — per-partition order invariant
    // (adjacent-inversion count must be zero in every partition; global
    // values are partitioning-independent so the oracle is constant) ----
    ("o06_sort_within_partitions", (s, d) => {
      import s.implicits._
      val sorted = Tables.orders(s, d)
        .repartition(col("o_custkey"))
        .sortWithinPartitions(col("o_custkey"), col("o_orderkey"))
      val stats = sorted.select(col("o_custkey"), col("o_orderkey"))
        .mapPartitions { rows =>
          var n = 0L; var inversions = 0L
          var prev: (Long, Long) = null
          rows.foreach { r =>
            val cur = (r.getLong(0), r.getLong(1))
            if (prev != null && Ordering[(Long, Long)].lt(cur, prev)) inversions += 1
            prev = cur; n += 1
          }
          Iterator((n, inversions))
        }
      stats.toDF("n", "inv")
        .agg(sum(col("n")).as("n_rows"), sum(col("inv")).as("inversions"))
    }, Some("""SELECT COUNT(*) AS n_rows, 0 AS inversions FROM orders""")),

    // ---- S3: timestamp+incrementing resume predicate — through the
    // ACTUAL operator (Tables.timestampIncrementingScan), not a
    // re-spelled predicate: a `>=` slip in the operator must turn this
    // row red, which a hand-rolled copy of the predicate would miss ----
    ("s03_ts_incrementing", (s, d) => {
      // UTC-pinned construction: Timestamp.valueOf interprets the string
      // in the JVM DEFAULT timezone, which would shift the resume point
      // (and diverge from the naive-timestamp oracle) on a non-UTC host
      val resumeTs = java.sql.Timestamp.from(
        java.time.LocalDateTime.parse("2024-01-10T00:00:00")
          .toInstant(java.time.ZoneOffset.UTC))
      Tables.timestampIncrementingScan(Tables.events(s, d), "ts", "event_id",
          resumeTs, 100L)
        .select(col("event_id"), micros(col("ts")).as("ts_us"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, epoch_us(ts) AS ts_us FROM events WHERE ts > TIMESTAMP '2024-01-10 00:00:00' OR (ts = TIMESTAMP '2024-01-10 00:00:00' AND event_id > 100) ORDER BY event_id"""))
  )
}
