package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator breadth over the fixture star schema — the [EXT]
  * surface of SURVEY.md §2.4–2.9: equi/semi/anti joins, aggregations,
  * distinct aggs, windows, sorts/top-k, set ops, membership predicates,
  * JSON/event analytics.
  *
  * Design rules applied throughout:
  *  - money arithmetic is done in `decimal(18,2)` (exact, order-independent
  *    — a float sum would differ run-to-run under shuffle reordering and
  *    engine-to-engine vs the oracle), cast to double only at the output
  *    boundary;
  *  - every ORDER BY carries a total tiebreak so top-k is deterministic;
  *  - dimension tables (region 5, nation 25, supplier ≤1k, part ≤20k rows)
  *    are `broadcast()` — at 100 TB the fact side never shuffles for these
  *    joins; only keyed aggregations shuffle, once, with map-side partial
  *    aggregation.
  */
object Relational {
  private type Q = (SparkSession, String) => DataFrame

  /** Exact money type. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------- q1
  /** Pricing summary (TPC-H Q1 shape): scan-heavy group-agg; the filter and
    * the 7-column projection reach the parquet scan (PushedFilters +
    * ReadSchema), everything else is one partial+final hash aggregate.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        d(sum(dec(col("l_quantity")))).as("sum_qty"),
        d(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        d(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("sum_disc_price"),
        d(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))) * (lit(1) + dec(col("l_tax"))))).as("sum_charge"),
        // raw double division (no rounding): identical IEEE ops on identical
        // operands are bit-equal cross-engine, while round() can disagree
        // when a rational lands exactly on a half-boundary of the grid
        (d(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        (d(sum(dec(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        (d(sum(dec(col("l_discount")))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q3
  /** Shipping-priority top-10 (TPC-H Q3 shape): selective dimension filter,
    * two equi-joins, keyed agg, deterministic top-k.
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir).filter(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
    val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > to_timestamp(lit("1998-01-01")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(d(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    """SELECT o_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q5
  /** Local-supplier volume (TPC-H Q5 shape): 6-table join; all dimensions
    * broadcast so the only shuffle is the final group-by-nation aggregate.
    */
  def q5LocalSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val asia = broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA"))
    val nat = broadcast(Tables.nation(s, dir))
    val sup = broadcast(Tables.supplier(s, dir))
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01")))
    Tables.lineitem(s, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .join(asia, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(d(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ------------------------------------------------------- part join
  /** Fact ⋈ broadcast-dimension revenue rollup by brand. */
  def qPartBrandRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        d(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("revenue"),
        d(sum(dec(col("l_quantity")))).as("qty"),
        count(lit(1)).as("n"))
      .orderBy(col("p_brand"))

  private val qPartBrandSql =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
      |  COUNT(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------- distinct aggs
  def qDistinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  private val qDistinctAggSql =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_supp,
      |  COUNT(DISTINCT l_partkey) AS n_part,
      |  COUNT(DISTINCT l_orderkey) AS n_orders,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------- membership
  def qIsinMembership(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), d(sum(dec(col("o_totalprice")))).as("sum_total"))
      .orderBy(col("o_orderstatus"))

  private val qIsinSql =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
      |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------------------------ top-k
  /** Total sort + limit: Spark executes as TakeOrderedAndProject — a per-
    * partition top-k then a k-row driver merge, no full sort even at 100 TB.
    */
  def qTopkOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  private val qTopkSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // ----------------------------------------------------- window: rank
  /** Highest-value order per customer (ranking window, deterministic
    * tiebreak). One shuffle by o_custkey.
    */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"))
  }

  private val qWindowRankSql =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  // -------------------------------------------------- window: running
  /** Per-supplier running quantity (frame window). Decimal-exact running
    * sum. The ROWS frame makes ordering part of the SEMANTICS, so the sort
    * key must be a total order of the table — (orderkey, linenumber) alone
    * is NOT unique in the fixtures at sf0.1 (118k duplicate pairs), and a
    * tie between rows of different quantity makes prefix sums
    * engine-dependent. (partkey, extendedprice) completes the unique key;
    * the output order adds running_qty so fully-tied display rows are
    * ordered deterministically too.
    */
  def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_extendedprice"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_partkey"), col("l_extendedprice"), col("l_quantity"))
      .withColumn("running_qty", d(sum(dec(col("l_quantity"))).over(w)))
      .drop("l_quantity", "l_partkey", "l_extendedprice")
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("running_qty"))
  }

  private val qWindowRunningSql =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey, l_extendedprice
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |FROM lineitem
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, running_qty""".stripMargin

  // ------------------------------------------------------ semi / anti
  def qJoinSemi(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))

  private val qJoinSemiSql =
    """SELECT c_nationkey, COUNT(*) AS n_customers FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  def qJoinAnti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_nationkey"))
      .orderBy(col("c_custkey"))

  private val qJoinAntiSql =
    """SELECT c_custkey, c_nationkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ----------------------------------------------------------- set ops
  def qSetopExcept(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey").as("custkey"))
      .except(Tables.orders(s, dir).select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))

  private val qSetopExceptSql =
    """SELECT c_custkey AS custkey FROM customer
      |EXCEPT SELECT o_custkey AS custkey FROM orders
      |ORDER BY custkey""".stripMargin

  def qSetopIntersect(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
      .intersect(o.filter(col("o_totalprice") > 300000.0).select(col("o_orderkey")))
      .orderBy(col("o_orderkey"))
  }

  private val qSetopIntersectSql =
    """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |INTERSECT
      |SELECT o_orderkey FROM orders WHERE o_totalprice > 300000.0
      |ORDER BY o_orderkey""".stripMargin

  def qSetopUnion(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
      .union(o.filter(col("o_totalprice") > 400000.0).select(col("o_orderkey")))
      .distinct()
      .orderBy(col("o_orderkey"))
  }

  private val qSetopUnionSql =
    """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION
      |SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------------ events
  /** Tumbling-hour rollup over the event stream (batch form; the streaming
    * wrapper reuses the same aggregation under a watermark).
    */
  def qEventsHourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("hour_ts", unix_timestamp(date_trunc("hour", col("ts"))))
      .groupBy(col("hour_ts"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        d(sum(dec(col("value")))).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("hour_ts"), col("event_type"))

  private val qEventsHourlySql =
    """SELECT epoch_ms(date_trunc('hour', ts))//1000 AS hour_ts, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** JSON property extraction (events.props is a JSON string). Regexp-based
    * so the oracle needs no JSON extension; the streaming/typed path uses
    * `from_json` (see cdc.Changelog).
    */
  def qEventsJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      // no-match regexp_extract yields "", and under ANSI mode (Spark 4
      // default) "".cast(int) THROWS — nullif makes a props row without
      // "k" contribute null (which sum/max skip) instead of failing the query
      .withColumn("k",
        nullif(regexp_extract(col("props"), "\"k\": (\\d+)", 1), lit("")).cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  private val qEventsJsonSql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS INTEGER)) AS BIGINT) AS sum_k,
      |  MAX(CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS INTEGER)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Gap-based sessionization (30-min inactivity) — lag window + grouped
    * count, the classic event-stream shape. Millisecond epochs on both
    * sides avoid float-vs-truncated-seconds boundary drift.
    */
  def qEventsSessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
    Tables.events(s, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"))
      .withColumn("gap", col("ms") - lag(col("ms"), 1).over(w))
      .withColumn("newf", when(col("gap") > 1800000L, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (lit(1) + sum(col("newf"))).cast("long").as("n_sessions"))
      .orderBy(col("user_id"))
  }

  private val qEventsSessionizeSql =
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
      |g AS (SELECT user_id,
      |        CASE WHEN ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms) > 1800000
      |             THEN 1 ELSE 0 END AS newf
      |      FROM e)
      |SELECT user_id, COUNT(*) AS n_events, CAST(1 + SUM(newf) AS BIGINT) AS n_sessions
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  // --------------------------------------------- windowed top-k analytics
  /** Top spender per hour: grouped aggregation composed with a ranking
    * window — the "leaderboard per window" shape of stream analytics (the
    * streaming form runs the same agg under a watermark, rank applied on
    * the emitted finalized windows).
    */
  def qEventsTopUserHourly(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"),
        col("user_id"))
      .agg(d(sum(dec(col("value")))).as("total"))
    val w = Window.partitionBy(col("hour_ts"))
      .orderBy(col("total").desc, col("user_id"))
    hourly.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("hour_ts"), col("user_id"), col("total"))
      .orderBy(col("hour_ts"))
  }

  private val qEventsTopUserHourlySql =
    """WITH hourly AS (
      |  SELECT epoch_ms(date_trunc('hour', ts))//1000 AS hour_ts, user_id,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |  FROM events GROUP BY 1, 2),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY hour_ts
      |                               ORDER BY total DESC, user_id) AS rn
      |  FROM hourly)
      |SELECT hour_ts, user_id, total FROM ranked WHERE rn = 1
      |ORDER BY hour_ts""".stripMargin

  // -------------------------------------------------------------- funnel
  /** Funnel conversion: users whose first `purchase` follows their first
    * `signup`, with the conversion delay. Event-sequence analytics as one
    * conditional-aggregation pass per user — no self-join over the event
    * log, so the shape survives any event volume (shuffle carries one row
    * per user).
    */
  def qEventsFunnel(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", unix_millis(col("ts")))).as("first_signup_ms"),
        min(when(col("event_type") === "purchase", unix_millis(col("ts")))).as("first_purchase_ms"),
        count(lit(1)).as("n_events"))
      .withColumn("converted",
        col("first_signup_ms").isNotNull && col("first_purchase_ms").isNotNull &&
          col("first_purchase_ms") > col("first_signup_ms"))
      .withColumn("delay_ms",
        when(col("converted"), col("first_purchase_ms") - col("first_signup_ms")))
      .select(col("user_id"), col("n_events"), col("converted"), col("delay_ms"))
      .orderBy(col("user_id"))

  private val qEventsFunnelSql =
    """WITH u AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END) AS first_signup_ms,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS first_purchase_ms,
      |    COUNT(*) AS n_events
      |  FROM events GROUP BY user_id)
      |SELECT user_id, n_events,
      |  (first_signup_ms IS NOT NULL AND first_purchase_ms IS NOT NULL
      |   AND first_purchase_ms > first_signup_ms) AS converted,
      |  CASE WHEN first_signup_ms IS NOT NULL AND first_purchase_ms IS NOT NULL
      |            AND first_purchase_ms > first_signup_ms
      |       THEN first_purchase_ms - first_signup_ms END AS delay_ms
      |FROM u ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------ cohorts
  /** Cohort retention: users grouped by first-activity day, activity
    * counted per (cohort, day-offset) — the standard retention matrix.
    * Two bounded-key shuffles (per-user min for the cohort day, then the
    * (cohort, day) count) plus one user-keyed join; no event self-join,
    * so the shape is linear in event volume. All-date/integer output —
    * exact in any engine.
    */
  def qEventsRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), col("day"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"),
        col("n_active"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  private val qEventsRetentionSql =
    """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |coh AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
      |SELECT cohort_day,
      |       CAST(ev.day - cohort_day AS INTEGER) AS day_offset,
      |       COUNT(DISTINCT ev.user_id) AS n_active
      |FROM ev JOIN coh USING (user_id)
      |GROUP BY cohort_day, ev.day
      |ORDER BY cohort_day, day_offset""".stripMargin

  // -------------------------------------------------------- exact stats
  /** Global moments computed exactly: decimal sums, then identical IEEE
    * double ops on both engines (variance via the sum-of-squares identity)
    * so the result hash-matches without tolerance.
    */
  def qAggStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(
        count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        d(sum(dec(col("l_extendedprice")))).as("sum_price"),
        d(sum(dec(col("l_extendedprice")) * dec(col("l_extendedprice")))).as("sum_sq"))
      // variance keeps round(4): its inputs pass through decimal->double
      // conversions above 2^53 where DuckDB double-rounds (1-ulp drift), and
      // unlike terminating ratios the value can't land on a rounding tie
      .withColumn("variance",
        round((col("sum_sq") - col("sum_price") * col("sum_price") / col("n")) / (col("n") - 1), 4))
      .select(col("n"), col("min_price"), col("max_price"), col("sum_price"), col("variance"))

  private val qAggStatsSql =
    """WITH a AS (
      |  SELECT COUNT(*) AS n,
      |    MIN(l_extendedprice) AS min_price,
      |    MAX(l_extendedprice) AS max_price,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_sq
      |  FROM lineitem)
      |SELECT n, min_price, max_price, sum_price,
      |  ROUND((sum_sq - sum_price * sum_price / n) / (n - 1), 4) AS variance
      |FROM a""".stripMargin

  // ------------------------------------------------------------ rollup
  /** Hierarchical aggregate (ROLLUP): subtotals per (returnflag, linestatus),
    * per returnflag, and grand total — grouping-set coverage. Spark default
    * sort puts NULLs first; the oracle pins NULLS FIRST explicitly.
    */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), d(sum(dec(col("l_quantity")))).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val qRollupSql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------- grouping sets
  /** Explicit GROUPING SETS — the general form rollup/cube specialize:
    * per-returnflag and per-linestatus marginals plus the grand total in
    * ONE pass (Spark expands to a single Expand + hash aggregate, not
    * three scans). `grouping_id` disambiguates which set a row belongs
    * to; the same bit encoding in both engines.
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        d(sum(dec(col("l_quantity")))).as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"), col("n"),
        col("sum_qty"))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val qGroupingSetsSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ----------------------------------------------- correlated subquery
  /** Orders ≥ 3/2 of their customer's average order value, written as
    * correlated scalar subqueries through the engine's SQL entry point —
    * Catalyst decorrelates them into joins. The predicate is restated in
    * exact decimal arithmetic (price·cnt·2 > sum·3) so row selection never
    * hinges on a float ulp; the oracle uses the decorrelated join form.
    */
  def qSqlCorrSubquery(s: SparkSession, dir: String): DataFrame = {
    // Namespaced internal view, dropped after spark.sql's EAGER analysis
    // resolves it (the returned DataFrame keeps the resolved relation) —
    // no lingering session state and no clobbering of a user's view name.
    val view = "graft_internal_orders_corr"
    Tables.orders(s, dir).createOrReplaceTempView(view)
    try s.sql(
      s"""SELECT o_orderkey, o_custkey, o_totalprice
         |FROM $view o
         |WHERE CAST(o_totalprice AS DECIMAL(18,2))
         |        * (SELECT COUNT(*) FROM $view i WHERE i.o_custkey = o.o_custkey) * 2
         |      > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
         |         FROM $view i WHERE i.o_custkey = o.o_custkey) * 3
         |ORDER BY o_orderkey""".stripMargin)
    finally s.catalog.dropTempView(view)
  }

  private val qSqlCorrSubquerySql =
    """WITH c AS (
      |  SELECT o_custkey AS k, COUNT(*) AS cnt,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
      |  FROM orders GROUP BY o_custkey)
      |SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders JOIN c ON k = o_custkey
      |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * cnt * 2 > s * 3
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------- ntile
  /** Quartile bucketing of customers by balance (ntile window). */
  def qNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("quartile", ntile(4).over(w))
      .orderBy(col("c_custkey"))
  }

  private val qNtileSql =
    """SELECT c_custkey, c_acctbal,
      |  NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
      |FROM customer ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------- full outer join
  /** FULL OUTER membership accounting: which side of customer⋈orders each
    * row falls on. Completes the join-type family (inner/left/semi/anti/
    * cross are exercised elsewhere).
    */
  def qJoinFullOuter(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        when(col("c_custkey").isNull, "order_only")
          .when(col("o_orderkey").isNull, "customer_only")
          .otherwise("matched").as("side"))
      .groupBy(col("side")).agg(count(lit(1)).as("n"))
      .orderBy(col("side"))

  private val qJoinFullOuterSql =
    """SELECT CASE WHEN c_custkey IS NULL THEN 'order_only'
      |            WHEN o_orderkey IS NULL THEN 'customer_only'
      |            ELSE 'matched' END AS side, COUNT(*) AS n
      |FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------- range-frame window
  /** Rolling 30-day quantity per supplier — a RANGE (value-based) frame
    * over epoch seconds, vs the ROWS frame of q_window_running. Equal
    * order keys share the frame in both engines by RANGE semantics.
    */
  def qWindowRange30d(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("sec"))
      .rangeBetween(-2592000L, 0L)
    Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        unix_timestamp(col("l_shipdate")).as("sec"), col("l_quantity"))
      .withColumn("qty_30d", d(sum(dec(col("l_quantity"))).over(w)))
      .drop("l_quantity")
      .orderBy(col("l_suppkey"), col("sec"), col("l_orderkey"), col("l_linenumber"))
  }

  private val qWindowRange30dSql =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  epoch_ms(l_shipdate)//1000 AS sec,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_suppkey ORDER BY epoch_ms(l_shipdate)//1000
      |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_30d
      |FROM lineitem
      |ORDER BY l_suppkey, sec, l_orderkey, l_linenumber""".stripMargin

  // -------------------------------------------------------- percentiles
  /** Exact linear-interpolation percentiles (median/p90) — both engines
    * interpolate `(1−g)·a + g·b`; the quantity domain is integer-valued so
    * interpolated results are exact.
    */
  def qPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  private val qPercentilesSql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------- temporal rollup
  /** Monthly order rollup — date-function surface (`date_trunc`/`year`/
    * `month`) over the order timeline.
    */
  def qOrdersByMonth(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"), d(sum(dec(col("o_totalprice")))).as("revenue"))
      .orderBy(col("y"), col("m"))

  private val qOrdersByMonthSql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
      |       CAST(month(o_orderdate) AS INTEGER) AS m,
      |       COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------- cube
  /** Full CUBE over the two flag dimensions — all 2^2 grouping sets. */
  def qCube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val qCubeSql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------------------- pivot
  /** Pivot order status into columns per priority (wide-format rollup);
    * the oracle is the portable FILTER-clause formulation.
    */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy(col("o_orderpriority"))

  private val qPivotSql =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (o_orderstatus = 'F') AS "F",
      |  COUNT(*) FILTER (o_orderstatus = 'O') AS "O",
      |  COUNT(*) FILTER (o_orderstatus = 'P') AS "P"
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------- approx distinct
  /** HLL++ sketch cardinality next to the exact count — the constant-memory
    * path for 100 TB cardinalities. Sketch estimates are engine-specific,
    * so no SQL oracle (rows-only check); ApproxSpec pins the error < 5%.
    */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy(col("l_returnflag"))

  // ------------------------------------------------------------ export
  val queries: Map[String, Q] = Map(
    "q_ntile" -> (qNtile _),
    "q_join_full_outer" -> (qJoinFullOuter _),
    "q_window_range_30d" -> (qWindowRange30d _),
    "q_percentiles" -> (qPercentiles _),
    "q_orders_by_month" -> (qOrdersByMonth _),
    "q_cube" -> (qCube _),
    "q_pivot" -> (qPivot _),
    "q_rollup" -> (qRollup _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_sql_corr_subquery" -> (qSqlCorrSubquery _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier_volume" -> (q5LocalSupplierVolume _),
    "q_part_brand_revenue" -> (qPartBrandRevenue _),
    "q_distinct_agg" -> (qDistinctAgg _),
    "q_isin_membership" -> (qIsinMembership _),
    "q_topk_orders" -> (qTopkOrders _),
    "q_window_rank" -> (qWindowRank _),
    "q_window_running" -> (qWindowRunning _),
    "q_join_semi" -> (qJoinSemi _),
    "q_join_anti" -> (qJoinAnti _),
    "q_setop_except" -> (qSetopExcept _),
    "q_setop_intersect" -> (qSetopIntersect _),
    "q_setop_union" -> (qSetopUnion _),
    "q_events_hourly" -> (qEventsHourly _),
    "q_events_json" -> (qEventsJson _),
    "q_events_sessionize" -> (qEventsSessionize _),
    "q_events_top_user_hourly" -> (qEventsTopUserHourly _),
    "q_events_funnel" -> (qEventsFunnel _),
    "q_events_retention" -> (qEventsRetention _),
    "q_agg_stats" -> (qAggStats _))

  val oracles: Map[String, String] = Map(
    "q_ntile" -> qNtileSql,
    "q_join_full_outer" -> qJoinFullOuterSql,
    "q_window_range_30d" -> qWindowRange30dSql,
    "q_percentiles" -> qPercentilesSql,
    "q_orders_by_month" -> qOrdersByMonthSql,
    "q_cube" -> qCubeSql,
    "q_pivot" -> qPivotSql,
    "q_rollup" -> qRollupSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_sql_corr_subquery" -> qSqlCorrSubquerySql,
    "q1_pricing_summary" -> q1Sql,
    "q3_shipping_priority" -> q3Sql,
    "q5_local_supplier_volume" -> q5Sql,
    "q_part_brand_revenue" -> qPartBrandSql,
    "q_distinct_agg" -> qDistinctAggSql,
    "q_isin_membership" -> qIsinSql,
    "q_topk_orders" -> qTopkSql,
    "q_window_rank" -> qWindowRankSql,
    "q_window_running" -> qWindowRunningSql,
    "q_join_semi" -> qJoinSemiSql,
    "q_join_anti" -> qJoinAntiSql,
    "q_setop_except" -> qSetopExceptSql,
    "q_setop_intersect" -> qSetopIntersectSql,
    "q_setop_union" -> qSetopUnionSql,
    "q_events_hourly" -> qEventsHourlySql,
    "q_events_json" -> qEventsJsonSql,
    "q_events_sessionize" -> qEventsSessionizeSql,
    "q_events_top_user_hourly" -> qEventsTopUserHourlySql,
    "q_events_funnel" -> qEventsFunnelSql,
    "q_events_retention" -> qEventsRetentionSql,
    "q_agg_stats" -> qAggStatsSql)
}
