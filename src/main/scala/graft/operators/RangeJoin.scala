package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Range (interval) join — point-in-interval matching at scale.
  *
  * A naive `a.ts BETWEEN b.lo AND b.hi` join has no equi-key, so Spark can
  * only run it as BroadcastNestedLoopJoin — O(|A|·|B|) work however big
  * the sides. The scalable form is the BIN JOIN: quantize time into
  * fixed-width bins, explode each interval into the bins it covers
  * (bounded by interval_width/bin_width + 1 rows), equi-join points to
  * intervals on the bin key, then re-check the exact bounds. Work becomes
  * O(|A| + |B|·bins_per_interval + |matches|), shuffle-partitioned by bin
  * — the same pattern distributed engines use for spatial grids.
  *
  * The fixture query joins `events` to 14 deterministic, OVERLAPPING
  * 3-day campaign windows (stride 2 days — overlap proves this is a real
  * range join, not a partition): per campaign, event count and distinct
  * users. Oracle: the plain BETWEEN join DuckDB runs natively (its IEJoin
  * handles it) — an independent evaluation strategy for the same
  * semantics.
  */
object RangeJoin {
  private type Q = (SparkSession, String) => DataFrame

  private val DayMs = 86400000L
  private val Jan1_2024 = 1704067200000L // 2024-01-01T00:00:00Z epoch-ms
  private val NCampaigns = 14
  private val StrideDays = 2
  private val WidthDays = 3

  /** Generic bin join: `points(pt)` × `intervals(lo, hi)` (hi exclusive),
    * equi-keyed on `binWidth`-sized bins. Returns matched rows with all
    * columns of both inputs.
    */
  def binJoin(points: DataFrame, intervals: DataFrame,
              pt: String, lo: String, hi: String, binWidth: Long,
              maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    // Backticked names everywhere (expr AND col would otherwise read a
    // dot as struct access). Integer `div`, not `/` (Column `/` on longs
    // returns double).
    def c(name: String) = col(s"`$name`")
    // Same guards as the optimizer-rule twin (plans.BinJoinRewrite): an
    // empty/inverted interval yields ZERO bins (sequence would step -1
    // and enumerate garbage), and a sentinel interval raises an
    // actionable error instead of dying on the array-size limit.
    val seqBins = sequence(expr(s"`$lo` div $binWidth"), expr(s"(`$hi` - 1) div $binWidth"))
    // span in DOUBLE: a long subtraction overflows for extreme
    // opposite-sign bounds (e.g. lo=Long.MinValue, hi=Long.MaxValue at
    // width 1), turning the intended guard error into ARITHMETIC_OVERFLOW
    // under ANSI; double imprecision (~2^11 at that magnitude) is
    // irrelevant for a threshold test against ~2^20.
    val span = expr(s"CAST((`$hi` - 1) div $binWidth AS DOUBLE) - CAST(`$lo` div $binWidth AS DOUBLE)")
    val bins = when(c(hi) <= c(lo), typedLit(Array.empty[Long]))
      .when(span > lit(maxBinsPerInterval - 1),
        raise_error(lit(s"binJoin interval spans more than $maxBinsPerInterval bins " +
          "(maxBinsPerInterval); raise it or widen binWidth")).cast("array<bigint>"))
      .otherwise(seqBins)
    val binned = intervals.withColumn("__bin", explode(bins))
    points.withColumn("__bin", expr(s"`$pt` div $binWidth"))
      .join(binned, "__bin")
      .filter(c(pt) >= c(lo) && c(pt) < c(hi))
      .drop("__bin")
  }

  /** Per-campaign event stats over overlapping 3-day windows. */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val campaigns = s.range(NCampaigns).select(
      col("id").as("campaign_id"),
      (lit(Jan1_2024) + col("id") * (StrideDays * DayMs)).as("lo"),
      (lit(Jan1_2024) + col("id") * (StrideDays * DayMs) + WidthDays * DayMs).as("hi"))
    val ev = Tables.events(s, dir)
      .select(unix_millis(col("ts")).as("ms"), col("user_id"))
    binJoin(ev, campaigns, "ms", "lo", "hi", DayMs)
      .groupBy(col("campaign_id"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("campaign_id"))
  }

  private val qRangeJoinSql =
    s"""WITH c AS (
       |  SELECT i AS campaign_id,
       |         $Jan1_2024 + i * ${StrideDays * DayMs} AS lo,
       |         $Jan1_2024 + i * ${StrideDays * DayMs} + ${WidthDays * DayMs} AS hi
       |  FROM generate_series(0, ${NCampaigns - 1}) t(i)),
       |ev AS (SELECT epoch_ms(ts) AS ms, user_id FROM events)
       |SELECT campaign_id, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
       |FROM c JOIN ev ON ev.ms >= c.lo AND ev.ms < c.hi
       |GROUP BY campaign_id ORDER BY campaign_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_range_join" -> (qRangeJoin _))

  val oracles: Map[String, String] = Map(
    "q_range_join" -> qRangeJoinSql)
}
