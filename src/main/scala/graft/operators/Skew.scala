package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew-resistant aggregation: explicit two-phase salting.
  *
  * A `groupBy(hotKey)` with very few distinct keys (here: 3 return flags
  * over the whole lineitem table) degenerates at scale — every row of a
  * hot key lands on one reducer. Salting splits each key into `nSalts`
  * deterministic sub-keys for the first (parallel) aggregation, then a
  * cheap second aggregation over `keys × nSalts` rows merges the partials.
  * Results are identical to the direct aggregation because the aggregates
  * are decomposable and the money math is exact decimal (order-independent)
  * — the DuckDB oracle is the *unsalted* GROUP BY.
  *
  * (AQE's skew-join handling covers joins; this is the aggregation-side
  * pattern for when partial aggregation alone can't save a pathological
  * key distribution — e.g. high-cardinality accumulators per key.)
  */
object Skew {

  /** Deterministic salt in [0, nSalts) from row identity columns. */
  def salt(nSalts: Int, idCols: Column*): Column =
    pmod(xxhash64(idCols: _*), lit(nSalts.toLong))

  def qSaltedAgg(s: SparkSession, dir: String): DataFrame = {
    val nSalts = 32
    val partial = Tables.lineitem(s, dir)
      .withColumn("_salt", salt(nSalts, col("l_orderkey"), col("l_linenumber")))
      .groupBy(col("l_returnflag"), col("_salt"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).as("sq"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("sp"),
        count(lit(1)).as("c"))
    partial
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("sq")).cast("double").as("sum_qty"),
        sum(col("sp")).cast("double").as("sum_price"),
        sum(col("c")).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Skew-resistant join: salt the (skewed) probe side deterministically,
    * REPLICATE the build side once per salt, and equi-join on
    * (key, salt) — each hot key's rows spread over `nSalts` reducers
    * instead of one. Build-side cost is |build| × nSalts rows, which is
    * the explicit trade when the build side is too big to broadcast but
    * the probe's key distribution is pathological (AQE's skew-join split
    * handles moderate skew; replication is the heavy-hammer form for a
    * single dominant key). Results are identical to the plain join —
    * every probe row meets exactly one replica of its build row.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 nSalts: Int, probeIdCols: Seq[Column]): DataFrame = {
    val salted = probe.withColumn("_salt", salt(nSalts, probeIdCols: _*))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** lineitem ⋈ a per-returnflag dimension — 3 distinct keys over the
    * whole fact table is maximal join skew; the oracle is the plain
    * (unsalted) join + GROUP BY.
    */
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val facts = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val dim = Tables.lineitem(s, dir).select(col("l_returnflag")).distinct()
      .withColumn("flag_label", concat(lit("flag_"), col("l_returnflag")))
    saltedJoin(facts, dim, "l_returnflag", 32,
      Seq(col("l_orderkey"), col("l_linenumber")))
      .groupBy(col("flag_label"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy(col("flag_label"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_salted_agg" -> (qSaltedAgg _), "q_salted_join" -> (qSaltedJoin _))

  val oracles: Map[String, String] = Map(
    "q_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_salted_join" ->
      """WITH dim AS (
        |  SELECT DISTINCT l_returnflag, 'flag_' || l_returnflag AS flag_label
        |  FROM lineitem)
        |SELECT flag_label, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN dim USING (l_returnflag)
        |GROUP BY flag_label ORDER BY flag_label""".stripMargin)
}
