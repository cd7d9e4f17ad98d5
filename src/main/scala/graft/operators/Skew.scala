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

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_salted_agg" -> (qSaltedAgg _))

  val oracles: Map[String, String] = Map(
    "q_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
