package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (point-in-time) join — the temporal operator Spark has no native
  * form of: for each left row, attach the latest right row of the same key
  * with `right.ts <= left.ts`.
  *
  * Formulation: tag both sides, UNION, and take `last(payload) IGNORE
  * NULLS` over a (key, ts)-ordered running window; left rows then carry
  * the most recent right payload at-or-before their timestamp. That is
  * ONE hash-shuffle on the key (the window sort) — never the
  * range-condition join a naive translation produces, which Spark can
  * only execute as a broadcast-nested-loop (O(|L|·|R|) per key at scale).
  * The same trick is the standard streaming backfill shape: both sides
  * can grow unboundedly and the plan stays one shuffle.
  *
  * Tie semantics: a right row at exactly left.ts matches (inclusive, the
  * DuckDB/kdb ASOF convention) — right rows order before left rows at
  * equal ts via the side tag. Rows with equal (key, ts) ON THE RIGHT are
  * ambiguous under any as-of semantics; callers must pre-aggregate the
  * right side to unique (key, ts) (as the fixture query does by
  * construction — `(user_id, ts)` is unique in `events`).
  */
object AsofJoin {
  private type Q = (SparkSession, String) => DataFrame

  /** Left rows + an `asof` struct of the matched right payload (null when
    * the key has no right row at-or-before `ts`). `left` and `right` must
    * both expose `key` and `ts` columns; `rightPayload` names the right
    * columns to carry.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightPayload: Seq[String]): DataFrame = {
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c)))
    val l = left
      .withColumn("__r", lit(null).cast(payloadType))
      .withColumn("__side", lit(1))
    val r = right.select(
      col(key), col(ts),
      struct(rightPayload.map(col): _*).as("__r"),
      lit(0).as("__side"))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__r", "__side")
  }

  /** Attribution: each purchase event joined as-of to the same user's most
    * recent preceding (or simultaneous) view event, with the view-to-buy
    * latency. Millisecond epochs on both sides (the sessionize pattern) —
    * no float time arithmetic.
    */
  def qAsofAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("event_id"), col("user_id"),
      unix_millis(col("ts")).as("ms"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ms"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ms"), col("event_id").as("view_id"))
    asofJoin(purchases, views, "user_id", "ms", Seq("view_id", "ms"))
      .select(
        col("event_id"), col("user_id"), col("ms").as("purchase_ms"),
        col("asof.view_id").as("view_id"), col("asof.ms").as("view_ms"),
        (col("ms") - col("asof.ms")).as("ms_since_view"))
      .orderBy(col("event_id"))
  }

  // DuckDB has a native ASOF JOIN — a genuinely independent formulation
  // of the same semantics, which makes it a strong oracle for the
  // union+window plan.
  private val qAsofAttributionSql =
    """WITH ev AS (
      |  SELECT event_id, user_id, epoch_ms(ts) AS ms, event_type FROM events),
      |p AS (SELECT event_id, user_id, ms FROM ev WHERE event_type = 'purchase'),
      |v AS (SELECT event_id AS view_id, user_id, ms FROM ev WHERE event_type = 'view')
      |SELECT p.event_id, p.user_id, p.ms AS purchase_ms,
      |       v.view_id, v.ms AS view_ms, p.ms - v.ms AS ms_since_view
      |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ms >= v.ms
      |ORDER BY p.event_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_asof_join" -> (qAsofAttribution _))

  val oracles: Map[String, String] = Map(
    "q_asof_join" -> qAsofAttributionSql)
}
