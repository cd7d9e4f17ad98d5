package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The CDC apply-fold: changelog → replica snapshot.
  *
  * Reference semantics (`/root/reference/kafka-consumer-service/main.py:49-93`):
  * op dispatch is by before/after *nullity*, never the wire `op` field —
  *  - before null,  after !null → INSERT  (C1, `main.py:49-52`)
  *  - before !null, after !null → UPDATE keyed by PK (C2, `main.py:54-73`)
  *  - before !null, after null  → DELETE (C3, `main.py:75-86`)
  *  - before null,  after null  → TRUNCATE — wholesale reset (C4, `main.py:88-90`)
  * applied in total binlog order (`payload.source.pos`). The *net effect* is
  * "latest surviving after-image per key, ignoring everything at or before
  * the last truncate" — which is exactly what we compute, declaratively:
  *
  *  1. truncate horizon = max(pos) over truncate events (1-row agg; Catalyst
  *     broadcasts it into the stream — no collect, no driver loop);
  *  2. drop events with pos <= horizon (the generation reset, made pure and
  *     replayable — batch and streaming share it);
  *  3. one hash-shuffle by key + `max_by(after, pos)` (partial aggregation
  *     runs map-side, so at 100 TB each executor pre-folds its partition of
  *     the changelog to one candidate row per key before the exchange — the
  *     shuffle carries |keys| rows, not |events|);
  *  4. keys whose final image is null (deleted) drop out.
  *
  * Versus the reference's row-at-a-time interpreter this is embarrassingly
  * parallel: per-key order is total via `pos`, so partitions never need
  * cross-talk beyond the single keyed exchange.
  */
object CdcApply {

  private val negInf = Long.MinValue

  /** Classify an event by nullity (the engine's op dispatch). */
  def opOf(before: Column, after: Column): Column =
    when(before.isNull && after.isNotNull, "c")
      .when(before.isNotNull && after.isNotNull, "u")
      .when(before.isNotNull && after.isNull, "d")
      .otherwise("t")

  /** Events surviving the last truncate, truncates themselves removed. */
  def afterTruncateHorizon(changelog: DataFrame): DataFrame = {
    val horizon = changelog
      .filter(col("before").isNull && col("after").isNull)
      .agg(coalesce(max(col("pos")), lit(negInf)).as("h"))
    changelog
      .filter(!(col("before").isNull && col("after").isNull))
      .crossJoin(broadcast(horizon))
      .filter(col("pos") > col("h"))
      .drop("h")
  }

  /** Generic replica snapshot: latest surviving after-image per key for an
    * arbitrary table shape. All per-op reference behaviors derive from the
    * spec — key extraction (P7), SET-columns = after minus PK (P6), and the
    * final projection (P5) — so new tables need a `CdcTableSpec`, not new
    * fold code. Output columns keep the image's natural types, key-ordered.
    */
  def snapshotFor(changelog: DataFrame, spec: CdcSchema.CdcTableSpec): DataFrame =
    afterTruncateHorizon(changelog)
      .withColumn("key",
        coalesce(col(s"after.${spec.key}"), col(s"before.${spec.key}")))
      // Wrap the nullable after-image in a struct so a final DELETE (null
      // after) is itself the max_by winner, not silently skipped.
      .groupBy(col("key"))
      .agg(max_by(struct(col("after").as("after")), col("pos")).as("last"))
      .filter(col("last.after").isNotNull)
      .select(spec.allCols.map(c => col(s"last.after.$c").as(c)): _*)
      .orderBy(col(spec.key))

  /** Replica snapshot of the reference's invoice table: the generic fold
    * plus the sink's UInt64 widening (`db-table-init.sql:13-14`), key-ordered
    * (mirrors the reference's canonical comparison order,
    * `tests/test_consistency.py:58-59`). The projection preserves the
    * fold's key ordering — no second sort.
    */
  def snapshot(changelog: DataFrame): DataFrame =
    snapshotFor(changelog, CdcSchema.invoiceSpec)
      .select(
        col("order_id").cast("long").as("order_id"),
        col("invoice_number").cast("long").as("invoice_number"))

  /** Same fold via a ranking window — used by the consistency diff to check
    * the two formulations agree (and in tests). One shuffle by key either
    * way; `max_by` is preferred in the hot path because it map-side-combines,
    * while the window must materialize per-key sorted runs.
    */
  def snapshotViaWindow(changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("pos").desc)
    afterTruncateHorizon(changelog)
      .withColumn("key", coalesce(col("after.order_id"), col("before.order_id")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("after").isNotNull)
      .select(
        col("after.order_id").cast("long").as("order_id"),
        col("after.invoice_number").cast("long").as("invoice_number"))
      .orderBy(col("order_id"))
  }

  /** Multi-table fold: one engine instance maintaining every table of a
    * database from a single interleaved changelog (the wire format carries
    * `source.db`/`source.table`; a Debezium connector emits all captured
    * tables). Semantics generalize the single-table fold with the horizon
    * computed PER TABLE — a TRUNCATE resets only its own table (matching
    * MySQL semantics the reference inherits). Expects `db`/`table` columns
    * alongside the normalized changelog (see `Changelog.fromEnvelopeJsonMulti`).
    *
    * Scale: horizons are |tables| rows (broadcast); the fold is one
    * hash-shuffle on (db, table, key) — adding tables adds keys, not
    * stages.
    */
  /** Generic multi-table fold, parameterized like [[snapshotFor]]; output
    * is (db, table, spec columns) in natural types, (db, table, key)
    * ordered.
    */
  def snapshotByTableFor(changelog: DataFrame, spec: CdcSchema.CdcTableSpec): DataFrame = {
    val horizons = changelog
      .filter(col("before").isNull && col("after").isNull)
      .groupBy(col("db"), col("table"))
      .agg(max(col("pos")).as("h"))
    changelog
      .filter(!(col("before").isNull && col("after").isNull))
      .join(broadcast(horizons), Seq("db", "table"), "left")
      .filter(col("h").isNull || col("pos") > col("h"))
      .withColumn("key",
        coalesce(col(s"after.${spec.key}"), col(s"before.${spec.key}")))
      .groupBy(col("db"), col("table"), col("key"))
      .agg(max_by(struct(col("after").as("after")), col("pos")).as("last"))
      .filter(col("last.after").isNotNull)
      .select(col("db") +: col("table") +:
        spec.allCols.map(c => col(s"last.after.$c").as(c)): _*)
      .orderBy(col("db"), col("table"), col(spec.key))
  }

  /** Invoice-table multi-table fold with the sink's UInt64 widening. */
  def snapshotByTable(changelog: DataFrame): DataFrame =
    snapshotByTableFor(changelog, CdcSchema.invoiceSpec)
      .select(col("db"), col("table"),
        col("order_id").cast("long").as("order_id"),
        col("invoice_number").cast("long").as("invoice_number"))

  /** Time-travel: the replica as of binlog position `pos` (inclusive).
    * Because the fold is a pure function of the event set, "as of" is just
    * a position predicate before the same fold — replayable history for
    * free, something the reference's mutate-in-place sink cannot answer.
    * The predicate pushes down to the changelog scan.
    */
  def snapshotAsOf(changelog: DataFrame, pos: Long): DataFrame =
    snapshot(changelog.filter(col("pos") <= pos))

  /** COUNT(*) consistency check (reference `test_consistency.py:38-53`). */
  def rowcount(changelog: DataFrame): DataFrame =
    snapshot(changelog).agg(count(lit(1)).as("n"))

  /** Audit-log projection (reference P4, `main.py:44-45`): every
    * non-tombstone event — truncates included — appended in stream order
    * *before* dispatch. Here as the canonical (ts, pos, classified-op, key)
    * log; the streaming path pairs this with `to_json` for the raw-message
    * column.
    */
  def auditLog(changelog: DataFrame): DataFrame =
    changelog.select(
      col("ts_ms").as("log_ts"),
      col("pos"),
      opOf(col("before"), col("after")).as("op"),
      coalesce(col("after.order_id"), col("before.order_id")).as("order_id"))
      .orderBy(col("pos"))

  /** Symmetric difference of two keyed tables — the reference's row-by-row
    * consistency loop (`test_consistency.py:74-75`) as a set operation:
    * empty ⟺ consistent. `exceptAll` keeps duplicate cardinality, which the
    * Python zip-compare is also sensitive to.
    */
  def consistencyDiff(a: DataFrame, b: DataFrame): DataFrame =
    a.exceptAll(b).withColumn("side", lit("a"))
      .unionByName(b.exceptAll(a).withColumn("side", lit("b")))

  /** [[consistencyDiff]] specialized to KEYED relations — at most one row
    * per key (including a possible null key), the shape every snapshot
    * formulation guarantees: ONE full-outer join on the key replaces the
    * two whole-row `exceptAll`s (each of which shuffles and
    * hash-aggregates the union of BOTH inputs on every column — at sf1
    * that is 4 traversals of 2.6M rows where the join makes one keyed
    * pass per side). The join is NULL-SAFE (`<=>`) and row presence is
    * tracked by markers, not key nullity, so a null-key row — e.g. a
    * malformed envelope one formulation folds differently — still
    * surfaces as a diff instead of silently vanishing. Output contract
    * identical to the generic form under the one-row-per-key
    * precondition; equivalence spec-pinned (FormulationParitySpec).
    */
  def consistencyDiffByKey(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val cols = a.columns.toSeq
    val aj = a.withColumn("__pres", lit(true)).alias("a")
    val bj = b.withColumn("__pres", lit(true)).alias("b")
    val as = struct(cols.map(c => col("a." + c).as(c)): _*)
    val bs = struct(cols.map(c => col("b." + c).as(c)): _*)
    val aRow = struct(cols.map(c => col("a." + c).as(c)) :+ lit("a").as("side"): _*)
    val bRow = struct(cols.map(c => col("b." + c).as(c)) :+ lit("b").as("side"): _*)
    // Presence must be part of the inequality: an unmatched row whose
    // columns are ALL null makes `as <=> bs` true against the null-extended
    // side, which would otherwise suppress both marker branches.
    val differ = !(as <=> bs) || col("a.__pres").isNull || col("b.__pres").isNull
    aj.join(bj, col(s"a.$key") <=> col(s"b.$key"), "full_outer")
      .select(explode(array(
        when(col("a.__pres").isNotNull && differ, aRow),
        when(col("b.__pres").isNotNull && differ, bRow))).as("p"))
      .filter(col("p").isNotNull)
      .select(col("p.*"))
  }
}
