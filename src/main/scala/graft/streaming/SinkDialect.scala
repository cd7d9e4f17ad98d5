package graft.streaming

import org.apache.spark.sql.types._

import graft.cdc.CdcSchema.CdcTableSpec

/** Store dialect for the external replica sink ([[JdbcSink]]).
  *
  * The contract JdbcSink fixes — keyed last-writer-wins by binlog `pos`,
  * NULL-marker deletes, a persisted truncate horizon — is store-agnostic;
  * what varies is how a store expresses "keep the newest row per key":
  *
  *  - '''ANSI''' upsert stores (DuckDB / Postgres / SQLite): a conditional
  *    `INSERT … ON CONFLICT … DO UPDATE … WHERE excluded.pos > t.pos`.
  *    The guard runs per statement, so the table always holds exactly the
  *    per-key winners and reads are plain SELECTs.
  *  - '''ClickHouse''' — the reference's actual terminal store
  *    (`/root/reference/kafka-consumer-service/main.py:14-17`) — has no
  *    upsert. The idiomatic mapping is a `ReplacingMergeTree(pos)` table:
  *    writes are plain appends and the ENGINE keeps the max-`pos` row per
  *    `ORDER BY` key at background-merge time; reads ask for merge-final
  *    semantics with `FINAL`. Same converged state — the LWW fold moves
  *    from statement time into the storage engine. Appends also make
  *    at-least-once redelivery free: a re-applied batch re-inserts
  *    identical `(key, pos, …)` rows, and version-equal duplicates
  *    collapse to one row at merge.
  *
  * Consequently the horizon meta table is append-only under ClickHouse
  * (no UPDATE mutation needed): [[JdbcSink.readHorizon]] already reads
  * `MAX(horizon)`, which is correct for both the single-row ANSI shape
  * and the append-per-advance ClickHouse shape. Truncate becomes an
  * `ALTER TABLE … DELETE` mutation (asynchronous in ClickHouse; the
  * persisted horizon filters stragglers regardless, so eventual mutation
  * is sufficient — same argument as the parquet state's lazy GC).
  *
  * What is NOT expressible in-dialect: retyping the `ORDER BY` key of a
  * MergeTree table (ClickHouse rejects MODIFY COLUMN on key columns, like
  * every store rejects retyping a PRIMARY KEY) — a PK widening is an
  * explicit offline rebuild there, so [[ClickHouseDialect.supportsPkWidenRebuild]]
  * is false and [[JdbcSink.ensureTable]] refuses loudly instead of
  * attempting a non-transactional in-place migration (ClickHouse has no
  * multi-statement transactions to make the ANSI rebuild safe).
  *
  * Selection is by JDBC URL scheme ([[SinkDialect.forUrl]]); no store
  * driver classes are referenced — generated SQL is asserted in
  * `SinkDialectSpec`, and the ANSI dialect is additionally exercised
  * against a live DuckDB in `JdbcSinkSpec`.
  */
sealed trait SinkDialect {
  def name: String

  /** SQL type for the narrow envelope image column set (SURVEY §1.2:
    * int32/int64/string). `nullable` marks value columns — ClickHouse
    * needs the wrapper spelled out; ANSI columns are nullable by default.
    */
  def sqlType(dt: DataType, nullable: Boolean): String

  /** Replica table DDL (idempotent). */
  def createTableSql(table: String, spec: CdcTableSpec, imageType: StructType): String

  /** Horizon meta table DDL (idempotent). */
  def metaDdlSql(table: String): String

  /** The per-key write: ANSI = pos-guarded conditional upsert; ClickHouse
    * = plain append (the ReplacingMergeTree ENGINE is the guard).
    */
  def upsertSql(table: String, spec: CdcTableSpec): String

  /** Evolution: append a captured ADD COLUMN (nullable — existing rows
    * null-fill, matching MySQL's backfill and the parquet replica).
    */
  def addColumnSql(table: String, column: String, dt: DataType): String

  /** Evolution: widen a live value column to the retype the engine allows
    * (int32 → int64, a captured MODIFY COLUMN).
    */
  def widenValueColumnSql(table: String, column: String): String

  /** C4 truncate: erase rows at-or-below the horizon. */
  def horizonDeleteSql(table: String, horizon: Long): String

  /** Persist an advanced horizon (read back as `MAX(horizon)`). */
  def persistHorizonSql(table: String, horizon: Long): String

  /** Whether a widened PRIMARY KEY can be rebuilt in place inside one
    * transaction ([[JdbcSink.ensureTable]]'s copy-swap). False ⇒ the
    * sink refuses and the widening is an offline migration.
    */
  def supportsPkWidenRebuild: Boolean

  /** The replica read: live rows only (delete markers are all-values-NULL
    * rows). Documents the dialect's read shape; ClickHouse needs `FINAL`.
    */
  def replicaSelectSql(table: String, spec: CdcTableSpec): String

  /** Periodic horizon-meta maintenance: drop meta rows strictly below
    * `keepAtOrAbove` (the caller passes the current MAX(horizon), so the
    * winning row always survives). ANSI stores keep a single row UPDATEd
    * in place, so this is a cheap no-op DELETE; ClickHouse's meta is
    * append-per-advance — without occasional cleanup a long-running sink
    * grows the meta table (and each advance queues one async mutation)
    * without bound. Run at maintenance cadence, not per batch; both the
    * statement and the `MAX(horizon)` read stay correct whether or not
    * cleanup has happened.
    */
  def metaCleanupSql(table: String, keepAtOrAbove: Long): String

  protected def liveRowPredicate(spec: CdcTableSpec): String =
    spec.valueCols.map(c => s"$c IS NOT NULL").mkString("(", " OR ", ")")
}

object SinkDialect {
  /** Dialect by JDBC URL scheme. Anything that is not ClickHouse gets the
    * ANSI conditional upsert — the portable default the sink was built
    * against (DuckDB in tests; Postgres/SQLite share the syntax).
    */
  def forUrl(url: String): SinkDialect =
    if (url.startsWith("jdbc:clickhouse:") || url.startsWith("jdbc:ch:"))
      ClickHouseDialect
    else AnsiDialect
}

/** Portable ANSI `ON CONFLICT` dialect (DuckDB / Postgres / SQLite). The
  * strings here are byte-identical to what [[JdbcSink]] generated before
  * dialects existed — `JdbcSinkSpec` runs them against a live DuckDB.
  */
case object AnsiDialect extends SinkDialect {
  val name = "ansi"

  def sqlType(dt: DataType, nullable: Boolean): String = dt match {
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case StringType => "VARCHAR"
    case other => throw new IllegalArgumentException(
      s"unsupported image column type $other (envelope carries int32/int64/string)")
  }

  def createTableSql(table: String, spec: CdcTableSpec, imageType: StructType): String = {
    val valueDdl = spec.valueCols
      .map(c => s"$c ${sqlType(imageType(c).dataType, nullable = true)}").mkString(", ")
    s"""CREATE TABLE IF NOT EXISTS $table (
       |  ${spec.key} ${sqlType(imageType(spec.key).dataType, nullable = false)} PRIMARY KEY,
       |  pos BIGINT NOT NULL, $valueDdl)""".stripMargin
  }

  def metaDdlSql(table: String): String =
    s"CREATE TABLE IF NOT EXISTS ${table}_meta (horizon BIGINT NOT NULL)"

  def upsertSql(table: String, spec: CdcTableSpec): String = {
    val cols = (Seq(spec.key, "pos") ++ spec.valueCols).mkString(", ")
    val marks = (Seq(spec.key, "pos") ++ spec.valueCols).map(_ => "?").mkString(", ")
    val sets = ("pos" +: spec.valueCols)
      .map(c => s"$c = excluded.$c").mkString(", ")
    s"""INSERT INTO $table ($cols) VALUES ($marks)
       |ON CONFLICT (${spec.key}) DO UPDATE SET $sets
       |WHERE excluded.pos > $table.pos""".stripMargin
  }

  def addColumnSql(table: String, column: String, dt: DataType): String =
    s"ALTER TABLE $table ADD COLUMN $column ${sqlType(dt, nullable = true)}"

  def widenValueColumnSql(table: String, column: String): String =
    s"ALTER TABLE $table ALTER COLUMN $column SET DATA TYPE BIGINT"

  def horizonDeleteSql(table: String, horizon: Long): String =
    s"DELETE FROM $table WHERE pos <= $horizon"

  def persistHorizonSql(table: String, horizon: Long): String =
    s"UPDATE ${table}_meta SET horizon = $horizon"

  val supportsPkWidenRebuild = true

  def replicaSelectSql(table: String, spec: CdcTableSpec): String =
    s"SELECT ${spec.allCols.mkString(", ")} FROM $table " +
      s"WHERE ${liveRowPredicate(spec)}"

  def metaCleanupSql(table: String, keepAtOrAbove: Long): String =
    s"DELETE FROM ${table}_meta WHERE horizon < $keepAtOrAbove"
}

/** ClickHouse `ReplacingMergeTree(pos)` dialect — append-only LWW. */
case object ClickHouseDialect extends SinkDialect {
  val name = "clickhouse"

  def sqlType(dt: DataType, nullable: Boolean): String = {
    val base = dt match {
      case IntegerType => "Int32"
      case LongType => "Int64"
      case StringType => "String"
      case other => throw new IllegalArgumentException(
        s"unsupported image column type $other (envelope carries int32/int64/string)")
    }
    if (nullable) s"Nullable($base)" else base
  }

  def createTableSql(table: String, spec: CdcTableSpec, imageType: StructType): String = {
    val valueDdl = spec.valueCols
      .map(c => s"$c ${sqlType(imageType(c).dataType, nullable = true)}").mkString(", ")
    s"""CREATE TABLE IF NOT EXISTS $table (
       |  ${spec.key} ${sqlType(imageType(spec.key).dataType, nullable = false)},
       |  pos Int64, $valueDdl)
       |ENGINE = ReplacingMergeTree(pos)
       |ORDER BY ${spec.key}""".stripMargin
  }

  // append-per-advance; readHorizon's MAX(horizon) folds the history
  def metaDdlSql(table: String): String =
    s"""CREATE TABLE IF NOT EXISTS ${table}_meta (horizon Int64)
       |ENGINE = MergeTree ORDER BY tuple()""".stripMargin

  def upsertSql(table: String, spec: CdcTableSpec): String = {
    val cols = (Seq(spec.key, "pos") ++ spec.valueCols).mkString(", ")
    val marks = (Seq(spec.key, "pos") ++ spec.valueCols).map(_ => "?").mkString(", ")
    s"INSERT INTO $table ($cols) VALUES ($marks)"
  }

  def addColumnSql(table: String, column: String, dt: DataType): String =
    s"ALTER TABLE $table ADD COLUMN IF NOT EXISTS $column ${sqlType(dt, nullable = true)}"

  def widenValueColumnSql(table: String, column: String): String =
    s"ALTER TABLE $table MODIFY COLUMN $column Nullable(Int64)"

  // asynchronous mutation — sufficient: the persisted horizon filters
  // stragglers at apply time whether or not the mutation has completed
  def horizonDeleteSql(table: String, horizon: Long): String =
    s"ALTER TABLE $table DELETE WHERE pos <= $horizon"

  def persistHorizonSql(table: String, horizon: Long): String =
    s"INSERT INTO ${table}_meta (horizon) VALUES ($horizon)"

  val supportsPkWidenRebuild = false

  def replicaSelectSql(table: String, spec: CdcTableSpec): String =
    s"SELECT ${spec.allCols.mkString(", ")} FROM $table FINAL " +
      s"WHERE ${liveRowPredicate(spec)}"

  // async mutation, like the horizon delete; the MAX row is kept by the
  // caller-supplied bound, so a read racing the mutation is unaffected
  def metaCleanupSql(table: String, keepAtOrAbove: Long): String =
    s"ALTER TABLE ${table}_meta DELETE WHERE horizon < $keepAtOrAbove"
}
