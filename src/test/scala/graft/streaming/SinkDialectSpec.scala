package graft.streaming

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.CdcSchema.CdcTableSpec

/** Generated-SQL contract for the sink dialects. The ANSI strings are
  * additionally executed against a live DuckDB by `JdbcSinkSpec`; the
  * ClickHouse strings are asserted here only (no store in the sandbox) —
  * the dialect's job is to pin the exact SQL a deployment would run.
  */
class SinkDialectSpec extends AnyFunSuite {

  private val spec = CdcTableSpec("order_id", Seq("invoice_number", "note"))
  private val imageType = StructType(Seq(
    StructField("order_id", IntegerType),
    StructField("invoice_number", IntegerType),
    StructField("note", StringType)))

  test("dialect selection is by URL scheme") {
    assert(SinkDialect.forUrl("jdbc:duckdb:/tmp/db") === AnsiDialect)
    assert(SinkDialect.forUrl("jdbc:postgresql://h/db") === AnsiDialect)
    assert(SinkDialect.forUrl("jdbc:sqlite::memory:") === AnsiDialect)
    assert(SinkDialect.forUrl("jdbc:clickhouse://h:8123/db") === ClickHouseDialect)
    assert(SinkDialect.forUrl("jdbc:ch://h:8123/db") === ClickHouseDialect)
  }

  test("ANSI strings are the pre-dialect sink SQL, unchanged") {
    assert(AnsiDialect.createTableSql("invoice", spec, imageType) ===
      """CREATE TABLE IF NOT EXISTS invoice (
        |  order_id INTEGER PRIMARY KEY,
        |  pos BIGINT NOT NULL, invoice_number INTEGER, note VARCHAR)""".stripMargin)
    assert(AnsiDialect.upsertSql("invoice", spec) ===
      """INSERT INTO invoice (order_id, pos, invoice_number, note) VALUES (?, ?, ?, ?)
        |ON CONFLICT (order_id) DO UPDATE SET pos = excluded.pos, invoice_number = excluded.invoice_number, note = excluded.note
        |WHERE excluded.pos > invoice.pos""".stripMargin)
    assert(AnsiDialect.metaDdlSql("invoice") ===
      "CREATE TABLE IF NOT EXISTS invoice_meta (horizon BIGINT NOT NULL)")
    assert(AnsiDialect.addColumnSql("invoice", "note", StringType) ===
      "ALTER TABLE invoice ADD COLUMN note VARCHAR")
    assert(AnsiDialect.widenValueColumnSql("invoice", "invoice_number") ===
      "ALTER TABLE invoice ALTER COLUMN invoice_number SET DATA TYPE BIGINT")
    assert(AnsiDialect.horizonDeleteSql("invoice", 42L) ===
      "DELETE FROM invoice WHERE pos <= 42")
    assert(AnsiDialect.persistHorizonSql("invoice", 42L) ===
      "UPDATE invoice_meta SET horizon = 42")
    assert(AnsiDialect.replicaSelectSql("invoice", spec) ===
      "SELECT order_id, invoice_number, note FROM invoice " +
        "WHERE (invoice_number IS NOT NULL OR note IS NOT NULL)")
    assert(AnsiDialect.supportsPkWidenRebuild)
  }

  test("ClickHouse maps the LWW contract onto ReplacingMergeTree(pos)") {
    assert(ClickHouseDialect.createTableSql("invoice", spec, imageType) ===
      """CREATE TABLE IF NOT EXISTS invoice (
        |  order_id Int32,
        |  pos Int64, invoice_number Nullable(Int32), note Nullable(String))
        |ENGINE = ReplacingMergeTree(pos)
        |ORDER BY order_id""".stripMargin)
    // no upsert in ClickHouse: writes are appends, the ENGINE keeps the
    // max-pos row per key at merge — so the statement is a plain INSERT
    assert(ClickHouseDialect.upsertSql("invoice", spec) ===
      "INSERT INTO invoice (order_id, pos, invoice_number, note) VALUES (?, ?, ?, ?)")
    assert(ClickHouseDialect.metaDdlSql("invoice") ===
      """CREATE TABLE IF NOT EXISTS invoice_meta (horizon Int64)
        |ENGINE = MergeTree ORDER BY tuple()""".stripMargin)
    assert(ClickHouseDialect.addColumnSql("invoice", "note", StringType) ===
      "ALTER TABLE invoice ADD COLUMN IF NOT EXISTS note Nullable(String)")
    assert(ClickHouseDialect.widenValueColumnSql("invoice", "invoice_number") ===
      "ALTER TABLE invoice MODIFY COLUMN invoice_number Nullable(Int64)")
    // truncate = asynchronous mutation; the persisted horizon filters
    // stragglers at apply time, so eventual deletion is sufficient
    assert(ClickHouseDialect.horizonDeleteSql("invoice", 42L) ===
      "ALTER TABLE invoice DELETE WHERE pos <= 42")
    // horizon meta is append-only (no UPDATE mutation); readHorizon's
    // MAX(horizon) folds the history for both dialects
    assert(ClickHouseDialect.persistHorizonSql("invoice", 42L) ===
      "INSERT INTO invoice_meta (horizon) VALUES (42)")
    // reads need merge-final semantics
    assert(ClickHouseDialect.replicaSelectSql("invoice", spec) ===
      "SELECT order_id, invoice_number, note FROM invoice FINAL " +
        "WHERE (invoice_number IS NOT NULL OR note IS NOT NULL)")
  }

  test("ClickHouse refuses the in-place PK-widening rebuild") {
    assert(!ClickHouseDialect.supportsPkWidenRebuild)
    // ensureTable escalates instead of attempting a non-transactional
    // copy-swap — exercised end-to-end via the dialect flag here because
    // reaching the branch needs a live store with an INTEGER key column
    // (the ANSI path is covered against DuckDB in JdbcSinkSpec)
  }
}
