package graft.streaming

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.CdcSchema

/** External JDBC replica sink — the engine's adapter for the reference's
  * terminal-sink topology (a ClickHouse table mutated over the network,
  * `/root/reference/kafka-consumer-service/main.py:14-17,32`), expressed
  * as the SAME merge contract the parquet state uses instead of generated
  * DML strings:
  *
  *  - the external table holds `(key PRIMARY KEY, pos, valueCols…)` —
  *    last-writer-wins by binlog position, enforced IN the upsert
  *    (`ON CONFLICT … DO UPDATE … WHERE excluded.pos > t.pos`), so
  *    at-least-once redelivery and out-of-order batches converge exactly
  *    like `CdcStream.mergeBatch`;
  *  - deletes keep a NULL-valued marker row (pos-guarded), so a late
  *    redelivered older event cannot resurrect a deleted key; the replica
  *    view is `WHERE <values> IS NOT NULL`;
  *  - truncate is a position horizon: rows at-or-below it are deleted and
  *    the horizon is persisted in `<table>_meta`, filtering later
  *    stragglers — C4's generation semantics, not a TRUNCATE statement.
  *
  * Per micro-batch the batch is folded to its net per-key effect FIRST
  * (`mergeBatch` against empty state — one row per key), then applied with
  * one prepared upsert per key from `foreachPartition`: work and SQL
  * round-trips are O(|delta|), connections are per-partition (the standard
  * executor-side JDBC pattern; `numPartitions` bounds the fan-in for
  * stores that dislike many writers). SQL generation is behind
  * [[SinkDialect]], selected by URL scheme: ANSI `ON CONFLICT`
  * (DuckDB/Postgres/SQLite) by default, `ReplacingMergeTree(pos)`
  * appends for a `jdbc:clickhouse:` URL (the reference's terminal
  * store) — the contract (keyed last-writer-wins by pos) is what this
  * object fixes, not the dialect.
  *
  * Everything here is plain `java.sql` — no driver classes referenced; the
  * driver jar on the executor classpath is discovered by DriverManager.
  *
  * Failure stance: a partition task that dies mid-apply (dropped
  * connection, transient store error) is SAFE to re-run wholesale — every
  * statement is a pos-guarded idempotent upsert, so Spark's ordinary task
  * retry (`spark.task.maxFailures`) is the recovery mechanism; the sink
  * deliberately adds no retry loop of its own.
  */
object JdbcSink {

  /** Default rows per `executeBatch` flush — bounds per-connection batch
    * memory while cutting round-trips ~1000× vs per-row executeUpdate.
    * `JdbcSoak` measures the difference by passing 1 (the reference's
    * one-statement-per-message chattiness) vs this.
    */
  val DefaultBatchSize = 1000

  /** Row count above which the PK-widening rebuild logs an offline-migration
    * warning ([[ensureTable]]) — the rebuild copies the whole replica through
    * one connection in one transaction, which is fine for test-scale tables
    * and an operations event for multi-TB ones.
    */
  val WidenRebuildWarnRows = 10_000_000L

  private def jdbcType(dt: DataType): Int = dt match {
    case IntegerType => java.sql.Types.INTEGER
    case LongType => java.sql.Types.BIGINT
    case StringType => java.sql.Types.VARCHAR
    case other => throw new IllegalArgumentException(s"unsupported $other")
  }

  /** Idempotent DDL: replica table + single-row horizon meta table.
    * Schema evolution propagates: value columns the spec has that the
    * EXISTING table lacks (the spec evolved via a captured ADD COLUMN —
    * `cdc.SchemaEvolution`) are added with `ALTER TABLE ADD COLUMN`,
    * nullable — existing rows null-fill, matching both MySQL's backfill
    * and the parquet replica's lazy read-time widening.
    */
  def ensureTable(conn: Connection, table: String,
                  spec: CdcSchema.CdcTableSpec, imageType: StructType,
                  dialect: SinkDialect = AnsiDialect): Unit = {
    val st = conn.createStatement()
    try {
      st.execute(dialect.createTableSql(table, spec, imageType))
      // portable existing-column probe (empty result set metadata — no
      // reliance on engine-specific catalog case conventions)
      val probe = st.executeQuery(s"SELECT * FROM $table WHERE 1=0")
      val md = probe.getMetaData
      val existing = (1 to md.getColumnCount)
        .map(i => md.getColumnName(i).toLowerCase -> md.getColumnType(i)).toMap
      spec.valueCols.filterNot(c => existing.contains(c.toLowerCase)).foreach { c =>
        st.execute(dialect.addColumnSql(table, c, imageType(c).dataType))
      }
      // widen live INTEGER columns an evolved spec re-typed to BIGINT
      // (MODIFY COLUMN application) — the only retype the engine allows
      def needsWiden(c: String): Boolean =
        imageType(c).dataType == org.apache.spark.sql.types.LongType &&
          existing.get(c.toLowerCase).contains(java.sql.Types.INTEGER)
      spec.valueCols.filter(needsWiden).foreach { c =>
        st.execute(dialect.widenValueColumnSql(table, c))
      }
      // a widened KEY cannot be retyped in place: stores reject ALTERing
      // a PRIMARY KEY column (DuckDB: "Cannot change the type of a column
      // that has a UNIQUE or PRIMARY KEY constraint"). Rebuild instead —
      // one transaction, so a crash mid-migration leaves the old table.
      // NOTE: this copies the ENTIRE replica through one connection; for a
      // large (multi-TB) replica treat a key widening as an OFFLINE
      // migration window, not a live schema change — the size guard below
      // logs the row count so operators can see what they signed up for.
      if (needsWiden(spec.key)) {
        if (!dialect.supportsPkWidenRebuild)
          throw new UnsupportedOperationException(
            s"${dialect.name}: cannot retype the ORDER BY/PRIMARY KEY column " +
              s"${spec.key} in place and has no transactional copy-swap; " +
              "run the key widening as an offline rebuild migration")
        val cnt = st.executeQuery(s"SELECT COUNT(*) FROM $table")
        cnt.next()
        val nRows = cnt.getLong(1)
        if (nRows > WidenRebuildWarnRows)
          System.err.println(
            s"[graft.JdbcSink] PK-widening rebuild of $table copies $nRows rows " +
              "through one connection in one transaction; schedule as an offline migration")
        // name columns on BOTH sides: the copy must not depend on the live
        // table's physical column order (manual DDL or a store with
        // different ordering rules would silently mis-map a SELECT *)
        val colList = (Seq(spec.key, "pos") ++ spec.valueCols).mkString(", ")
        val valueDdl = spec.valueCols
          .map(c => s"$c ${dialect.sqlType(imageType(c).dataType, nullable = true)}")
          .mkString(", ")
        st.execute("BEGIN TRANSACTION")
        st.execute(
          s"""CREATE TABLE ${table}__wide (
             |  ${spec.key} BIGINT PRIMARY KEY, pos BIGINT NOT NULL, $valueDdl)""".stripMargin)
        st.execute(s"INSERT INTO ${table}__wide ($colList) SELECT $colList FROM $table")
        st.execute(s"DROP TABLE $table")
        st.execute(s"ALTER TABLE ${table}__wide RENAME TO $table")
        st.execute("COMMIT")
      }
      st.execute(dialect.metaDdlSql(table))
      val rs = st.executeQuery(s"SELECT COUNT(*) FROM ${table}_meta")
      rs.next()
      if (rs.getLong(1) == 0)
        st.execute(s"INSERT INTO ${table}_meta VALUES (${Long.MinValue})")
    } finally st.close()
  }

  private def readHorizon(conn: Connection, table: String): Long = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(s"SELECT MAX(horizon) FROM ${table}_meta")
      rs.next(); rs.getLong(1)
    } finally st.close()
  }

  /** Apply one micro-batch of changelog events (the normalized
    * `Changelog.fromEnvelopeJson` shape) to the JDBC replica. Idempotent:
    * re-applying any batch — or any interleaving of already-applied
    * batches — leaves the table unchanged.
    */
  def applyBatch(batch: DataFrame, url: String, table: String,
                 spec: CdcSchema.CdcTableSpec = CdcSchema.invoiceSpec,
                 numPartitions: Int = 8,
                 batchSize: Int = DefaultBatchSize): Unit = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val dialect = SinkDialect.forUrl(url)
    val spark = batch.sparkSession
    val imageType = batch.schema("after").dataType.asInstanceOf[StructType]
    val keyJdbc = jdbcType(imageType(spec.key).dataType)
    val valueJdbc = spec.valueCols.map(c => jdbcType(imageType(c).dataType))

    // net per-key effect of THIS batch (one row per key + the horizon row)
    val folded = CdcStream.mergeBatch(
      CdcStream.emptyStateFor(spark, spec, imageType), batch, spec = spec).persist()
    try {
      val batchHorizon = folded.filter(col("key").isNull)
        .select(max(col("pos"))).collect()(0).getLong(0)

      val conn = DriverManager.getConnection(url)
      val storedHorizon =
        try {
          ensureTable(conn, table, spec, imageType, dialect)
          val stored = readHorizon(conn, table)
          if (batchHorizon > stored) {
            val st = conn.createStatement()
            try {
              // C4: erase everything at-or-below the horizon, then persist
              // it so stragglers in LATER batches are filtered too
              st.execute(dialect.horizonDeleteSql(table, batchHorizon))
              st.execute(dialect.persistHorizonSql(table, batchHorizon))
            } finally st.close()
          }
          math.max(stored, batchHorizon)
        } finally conn.close()

      val sql = dialect.upsertSql(table, spec)
      val valueCols = spec.valueCols
      folded
        .filter(col("key").isNotNull && col("pos") > storedHorizon)
        .repartition(numPartitions, col("key"))
        .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
          if (rows.hasNext) {
            val c = DriverManager.getConnection(url)
            try {
              val ps = c.prepareStatement(sql)
              // statements accumulate into client-side JDBC batches (per
              // partition connection, on the executor) flushed every
              // `batchSize` rows: per-row executeUpdate would pay one
              // network round-trip per key against a remote store — the
              // reference's one-insert-per-message chattiness (main.py:45)
              // this sink exists to replace. Upserts within one batch are
              // distinct keys (folded is one row per key), so batch
              // execution order cannot change the outcome.
              var pending = 0
              try {
                rows.foreach { r =>
                  ps.setObject(1, r.getAs[Any]("key"), keyJdbc)
                  ps.setLong(2, r.getAs[Long]("pos"))
                  val after = r.getAs[org.apache.spark.sql.Row]("after")
                  valueCols.zip(valueJdbc).zipWithIndex.foreach { case ((vc, jt), i) =>
                    val v = if (after == null) null else after.getAs[Any](vc)
                    if (v == null) ps.setNull(3 + i, jt) else ps.setObject(3 + i, v, jt)
                  }
                  ps.addBatch()
                  pending += 1
                  if (pending >= batchSize) { val _ = ps.executeBatch(); pending = 0 }
                }
                if (pending > 0) { val _ = ps.executeBatch() }
                ()
              } finally ps.close()
            } finally c.close()
          }
        }
    } finally folded.unpersist()
    ()
  }

  /** `writeStream.foreachBatch` adapter: the reference topology's terminal
    * sink as one line of wiring.
    */
  def foreachBatchWriter(url: String, table: String,
                         spec: CdcSchema.CdcTableSpec = CdcSchema.invoiceSpec,
                         numPartitions: Int = 8,
                         batchSize: Int = DefaultBatchSize): (DataFrame, Long) => Unit =
    (batch, _) => applyBatch(batch, url, table, spec, numPartitions, batchSize)
}
