package graft.streaming

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.CdcSchema

/** ReplacingMergeTree READ-PATH simulation, live against DuckDB.
  *
  * `SinkDialectSpec` pins every string the ClickHouse dialect generates;
  * what it could only argue is the READ contract: that append-only
  * writes + the engine's collapse (max-`pos` row per `ORDER BY` key,
  * what `FINAL` computes for `ReplacingMergeTree(pos)`) + the dialect's
  * `replicaSelectSql` predicate converge to the SAME replica the ANSI
  * upsert dialect maintains statement-by-statement
  * (`/root/reference/kafka-consumer-service/main.py:14-17,32` is the
  * store this dialect targets; no ClickHouse runs in-sandbox).
  *
  * So the ENGINE — and only the engine — is emulated here:
  *
  *  - `FROM <t> FINAL`   → a max-pos-per-key collapse subquery;
  *  - `ALTER TABLE … DELETE` (ClickHouse's ASYNC mutation) → the same
  *    predicate as a DELETE, executed either immediately or DEFERRED to
  *    model mutation lag;
  *  - the CH `CREATE TABLE` (Int32/Nullable/ENGINE clause — string-pinned
  *    elsewhere) → the same column set in DuckDB DDL.
  *
  * Everything else — the append `INSERT`, the horizon `INSERT`, the
  * `MAX(horizon)` read, `replicaSelectSql`'s projection and live-row
  * predicate, and the apply protocol itself (fold to net per-key effect,
  * horizon advance + straggler filter) — runs VERBATIM as the dialect
  * generates it. The ANSI leg runs the identical protocol with the ANSI
  * dialect's statements, so any divergence is the dialect's fault, not
  * the harness's.
  */
class ClickHouseSimSpec extends AnyFunSuite {

  private val spec = CdcSchema.invoiceSpec
  private val imageType = CdcSchema.invoiceType
  private val table = "invoice"

  private lazy val driverAvailable =
    try { Class.forName("org.duckdb.DuckDBDriver"); true }
    catch { case _: ClassNotFoundException => false }

  /** One changelog event: a keyed row (value None = delete marker) or a
    * truncate at `pos`.
    */
  private sealed trait Ev
  private case class Rw(key: Int, pos: Long, value: Option[Int]) extends Ev
  private case class Trunc(pos: Long) extends Ev

  /** A simulated store: a fresh DuckDB db plus the dialect driving it and
    * the two engine-level translations described above.
    */
  private final class Store(val dialect: SinkDialect, emulateEngine: Boolean) {
    private val url = "jdbc:duckdb:" +
      java.nio.file.Files.createTempDirectory("chsim") + "/db"
    val conn = DriverManager.getConnection(url)
    private val pendingMutations = scala.collection.mutable.Queue.empty[String]
    var deferMutations = false

    private def exec(sql: String): Unit = {
      val st = conn.createStatement(); try st.execute(sql) finally st.close(); ()
    }

    // --- engine emulation boundary -----------------------------------
    private def runMutation(sql: String): Unit = {
      // ClickHouse ALTER ... DELETE is an async mutation with DELETE
      // semantics; model lag by queueing when deferred
      val asDelete =
        if (!emulateEngine) sql
        else sql.replace(s"ALTER TABLE $table DELETE", s"DELETE FROM $table")
          .replace(s"ALTER TABLE ${table}_meta DELETE", s"DELETE FROM ${table}_meta")
      if (deferMutations) { pendingMutations += asDelete; () } else exec(asDelete)
    }

    /** Complete all queued async mutations ("the mutation queue drains"). */
    def drainMutations(): Unit =
      while (pendingMutations.nonEmpty) exec(pendingMutations.dequeue())

    private def collapse(sql: String): String =
      if (!emulateEngine) sql
      else sql.replace(s"FROM $table FINAL",
        s"""FROM (SELECT * FROM (SELECT *, row_number() OVER
           | (PARTITION BY ${spec.key} ORDER BY pos DESC) AS __rn
           | FROM $table) WHERE __rn = 1) $table""".stripMargin.replace("\n", ""))
    // -----------------------------------------------------------------

    def ensure(): Unit = {
      if (emulateEngine)
        // same column set as the pinned CH DDL; storage clause is engine
        exec(s"CREATE TABLE IF NOT EXISTS $table " +
          s"(${spec.key} INTEGER, pos BIGINT, invoice_number INTEGER)")
      else exec(dialect.createTableSql(table, spec, imageType))
      exec(if (emulateEngine)
        s"CREATE TABLE IF NOT EXISTS ${table}_meta (horizon BIGINT)"
      else dialect.metaDdlSql(table))
      val rs = conn.createStatement().executeQuery(
        s"SELECT COUNT(*) FROM ${table}_meta")
      rs.next()
      if (rs.getLong(1) == 0)
        exec(s"INSERT INTO ${table}_meta VALUES (${Long.MinValue})")
    }

    def storedHorizon(): Long = {
      val rs = conn.createStatement().executeQuery(
        s"SELECT MAX(horizon) FROM ${table}_meta")
      rs.next(); rs.getLong(1)
    }

    /** One micro-batch under the sink's apply protocol (JdbcSink
      * semantics: horizon advance first, then the net per-key effect of
      * the batch, stragglers at-or-below the persisted horizon filtered).
      */
    def applyBatch(events: Seq[Ev]): Unit = {
      val batchHorizon =
        events.collect { case Trunc(p) => p }.maxOption.getOrElse(Long.MinValue)
      val stored = storedHorizon()
      if (batchHorizon > stored) {
        runMutation(dialect.horizonDeleteSql(table, batchHorizon))
        exec(dialect.persistHorizonSql(table, batchHorizon))
      }
      val h = math.max(stored, batchHorizon)
      val folded = events.collect { case r: Rw => r }
        .groupBy(_.key).values.map(_.maxBy(_.pos))
        .filter(_.pos > h).toSeq.sortBy(_.key)
      val ps = conn.prepareStatement(dialect.upsertSql(table, spec))
      try folded.foreach { r =>
        ps.setInt(1, r.key); ps.setLong(2, r.pos)
        r.value match {
          case Some(v) => ps.setInt(3, v)
          case None => ps.setNull(3, java.sql.Types.INTEGER)
        }
        ps.executeUpdate()
      } finally ps.close()
    }

    def metaCleanup(): Unit = runMutation(
      dialect.metaCleanupSql(table, storedHorizon()))

    def metaRows(): Long = {
      val rs = conn.createStatement().executeQuery(
        s"SELECT COUNT(*) FROM ${table}_meta")
      rs.next(); rs.getLong(1)
    }

    def replica(): Seq[(Int, Int)] = {
      val rs = conn.createStatement().executeQuery(
        collapse(dialect.replicaSelectSql(table, spec)) + s" ORDER BY ${spec.key}")
      val buf = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
      while (rs.next()) buf += ((rs.getInt(1), rs.getInt(2)))
      buf.toList
    }

    def close(): Unit = conn.close()
  }

  private def bothStores(): (Store, Store) =
    (new Store(AnsiDialect, emulateEngine = false),
      new Store(ClickHouseDialect, emulateEngine = true))

  private def applyAll(batches: Seq[Seq[Ev]])(s: Store): Seq[(Int, Int)] = {
    s.ensure()
    batches.foreach(s.applyBatch)
    s.drainMutations()
    val r = s.replica()
    s.close()
    r
  }

  test("out-of-order updates, redelivery, delete markers: CH collapse == ANSI upsert") {
    assume(driverAvailable)
    val batches = Seq(
      Seq(Rw(1, 1, Some(10)), Rw(2, 2, Some(20)), Rw(3, 3, Some(30))),
      // out-of-order: pos 5 lands before 4; the stale 4 must lose on BOTH
      Seq(Rw(1, 5, Some(15)), Rw(1, 4, Some(14)), Rw(3, 6, None)), // 3 deleted
      // whole-batch redelivery (at-least-once): identical (key,pos) rows
      Seq(Rw(1, 5, Some(15)), Rw(1, 4, Some(14)), Rw(3, 6, None)),
      // a late OLDER event for the deleted key must not resurrect it
      Seq(Rw(3, 4, Some(34)), Rw(4, 7, Some(40))))
    val (ansi, ch) = bothStores()
    val a = applyAll(batches)(ansi)
    val c = applyAll(batches)(ch)
    assert(a === Seq((1, 15), (2, 20), (4, 40)))
    assert(c === a)
  }

  test("truncate: horizon advance + async mutation converge to the ANSI replica") {
    assume(driverAvailable)
    val batches = Seq(
      Seq(Rw(1, 1, Some(10)), Rw(2, 2, Some(20))),
      // truncate at 5, then new life after it
      Seq(Trunc(5), Rw(3, 6, Some(30))),
      // stragglers at-or-below the persisted horizon arrive LATE and are
      // filtered by the apply protocol on both stores
      Seq(Rw(1, 4, Some(11)), Rw(4, 7, Some(40))))
    val (ansi, ch) = bothStores()
    val a = applyAll(batches)(ansi)
    val c = applyAll(batches)(ch)
    assert(a === Seq((3, 30), (4, 40)))
    assert(c === a)
  }

  test("mutation lag: deferred delete is invisible after drain; horizon still filters") {
    assume(driverAvailable)
    val ch = new Store(ClickHouseDialect, emulateEngine = true)
    ch.ensure()
    ch.applyBatch(Seq(Rw(1, 1, Some(10)), Rw(2, 2, Some(20))))
    ch.deferMutations = true
    ch.applyBatch(Seq(Trunc(5), Rw(3, 6, Some(30))))
    // the mutation has NOT run: pre-truncate rows are still physically
    // present (the documented transient window of an async store)...
    assert(ch.replica() === Seq((1, 10), (2, 20), (3, 30)))
    // ...but the persisted horizon already filters re-deliveries
    ch.applyBatch(Seq(Rw(1, 4, Some(11))))
    assert(ch.replica() === Seq((1, 10), (2, 20), (3, 30)))
    // mutation queue drains → converged replica
    ch.drainMutations()
    assert(ch.replica() === Seq((3, 30)))
    ch.close()
  }

  test("meta cleanup bounds the append-per-advance horizon table") {
    assume(driverAvailable)
    val ch = new Store(ClickHouseDialect, emulateEngine = true)
    ch.ensure()
    (1L to 5L).foreach(i => ch.applyBatch(Seq(Trunc(i * 10))))
    assert(ch.metaRows() === 6) // seed + 5 advances
    assert(ch.storedHorizon() === 50L)
    ch.metaCleanup()
    assert(ch.metaRows() === 1) // only the MAX row survives
    assert(ch.storedHorizon() === 50L) // and the horizon read is unchanged
    ch.close()
  }

  test("metaCleanupSql strings are pinned for both dialects") {
    assert(AnsiDialect.metaCleanupSql("invoice", 50L) ===
      "DELETE FROM invoice_meta WHERE horizon < 50")
    assert(ClickHouseDialect.metaCleanupSql("invoice", 50L) ===
      "ALTER TABLE invoice_meta DELETE WHERE horizon < 50")
  }
}
