package graft.streaming

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

/** The external JDBC replica sink, backed by a real JDBC engine (DuckDB's
  * driver from the test classpath — the adapter itself is pure java.sql).
  * Asserts the reference sink semantics (insert/update/delete/truncate,
  * `main.py:49-90`) land correctly, plus the engine's stronger contract:
  * idempotent re-apply, out-of-order convergence, and equality with the
  * parquet-state fold on identical input.
  */
class JdbcSinkSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = graft.TestSpark.spark

  override def afterAll(): Unit =
    anchors.synchronized {
      anchors.foreach(c => scala.util.Try(c.close()))
      anchors.clear()
    }

  private lazy val driverAvailable =
    try { Class.forName("org.duckdb.DuckDBDriver"); true }
    catch { case _: ClassNotFoundException => false }

  private def env(before: String, after: String, op: String, pos: Long) =
    s"""{"payload":{"before":$before,"after":$after,"source":{"ts_ms":${1000 + pos},"pos":$pos,"db":"dev","table":"invoice"},"op":"$op","ts_ms":${1000 + pos}}}"""

  private def batchOf(lines: String*) = {
    import spark.implicits._
    graft.cdc.Changelog.fromEnvelopeJson(lines.toDF("raw"), "raw")
  }

  // One connection per test db is held open for the suite's lifetime:
  // DuckDB checkpoints and removes the WAL when the LAST connection to a
  // file closes, and applyBatch's per-partition connections close
  // concurrently — two simultaneous last-closes race on the WAL unlink
  // (observed as a rare "Could not remove file db.wal" task failure).
  // With an anchor alive, no partition close is ever the last close. The
  // product stance is unchanged: against a real networked store there is
  // no embedded WAL, and a genuinely failed task is retried wholesale
  // (pos-guarded idempotent upserts — see JdbcSink's failure stance).
  private val anchors = scala.collection.mutable.ListBuffer.empty[java.sql.Connection]

  private def freshDb(): String = {
    val url = "jdbc:duckdb:" +
      java.nio.file.Files.createTempDirectory("jdbcsink") + "/db"
    anchors.synchronized { anchors += DriverManager.getConnection(url) }
    url
  }

  private def replica(url: String): Seq[(Int, Option[Int])] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT order_id, invoice_number FROM invoice WHERE invoice_number IS NOT NULL ORDER BY order_id")
      val buf = scala.collection.mutable.ListBuffer.empty[(Int, Option[Int])]
      while (rs.next()) buf += ((rs.getInt(1), Some(rs.getInt(2))))
      buf.toList
    } finally c.close()
  }

  test("insert/update/delete/truncate land correctly") {
    assume(driverAvailable, "duckdb jdbc driver not on test classpath")
    val url = freshDb()
    JdbcSink.applyBatch(batchOf(
      env("null", """{"order_id":1,"invoice_number":10}""", "c", 1),
      env("null", """{"order_id":2,"invoice_number":20}""", "c", 2),
      env("null", """{"order_id":3,"invoice_number":30}""", "c", 3)), url, "invoice")
    assert(replica(url) === Seq((1, Some(10)), (2, Some(20)), (3, Some(30))))

    JdbcSink.applyBatch(batchOf(
      env("""{"order_id":1,"invoice_number":10}""",
        """{"order_id":1,"invoice_number":11}""", "u", 4),
      env("""{"order_id":2,"invoice_number":20}""", "null", "d", 5)), url, "invoice")
    assert(replica(url) === Seq((1, Some(11)), (3, Some(30))))

    // truncate erases all state at-or-below its position...
    JdbcSink.applyBatch(batchOf(
      env("null", "null", "t", 6),
      env("null", """{"order_id":9,"invoice_number":90}""", "c", 7)), url, "invoice")
    assert(replica(url) === Seq((9, Some(90))))

    // ...and the persisted horizon filters stragglers in LATER batches
    JdbcSink.applyBatch(batchOf(
      env("null", """{"order_id":4,"invoice_number":40}""", "c", 5)), url, "invoice")
    assert(replica(url) === Seq((9, Some(90))))
  }

  test("idempotent re-apply and out-of-order batches converge (pos guard)") {
    assume(driverAvailable, "duckdb jdbc driver not on test classpath")
    val b1 = Seq(
      env("null", """{"order_id":1,"invoice_number":10}""", "c", 1),
      env("null", """{"order_id":2,"invoice_number":20}""", "c", 2))
    val b2 = Seq(
      env("""{"order_id":1,"invoice_number":10}""",
        """{"order_id":1,"invoice_number":11}""", "u", 3),
      env("""{"order_id":2,"invoice_number":20}""", "null", "d", 4))
    val expected = Seq((1, Some(11)))

    val inOrder = freshDb()
    JdbcSink.applyBatch(batchOf(b1: _*), inOrder, "invoice")
    JdbcSink.applyBatch(batchOf(b2: _*), inOrder, "invoice")
    assert(replica(inOrder) === expected)
    // at-least-once redelivery of an old batch: the pos guard rejects every
    // stale image, and the delete MARKER (kept, not removed) blocks
    // resurrection of key 2
    JdbcSink.applyBatch(batchOf(b1: _*), inOrder, "invoice")
    assert(replica(inOrder) === expected)

    val reversed = freshDb()
    JdbcSink.applyBatch(batchOf(b2: _*), reversed, "invoice")
    JdbcSink.applyBatch(batchOf(b1: _*), reversed, "invoice")
    assert(replica(reversed) === expected)
  }

  test("evolved spec widens an existing replica table via ALTER TABLE ADD COLUMN") {
    assume(driverAvailable, "duckdb jdbc driver not on test classpath")
    import org.apache.spark.sql.types._
    val url = freshDb()
    // narrow batch creates the table
    JdbcSink.applyBatch(batchOf(
      env("null", """{"order_id":1,"invoice_number":10}""", "c", 1)), url, "invoice")
    // the spec evolves (captured ADD COLUMN); the widened batch must land
    val (espec, etype) = graft.cdc.SchemaEvolution.evolve(
      graft.cdc.CdcSchema.invoiceSpec, graft.cdc.CdcSchema.invoiceType,
      Seq("ALTER TABLE invoice ADD COLUMN region VARCHAR(16)"))
    val wide = {
      import spark.implicits._
      graft.cdc.Changelog.fromEnvelopeJsonFor(
        Seq("""{"payload":{"after":{"order_id":2,"invoice_number":20,"region":"emea"},"source":{"pos":2}}}""")
          .toDF("raw"),
        graft.cdc.CdcSchema.invoiceSpec, etype.asInstanceOf[StructType], "raw")
    }
    JdbcSink.applyBatch(wide, url, "invoice", spec = espec)
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT order_id, invoice_number, region FROM invoice ORDER BY order_id")
      val buf = scala.collection.mutable.ListBuffer.empty[(Int, Int, String)]
      while (rs.next()) buf += ((rs.getInt(1), rs.getInt(2), rs.getString(3)))
      // pre-evolution row null-fills; widened row carries the new column
      assert(buf.toList === List((1, 10, null), (2, 20, "emea")))
    } finally c.close()
  }

  test("widening MODIFY re-types a live replica column via ALTER COLUMN") {
    assume(driverAvailable, "duckdb jdbc driver not on test classpath")
    import org.apache.spark.sql.types._
    val url = freshDb()
    // narrow batch creates the table with invoice_number INTEGER
    JdbcSink.applyBatch(batchOf(
      env("null", """{"order_id":1,"invoice_number":10}""", "c", 1)), url, "invoice")
    val (espec, etype) = graft.cdc.SchemaEvolution.evolve(
      graft.cdc.CdcSchema.invoiceSpec, graft.cdc.CdcSchema.invoiceType,
      Seq("ALTER TABLE invoice MODIFY COLUMN invoice_number BIGINT"))
    val wide = {
      import spark.implicits._
      graft.cdc.Changelog.fromEnvelopeJsonFor(
        Seq("""{"payload":{"after":{"order_id":2,"invoice_number":4000000020},"source":{"pos":2}}}""")
          .toDF("raw"),
        graft.cdc.CdcSchema.invoiceSpec, etype.asInstanceOf[StructType], "raw")
    }
    JdbcSink.applyBatch(wide, url, "invoice", spec = espec)
    val c = DriverManager.getConnection(url)
    try {
      val md = c.createStatement().executeQuery(
        "SELECT * FROM invoice WHERE 1=0").getMetaData
      val types = (1 to md.getColumnCount)
        .map(i => md.getColumnName(i).toLowerCase -> md.getColumnType(i)).toMap
      assert(types("invoice_number") === java.sql.Types.BIGINT)
      val rs = c.createStatement().executeQuery(
        "SELECT order_id, invoice_number FROM invoice ORDER BY order_id")
      val buf = scala.collection.mutable.ListBuffer.empty[(Int, Long)]
      while (rs.next()) buf += ((rs.getInt(1), rs.getLong(2)))
      // the pre-widening row survives the retype; the wide row lands
      assert(buf.toList === List((1, 10L), (2, 4000000020L)))
    } finally c.close()
  }

  test("widened KEY rebuilds the replica table (PK cannot be retyped in place)") {
    assume(driverAvailable, "duckdb jdbc driver not on test classpath")
    import org.apache.spark.sql.types._
    val url = freshDb()
    // narrow batch creates the table with order_id INTEGER PRIMARY KEY
    JdbcSink.applyBatch(batchOf(
      env("null", """{"order_id":1,"invoice_number":10}""", "c", 1)), url, "invoice")
    val (espec, etype) = graft.cdc.SchemaEvolution.evolve(
      graft.cdc.CdcSchema.invoiceSpec, graft.cdc.CdcSchema.invoiceType,
      Seq("ALTER TABLE invoice MODIFY COLUMN order_id BIGINT"))
    val wide = {
      import spark.implicits._
      graft.cdc.Changelog.fromEnvelopeJsonFor(
        Seq("""{"payload":{"after":{"order_id":4000000002,"invoice_number":20},"source":{"pos":2}}}""")
          .toDF("raw"),
        graft.cdc.CdcSchema.invoiceSpec, etype.asInstanceOf[StructType], "raw")
    }
    JdbcSink.applyBatch(wide, url, "invoice", spec = espec)
    val c = DriverManager.getConnection(url)
    try {
      val md = c.createStatement().executeQuery(
        "SELECT * FROM invoice WHERE 1=0").getMetaData
      val types = (1 to md.getColumnCount)
        .map(i => md.getColumnName(i).toLowerCase -> md.getColumnType(i)).toMap
      assert(types("order_id") === java.sql.Types.BIGINT)
      val rs = c.createStatement().executeQuery(
        "SELECT order_id, invoice_number FROM invoice ORDER BY order_id")
      val buf = scala.collection.mutable.ListBuffer.empty[(Long, Int)]
      while (rs.next()) buf += ((rs.getLong(1), rs.getInt(2)))
      // the narrow-key row survives the rebuild; the wide key lands
      assert(buf.toList === List((1L, 10), (4000000002L, 20)))
    } finally c.close()
  }

  test("batchSize=1 (per-row statements) and batched mode produce identical replicas") {
    assume(driverAvailable, "duckdb jdbc driver not on test classpath")
    val events = (1 to 50).map { i =>
      val key = i % 13
      if (i % 6 == 0) env(s"""{"order_id":$key,"invoice_number":${i * 10}}""", "null", "d", i)
      else env("null", s"""{"order_id":$key,"invoice_number":${i * 10}}""", "c", i)
    }
    val perRow = freshDb(); val batched = freshDb()
    events.grouped(25).foreach { b =>
      JdbcSink.applyBatch(batchOf(b: _*), perRow, "invoice", batchSize = 1)
      JdbcSink.applyBatch(batchOf(b: _*), batched, "invoice", batchSize = 1000)
    }
    assert(replica(perRow) === replica(batched) && replica(perRow).nonEmpty)
  }

  test("JDBC replica equals the parquet-state fold on identical input") {
    assume(driverAvailable, "duckdb jdbc driver not on test classpath")
    // deterministic mixed workload: inserts, overwrites, deletes, one
    // truncate mid-stream, stragglers below the horizon
    val events = (1 to 60).map { i =>
      val key = i % 17
      i % 7 match {
        case 0 => env(s"""{"order_id":$key,"invoice_number":${i * 10}}""", "null", "d", i)
        case 3 if i == 24 => env("null", "null", "t", i)
        case _ => env("null", s"""{"order_id":$key,"invoice_number":${i * 10}}""", "c", i)
      }
    }
    val batches = events.grouped(20).toSeq

    val url = freshDb()
    var state = CdcStream.emptyState(spark)
    batches.foreach { b =>
      JdbcSink.applyBatch(batchOf(b: _*), url, "invoice")
      state = CdcStream.mergeBatch(state, batchOf(b: _*)).localCheckpoint()
    }
    val viaParquetFold = CdcStream.snapshotOf(state).collect()
      .map(r => (r.getLong(0).toInt, Some(r.getLong(1).toInt))).toSeq
    assert(replica(url) === viaParquetFold)
  }

  test("streaming integration: foreachBatchWriter as the terminal sink") {
    assume(driverAvailable, "duckdb jdbc driver not on test classpath")
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory("jdbcstream").toString
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    Files.write(Paths.get(s"$in/b1.json"), Seq(
      env("null", """{"order_id":1,"invoice_number":10}""", "c", 1),
      env("""{"order_id":1,"invoice_number":10}""",
        """{"order_id":1,"invoice_number":12}""", "u", 2),
      env("null", """{"order_id":5,"invoice_number":50}""", "c", 3))
      .mkString("\n").getBytes)
    val url = freshDb()
    val q = CdcStream.fromFiles(spark, in).writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(JdbcSink.foreachBatchWriter(url, "invoice"))
      .start()
    // processAllAvailable blocks until every pending batch has been
    // COMMITTED (no timeout to race under parallel-suite load), and stop()
    // releases the sink's DuckDB write lock before replica() connects —
    // awaitTermination(timeout) could elapse mid-write and leave the file
    // locked, failing the read with a spurious lock error
    q.processAllAvailable()
    q.stop()
    assert(replica(url) === Seq((1, Some(12)), (5, Some(50))))
  }
}
