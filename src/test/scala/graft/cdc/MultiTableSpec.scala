package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Multi-table CDC: one interleaved changelog maintaining several tables,
  * with per-table truncate horizons (a TRUNCATE resets only its own table).
  * Also exercises envelope ingestion from different text container formats
  * (JSON-lines via text source, CSV) — the wire value is a string wherever
  * it arrives from.
  */
class MultiTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def env(db: String, table: String, before: String, after: String,
                  op: String, pos: Long) =
    s"""{"payload":{"before":$before,"after":$after,"source":{"ts_ms":${1000 + pos},"pos":$pos,"db":"$db","table":"$table"},"op":"$op","ts_ms":${1000 + pos}}}"""

  private val interleaved = Seq(
    env("dev", "invoice", "null", """{"order_id":1,"invoice_number":10}""", "c", 1),
    env("dev", "payment", "null", """{"order_id":1,"invoice_number":99}""", "c", 2),
    env("dev", "invoice", "null", """{"order_id":2,"invoice_number":20}""", "c", 3),
    env("dev", "payment", "null", """{"order_id":2,"invoice_number":88}""", "c", 4),
    env("dev", "invoice", "null", "null", "t", 5), // truncate invoice ONLY
    env("dev", "invoice", "null", """{"order_id":3,"invoice_number":30}""", "c", 6),
    env("dev", "payment",
      """{"order_id":2,"invoice_number":88}""",
      """{"order_id":2,"invoice_number":89}""", "u", 7))

  private def multiLog(lines: Seq[String]) =
    Changelog.fromEnvelopeJsonMulti(
      spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING).toDF("value"))

  test("truncate resets only its own table; others keep full history") {
    val snap = CdcApply.snapshotByTable(multiLog(interleaved)).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(snap.toSeq === Seq(
      ("invoice", 3L, 30L),              // pre-truncate invoice rows erased
      ("payment", 1L, 99L), ("payment", 2L, 89L))) // payment untouched, update applied
  }

  test("a table with no truncate has a null horizon and keeps everything") {
    val noTrunc = interleaved.filterNot(_.contains(""""op":"t""""))
    val snap = CdcApply.snapshotByTable(multiLog(noTrunc)).collect()
    assert(snap.length === 5)
  }

  test("same envelopes ingested from CSV arrive at the same snapshot") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("csvsrc").toString
    // single-column CSV, quoted; the value column is the envelope string
    val quoted = interleaved.map(l => "\"" + l.replace("\"", "\"\"") + "\"")
    Files.write(Paths.get(s"$dir/log.csv"), quoted.mkString("\n").getBytes)
    val fromCsv = spark.read
      .schema("value STRING")
      .option("quote", "\"").option("escape", "\"")
      .csv(dir)
    val a = CdcApply.snapshotByTable(multiLog(interleaved)).collect().toSeq
    val b = CdcApply.snapshotByTable(
      Changelog.fromEnvelopeJsonMulti(fromCsv)).collect().toSeq
    assert(a === b)
  }
}
