package graft.cdc

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit vectors: the four golden envelope fixtures (values from
  * `/root/reference/kafka-consumer-service/example/{insert,update,delete,
  * truncate}.json` payloads, see FIXTURES.md A4) plus the Kafka tombstone,
  * driven through the parse → classify → apply fold.
  */
class CdcApplySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Compact envelopes: the narrow from_json schema reads only payload.*,
  // so the (unused, ~90%-of-bytes) Connect schema block is omitted.
  private def env(before: String, after: String, op: String, pos: Long, tsMs: Long) =
    s"""{"payload":{"before":$before,"after":$after,
       |"source":{"ts_ms":$tsMs,"pos":$pos,"db":"dev","table":"invoice"},
       |"op":"$op","ts_ms":$tsMs}}""".stripMargin.replace("\n", "")

  val insertJson   = env("null", """{"order_id":100,"invoice_number":100}""", "c", 361, 1696500000000L)
  val deleteJson   = env("""{"order_id":100,"invoice_number":100}""", "null", "d", 639, 1696500001000L)
  val updateJson   = env("""{"order_id":100,"invoice_number":100}""", """{"order_id":100,"invoice_number":200}""", "u", 926, 1696500002000L)
  val truncateJson = env("null", "null", "t", 235, 1696499999000L)

  private def parse(lines: Seq[String]) =
    Changelog.fromEnvelopeJson(
      spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING).toDF("value"))

  test("tombstone (null value) rows are dropped before parsing") {
    val withTombstone = spark.createDataFrame(
      java.util.Arrays.asList(Row(insertJson), Row(null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType, nullable = true))))
    assert(Changelog.fromEnvelopeJson(withTombstone).count() === 1)
  }

  test("envelope parse extracts pos/op/images from the narrow schema") {
    val rows = parse(Seq(insertJson)).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("pos") === 361L)
    assert(r.getAs[String]("op") === "c")
    assert(r.getAs[Row]("before") === null)
    assert(r.getAs[Row]("after").getAs[Int]("order_id") === 100)
  }

  test("nullity classification matches reference dispatch (main.py:49-90)") {
    import org.apache.spark.sql.functions.col
    val ops = parse(Seq(insertJson, updateJson, deleteJson, truncateJson))
      .select(CdcApply.opOf(col("before"), col("after")))
      .collect().map(_.getString(0)).sorted
    assert(ops.toSeq === Seq("c", "d", "t", "u"))
  }

  test("insert then delete then (re)insert nets to the latest insert") {
    val log = parse(Seq(
      env("null", """{"order_id":1,"invoice_number":10}""", "c", 1, 0),
      env("""{"order_id":1,"invoice_number":10}""", "null", "d", 2, 0),
      env("null", """{"order_id":1,"invoice_number":30}""", "c", 3, 0)))
    val snap = CdcApply.snapshot(log).collect()
    assert(snap.toSeq.map(r => (r.getLong(0), r.getLong(1))) === Seq((1L, 30L)))
  }

  test("delete as final event removes the key") {
    val log = parse(Seq(insertJson, deleteJson)) // pos 361 then 639
    assert(CdcApply.snapshot(log).count() === 0)
  }

  test("update keyed by PK rewrites the non-PK column (golden trio)") {
    val log = parse(Seq(insertJson, deleteJson, updateJson)) // 361,639,926
    val snap = CdcApply.snapshot(log).collect()
    assert(snap.toSeq.map(r => (r.getLong(0), r.getLong(1))) === Seq((100L, 200L)))
  }

  test("truncate erases all events at or before its position") {
    val log = parse(Seq(
      env("null", """{"order_id":1,"invoice_number":1}""", "c", 10, 0),
      env("null", """{"order_id":2,"invoice_number":2}""", "c", 20, 0),
      env("null", "null", "t", 25, 0),
      env("null", """{"order_id":3,"invoice_number":3}""", "c", 30, 0)))
    val snap = CdcApply.snapshot(log).collect()
    assert(snap.toSeq.map(r => (r.getLong(0), r.getLong(1))) === Seq((3L, 3L)))
  }

  test("golden truncate fixture (pos 235) precedes the trio — full replay") {
    val log = parse(Seq(truncateJson, insertJson, deleteJson, updateJson))
    val snap = CdcApply.snapshot(log).collect()
    assert(snap.toSeq.map(r => (r.getLong(0), r.getLong(1))) === Seq((100L, 200L)))
  }

  test("snapshot and window formulation agree on the synthetic changelog") {
    val log = Changelog.synthetic(spark, TestSpark.sf0001)
    assert(CdcApply.consistencyDiff(
      CdcApply.snapshot(log), CdcApply.snapshotViaWindow(log)).count() === 0)
  }

  test("audit log carries every non-tombstone event including truncates") {
    val log = parse(Seq(truncateJson, insertJson, deleteJson, updateJson))
    val audit = CdcApply.auditLog(log).collect()
    assert(audit.length === 4)
    assert(audit.map(_.getAs[String]("op")).toSeq === Seq("t", "c", "d", "u")) // pos order
  }
}
