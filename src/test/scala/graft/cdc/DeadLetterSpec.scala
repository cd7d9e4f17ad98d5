package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dead-letter routing (reference C5 fallback, `main.py:92-93`): malformed
  * envelopes are quarantined with their raw payload, never silently dropped
  * and never crashing the fold; tombstones (null values) remain plain skips.
  */
class DeadLetterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val good =
    """{"payload":{"before":null,"after":{"order_id":1,"invoice_number":1},"source":{"ts_ms":1,"pos":5,"db":"dev","table":"invoice"},"op":"c","ts_ms":1}}"""
  private val notJson = """this is not json at all {{{"""
  private val jsonNoPayload = """{"schema":{"type":"struct"}}"""
  private val payloadNoPos = """{"payload":{"before":null,"after":{"order_id":2,"invoice_number":2},"op":"c","ts_ms":1}}"""

  private def df(lines: Seq[String]) =
    spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING).toDF("value")

  test("malformed envelopes route to dead letters with raw bytes preserved") {
    val in = df(Seq(good, notJson, jsonNoPayload, payloadNoPos))
    val dead = Changelog.deadLetters(in).collect()
    assert(dead.length === 3)
    assert(dead.map(_.getString(0)).toSet === Set(notJson, jsonNoPayload, payloadNoPos))
    assert(dead.forall(_.getString(1) === "unparseable_envelope"))
  }

  test("changelog and dead letters partition the non-tombstone input") {
    val in = df(Seq(good, notJson, jsonNoPayload, payloadNoPos))
    val parsed = Changelog.fromEnvelopeJson(in).count()
    val dead = Changelog.deadLetters(in).count()
    assert(parsed === 1 && parsed + dead === 4)
  }

  test("schema-change envelopes route to schema history, not dead letters") {
    // Debezium schema-change event (include.schema.changes=true,
    // debezium-config-push.sh:21): has source.pos + ddl, no row images.
    val ddlEvent =
      """{"payload":{"source":{"ts_ms":9,"pos":999,"db":"dev"},"databaseName":"dev","ddl":"ALTER TABLE dev.invoice ADD COLUMN note VARCHAR(64)","ts_ms":9}}"""
    val in = df(Seq(good, ddlEvent, notJson))
    val hist = Changelog.schemaHistory(in).collect()
    assert(hist.length === 1)
    assert(hist.head.getString(0) === "dev")
    assert(hist.head.getLong(1) === 999L)
    assert(hist.head.getString(3).startsWith("ALTER TABLE"))
    // three-way partition: changelog=1, history=1, dead=1
    assert(Changelog.fromEnvelopeJson(in).count() === 1)
    assert(Changelog.deadLetters(in).count() === 1)
  }

  test("a DDL event's pos must never act as a truncate horizon") {
    val ddlEvent = // pos above every data event
      """{"payload":{"source":{"ts_ms":9,"pos":999,"db":"dev"},"databaseName":"dev","ddl":"DROP TABLE dev.scratch","ts_ms":9}}"""
    val in = df(Seq(good, ddlEvent))
    val snap = CdcApply.snapshot(Changelog.fromEnvelopeJson(in))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // pos 5 < 999, yet the insert survives: the DDL was routed, not folded
    assert(snap.toSeq === Seq((1L, 1L)))
  }

  test("tombstones are skipped by both paths (not dead letters)") {
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(good), org.apache.spark.sql.Row(null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType, nullable = true))))
    assert(Changelog.fromEnvelopeJson(withNull).count() === 1)
    assert(Changelog.deadLetters(withNull).count() === 0)
  }
}

/** The null-key poisoning scenario: a mistyped field nulled by PERMISSIVE
  * parsing must never reach the fold, where a null key would masquerade as
  * the truncate-horizon marker.
  */
class NullKeyPoisonSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val good =
    """{"payload":{"before":null,"after":{"order_id":1,"invoice_number":10},"source":{"ts_ms":1,"pos":5,"db":"d","table":"t"},"op":"c","ts_ms":1}}"""
  private val poison = // order_id mistyped -> nulled; pos higher than everything
    """{"payload":{"before":{"order_id":"oops","invoice_number":1},"after":null,"source":{"ts_ms":1,"pos":99,"db":"d","table":"t"},"op":"d","ts_ms":1}}"""
  private val partial = // incomplete after-image would crash typed decode
    """{"payload":{"before":null,"after":{"order_id":7},"source":{"ts_ms":1,"pos":6,"db":"d","table":"t"},"op":"c","ts_ms":1}}"""

  private def df = spark.createDataset(Seq(good, poison, partial))(
    org.apache.spark.sql.Encoders.STRING).toDF("value")

  test("malformed-image envelopes dead-letter instead of entering the fold") {
    assert(graft.cdc.Changelog.fromEnvelopeJson(df).count() === 1)
    assert(graft.cdc.Changelog.deadLetters(df).count() === 2)
  }

  test("the poison pos must not act as a truncate horizon") {
    val snap = graft.cdc.CdcApply.snapshot(graft.cdc.Changelog.fromEnvelopeJson(df))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(snap.toSeq === Seq((1L, 10L))) // pos 5 < 99 yet survives
  }

  test("everything passing the gate decodes through the typed path") {
    import spark.implicits._
    val events = graft.cdc.Changelog.fromEnvelopeJson(df)
      .as[graft.cdc.CdcSchema.CdcEvent].collect()
    assert(events.length === 1 && events.head.after.get.order_id === 1)
  }
}
