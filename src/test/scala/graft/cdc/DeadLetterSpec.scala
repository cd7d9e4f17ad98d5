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
