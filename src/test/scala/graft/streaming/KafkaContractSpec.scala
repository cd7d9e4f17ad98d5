package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Kafka ingress boundary, without a broker.
  *
  * The sandbox has no Kafka jars and no egress, so the `format("kafka")`
  * source itself cannot run; what CAN be pinned is everything the engine
  * does after `.load()` — `CdcStream.fromKafkaRelation` — driven with the
  * connector's exact documented output relation (key/value: binary, topic:
  * string, partition: int, offset: long, timestamp: timestamp,
  * timestampType: int). If the real connector is present in a deployment,
  * `fromKafka` is this function composed with the source.
  */
class KafkaContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the spark-sql-kafka source's fixed output schema
  private val kafkaSchema = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("timestampType", IntegerType, nullable = true)))

  private def env(before: String, after: String, op: String, pos: Long) =
    s"""{"payload":{"before":$before,"after":$after,"source":{"ts_ms":${1000 + pos},"pos":$pos,"db":"dev","table":"invoice"},"op":"$op","ts_ms":${1000 + pos}}}"""

  private def kafkaRow(value: String, offset: Long, tsMs: Long): Row =
    Row("k".getBytes("UTF-8"),
      if (value == null) null else value.getBytes("UTF-8"),
      "source.dev.invoice", 0, offset,
      new java.sql.Timestamp(tsMs), 0)

  test("kafka relation decodes like the file source; tombstones skipped") {
    val lines = Seq(
      env("null", """{"order_id":1,"invoice_number":10}""", "c", 1),
      env("""{"order_id":1,"invoice_number":10}""",
        """{"order_id":1,"invoice_number":11}""", "u", 2),
      env("null", """{"order_id":2,"invoice_number":20}""", "c", 3))
    val rows = new java.util.ArrayList[Row]()
    lines.zipWithIndex.foreach { case (l, i) => rows.add(kafkaRow(l, i, 1700000000000L + i)) }
    rows.add(kafkaRow(null, 99, 1700000000999L)) // delete *tombstone* (skip, not a delete)

    val changelog = CdcStream.fromKafkaRelation(spark.createDataFrame(rows, kafkaSchema))
    // same events the file-source/batch path produces from the same strings
    val viaStrings = graft.cdc.Changelog.fromEnvelopeJson(
      spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING).toDF("value"))
    val a = changelog.select("pos", "op").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val b = viaStrings.select("pos", "op").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(a.toSeq === b.toSeq)
    assert(changelog.count() === 3) // tombstone dropped, not dead-lettered

    val snap = graft.cdc.CdcApply.snapshot(changelog)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(snap === Seq((1L, 11L), (2L, 20L)))
  }

  test("audit timestamp comes from the Kafka record timestamp in epoch-ms") {
    val rows = new java.util.ArrayList[Row]()
    rows.add(kafkaRow(env("null", """{"order_id":7,"invoice_number":70}""", "c", 5),
      0, 1723450000123L))
    val changelog = CdcStream.fromKafkaRelation(spark.createDataFrame(rows, kafkaSchema))
    // ts_ms carries the Kafka ingest time (reference main.py:35), not the
    // payload's source clock
    assert(changelog.select("ts_ms").head().getLong(0) === 1723450000123L)
  }
}
