package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming windowed aggregation + watermark dedup, driven through a real
  * file-source stream into a memory sink.
  */
class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def line(id: Long, ts: String, user: Long, typ: String, v: Double) =
    s"""{"event_id":$id,"ts":"$ts","user_id":$user,"event_type":"$typ","value":$v}"""

  private def streamFrom(dir: String, maxFilesPerTrigger: Option[Int] = None) = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n)).json(dir)
  }

  test("tumbling hourly windows aggregate per event type") {
    val in = Files.createTempDirectory("evt1").toString
    Files.write(Paths.get(s"$in/a.json"), Seq(
      line(1, "2024-01-01 10:05:00", 1, "click", 1.0),
      line(2, "2024-01-01 10:45:00", 2, "click", 2.0),
      line(3, "2024-01-01 10:50:00", 1, "view", 5.0),
      line(4, "2024-01-01 11:10:00", 3, "click", 4.0)).mkString("\n").getBytes)
    val q = EventStream.hourlyByType(EventStream.watermarked(streamFrom(in)))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = spark.table("hourly").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(rows.toSeq === Seq(
      ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 10:00:00.0", "view", 1L, 5.0),
      ("2024-01-01 11:00:00.0", "click", 1L, 4.0)))
  }

  test("append mode emits a window only once the watermark passes it") {
    val in = Files.createTempDirectory("evt2").toString
    // Batch 1 fills hour 10; batch 2's event at 13:30 advances the
    // watermark to 11:30 (> 11:00), finalizing hour 10 only.
    Files.write(Paths.get(s"$in/b1.json"), Seq(
      line(1, "2024-01-01 10:05:00", 1, "click", 1.0),
      line(2, "2024-01-01 10:55:00", 2, "click", 2.0)).mkString("\n").getBytes)
    val q = EventStream.hourlyByType(EventStream.watermarked(streamFrom(in, Some(1))))
      .writeStream.format("memory").queryName("hourly_append")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("hourly_append").count() === 0) // watermark not past 11:00 yet
      Files.write(Paths.get(s"$in/b2.json"), Seq(
        line(3, "2024-01-01 13:30:00", 3, "view", 1.0)).mkString("\n").getBytes)
      q.processAllAvailable()
      val rows = spark.table("hourly_append").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      assert(rows.toSeq === Seq(("2024-01-01 10:00:00.0", "click", 2L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark keeps first arrival per event_id") {
    val in = Files.createTempDirectory("evt3").toString
    Files.write(Paths.get(s"$in/a.json"), Seq(
      line(10, "2024-01-01 10:05:00", 1, "click", 1.0),
      line(10, "2024-01-01 10:06:00", 1, "click", 1.0), // replay, same id
      line(11, "2024-01-01 10:07:00", 2, "view", 2.0)).mkString("\n").getBytes)
    val q = EventStream.dedupByEventId(EventStream.watermarked(streamFrom(in)))
      .writeStream.format("memory").queryName("dedup_events")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val ids = spark.table("dedup_events").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(10L, 11L))
  }
}
