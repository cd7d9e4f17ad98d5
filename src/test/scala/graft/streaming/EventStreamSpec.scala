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

  test("session windows merge by inactivity gap and emit past the watermark") {
    val in = Files.createTempDirectory("evt5").toString
    Files.write(Paths.get(s"$in/b1.json"), Seq(
      line(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      line(2, "2024-01-01 10:10:00", 1, "click", 2.0), // merges into session 1
      line(3, "2024-01-01 11:30:00", 1, "click", 4.0), // > 30min gap: new session
      line(4, "2024-01-01 10:05:00", 2, "view", 8.0)).mkString("\n").getBytes)
    val q = EventStream.sessionsByUser(EventStream.watermarked(streamFrom(in, Some(1))))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // advance the watermark (2h delay) past every session's close
      Files.write(Paths.get(s"$in/b2.json"), Seq(
        line(9, "2024-01-01 15:00:00", 3, "click", 0.0)).mkString("\n").getBytes)
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
        .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
          r.getLong(2), r.getLong(3), r.getDouble(4)))
        .sortBy(t => (t._3, t._1))
      assert(rows.toSeq === Seq(
        ("2024-01-01 10:00:00.0", "2024-01-01 10:40:00.0", 1L, 2L, 3.0),
        ("2024-01-01 11:30:00.0", "2024-01-01 12:00:00.0", 1L, 1L, 4.0),
        ("2024-01-01 10:05:00.0", "2024-01-01 10:35:00.0", 2L, 1L, 8.0)))
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with preceding views") {
    val in = Files.createTempDirectory("evt4").toString
    // batch 1: views arrive first (their buffer must persist across batches)
    Files.write(Paths.get(s"$in/b1.json"), Seq(
      line(1, "2024-01-01 10:00:00", 1, "view", 0.0),
      line(2, "2024-01-01 10:30:00", 1, "view", 0.0),
      line(3, "2024-01-01 08:00:00", 2, "view", 0.0)).mkString("\n").getBytes)
    val q = EventStream.purchaseViewJoin(streamFrom(in, Some(1)))
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // batch 2: purchases — user 1 inside the 1h window of both views;
      // user 2's only view is 2h30 old (outside the window, no match)
      Files.write(Paths.get(s"$in/b2.json"), Seq(
        line(10, "2024-01-01 10:45:00", 1, "purchase", 9.0),
        line(11, "2024-01-01 10:30:00", 2, "purchase", 9.0)).mkString("\n").getBytes)
      q.processAllAvailable()
      val pairs = spark.table("ssjoin").collect()
        .map(r => (r.getLong(0), r.getLong(3))).sorted
      assert(pairs.toSeq === Seq((10L, 1L), (10L, 2L)))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched purchases after the watermark") {
    val in = Files.createTempDirectory("evt6").toString
    // user 2 purchases with NO view in the preceding hour
    Files.write(Paths.get(s"$in/b1.json"), Seq(
      line(1, "2024-01-01 10:00:00", 1, "view", 0.0),
      line(10, "2024-01-01 10:30:00", 1, "purchase", 9.0),
      line(11, "2024-01-01 10:30:00", 2, "purchase", 9.0)).mkString("\n").getBytes)
    val q = EventStream.purchaseViewJoin(streamFrom(in, Some(1)), "10 minutes", "left_outer")
      .writeStream.format("memory").queryName("ssjoin_outer")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // watermark has not passed purchase_ts + 1h yet: the unmatched row
      // must NOT have been emitted prematurely (it could still match)
      val early = spark.table("ssjoin_outer").collect()
        .filter(_.isNullAt(3)).map(_.getLong(0))
      assert(early.isEmpty, s"premature outer emission: ${early.toSeq}")
      // Advance event time far past 11:30 + 1h + 10min delay ON BOTH
      // STREAMS: the global watermark is the MIN over every watermark
      // operator, and each side's operator only sees its own event type —
      // a view-only advancer would leave the purchase watermark at 10:20
      // and nothing would ever evict. The bump also takes effect at the
      // START of the next micro-batch (Spark's update rule), so b3
      // triggers the eviction pass that emits the unmatched outer row.
      Files.write(Paths.get(s"$in/b2.json"), Seq(
        line(98, "2024-01-01 18:00:00", 3, "purchase", 0.0),
        line(99, "2024-01-01 18:00:00", 4, "view", 0.0)).mkString("\n").getBytes)
      q.processAllAvailable()
      Files.write(Paths.get(s"$in/b3.json"), Seq(
        line(100, "2024-01-01 18:05:00", 5, "purchase", 0.0),
        line(101, "2024-01-01 18:05:00", 6, "view", 0.0)).mkString("\n").getBytes)
      q.processAllAvailable()
      // late purchases (98/100) stay buffered unemitted — the watermark
      // never passes their own horizon — so only 10 and 11 have emitted
      val rows = spark.table("ssjoin_outer").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .sortBy(_._1)
      assert(rows.toSeq === Seq((10L, Some(1L)), (11L, None)))
    } finally q.stop()
  }

  test("stream-stream join in batch mode runs the identical plan") {
    import spark.implicits._
    val batch = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (10L, java.sql.Timestamp.valueOf("2024-01-01 10:45:00"), 1L, "purchase", 9.0),
      (11L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1L, "purchase", 9.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val pairs = EventStream.purchaseViewJoin(batch).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // 10:45 purchase matches the 10:00 view; the 12:00 purchase is > 1h after
    assert(pairs.toSeq === Seq((10L, 1L)))
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
