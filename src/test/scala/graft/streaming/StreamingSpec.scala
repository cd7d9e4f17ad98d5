package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.{CdcApply, Changelog}

/** End-to-end Structured Streaming: envelope JSON files → file-source
  * stream → foreachBatch incremental merge → versioned state + audit log.
  * The final streamed state must equal the batch apply of the same
  * changelog (stream/batch unification — SURVEY.md §2.10 backfill row).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def env(before: String, after: String, op: String, pos: Long) =
    s"""{"payload":{"before":$before,"after":$after,"source":{"ts_ms":${1000 + pos},"pos":$pos,"db":"dev","table":"invoice"},"op":"$op","ts_ms":${1000 + pos}}}"""

  private val lines1 = Seq(
    env("null", """{"order_id":1,"invoice_number":10}""", "c", 1),
    env("null", """{"order_id":2,"invoice_number":20}""", "c", 2),
    env("null", """{"order_id":3,"invoice_number":30}""", "c", 3))
  private val lines2 = Seq(
    env("""{"order_id":2,"invoice_number":20}""", """{"order_id":2,"invoice_number":21}""", "u", 4),
    env("""{"order_id":3,"invoice_number":30}""", "null", "d", 5),
    env("null", """{"order_id":4,"invoice_number":40}""", "c", 6))

  test("streamed incremental state equals batch apply; audit log complete") {
    val base = Files.createTempDirectory("graft-stream").toString
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    Files.write(Paths.get(s"$in/b1.json"),
      lines1.mkString("\n").getBytes("UTF-8"))
    Files.write(Paths.get(s"$in/b2.json"),
      lines2.mkString("\n").getBytes("UTF-8"))

    val stream = CdcStream.fromFiles(spark, in)
    assert(stream.isStreaming)
    // maxFilesPerTrigger=1 would pin 2 micro-batches; AvailableNow already
    // splits per file listing order here — assert via state versions below.
    val q = CdcStream.run(stream, s"$base/audit", s"$base/state", s"$base/ckpt")
    q.awaitTermination(120000)

    val Some((_, state)) = CdcStream.latestStateVersion(spark, s"$base/state")
    val streamed = CdcStream.snapshotOf(state).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

    val batch = Changelog.fromEnvelopeJson(
      spark.createDataset(lines1 ++ lines2)(org.apache.spark.sql.Encoders.STRING).toDF("value"))
    val expected = CdcApply.snapshot(batch).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

    assert(streamed === expected)
    assert(streamed === Seq((1L, 10L), (2L, 21L), (4L, 40L)))

    val audit = spark.read.parquet(s"$base/audit")
    assert(audit.count() === 6)
    // per-batch partition dirs (idempotent replay) add the batch column
    assert(audit.columns.sorted.toSeq === Seq("batch", "kafka_message", "timestamp"))
  }

  test("restarted stream with new data continues from checkpointed state") {
    val base = Files.createTempDirectory("graft-stream2").toString
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    Files.write(Paths.get(s"$in/b1.json"), lines1.mkString("\n").getBytes("UTF-8"))
    val q1 = CdcStream.run(CdcStream.fromFiles(spark, in),
      s"$base/audit", s"$base/state", s"$base/ckpt")
    q1.awaitTermination(120000)

    Files.write(Paths.get(s"$in/b2.json"), lines2.mkString("\n").getBytes("UTF-8"))
    val q2 = CdcStream.run(CdcStream.fromFiles(spark, in),
      s"$base/audit", s"$base/state", s"$base/ckpt")
    q2.awaitTermination(120000)

    val Some((v, state)) = CdcStream.latestStateVersion(spark, s"$base/state")
    assert(v >= 2) // two distinct micro-batches across the restart
    val streamed = CdcStream.snapshotOf(state).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed === Seq((1L, 10L), (2L, 21L), (4L, 40L)))
  }
}

/** Typed stateful streaming: flatMapGroupsWithState per-key latest. */
class TypedStateSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def env(before: String, after: String, op: String, pos: Long) =
    s"""{"payload":{"before":$before,"after":$after,"source":{"ts_ms":${1000 + pos},"pos":$pos,"db":"dev","table":"invoice"},"op":"$op","ts_ms":${1000 + pos}}}"""

  test("typed state stream converges to latest-per-key across micro-batches") {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val in = Files.createTempDirectory("typed").toString
    Files.write(Paths.get(s"$in/b1.json"), Seq(
      env("null", """{"order_id":1,"invoice_number":10}""", "c", 1),
      env("null", """{"order_id":2,"invoice_number":20}""", "c", 2)).mkString("\n").getBytes)
    val stream = graft.streaming.CdcStream.fromFiles(spark, in)
      .as[graft.cdc.CdcSchema.CdcEvent]
    val q = graft.streaming.CdcStream.typedLatestPerKey(stream)
      .writeStream.format("memory").queryName("typed_state")
      .outputMode("update")
      .option("maxFilesPerTrigger", "1")
      .start()
    try {
      q.processAllAvailable()
      Files.write(Paths.get(s"$in/b2.json"), Seq(
        env("""{"order_id":2,"invoice_number":20}""", """{"order_id":2,"invoice_number":21}""", "u", 3),
        env("""{"order_id":1,"invoice_number":10}""", "null", "d", 4),
        env("""{"order_id":2,"invoice_number":21}""", """{"order_id":2,"invoice_number":21}""", "u", 3)).mkString("\n").getBytes) // pos-3 replay
      q.processAllAvailable()
      // last emission per key is the converged value
      val emissions = spark.table("typed_state").collect()
        .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
      val last = emissions.zipWithIndex.groupBy(_._1._1)
        .map { case (k, vs) => k -> vs.maxBy(_._2)._1._2 }
      assert(last === Map(1 -> None, 2 -> Some(21)))
    } finally q.stop()
  }
}

/** Bucketed incremental state: only touched partitions rewrite. */
class PartitionedStateSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def env(before: String, after: String, op: String, pos: Long) =
    s"""{"payload":{"before":$before,"after":$after,"source":{"ts_ms":${1000 + pos},"pos":$pos,"db":"dev","table":"invoice"},"op":"$op","ts_ms":${1000 + pos}}}"""

  test("disjoint-key batches leave untouched buckets' files alone") {
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory("pstate").toString
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    val n = 8
    // batch 1: keys 0 and 1 (buckets 0, 1)
    Files.write(Paths.get(s"$in/b1.json"), Seq(
      env("null", """{"order_id":0,"invoice_number":5}""", "c", 1),
      env("null", """{"order_id":1,"invoice_number":10}""", "c", 2)).mkString("\n").getBytes)
    val q1 = graft.streaming.CdcStream.runPartitioned(
      graft.streaming.CdcStream.fromFiles(spark, in),
      s"$base/audit", s"$base/state", s"$base/ckpt", n)
    q1.awaitTermination(120000)
    val bucket1File = new java.io.File(s"$base/state/p=1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    // batch 2: key 2 only (bucket 2) — bucket 1 must not be rewritten
    Files.write(Paths.get(s"$in/b2.json"), Seq(
      env("null", """{"order_id":2,"invoice_number":20}""", "c", 3)).mkString("\n").getBytes)
    val q2 = graft.streaming.CdcStream.runPartitioned(
      graft.streaming.CdcStream.fromFiles(spark, in),
      s"$base/audit", s"$base/state", s"$base/ckpt", n)
    q2.awaitTermination(120000)
    val bucket1After = new java.io.File(s"$base/state/p=1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    assert(bucket1After === bucket1File, "untouched bucket was rewritten")
    val snap = graft.streaming.CdcStream.partitionedSnapshot(spark, s"$base/state")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(snap === Seq((0L, 5L), (1L, 10L), (2L, 20L)))
  }

  test("truncate batch resets every bucket") {
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory("pstate2").toString
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    Files.write(Paths.get(s"$in/b1.json"), Seq(
      env("null", """{"order_id":3,"invoice_number":30}""", "c", 1),
      env("null", """{"order_id":12,"invoice_number":120}""", "c", 2)).mkString("\n").getBytes)
    val q1 = graft.streaming.CdcStream.runPartitioned(
      graft.streaming.CdcStream.fromFiles(spark, in),
      s"$base/audit", s"$base/state", s"$base/ckpt", 8)
    q1.awaitTermination(120000)
    Files.write(Paths.get(s"$in/b2.json"), Seq(
      env("null", "null", "t", 3),
      env("null", """{"order_id":7,"invoice_number":70}""", "c", 4)).mkString("\n").getBytes)
    val q2 = graft.streaming.CdcStream.runPartitioned(
      graft.streaming.CdcStream.fromFiles(spark, in),
      s"$base/audit", s"$base/state", s"$base/ckpt", 8)
    q2.awaitTermination(120000)
    val snap = graft.streaming.CdcStream.partitionedSnapshot(spark, s"$base/state")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(snap === Seq((7L, 70L)))
  }
}
