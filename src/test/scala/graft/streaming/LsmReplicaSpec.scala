package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The append-only (LSM) replica: per-batch delta segments + read-time
  * max-pos-per-key resolution + adaptive compaction must be
  * OBSERVATIONALLY IDENTICAL to the replace-merge replica on the same
  * stream — same snapshots, same replay guarantees — while never reading
  * or rewriting prior state in the commit path.
  */
class LsmReplicaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def env(pos: Long, key: Int, inv: Option[Int]) = inv match {
    case Some(v) =>
      s"""{"payload":{"before":null,"after":{"order_id":$key,"invoice_number":$v},"source":{"ts_ms":$pos,"pos":$pos,"db":"dev","table":"invoice"},"op":"c","ts_ms":$pos}}"""
    case None =>
      s"""{"payload":{"before":{"order_id":$key,"invoice_number":0},"after":null,"source":{"ts_ms":$pos,"pos":$pos,"db":"dev","table":"invoice"},"op":"d","ts_ms":$pos}}"""
  }
  private def trunc(pos: Long) =
    s"""{"payload":{"before":null,"after":null,"source":{"ts_ms":$pos,"pos":$pos},"op":"t","ts_ms":$pos}}"""

  private def writeBatches(in: String, batches: Seq[Seq[String]]): Unit = {
    Files.createDirectories(Paths.get(in))
    batches.zipWithIndex.foreach { case (lines, i) =>
      Files.write(Paths.get(s"$in/b$i.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    // deterministic trigger order by mtime
    val now = System.currentTimeMillis()
    batches.indices.foreach { i =>
      assert(new java.io.File(s"$in/b$i.json")
        .setLastModified(now - (batches.size - i) * 60000))
    }
  }

  test("LSM snapshot equals replace-merge snapshot: updates, deletes, truncate, stragglers") {
    val base = Files.createTempDirectory("graft-lsm-eq").toString
    val in = s"$base/in"
    writeBatches(in, Seq(
      Seq(env(1, 1, Some(10)), env(2, 2, Some(20)), env(3, 3, Some(30)),
        env(4, 4, Some(40))),
      // delete k3, update k1, then TRUNCATE at 10 (erases 1-4 incl. the
      // marker), then new life k5
      Seq(env(5, 3, None), env(6, 1, Some(11)), trunc(10), env(11, 5, Some(50))),
      // straggler BELOW the horizon redelivered late (must stay out),
      // update k5, insert k6
      Seq(env(4, 4, Some(40)), env(12, 5, Some(51)), env(13, 6, Some(60)))))

    def changelog() = CdcStream.fromFiles(spark, in, Some(1))
    CdcStream.runPartitioned(changelog(), s"$base/auditA", s"$base/stateA",
      s"$base/ckptA", nBuckets = 4).awaitTermination(120000)
    CdcStream.runPartitionedLsm(changelog(), s"$base/auditB", s"$base/stateB",
      s"$base/ckptB", nBuckets = 4).awaitTermination(120000)

    val merge = CdcStream.partitionedSnapshot(spark, s"$base/stateA")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def lsm() = CdcStream.partitionedSnapshotLsm(spark, s"$base/stateB")
      .collect().map(r => (r.getInt(0).toLong, r.getInt(1).toLong)).toSeq
    assert(merge === Seq((5L, 51L), (6L, 60L)))
    assert(lsm() === merge)

    // truncate APPENDED: segments from pre-truncate batches are still
    // referenced (no rewrite happened) until compaction folds them
    val m = BucketState.readManifest(spark, s"$base/stateB")
    assert(m.buckets.values.flatten.toSet.size > 1)

    // restart with no new input: replay no-ops, snapshot unchanged
    CdcStream.runPartitionedLsm(changelog(), s"$base/auditB", s"$base/stateB",
      s"$base/ckptB", nBuckets = 4).awaitTermination(120000)
    assert(lsm() === merge)
  }

  test("adaptive compaction bounds segments per bucket and preserves the snapshot") {
    val base = Files.createTempDirectory("graft-lsm-compact").toString
    val in = s"$base/in"
    // 6 batches all hammering the same key: its bucket accrues one
    // segment per batch; compactWhenSegments=3 must keep max ≤ 3
    writeBatches(in, (1 to 6).map(i => Seq(env(i.toLong, 7, Some(i * 100)))))
    CdcStream.runPartitionedLsm(CdcStream.fromFiles(spark, in, Some(1)),
      s"$base/audit", s"$base/state", s"$base/ckpt",
      nBuckets = 4, compactWhenSegments = 3).awaitTermination(120000)

    val m = BucketState.readManifest(spark, s"$base/state")
    assert(m.buckets.nonEmpty)
    assert(m.buckets.values.map(_.size).max <= 3)
    val snap = CdcStream.partitionedSnapshotLsm(spark, s"$base/state")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(snap === Seq((7, 600)))
  }

  test("as-of read replays the prefix; compaction advances the floor and below-floor reads refuse") {
    val base = Files.createTempDirectory("graft-lsm-asof").toString
    val in = s"$base/in"
    // history: k1=10@1, k2=20@2, k1 deleted@5, TRUNCATE@10, k1=12@11, k2=21@12
    writeBatches(in, Seq(
      Seq(env(1, 1, Some(10)), env(2, 2, Some(20))),
      Seq(env(5, 1, None), trunc(10)),
      Seq(env(11, 1, Some(12)), env(12, 2, Some(21)))))
    CdcStream.runPartitionedLsm(CdcStream.fromFiles(spark, in, Some(1)),
      s"$base/audit", s"$base/state", s"$base/ckpt", nBuckets = 4)
      .awaitTermination(120000)

    def asof(p: Long) =
      CdcStream.partitionedSnapshotLsmAsOf(spark, s"$base/state", p)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq.sorted
    // no compaction yet: every prefix of history is answerable
    assert(CdcStream.readTtFloor(spark, s"$base/state") === Long.MinValue)
    assert(asof(2) === Seq((1, 10), (2, 20)))
    assert(asof(5) === Seq((2, 20)))       // k1's delete marker wins
    assert(asof(10) === Seq.empty)         // at the truncate horizon
    assert(asof(11) === Seq((1, 12)))      // first post-truncate life
    assert(asof(12) === Seq((1, 12), (2, 21))) // = the full snapshot

    // compaction folds per-key history up to the max folded pos (12):
    // the floor advances there, the full snapshot still reads, and a
    // prefix read below the floor refuses instead of answering wrongly
    CdcStream.compactLsm(spark, s"$base/state", nBuckets = 4)
    assert(CdcStream.readTtFloor(spark, s"$base/state") === 12L)
    assert(asof(12) === Seq((1, 12), (2, 21)))
    val e = intercept[IllegalArgumentException](asof(5))
    assert(e.getMessage.contains("compaction floor"))

    // post-compaction appends re-open a time-travel window above the floor
    CdcStream.applyLsmBatch(
      graft.cdc.Changelog.fromEnvelopeJson(
        spark.createDataset(Seq(env(15, 3, Some(30)), env(16, 2, None)))(
          org.apache.spark.sql.Encoders.STRING).toDF("value")),
      batchId = 3, s"$base/audit", s"$base/state", 4,
      graft.cdc.CdcSchema.invoiceSpec)
    assert(asof(15) === Seq((1, 12), (2, 21), (3, 30)))
    assert(asof(16) === Seq((1, 12), (3, 30)))
  }

  test("changes-between: net i/u/d feed, identical-image updates excluded, truncate crossing = d") {
    val base = Files.createTempDirectory("graft-lsm-cdf").toString
    val in = s"$base/in"
    // window (3, 13]: k1 10→11 ('u'), k3 deleted ('d'), k4 born ('i'),
    // k2 re-written to the SAME image (no net change — excluded)
    writeBatches(in, Seq(
      Seq(env(1, 1, Some(10)), env(2, 2, Some(20)), env(3, 3, Some(30))),
      Seq(env(5, 1, Some(11)), env(6, 3, None), env(7, 4, Some(40)),
        env(8, 2, Some(20)))))
    CdcStream.runPartitionedLsm(CdcStream.fromFiles(spark, in, Some(1)),
      s"$base/audit", s"$base/state", s"$base/ckpt", nBuckets = 4)
      .awaitTermination(120000)
    def feed(p1: Long, p2: Long) =
      CdcStream.lsmChangesBetween(spark, s"$base/state", p1, p2)
        .collect()
        .map(r => (r.getInt(0), r.getString(1),
          Option(r.getStruct(2)).map(_.getInt(1)),
          Option(r.getStruct(3)).map(_.getInt(1))))
        .toSet
    assert(feed(3, 8) === Set(
      (1, "u", Some(10), Some(11)),
      (3, "d", Some(30), None),
      (4, "i", None, Some(40))))
    // a truncate inside the window erases pre-window keys: they report 'd'
    CdcStream.applyLsmBatch(
      graft.cdc.Changelog.fromEnvelopeJson(
        spark.createDataset(Seq(trunc(10), env(11, 5, Some(50))))(
          org.apache.spark.sql.Encoders.STRING).toDF("value")),
      batchId = 2, s"$base/audit", s"$base/state", 4,
      graft.cdc.CdcSchema.invoiceSpec)
    assert(feed(8, 11) === Set(
      (1, "d", Some(11), None),
      (2, "d", Some(20), None),
      (4, "d", Some(40), None),
      (5, "i", None, Some(50))))
    // empty window ⇒ empty feed; below-floor fromPos refuses after compaction
    assert(feed(11, 11) === Set.empty)
    CdcStream.compactLsm(spark, s"$base/state", nBuckets = 4)
    val e = intercept[IllegalArgumentException](feed(3, 11))
    assert(e.getMessage.contains("compaction floor"))
  }

  test("delete markers survive compaction: an older redelivery cannot resurrect") {
    val base = Files.createTempDirectory("graft-lsm-marker").toString
    val in = s"$base/in"
    writeBatches(in, Seq(
      Seq(env(1, 1, Some(10)), env(2, 2, Some(20))),
      Seq(env(5, 1, None)))) // delete k1 at pos 5
    CdcStream.runPartitionedLsm(CdcStream.fromFiles(spark, in, Some(1)),
      s"$base/audit", s"$base/state", s"$base/ckpt", nBuckets = 4)
      .awaitTermination(120000)
    CdcStream.compactLsm(spark, s"$base/state", nBuckets = 4)
    // compaction kept the marker: a late OLDER event for k1 appended
    // afterwards must lose to it
    CdcStream.applyLsmBatch(
      graft.cdc.Changelog.fromEnvelopeJson(
        spark.createDataset(Seq(env(3, 1, Some(13))))(
          org.apache.spark.sql.Encoders.STRING).toDF("value")),
      batchId = 2, s"$base/audit", s"$base/state", 4,
      graft.cdc.CdcSchema.invoiceSpec)
    val snap = CdcStream.partitionedSnapshotLsm(spark, s"$base/state")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(snap === Seq((2, 20)))
  }
}
