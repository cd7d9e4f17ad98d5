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
