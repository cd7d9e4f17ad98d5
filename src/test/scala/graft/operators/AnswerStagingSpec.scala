package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The per-batch ANSWER files (survivors / admitted / members) now ride
  * the segment write under the reserved staging bucket and are renamed
  * out before the manifest commit ([[graft.streaming.BucketState
  * .claimAnswer]]). These specs pin the edge the rename cannot produce
  * by construction: an ALL-REJECTED batch stages no answer partition at
  * all, and the claim must still leave an empty-but-readable answer dir
  * (per-batch return frames and snapshot glob unions both consume it).
  */
class AnswerStagingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("exact: an all-duplicate batch returns an empty readable survivor set") {
    val d = freshDir("ans-exact")
    val b0 = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    IncrementalDedup.ingest(spark, d, b0, 0, nBuckets = 8).count()
    // every batch-1 doc duplicates stored content — zero survivors, so
    // the staged answer partition never exists and claimAnswer must
    // fabricate the empty dir
    val b1 = Seq((3L, "alpha beta gamma"), (4L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = IncrementalDedup.ingest(spark, d, b1, 1, nBuckets = 8)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("fp", "doc_id"))
    // the registry still answers from both batches' files
    val snap = IncrementalDedup.snapshot(spark, d)
    assert(snap.select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L))
    graft.Shared.deleteDirTree(d)
  }

  test("near-dup: an all-near-dup batch returns an empty readable admitted set") {
    val d = freshDir("ans-nd")
    val text = "one two three four five six seven eight nine ten"
    val b0 = Seq((1L, text)).toDF("doc_id", "text")
    IncrementalNearDup.ingest(spark, d, b0, 0, nBuckets = 8).count()
    // identical text ⇒ identical signature ⇒ rejected; empty admitted
    val b1 = Seq((2L, text)).toDF("doc_id", "text")
    val out = IncrementalNearDup.ingest(spark, d, b1, 1, nBuckets = 8)
    assert(out.count() === 0L)
    val snap = IncrementalNearDup.admittedSnapshot(spark, d)
    assert(snap.collect().map(_.getLong(0)).toSet === Set(1L))
    graft.Shared.deleteDirTree(d)
  }

  test("exact: a replay after the claim returns the same survivors") {
    val d = freshDir("ans-replay")
    val b0 = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("doc_id", "text")
    val first = IncrementalDedup.ingest(spark, d, b0, 0, nBuckets = 8)
      .collect().map(_.getLong(1)).toSet
    // same batchId + same input = idempotent no-op reading the claimed
    // answer dir, not the (renamed-away) staging partition
    val replay = IncrementalDedup.ingest(spark, d, b0, 0, nBuckets = 8)
      .collect().map(_.getLong(1)).toSet
    assert(replay === first)
    graft.Shared.deleteDirTree(d)
  }
}
