package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{IncrementalDedup, IncrementalNearDup, TextAnalysis}

/** The COMPOSED replay contract behind `graft.PipelineSoak`: one
  * foreachBatch body drives TWO independent persisted state stores
  * (exact fingerprint index, banded near-dup index) keyed by the same
  * batchId, and exactly-once for the whole pipeline follows from the
  * chain — the exact ingest's committed-replay guard returns the SAME
  * survivors, so the near-dup ingest re-sees byte-identical input and
  * its own guard no-ops. Each store's guard is spec'd in isolation
  * (IncrementalDedupSpec / IncrementalNearDupSpec); this spec pins the
  * chain itself, replaying a mid-stream batch exactly as a restarted
  * checkpointed stream would.
  */
class PipelineReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val tau = 0.5

  // the soak's stage sequence, verbatim: gate -> exact -> near-dup
  private def runDrop(exactDir: String, ndDir: String,
                      batch: DataFrame, batchId: Long): (Seq[Long], Seq[Long]) = {
    val gated = batch.filter(TextAnalysis.scoreExpr(col("text")) >= tau)
    val exact = IncrementalDedup.ingest(spark, exactDir, gated, batchId, nBuckets = 4)
    val ndIn = gated.join(exact.select(col("doc_id")), Seq("doc_id"))
    val admitted = IncrementalNearDup.ingest(spark, ndDir, ndIn, batchId, nBuckets = 4)
    (exact.collect().map(_.getAs[Long]("doc_id")).sorted.toSeq,
      admitted.collect().map(_.getAs[Long]("doc_id")).sorted.toSeq)
  }

  test("crash-replay of the last drop no-ops BOTH stores; the resumed stream equals an uninterrupted one") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).limit(120)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val drops = docs.grouped(40).toSeq
    def df(rows: Seq[(Long, String)]) =
      spark.createDataFrame(rows).toDF("doc_id", "text")
    def fresh(tag: String) =
      java.nio.file.Files.createTempDirectory(s"pipe-$tag").toString
    def manifestState(dir: String) = {
      val m = BucketState.readManifest(spark, dir)
      (m.buckets.view.mapValues(_.toSeq.sorted).toMap, m.fp)
    }
    def admitted(ndDir: String) =
      IncrementalNearDup.admittedSnapshot(spark, ndDir)
        .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq

    // reference: the uninterrupted stream
    val (exactA, ndA) = (fresh("exact-a"), fresh("nd-a"))
    val refResults = drops.zipWithIndex.map { case (d, i) =>
      runDrop(exactA, ndA, df(d), i.toLong)
    }
    // the fixture must exercise both stages or the replay proves nothing
    assert(refResults.map(_._1.size).sum > 0)
    assert(refResults.map(_._2.size).sum > 0)

    // crashed-and-restarted stream: drops 0,1 commit, the run dies AFTER
    // both state commits but BEFORE the checkpoint commit, so the
    // restarted stream re-delivers drop 1 (the only replay shape a
    // checkpointed source produces — replaying an OLDER batch means
    // checkpoint/state divergence and both guards fail loudly, spec'd
    // per-store), then continues with drop 2.
    val (exactB, ndB) = (fresh("exact-b"), fresh("nd-b"))
    runDrop(exactB, ndB, df(drops(0)), 0L)
    val first = runDrop(exactB, ndB, df(drops(1)), 1L)
    val exactMB = manifestState(exactB)
    val ndMB = manifestState(ndB)
    val admittedMid = admitted(ndB)

    val replay = runDrop(exactB, ndB, df(drops(1)), 1L)
    // the whole chain returns the original answers and mutates nothing
    assert(replay === first)
    assert(manifestState(exactB) === exactMB)
    assert(manifestState(ndB) === ndMB)
    assert(admitted(ndB) === admittedMid)

    // the resumed stream's remaining drop lands exactly as the
    // uninterrupted run's did — exactly-once composition end to end
    val resumed = runDrop(exactB, ndB, df(drops(2)), 2L)
    assert(resumed === refResults(2))
    assert(admitted(ndB) === admitted(ndA))
  }
}
