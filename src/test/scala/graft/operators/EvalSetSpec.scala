package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The versioned-eval-set contract: a publish mid-stream changes what
  * LATER batches are screened against, while replayed batches keep their
  * recorded version — so the streamed survivor traces equal the one-shot
  * per-batch-at-recorded-version filter even across an eval update.
  */
class EvalSetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  private val evalV1 = Seq(
    900L -> "the held out benchmark question about alpine glaciers retreating rapidly each year")
  private val evalExtra = Seq(
    901L -> "a brand new evaluation prompt concerning maritime navigation under polar starlight")
  // batch docs: one contaminated vs v1, one vs the v2 addition, one clean
  private val b0 = Seq(
    1L -> "discussion of the held out benchmark question about alpine glaciers retreating rapidly each year in detail",
    2L -> "a brand new evaluation prompt concerning maritime navigation under polar starlight was leaked here",
    3L -> "entirely unrelated prose about sourdough fermentation timing and hydration ratios")
  private val b1 = Seq(
    11L -> "the held out benchmark question about alpine glaciers retreating rapidly each year appears again",
    12L -> "a brand new evaluation prompt concerning maritime navigation under polar starlight repeated verbatim",
    13L -> "more unrelated prose on bicycle chain maintenance and lubricant selection")

  private def admittedIds(batch: Seq[(Long, String)], hashes: DataFrame): Set[Long] =
    Dedup.decontaminateAdmit(docsDf(batch), hashes)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet

  test("a mid-stream publish binds later batches to v2 while replays keep their recorded v1") {
    val evalDir = freshDir("evalset")
    val recDir = freshDir("evalrec")
    assert(EvalSet.currentVersion(spark, evalDir) === 0L)
    assert(EvalSet.publish(spark, evalDir, docsDf(evalV1)) === 1L)

    // batch 0 runs under v1: doc 2's contamination is NOT yet in the eval set
    val v0 = EvalSet.versionForBatch(spark, evalDir, recDir, 0)
    assert(v0 === 1L)
    val got0 = admittedIds(b0, EvalSet.hashesAt(spark, evalDir, v0))
    assert(got0 === Set(2L, 3L))

    // the eval suite grows mid-stream
    assert(EvalSet.publish(spark, evalDir,
      docsDf(evalV1 ++ evalExtra)) === 2L)
    assert(EvalSet.currentVersion(spark, evalDir) === 2L)

    // batch 1 binds to v2: both contaminated docs rejected
    val v1 = EvalSet.versionForBatch(spark, evalDir, recDir, 1)
    assert(v1 === 2L)
    assert(admittedIds(b1, EvalSet.hashesAt(spark, evalDir, v1)) === Set(13L))

    // batch 0 REPLAYED after the publish: the record pins v1, so the
    // replay reproduces its original survivor set (doc 2 still admitted)
    val v0replay = EvalSet.versionForBatch(spark, evalDir, recDir, 0)
    assert(v0replay === 1L)
    assert(admittedIds(b0, EvalSet.hashesAt(spark, evalDir, v0replay)) === got0)

    graft.Shared.deleteDirTree(evalDir); graft.Shared.deleteDirTree(recDir)
  }

  test("a crashed publish is invisible and its version number is retaken") {
    val evalDir = freshDir("evalset-crash")
    EvalSet.publish(spark, evalDir, docsDf(evalV1))
    // simulate a publish that died between the data write and the marker
    Dedup.evalShingleHashes(docsDf(evalExtra))
      .write.mode("overwrite").parquet(s"$evalDir/v=2")
    assert(EvalSet.currentVersion(spark, evalDir) === 1L)
    // the next publish retakes v2 and completes it
    assert(EvalSet.publish(spark, evalDir, docsDf(evalV1 ++ evalExtra)) === 2L)
    assert(EvalSet.currentVersion(spark, evalDir) === 2L)
    graft.Shared.deleteDirTree(evalDir)
  }

  test("back-screening flags exactly the v1-admitted docs contaminated under v2") {
    // the batch back-screen pass (text_decon_backscreen's engine form):
    // doc 1 is v1-contaminated (never admitted — must NOT be flagged),
    // doc 2 is clean under v1 but contaminated under the v2 addition
    // (the flag set), doc 3 is clean under both (never flagged)
    val evalDir = freshDir("evalset-backscreen")
    EvalSet.publish(spark, evalDir, docsDf(evalV1))
    EvalSet.publish(spark, evalDir, docsDf(evalV1 ++ evalExtra))
    val train = docsDf(b0)
    val admittedV1 = Dedup.decontaminateAdmit(train,
      EvalSet.hashesAt(spark, evalDir, 1))
    val survivorsV2 = Dedup.decontaminateAdmit(admittedV1,
      EvalSet.hashesAt(spark, evalDir, 2))
    val flagged = admittedV1.select(col("doc_id"))
      .join(survivorsV2.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    assert(flagged === Set(2L))
    // cross-check against the independent pairwise decontamination form:
    // flagged = admitted-under-v1 docs with any shared 8-gram vs the v2
    // benchmark corpus
    val independent = Dedup.textDecontaminateAgainst(
        admittedV1, docsDf(evalV1 ++ evalExtra))
      .select(col("train_doc")).distinct().collect().map(_.getLong(0)).toSet
    assert(flagged === independent)
    graft.Shared.deleteDirTree(evalDir)
  }
}
