package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The incremental banded-MinHash near-dup index: first-wins pairwise
  * admission whose chunked ingest must equal the one-shot filter — plus
  * the replay and seen-registry contracts that make it safe to run from
  * a checkpointed stream.
  */
class IncrementalNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("neardup-spec").toString

  private def docsDf(rows: Seq[(Long, String)]) = {
    import org.apache.spark.sql.functions.col
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"))
  }

  test("chunked ingest equals one-shot: real corpus, 3 ascending chunks") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val ids = docs.agg(
      org.apache.spark.sql.functions.min("doc_id"),
      org.apache.spark.sql.functions.max("doc_id")).collect()(0)
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)

    val oneDir = freshDir()
    val oneShot = IncrementalNearDup.ingest(spark, oneDir, docs, 0, nBuckets = 8)
      .collect().map(_.getLong(0)).sorted

    val chunkDir = freshDir()
    val a = IncrementalNearDup.ingest(spark, chunkDir,
      docs.filter(col("doc_id") <= c1), 0, nBuckets = 8)
    val b = IncrementalNearDup.ingest(spark, chunkDir,
      docs.filter(col("doc_id") > c1 && col("doc_id") <= c2), 1, nBuckets = 8)
    val c = IncrementalNearDup.ingest(spark, chunkDir,
      docs.filter(col("doc_id") > c2), 2, nBuckets = 8)
    val chunked = (a.collect() ++ b.collect() ++ c.collect())
      .map(_.getLong(0)).sorted

    assert(chunked.length > 0 && chunked.length < docs.count())
    assert(chunked.toSeq === oneShot.toSeq)
  }

  test("duplicates across batches are rejected; the registry includes rejected docs") {
    val dir = freshDir()
    val text = "the quick brown fox jumps over the lazy dog near the old stone bridge every single morning"
    val other = "completely unrelated legal boilerplate concerning maritime insurance claims filed before nineteen twelve in coastal provinces"
    // batch 0: doc 1 (text), doc 2 (other)
    val a = IncrementalNearDup.ingest(spark, dir,
      docsDf(Seq((1L, text), (2L, other))), 0, nBuckets = 8)
    assert(a.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // batch 1: doc 3 duplicates doc 1 → rejected; doc 4 duplicates doc 3
    // WITHIN the batch → rejected against the smaller in-batch id even
    // though doc 3 itself is rejected (seen-registry, not admitted-set)
    val b = IncrementalNearDup.ingest(spark, dir,
      docsDf(Seq((3L, text), (4L, text))), 1, nBuckets = 8)
    assert(b.collect().isEmpty)
    // batch 2: doc 5 duplicates the REJECTED doc 3's text → still
    // rejected (its bands are registered), doc 6 is fresh → admitted
    val c = IncrementalNearDup.ingest(spark, dir,
      docsDf(Seq((5L, text),
        (6L, "a third body of text about alpine railway construction techniques documented throughout the eighteen nineties"))), 2, nBuckets = 8)
    assert(c.collect().map(_.getLong(0)).toSeq === Seq(6L))
  }

  test("v2 layout: sig stored once per doc as band=-1 rows; band rows carry no sig") {
    import org.apache.spark.sql.functions.col
    val dir = freshDir()
    val docs = docsDf(Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the old stone bridge"),
      (2L, "completely unrelated legal boilerplate concerning maritime insurance claims filed early")))
    IncrementalNearDup.ingest(spark, dir, docs, 0, nBuckets = 8)
    val seg = spark.read.parquet(s"$dir/v=1")
    // one sig row per doc, carrying the only non-null signatures
    val sigRows = seg.filter(col("band") === -1L)
    assert(sigRows.count() === 2)
    assert(sigRows.filter(col("sig").isNull).count() === 0)
    assert(seg.filter(col("band") >= 0 && col("sig").isNotNull).count() === 0)
    // band rows: Bands per doc, keys intact
    assert(seg.filter(col("band") >= 0).count() ===
      2L * IncrementalNearDup.Bands)
    // and the split layout still catches a cross-batch near-dup (the
    // sig fetch path, not the in-batch self-join)
    val b = IncrementalNearDup.ingest(spark, dir,
      docsDf(Seq((3L, "the quick brown fox jumps over the lazy dog near the old stone bridge"))), 1, nBuckets = 8)
    assert(b.collect().isEmpty)
  }

  test("replay of a committed batch no-ops with the same answer; changed input fails loudly") {
    val dir = freshDir()
    val text = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen"
    val first = IncrementalNearDup.ingest(spark, dir,
      docsDf(Seq((10L, text))), 0, nBuckets = 4)
    assert(first.collect().map(_.getLong(0)).toSeq === Seq(10L))
    // same batchId, same input: idempotent, same admitted set
    val replay = IncrementalNearDup.ingest(spark, dir,
      docsDf(Seq((10L, text))), 0, nBuckets = 4)
    assert(replay.collect().map(_.getLong(0)).toSeq === Seq(10L))
    // same batchId, DIFFERENT input: checkpoint reset against retained
    // state — must fail, not silently lose events
    val e = intercept[IllegalArgumentException](
      IncrementalNearDup.ingest(spark, dir,
        docsDf(Seq((11L, text + " extra"))), 0, nBuckets = 4))
    assert(e.getMessage.contains("fingerprint"))
  }

  test("layout guard: a non-empty index without the v3 stamp fails loudly") {
    val dir = freshDir()
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    IncrementalNearDup.ingest(spark, dir, docsDf(Seq((1L, text))), 0, nBuckets = 4)
      .count()
    // simulate an index written by the pre-stamp (v1-era) release: committed
    // segments, no _LAYOUT marker — reading it as v2 would silently admit
    // every cross-batch duplicate, so ingest must refuse instead
    assert(new java.io.File(s"$dir/_LAYOUT").delete())
    val e = intercept[IllegalStateException](
      IncrementalNearDup.ingest(spark, dir, docsDf(Seq((2L, text))), 1, nBuckets = 4))
    assert(e.getMessage.contains("_LAYOUT"))

    // and a MISMATCHED stamp (some future v9) must refuse symmetrically
    val dir2 = freshDir()
    IncrementalNearDup.ingest(spark, dir2, docsDf(Seq((1L, text))), 0, nBuckets = 4)
      .count()
    // drop the checksum sidecar too — a raw rewrite under an intact .crc
    // trips Hadoop's ChecksumException before the guard even reads
    new java.io.File(s"$dir2/._LAYOUT.crc").delete()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir2/_LAYOUT"),
      "neardup-v9".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException](
      IncrementalNearDup.ingest(spark, dir2, docsDf(Seq((2L, text))), 1, nBuckets = 4))
    assert(e2.getMessage.contains("neardup-v9"))
  }
}
