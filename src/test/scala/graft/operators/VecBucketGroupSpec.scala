package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Physical-bucket grouping for scaled-nlist generations (r17): a
  * generation with more cells than [[IncrementalVecIndex.MaxBuckets]]
  * range-groups its cells into at most MaxBuckets partition dirs per
  * segment (the per-drop small-file fix), while every read path —
  * snapshot purity, bucket-pruned serving with the row-level cell
  * filter — stays bit-identical to the ungrouped semantics. The
  * grouping must derive from the STORED params (frozen cell count),
  * never from session state at read time.
  */
class VecBucketGroupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def vecs: DataFrame =
    Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))

  private def rowsOf(df: DataFrame): Set[(Long, Long, Seq[Int])] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getSeq[Int](2))).toSet

  test("a >MaxBuckets-cell generation writes grouped dirs and serves identically to the ungrouped read") {
    val d = freshDir("vecinc-grouped")
    spark.conf.set("spark.graft.vec.cells", "100")
    try {
      IncrementalVecIndex.ingest(spark, d,
        vecs.filter(col("vec_id") <= 250), 0).count()
      IncrementalVecIndex.ingest(spark, d,
        vecs.filter(col("vec_id") > 250), 1).count()
    } finally spark.conf.unset("spark.graft.vec.cells")
    // conf unset BEFORE any read: the mapping must come from the stored
    // frozen params, not from whatever the serving session has set

    // layout: every segment dir holds at most MaxBuckets data buckets
    val vdirs = new java.io.File(d).listFiles.filter(_.getName.startsWith("v="))
    assert(vdirs.nonEmpty)
    vdirs.foreach { v =>
      val ps = v.listFiles.filter(_.getName.startsWith("p=")).map(_.getName)
      assert(ps.length <= IncrementalVecIndex.MaxBuckets,
        s"${v.getName} wrote ${ps.length} bucket dirs")
    }
    val snap = IncrementalVecIndex.snapshot(spark, d)
    val params = IncrementalVecIndex.readParams(spark, d)
    assert(params.centroids.length === 100)
    val distinctCells = snap.select(col("cell")).distinct().count()
    assert(distinctCells > IncrementalVecIndex.MaxBuckets,
      s"fixture too small to engage grouping (distinct cells $distinctCells)")
    // purity contract unchanged under grouping
    assert(rowsOf(snap) === rowsOf(IncrementalVecIndex.encodeWithParams(
      spark, params, vecs)))

    // serving: the bucket-pruned + cell-filtered read must equal the
    // UNGROUPED reference — same probe selection over the stored
    // centroids, candidates from the full snapshot filtered by cell
    val q = Array.tabulate(64)(i => math.sin(i * 0.37))
    val qFx = q.map(Similarity.fxLong)
    def cosFx(c: Array[Double]): Double = {
      val cf = c.map(Similarity.fxLong)
      val dot = cf.zip(qFx).map { case (a, b) => a * b }.sum.toDouble
      dot / math.sqrt(cf.map(x => x * x).sum.toDouble *
        qFx.map(x => x * x).sum.toDouble)
    }
    for (nProbe <- Seq(4, 7)) {
      val probed = params.centroids.zipWithIndex
        .map { case (c, i) => (i.toLong, cosFx(c)) }
        .sortBy { case (cell, sim) => (-sim, cell) }
        .take(nProbe).map(_._1).toSet
      val tables = Similarity.pqTablesFor(params.codebooks, q)
      val expected = snap.filter(col("cell").isInCollection(probed))
        .select(col("vec_id"), Similarity.adcDot(tables).as("adot"))
        .orderBy(col("adot").desc, col("vec_id"))
        .limit(Similarity.PqRerank)
        .join(Similarity.corpus(spark, dir), "vec_id")
        .withColumn("qv", typedLit(qFx))
        .withColumn("cosine", Similarity.cosNative(spark, col("v"), col("qv")))
        .select(col("vec_id"), col("cosine"))
        .orderBy(col("cosine").desc, col("vec_id")).limit(10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = IncrementalVecIndex.searchTopk(spark, d, dir, q,
          nProbe = nProbe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === expected, s"nProbe=$nProbe")
      assert(got.size === 10)
    }
    graft.Shared.deleteDirTree(d)
  }

  test("conf'd cell count past the cap still replays and chunks identically") {
    // the purity/replay contracts must not depend on the grouping being
    // identity: two sibling chunkings under 100 cells agree, and a
    // replayed batch is an idempotent no-op
    spark.conf.set("spark.graft.vec.cells", "100")
    val d2 = freshDir("vecinc-g2")
    val d3 = freshDir("vecinc-g3")
    try {
      IncrementalVecIndex.ingest(spark, d2, vecs.filter(col("vec_id") <= 250), 0).count()
      IncrementalVecIndex.ingest(spark, d2, vecs.filter(col("vec_id") > 250), 1).count()
      IncrementalVecIndex.ingest(spark, d3, vecs.filter(col("vec_id") <= 250), 0).count()
      IncrementalVecIndex.ingest(spark, d3,
        vecs.filter(col("vec_id") > 250 && col("vec_id") <= 400), 1).count()
      IncrementalVecIndex.ingest(spark, d3, vecs.filter(col("vec_id") > 400), 2).count()
      val s2 = rowsOf(IncrementalVecIndex.snapshot(spark, d2))
      assert(s2 === rowsOf(IncrementalVecIndex.snapshot(spark, d3)))
      assert(s2.size === vecs.count())
      val before = s2
      IncrementalVecIndex.ingest(spark, d2, vecs.filter(col("vec_id") > 250), 1).count()
      assert(rowsOf(IncrementalVecIndex.snapshot(spark, d2)) === before)
    } finally {
      spark.conf.unset("spark.graft.vec.cells")
      graft.Shared.deleteDirTree(d2); graft.Shared.deleteDirTree(d3)
    }
  }
}
