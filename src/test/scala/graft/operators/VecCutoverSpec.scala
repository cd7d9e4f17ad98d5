package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.streaming.BucketState

/** Generation cutover for the incremental IVF-PQ index: the staged
  * generation is invisible until the one `_GEN` rename (crash-anywhere
  * atomicity), the batch chain continues into the new generation, and
  * the new generation obeys the same frozen-params contracts as any
  * store (chunked ≡ one-shot under ITS params). Recall before/after is
  * measured by `graft.VecCutoverProbe` (committed artifact); these
  * specs pin the state-machine semantics.
  */
class VecCutoverSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def vecs: DataFrame =
    Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))

  private def topIds(d: String, q: Array[Double]): Seq[(Long, Double)] =
    IncrementalVecIndex.searchTopk(spark, d, dir, q).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def rowsOf(df: DataFrame): Set[(Long, Long, Seq[Int])] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2))).toSet

  test("cutover is atomic: a crash between the staged build and the rename leaves the old generation serving") {
    val d = freshDir("cutover-crash")
    val q = Array.tabulate(64)(i => math.sin(i * 0.29))
    IncrementalVecIndex.ingest(spark, d, vecs.filter(col("vec_id") <= 249), 0).count()
    IncrementalVecIndex.ingest(spark, d, vecs.filter(col("vec_id") > 249), 1).count()
    val before = topIds(d, q)
    val snapBefore = rowsOf(IncrementalVecIndex.snapshot(spark, d))

    // crash INJECTED after the staged generation fully commits but
    // before the pointer rename — the staged gen must be invisible
    intercept[RuntimeException] {
      IncrementalVecIndex.cutover(spark, d, vecs,
        beforeSwap = () => throw new RuntimeException("injected crash"))
    }
    assert(IncrementalVecIndex.liveGen(spark, d).isEmpty,
      "pointer must still name the pre-cutover store")
    assert(topIds(d, q) === before)
    assert(rowsOf(IncrementalVecIndex.snapshot(spark, d)) === snapBefore)

    // the retried cutover deletes the residue and completes
    val gen = IncrementalVecIndex.cutover(spark, d, vecs)
    assert(gen === 1L)
    assert(IncrementalVecIndex.liveGen(spark, d) === Some(1L))
    // the new generation serves: full corpus searchable, well-ordered
    val after = topIds(d, q)
    assert(after.size === 10)
    assert(after.map(_._2).sliding(2).forall(p => p.head >= p.last))
    assert(rowsOf(IncrementalVecIndex.snapshot(spark, d)).size === vecs.count())
    graft.Shared.deleteDirTree(d)
  }

  test("the batch chain continues into the new generation; its contracts hold; old state GCs away") {
    val d = freshDir("cutover-chain")
    val a = vecs.filter(col("vec_id") <= 166)
    val b = vecs.filter(col("vec_id") > 166 && col("vec_id") <= 333)
    val c = vecs.filter(col("vec_id") > 333)
    IncrementalVecIndex.ingest(spark, d, a, 0).count()
    IncrementalVecIndex.ingest(spark, d, b, 1).count()
    // gen 1 rebuilt from the two drops' union
    IncrementalVecIndex.cutover(spark, d, a.unionByName(b))
    // drop 2 continues the SAME batchId chain, landing in gen 1
    IncrementalVecIndex.ingest(spark, d, c, 2).count()
    assert(rowsOf(IncrementalVecIndex.snapshot(spark, d)).size === vecs.count())
    // replay of drop 2 is an idempotent no-op in the new generation
    IncrementalVecIndex.ingest(spark, d, c, 2).count()
    assert(rowsOf(IncrementalVecIndex.snapshot(spark, d)).size === vecs.count())
    // divergent replay still fails loudly in the new generation
    val ex = intercept[IllegalArgumentException] {
      IncrementalVecIndex.ingest(spark, d, c.limit(3), 2).count()
    }
    assert(ex.getMessage.toLowerCase.contains("fingerprint") ||
      ex.getMessage.toLowerCase.contains("batch"))
    // the whole store equals the one-shot encode under gen-1's params —
    // the frozen-params contract, now per generation
    val oneShot = rowsOf(IncrementalVecIndex.encodeWithParams(spark,
      IncrementalVecIndex.readParams(spark, d), vecs))
    assert(rowsOf(IncrementalVecIndex.snapshot(spark, d)) === oneShot)
    // maintenance GC drops the dead root-store state; serving unaffected
    IncrementalVecIndex.gcGenerations(spark, d)
    assert(!new java.io.File(s"$d/params").exists())
    assert(rowsOf(IncrementalVecIndex.snapshot(spark, d)) === oneShot)
    graft.Shared.deleteDirTree(d)
  }

  test("cutover scales nlist to the accumulated corpus; the scaled generation honors every contract") {
    val d = freshDir("cutover-nlist")
    val q = Array.tabulate(64)(i => math.cos(i * 0.17))
    val n = vecs.count()
    IncrementalVecIndex.ingest(spark, d, vecs.filter(col("vec_id") <= 249), 0).count()
    // generation 0 trains at the first-gen constant
    assert(IncrementalVecIndex.readParams(spark, d).centroids.length
      === IncrementalVecIndex.Cells)
    IncrementalVecIndex.ingest(spark, d, vecs.filter(col("vec_id") > 249), 1).count()
    IncrementalVecIndex.cutover(spark, d, vecs)
    // the retrained generation carries √N-scaled cells (> the constant
    // at this fixture), and the cell count is discovered from the
    // stored centroid rows — no reader consults the constant
    val scaled = IncrementalVecIndex.cellsFor(spark, n)
    assert(scaled > IncrementalVecIndex.Cells)
    val p2 = IncrementalVecIndex.readParams(spark, d)
    assert(p2.centroids.length === scaled)
    // serving and the frozen-params equivalence hold under scaled cells
    val got = topIds(d, q)
    assert(got.size === 10)
    assert(got.map(_._2).sliding(2).forall(s => s.head >= s.last))
    assert(rowsOf(IncrementalVecIndex.snapshot(spark, d)) ===
      rowsOf(IncrementalVecIndex.encodeWithParams(spark, p2, vecs)))
    // code rows actually spread over the scaled cell space
    assert(IncrementalVecIndex.snapshot(spark, d)
      .select(col("cell")).distinct().count() > IncrementalVecIndex.Cells)
    graft.Shared.deleteDirTree(d)
  }

  test("spark.graft.vec.cells overrides nlist at ingest and cutover; chunked ≡ one-shot holds") {
    val d = freshDir("cutover-cellsconf")
    spark.conf.set("spark.graft.vec.cells", "24")
    try {
      IncrementalVecIndex.ingest(spark, d, vecs.filter(col("vec_id") <= 249), 0).count()
      assert(IncrementalVecIndex.readParams(spark, d).centroids.length === 24)
      IncrementalVecIndex.ingest(spark, d, vecs.filter(col("vec_id") > 249), 1).count()
      // chunked ingest ≡ one-shot encode under the conf'd params
      val p = IncrementalVecIndex.readParams(spark, d)
      assert(rowsOf(IncrementalVecIndex.snapshot(spark, d)) ===
        rowsOf(IncrementalVecIndex.encodeWithParams(spark, p, vecs)))
      IncrementalVecIndex.cutover(spark, d, vecs)
      assert(IncrementalVecIndex.readParams(spark, d).centroids.length === 24)
    } finally spark.conf.unset("spark.graft.vec.cells")
    graft.Shared.deleteDirTree(d)
  }
}
