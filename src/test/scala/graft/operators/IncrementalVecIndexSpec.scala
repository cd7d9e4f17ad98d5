package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Contracts of the incremental IVF-PQ vector index: chunked ingest ≡
  * one-shot encode under the frozen first-drop params, idempotent replay
  * with a loud divergent-input refusal, params frozen across drops, and
  * bucket-pruned serving that equals serving from an equivalently-chunked
  * sibling. Search-result EXACTNESS (probe selection, ADC, re-rank order)
  * is pinned by the full DuckDB oracle on `ann_ivfpq_incremental` — these
  * specs pin the state-store semantics the oracle cannot see.
  */
class IncrementalVecIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def vecs: DataFrame =
    Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))

  private def rowsOf(df: DataFrame): Set[(Long, Long, Seq[Int])] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getSeq[Int](2))).toSet

  test("chunked ingest equals the sibling chunking and the one-shot encode under the same frozen params") {
    // same FIRST drop (ids ≤ 166) trains identical frozen params in both
    // stores, so any later chunking must append byte-identical code rows
    val d2 = freshDir("vecinc-two")
    IncrementalVecIndex.ingest(spark, d2, vecs.filter(col("vec_id") <= 166), 0).count()
    IncrementalVecIndex.ingest(spark, d2, vecs.filter(col("vec_id") > 166), 1).count()
    val d3 = freshDir("vecinc-three")
    IncrementalVecIndex.ingest(spark, d3, vecs.filter(col("vec_id") <= 166), 0).count()
    IncrementalVecIndex.ingest(spark, d3,
      vecs.filter(col("vec_id") > 166 && col("vec_id") <= 333), 1).count()
    IncrementalVecIndex.ingest(spark, d3, vecs.filter(col("vec_id") > 333), 2).count()

    val s2 = rowsOf(IncrementalVecIndex.snapshot(spark, d2))
    val s3 = rowsOf(IncrementalVecIndex.snapshot(spark, d3))
    assert(s2 === s3)
    // …and both equal the ONE-SHOT encode of the union under the frozen
    // params — the pure-function contract
    val oneShot = rowsOf(IncrementalVecIndex.encodeWithParams(spark,
      IncrementalVecIndex.readParams(spark, d2), vecs))
    assert(s2 === oneShot)
    assert(s2.size === vecs.count())

    // serving agrees between the sibling chunkings (same params, same
    // rows ⇒ same probe set, same ADC candidates, same re-rank)
    val q = Array.tabulate(64)(i => math.sin(i * 0.37))
    val r2 = IncrementalVecIndex.searchTopk(spark, d2, dir, q).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val r3 = IncrementalVecIndex.searchTopk(spark, d3, dir, q).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(r2 === r3)
    assert(r2.size === 10)
    assert(r2.map(_._2).sliding(2).forall(p => p.head >= p.last))
    graft.Shared.deleteDirTree(d2); graft.Shared.deleteDirTree(d3)
  }

  test("params are frozen after the first drop; replay is idempotent; divergent input fails loudly") {
    val d = freshDir("vecinc-replay")
    val a = vecs.filter(col("vec_id") <= 249)
    val b = vecs.filter(col("vec_id") > 249)
    IncrementalVecIndex.ingest(spark, d, a, 0).count()
    val paramsAfterFirst = rowsOfParams(d)
    IncrementalVecIndex.ingest(spark, d, b, 1).count()
    assert(rowsOfParams(d) === paramsAfterFirst,
      "a later drop must never retrain the frozen quantizers")

    val before = rowsOf(IncrementalVecIndex.snapshot(spark, d))
    // replay: same batchId + same input → no-op returning the same rows
    val replayed = rowsOf(IncrementalVecIndex.ingest(spark, d, b, 1)
      .select(col("cell"), col("vec_id"), col("codes")))
    assert(rowsOf(IncrementalVecIndex.snapshot(spark, d)) === before)
    assert(replayed === rowsOf(IncrementalVecIndex.encodeWithParams(spark,
      IncrementalVecIndex.readParams(spark, d), b)))
    // divergent input under a committed batchId must refuse
    val ex = intercept[IllegalArgumentException] {
      IncrementalVecIndex.ingest(spark, d, b.limit(5), 1).count()
    }
    assert(ex.getMessage.toLowerCase.contains("fingerprint") ||
      ex.getMessage.toLowerCase.contains("batch"))
    graft.Shared.deleteDirTree(d)
  }

  test("an aborted batch-0 params write is retrained when the relaunch brings different data") {
    // crash window: writeParams landed, the batch-0 manifest commit did
    // not. A relaunch with a DIFFERENT first drop passes checkBatch
    // (nothing committed) — the recorded training fingerprint must force
    // a retrain instead of silently encoding against the aborted input's
    // quantizers ('different input fails loudly' for the one batch that
    // defines the learned state; here the loud form is overwrite-retrain).
    val d = freshDir("vecinc-abort0")
    val a = vecs.filter(col("vec_id") <= 333)
    val b = vecs.filter(col("vec_id") > 333)
    IncrementalVecIndex.ingest(spark, d, a, 0).count()
    val paramsFromA = rowsOfParams(d)
    // roll the store back to the crash state: params present, no commits
    val fs = new java.io.File(d)
    fs.listFiles().foreach { f =>
      if (f.getName.startsWith("v=") || f.getName == "_CURRENT")
        graft.Shared.deleteDirTree(f.toString)
    }
    IncrementalVecIndex.ingest(spark, d, b, 0).count()
    val paramsFromB = rowsOfParams(d)
    assert(paramsFromB !== paramsFromA,
      "relaunch with different first-drop data must retrain the quantizers")
    // …and the retrained params are exactly what a fresh store trains on b
    val dFresh = freshDir("vecinc-fresh-b")
    IncrementalVecIndex.ingest(spark, dFresh, b, 0).count()
    assert(paramsFromB === rowsOfParams(dFresh))
    // same-input relaunch after the same crash reuses (params unchanged)
    fs.listFiles().foreach { f =>
      if (f.getName.startsWith("v=") || f.getName == "_CURRENT")
        graft.Shared.deleteDirTree(f.toString)
    }
    IncrementalVecIndex.ingest(spark, d, b, 0).count()
    assert(rowsOfParams(d) === paramsFromB)
    graft.Shared.deleteDirTree(d); graft.Shared.deleteDirTree(dFresh)
  }

  private def rowsOfParams(d: String): (Set[(Int, Seq[Double])], Set[(Int, Int, Seq[Double])]) = (
    spark.read.parquet(s"$d/params/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).toSet,
    spark.read.parquet(s"$d/params/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2))).toSet)
}
