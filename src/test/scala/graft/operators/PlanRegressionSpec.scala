package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-shape regression tests: the scale properties argued in the
  * Scaladocs are asserted against the actual physical plans, so a future
  * refactor that silently de-optimizes (drops a broadcast, loses pushdown,
  * turns top-k into a full sort, re-correlates a subquery) fails loudly.
  */
class PlanRegressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q5: every dimension join broadcasts; no sort-merge join") {
    val p = plan(Relational.q5LocalSupplierVolume(spark, sf))
    assert(p.split("BroadcastHashJoin").length - 1 >= 5, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q1: date filter and column pruning reach the parquet scan") {
    val p = plan(Relational.q1PricingSummary(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("ReadSchema: struct<l_quantity:double"), p)
    assert(!p.contains("l_orderkey"), "scan reads columns the query never uses")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan(Relational.qTopkOrders(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("correlated subquery decorrelates (no per-row subquery nodes)") {
    val p = plan(Relational.qSqlCorrSubquery(spark, sf))
    assert(!p.contains("Subquery"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("CDC snapshot: single keyed aggregate with map-side partials") {
    val log = graft.cdc.Changelog.synthetic(spark, sf)
    val p = plan(graft.cdc.CdcApply.snapshot(log))
    assert(p.contains("partial_max_by") || p.contains("partial_"),
      s"no map-side partial aggregation in:\n$p")
    // truncate horizon must be a broadcast, never a collected literal
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("ANN brute force: pruned scan + broadcast query + top-k") {
    val p = plan(Similarity.annCosineTopk(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), Not(EqualTo(vec_id,0))]"), p)
  }
}
