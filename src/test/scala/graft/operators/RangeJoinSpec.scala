package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bin-join semantics: exact [lo, hi) bounds, overlapping intervals
  * multiply-match, bin-boundary points land once (no dup from the bin
  * explode), and the plan is an equi-join, never a nested loop.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def points = {
    import spark.implicits._
    // 10 sits on a bin boundary (width 10); 19 is hi-1; 20 is hi (excluded)
    Seq((1L, "p0"), (10L, "p1"), (19L, "p2"), (20L, "p3"), (35L, "p4"))
      .toDF("ms", "tag")
  }
  private def intervals = {
    import spark.implicits._
    // [0,20) and [10,30) overlap on [10,20); [30,31) is sub-bin-width
    Seq((0L, 20L, "a"), (10L, 30L, "b"), (30L, 31L, "c"))
      .toDF("lo", "hi", "iv")
  }

  test("exact bounds, overlap multi-match, no bin-explode duplicates") {
    val out = RangeJoin.binJoin(points, intervals, "ms", "lo", "hi", 10L)
      .select(col("tag"), col("iv")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(
      ("p0", "a"),               // 1 in [0,20) only
      ("p1", "a"), ("p1", "b"),  // 10: boundary, in both overlapping windows
      ("p2", "a"), ("p2", "b"),  // 19 = hi-1 of a
      ("p3", "b")))              // 20 excluded from a (hi exclusive); 35 matches nothing
  }

  test("plan is an equi-join on the bin key (no nested loop / cartesian)") {
    val plan = RangeJoin.binJoin(points, intervals, "ms", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
