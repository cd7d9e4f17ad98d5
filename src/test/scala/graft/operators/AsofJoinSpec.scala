package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** As-of join semantics on hand-built edges: inclusive match at equal ts,
  * latest-wins among earlier right rows, null on no-match, and plan shape
  * (one window, no nested-loop join).
  */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def l = {
    import spark.implicits._
    Seq((1, 10L, "a"), (1, 5L, "b"), (2, 7L, "c"), (3, 4L, "d"))
      .toDF("k", "ms", "tag")
  }
  private def r = {
    import spark.implicits._
    // key 1: rows at 3, 5, 9 — left@5 must match 5 (inclusive), left@10 → 9
    // key 2: only a LATER row (8 > 7) → no match
    // key 3: absent entirely → no match
    Seq((1, 3L, 30), (1, 5L, 50), (1, 9L, 90), (2, 8L, 80))
      .toDF("k", "ms", "price")
  }

  test("inclusive ties, latest-wins, and no-match nulls") {
    val out = AsofJoin.asofJoin(l, r, "k", "ms", Seq("price", "ms"))
      .select(col("tag"), col("asof.price"), col("asof.ms"))
      .collect().map(row => (row.getString(0),
        if (row.isNullAt(1)) None else Some(row.getInt(1)))).toMap
    assert(out === Map(
      "a" -> Some(90), // 10 >= 9, latest of {3,5,9}
      "b" -> Some(50), // equal ts matches (inclusive)
      "c" -> None,     // right row exists but only later (8 > 7)
      "d" -> None))    // no right rows for the key
  }

  test("plan is one window over a union — no nested-loop range join") {
    val plan = AsofJoin.asofJoin(l, r, "k", "ms", Seq("price"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("left rows are preserved exactly (as-of is a left join)") {
    val out = AsofJoin.asofJoin(l, r, "k", "ms", Seq("price"))
    assert(out.count() === 4)
    assert(out.columns.toSeq === Seq("k", "ms", "tag", "asof"))
  }
}
