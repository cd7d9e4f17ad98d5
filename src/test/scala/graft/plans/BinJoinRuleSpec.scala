package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The range-join rewrite rule: a naive BETWEEN-style join plans as
  * BroadcastNestedLoopJoin without the rule and as a hash equi-join (bin
  * key) with it, with identical results. The shared test session was
  * built without extensions, so the rule is injected via
  * `spark.experimental.extraOptimizations` — the dynamic registration
  * path; `GraftExtensions` covers the `spark.sql.extensions` build-time
  * path (wiring sanity-checked below).
  */
class BinJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def points = {
    import spark.implicits._
    Seq((1L, "p0"), (10L, "p1"), (19L, "p2"), (20L, "p3"), (35L, "p4"))
      .toDF("ms", "tag")
  }
  private def intervals = {
    import spark.implicits._
    Seq((0L, 20L, "a"), (10L, 30L, "b"), (30L, 31L, "c"))
      .toDF("lo", "hi", "iv")
  }

  private def naiveJoin =
    points.join(intervals, col("ms") >= col("lo") && col("ms") < col("hi"))

  private def withRule[A](width: Long)(body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinJoinRewrite
    spark.conf.set(BinJoinRewrite.WidthConf, width.toString)
    try body
    finally {
      spark.conf.unset(BinJoinRewrite.WidthConf)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq BinJoinRewrite)
    }
  }

  test("without the rule: nested loop; with it: equi-join, same results") {
    val before = naiveJoin.queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin"), before)
    val expected = naiveJoin.collect()
      .map(r => (r.getString(1), r.getString(4))).sorted.toSeq

    withRule(10L) {
      val df = naiveJoin
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      val got = df.collect().map(r => (r.getString(1), r.getString(4))).sorted.toSeq
      assert(got === expected)
      assert(df.columns.toSeq === Seq("ms", "tag", "lo", "hi", "iv")) // bins internal
    }
  }

  test("rule is a no-op when the width conf is unset") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinJoinRewrite
    try {
      val plan = naiveJoin.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq BinJoinRewrite)
  }

  test("all four bound shapes rewrite; open/closed integer semantics exact") {
    for ((cond, name) <- Seq(
      (col("ms") > col("lo") && col("ms") < col("hi"), "open-open"),
      (col("ms") >= col("lo") && col("ms") <= col("hi"), "closed-closed"),
      (col("ms") <= col("hi") && col("ms") >= col("lo"), "swapped conjuncts"),
      (col("lo") <= col("ms") && col("hi") > col("ms"), "mirrored operands"))) {
      val naive = points.join(intervals, cond)
      val expected = naive.collect().map(r => (r.getString(1), r.getString(4))).sorted.toSeq
      withRule(10L) {
        val df = points.join(intervals, cond)
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name not rewritten:\n$plan")
        val got = df.collect().map(r => (r.getString(1), r.getString(4))).sorted.toSeq
        assert(got === expected, name)
      }
    }
  }

  test("extra non-equi conjuncts ride along: rewrite fires, residual exact") {
    // a cross-side inequality cannot be a hash key, so the range pair is
    // still the only route out of the nested loop; the extra conjunct
    // must survive in the residual filter
    val cond = col("ms") >= col("lo") && col("ms") < col("hi") &&
      col("tag") =!= col("iv")
    val naive = points.join(intervals, cond)
    val expected = naive.collect().map(r => (r.getString(1), r.getString(4))).sorted.toSeq
    assert(expected.nonEmpty)
    withRule(10L) {
      val df = points.join(intervals, cond)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(df.collect().map(r => (r.getString(1), r.getString(4))).sorted.toSeq
        === expected)
    }
  }

  test("a cross-side equality conjunct suppresses the rewrite (hash key exists)") {
    import spark.implicits._
    val named = Seq((0L, 20L, "p1"), (10L, 30L, "p9")).toDF("lo", "hi", "iv")
    val cond = col("ms") >= col("lo") && col("ms") < col("hi") &&
      col("tag") === col("iv")
    withRule(10L) {
      val df = points.join(named, cond)
      val plan = df.queryExecution.executedPlan.toString
      // must plan as a plain hash/sort-merge equi-join on tag=iv — no bin
      // explode anywhere
      assert(!plan.contains("__bin"), plan)
      assert(!plan.contains("Generate"), plan)
      assert(df.collect().map(_.getString(1)).sorted.toSeq === Seq("p1"))
    }
  }

  test("equi-keyed joins are left untouched") {
    withRule(10L) {
      val eq = points.join(intervals, col("ms") === col("lo"))
      assert(eq.count() === 1) // ms=10 matches lo=10
    }
  }

  test("mirrored plan sides (intervals on the left) also rewrite") {
    val naive = intervals.join(points, col("ms") >= col("lo") && col("ms") < col("hi"))
    val expected = naive.collect().map(r => (r.getString(2), r.getString(4))).sorted.toSeq
    withRule(10L) {
      val df = intervals.join(points, col("ms") >= col("lo") && col("ms") < col("hi"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(df.collect().map(r => (r.getString(2), r.getString(4))).sorted.toSeq === expected)
      assert(df.columns.toSeq === Seq("lo", "hi", "iv", "ms", "tag"))
    }
  }

  test("a malformed width conf disables the rule instead of failing queries") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinJoinRewrite
    spark.conf.set(BinJoinRewrite.WidthConf, "not-a-number")
    try assert(naiveJoin.count() === 6) // still runs (as a nested loop)
    finally {
      spark.conf.unset(BinJoinRewrite.WidthConf)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq BinJoinRewrite)
    }
  }

  test("a sentinel interval raises an actionable error naming the conf") {
    import spark.implicits._
    withRule(10L) {
      // [0, Long.MaxValue) spans ~1e18 bins: the runtime guard must name
      // the knob instead of dying on the Sequence array-size limit
      val sentinel = Seq((0L, Long.MaxValue, "all")).toDF("lo", "hi", "iv")
      val df = points.join(sentinel, col("ms") >= col("lo") && col("ms") < col("hi"))
      val e = intercept[Exception](df.count())
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains(BinJoinRewrite.MaxBinsConf)),
        s"unhelpful error: ${messages(e).mkString(" | ")}")
    }
  }

  test("closed Long.MaxValue sentinel bound rewrites without overflow") {
    import spark.implicits._
    // `pt <= hi` with hi = Long.MaxValue ("unbounded" sentinel): the old
    // half-open normalization computed Add(hi, 1), which throws
    // ARITHMETIC_OVERFLOW under ANSI (and silently dropped all matches
    // with ANSI off). Bin width Long.MaxValue keeps the span within the
    // maxBins guard so the join must actually RUN and match everything.
    val sentinel = Seq((0L, Long.MaxValue, "all")).toDF("lo", "hi", "iv")
    val cond = col("ms") >= col("lo") && col("ms") <= col("hi")
    withRule(Long.MaxValue) {
      val df = points.join(sentinel, cond)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(df.count() === points.count())
    }
  }

  test("empty/inverted intervals match nothing and generate no bin rows") {
    import spark.implicits._
    withRule(10L) {
      val weird = Seq((20L, 20L, "empty"), (30L, 10L, "inverted")).toDF("lo", "hi", "iv")
      val df = points.join(weird, col("ms") >= col("lo") && col("ms") < col("hi"))
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(df.count() === 0)
    }
  }

  test("GraftExtensions is instantiable by name, as spark.sql.extensions does") {
    // the builder path: zero-arg reflective construction + injection call
    val inst = Class.forName("graft.plans.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    inst(new org.apache.spark.sql.SparkSessionExtensions) // must not throw
  }
}
