package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** min_sum's full accepted-input contract — not just the hot path the
  * overlap parity spec exercises: null ELEMENTS must poison to null
  * (HOF parity for containsNull=true inputs, which checkInputDataTypes
  * accepts), and a both-sides-saturated slot must return Int.MaxValue
  * (the builder clamps per-part counts at Short.MaxValue, so a
  * saturated min is a lower bound on an unknowable true min — the only
  * sound pruning answer is "never prune").
  */
class MinSumExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def minSum(a: Seq[Integer], b: Seq[Integer]): java.lang.Integer = {
    MinSumExpr.register(spark)
    val df = spark.createDataFrame(Seq((a, b))).toDF("a", "b")
      .select(call_function("min_sum",
        transform(col("a"), x => x.cast("short")),
        transform(col("b"), x => x.cast("short"))).as("s"))
    val r = df.head()
    if (r.isNullAt(0)) null else Int.box(r.getInt(0))
  }

  test("plain vectors: sum of element mins") {
    assert(minSum(Seq(3, 7, 0), Seq(5, 2, 9)) === 3 + 2 + 0)
  }

  test("null element poisons to null, matching the HOF form") {
    assert(minSum(Seq(3, null, 1), Seq(1, 2, 3)) === null)
    assert(minSum(Seq(3, 2, 1), Seq(1, null, 3)) === null)
  }

  test("length mismatch is null, matching zip_with null-padding") {
    assert(minSum(Seq(1, 2), Seq(1, 2, 3)) === null)
  }

  test("both-sides-saturated slot returns Int.MaxValue (never prune)") {
    val cap = Short.MaxValue.toInt
    assert(minSum(Seq(cap, 1), Seq(cap, 2)) === Int.MaxValue)
    // one-side saturation stays exact: the smaller side IS the true min
    assert(minSum(Seq(cap, 1), Seq(4, 2)) === 4 + 1)
  }

  test("interpreted eval matches codegen on the contract cases") {
    // drive the interpreted path directly (nullSafeEval) with the same
    // cases — textual parallelism between the two is a review aid, this
    // pins it behaviorally
    import org.apache.spark.sql.catalyst.util.ArrayData
    def lit(xs: Seq[Any]) = ArrayData.toArrayData(
      xs.map { case null => null; case i: Int => i.toShort }.toArray)
    val e = MinSumExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(lit(Seq(3, 2)),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ShortType)),
      org.apache.spark.sql.catalyst.expressions.Literal(lit(Seq(1, 5)),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ShortType)))
    assert(e.eval(null) === 1 + 2)
    val cap = Short.MaxValue.toInt
    assert(MinSumExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(lit(Seq(cap)),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ShortType)),
      org.apache.spark.sql.catalyst.expressions.Literal(lit(Seq(cap)),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ShortType)))
      .eval(null) === Int.MaxValue)
    assert(MinSumExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(lit(Seq(1, null)),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ShortType, true)),
      org.apache.spark.sql.catalyst.expressions.Literal(lit(Seq(1, 2)),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ShortType)))
      .eval(null) === null)
  }
}
