package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, ShortType}

/** Native Catalyst expression: Σ_j min(a[j], b[j]) over two
  * `array<smallint>` count vectors — the partition-based sound upper
  * bound on a document pair's shingle intersection (|A∩B| ≤ the min-sum
  * of the docs' universe-partition histograms) that the exact-overlap
  * candidate join filters on.
  *
  * This is the documented escalation past the `zip_with`/`aggregate` HOF
  * form, same rationale as [[CosineFxExpr]]: HOFs are CodegenFallback
  * (interpreted per-element lambda dispatch + an intermediate array per
  * row), which measured ~6 µs per evaluation on the 64-part vectors —
  * ~40 s over the sf3 candidate stream's 2.2e8 residual evaluations,
  * dominating the whole overlap build. This expression emits one fused
  * Java loop inside whole-stage codegen. Bit-identical to the HOF form
  * by construction (same integer mins and sum) for non-null,
  * unsaturated slots — null slots poison to null exactly like the HOF,
  * and a both-sides-saturated slot (min = Short.MaxValue, i.e. the
  * builder's clamp fired on both docs) returns Int.MaxValue because the
  * true min is unknowable from a clamped vector and the only sound
  * pruning bound is "don't prune". Asserted by the overlap parity spec
  * against the brute count join.
  *
  * Interpreted `nullSafeEval` and generated code are kept textually
  * parallel so a reviewer can check they compute the same thing.
  */
case class MinSumExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(ShortType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "min_sum expects two array<smallint> count vectors, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "min_sum"

  // Length mismatch ⇒ null, matching the HOF form exactly (zip_with
  // null-pads the shorter side and the null poisons the aggregate).
  // A null ELEMENT also ⇒ null for the same parity reason: the HOF's
  // per-slot min is null-poisoning, so an accepted containsNull=true
  // input must not silently treat null slots as 0 (they previously did).
  // A SATURATED slot-min (both sides Short.MaxValue) ⇒ Int.MaxValue:
  // the count-vector builder clamps per-part counts at Short.MaxValue,
  // so a saturated min means the true min is unknowable from the vector
  // (≥ 32767) — the only sound bound is +∞, i.e. never prune. Slots
  // where just one side saturates stay exact (min = the smaller side).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var s = 0
      var sat = false
      var i = 0
      var nul = false
      while (i < n && !nul) {
        if (x.isNullAt(i) || y.isNullAt(i)) nul = true
        else {
          val xi = x.getShort(i); val yi = y.getShort(i)
          val m = if (xi < yi) xi else yi
          if (m == Short.MaxValue) sat = true
          s += m
        }
        i += 1
      }
      if (nul) null else if (sat) Int.MaxValue else s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (s, n, i, xi, yi, m, sat) = (ctx.freshName("s"), ctx.freshName("n"),
        ctx.freshName("i"), ctx.freshName("xi"), ctx.freshName("yi"),
        ctx.freshName("m"), ctx.freshName("sat"))
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $s = 0;
         |  boolean $sat = false;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    short $xi = $a.getShort($i);
         |    short $yi = $b.getShort($i);
         |    short $m = ($xi < $yi) ? $xi : $yi;
         |    if ($m == Short.MAX_VALUE) $sat = true;
         |    $s += $m;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $sat ? Integer.MAX_VALUE : $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinSumExpr {
  /** Register `min_sum(array<smallint>, array<smallint>) -> int` in the
    * session's function registry (idempotent), for both the Column DSL
    * (`call_function`) and SQL text.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "min_sum", exprs => MinSumExpr(exprs(0), exprs(1)), "scala_udf")
}
