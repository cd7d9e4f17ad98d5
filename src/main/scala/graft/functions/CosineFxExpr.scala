package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: cosine similarity of two fixed-point
  * `array<bigint>` vectors (see VectorFns — dyadic `floor(x·2^20)` lift).
  *
  * This is the documented escalation past the `zip_with`/`aggregate` HOF
  * form: HOFs are CodegenFallback (interpreted, per-element lambda
  * dispatch + a materialized intermediate array per row), while this
  * expression emits one fused Java loop inside whole-stage codegen — no
  * allocation, no virtual calls. Bit-identical to the HOF form by
  * construction (same integer sums, same IEEE tail ops), asserted by
  * CosineExprSpec and by the DuckDB oracle on every similarity query.
  *
  * Interpreted `nullSafeEval` and generated code are kept textually
  * parallel so a reviewer can check they compute the same thing.
  */
case class CosineFxExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is not extendable from outside org.apache.spark.sql
  // (AbstractDataType is package-private), but the registry exposes this
  // to arbitrary SQL text — so enforce array<bigint> inputs manually at
  // analysis time. Without this, calling cosine_fx on the natural
  // array<float> `embedding` column would reinterpret raw bytes via
  // ArrayData.getLong and return silently wrong numbers.
  override def checkInputDataTypes(): TypeCheckResult = {
    def isFx(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (isFx(left.dataType) && isFx(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "cosine_fx expects two array<bigint> fixed-point vectors " +
        s"(lift floats with VectorFns.fixedPoint), got ${left.dataType.catalogString} " +
        s"and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_fx"

  // Length mismatch ⇒ null, matching the HOF form exactly (zip_with
  // null-pads the shorter side and the null poisons the aggregate) —
  // truncating to min(n) would produce a silently wrong similarity.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var dot = 0L; var nx = 0L; var ny = 0L
      var i = 0
      while (i < n) {
        val xi = x.getLong(i); val yi = y.getLong(i)
        dot += xi * yi; nx += xi * xi; ny += yi * yi
        i += 1
      }
      dot.toDouble / math.sqrt(nx.toDouble * ny.toDouble)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (dot, nx, ny, n, i, xi, yi) = (ctx.freshName("dot"), ctx.freshName("nx"),
        ctx.freshName("ny"), ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("xi"), ctx.freshName("yi"))
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L, $nx = 0L, $ny = 0L;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $xi = $a.getLong($i);
         |    long $yi = $b.getLong($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  ${ev.value} = (double) $dot / java.lang.Math.sqrt((double) $nx * (double) $ny);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineFxExpr {
  /** Register `cosine_fx(array<bigint>, array<bigint>) -> double` in the
    * session's function registry (idempotent), making it available to both
    * the Column DSL (`call_function`) and SQL text.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_fx", exprs => CosineFxExpr(exprs(0), exprs(1)), "scala_udf")
}
