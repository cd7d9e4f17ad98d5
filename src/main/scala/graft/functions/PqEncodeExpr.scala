package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: product-quantization encode of one
  * embedding vector against a literal codebook — the full `m`-code array
  * in ONE fused loop.
  *
  * This is the same escalation [[CosineFxExpr]] documents: the HOF
  * formulation (`transform` over the literal codebook + `aggregate` over a
  * `zip_with` of squared diffs, then `array_position(array_min)`) is
  * CodegenFallback in Spark 4 — per-element lambda dispatch plus a
  * materialized k-element distance array per subspace per row, i.e.
  * m·k·sub interpreted closures per row on the dominant pass of
  * `writePqIndex`. Here the argmin runs as straight-line generated Java
  * over a referenced `double[]` codebook — no allocation besides the
  * output codes array, no virtual calls.
  *
  * Semantics match the HOF form bit-for-bit on full-length vectors
  * (asserted by the parity spec over the real corpus):
  *  - per-codeword distance is the SEQUENTIAL IEEE sum of squared diffs in
  *    index order (the `aggregate` fold order);
  *  - argmin is first-wins on ties (`array_position` returns the FIRST
  *    index equal to `array_min`; the `<` comparison below keeps the
  *    earliest minimum);
  *  - a NaN distance (NaN embedding element) sorts ABOVE every finite
  *    distance, as `array_min` orders it — the argmin guard explicitly
  *    escapes a NaN running-best so a finite later codeword still wins;
  *  - float inputs are widened element-wise (exact, float ⊂ double) the
  *    way `cast(array<float> as array<double>)` does.
  *
  * DELIBERATE divergence from the HOF form: a too-short (truncated) input
  * returns a whole-null code array here, where zip_with null-padding makes
  * the HOF form emit per-subspace null ELEMENTS. Whole-null is the safer
  * index behavior (a truncated vector has no meaningful code at all); the
  * parity spec pins the divergence explicitly.
  *
  * The codebook rides in the case class as a structurally-comparable
  * `IndexedSeq` (flattened [m][k][sub] row-major) so expression equality /
  * canonicalization stay value-based, and reaches generated code via
  * `ctx.addReferenceObj` — shipped once per task, NOT inlined into Java
  * source (16×16×4 doubles as source literals would bloat codegen).
  *
  * Returns null for a null or too-short input (a truncated vector has no
  * meaningful code; silently encoding a prefix would corrupt the index).
  */
case class PqEncodeExpr(child: Expression, flat: IndexedSeq[Double],
                        m: Int, k: Int, sub: Int)
    extends UnaryExpression {

  require(flat.length == m * k * sub,
    s"codebook length ${flat.length} != m*k*sub = ${m * k * sub}")

  // registry-reachable (register exposes this to SQL text) → enforce the
  // input type at analysis time, as CosineFxExpr does
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float> or array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private lazy val flatArr: Array[Double] = flat.toArray

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() < m * sub) null
    else {
      val cb = flatArr
      val codes = new Array[Int](m)
      var j = 0
      while (j < m) {
        var best = 0
        var bd = Double.NaN
        var c = 0
        while (c < k) {
          var d = 0.0
          var i = 0
          while (i < sub) {
            val xi = if (elemIsFloat) x.getFloat(j * sub + i).toDouble
                     else x.getDouble(j * sub + i)
            val diff = cb((j * k + c) * sub + i) - xi
            d += diff * diff
            i += 1
          }
          // NaN-safe argmin: a NaN distance (NaN embedding element) must
          // never lock out later finite codewords — `d < NaN` is false for
          // every d, so without the third clause best would stick at the
          // first codeword. HOF `array_min` orders NaN above every finite
          // double; this matches it.
          if (c == 0 || d < bd || (java.lang.Double.isNaN(bd) && !java.lang.Double.isNaN(d))) {
            bd = d; best = c
          }
          c += 1
        }
        codes(j) = best
        j += 1
      }
      new GenericArrayData(codes)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", flatArr, "double[]")
    val get = if (elemIsFloat) "(double) %s.getFloat(%s)" else "%s.getDouble(%s)"
    nullSafeCodeGen(ctx, ev, x => {
      val (codes, j, best, bd, c, d, i, xi, diff) = (ctx.freshName("codes"),
        ctx.freshName("j"), ctx.freshName("best"), ctx.freshName("bd"),
        ctx.freshName("c"), ctx.freshName("d"), ctx.freshName("i"),
        ctx.freshName("xi"), ctx.freshName("diff"))
      s"""
         |if ($x.numElements() < ${m * sub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    int $best = 0; double $bd = Double.NaN;
         |    for (int $c = 0; $c < $k; $c++) {
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $sub; $i++) {
         |        double $xi = ${get.format(x, s"$j * $sub + $i")};
         |        double $diff = $cb[($j * $k + $c) * $sub + $i] - $xi;
         |        $d += $diff * $diff;
         |      }
         |      if ($c == 0 || $d < $bd || (Double.isNaN($bd) && !Double.isNaN($d))) {
         |        $bd = $d; $best = $c;
         |      }
         |    }
         |    $codes[$j] = $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeExpr {
  /** Register `pq_encode(array<float|double>) -> array<int>` for THIS
    * codebook in the session registry (the codebook is driver-trained
    * state, not SQL-expressible — the closure carries it), and return the
    * codebook-unique registry name the caller should `call_function` with.
    *
    * Two names are registered: a content-hashed `pq_encode_<h>` — so two
    * threads building PQ queries for DIFFERENT corpora on one session can
    * interleave register→analyze without binding the wrong codebook — and
    * the plain `pq_encode` alias for SQL text, which keeps
    * last-registration-wins semantics (DataFrames are analyzed eagerly, so
    * a later registration never re-binds an already-built plan; the hashed
    * name removes the build-time window too).
    */
  def register(spark: SparkSession, codebooks: Array[Array[Array[Double]]]): String = {
    val m = codebooks.length
    val k = codebooks(0).length
    val sub = codebooks(0)(0).length
    val flat: IndexedSeq[Double] =
      codebooks.flatMap(_.flatMap(_.toIndexedSeq)).toIndexedSeq
    val builder = (exprs: Seq[Expression]) => PqEncodeExpr(exprs(0), flat, m, k, sub)
    // content hash of the flat codebook: stable within and across JVMs
    // (MurmurHash3 over the element sequence), so a re-fit of the SAME
    // codebook reuses its name
    val unique = f"pq_encode_${scala.util.hashing.MurmurHash3.orderedHash(flat) & 0x7fffffff}%08x"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      unique, builder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode", builder, "scala_udf")
    unique
  }
}
