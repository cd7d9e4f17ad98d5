package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native codegen cosine must equal the HOF formulation bit-for-bit,
  * and must actually run inside whole-stage codegen.
  */
class CosineExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def pairs = {
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorFns.fixedPoint(col("embedding")).as("v"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id") && col("b.vec_id") <= 50)
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        col("a.v").as("va"), col("b.v").as("vb"))
  }

  test("native expression == HOF cosine, bit for bit, on all test pairs") {
    CosineFxExpr.register(spark)
    val diff = pairs
      .withColumn("hof", VectorFns.cosineFx(col("va"), col("vb")))
      .withColumn("native", call_function("cosine_fx", col("va"), col("vb")))
      .filter(col("hof") =!= col("native")) // exact double inequality
      .count()
    assert(diff === 0)
  }

  test("expression is codegen-capable (no CodegenFallback in its plan)") {
    CosineFxExpr.register(spark)
    // Materialize the fixed-point arrays first: the HOF lift (transform) is
    // CodegenFallback and would break the stage, masking what we're testing
    // — that cosine_fx itself stays inside WholeStageCodegen.
    val tmp = java.nio.file.Files.createTempDirectory("cosfx").toString
    graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorFns.fixedPoint(col("embedding")).as("v"))
      .write.mode("overwrite").parquet(tmp)
    val e = spark.read.parquet(tmp)
    val df = e.select(call_function("cosine_fx", col("v"), col("v")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(N)` prefix marks operators inside a WholeStageCodegen span
    assert(plan.linesIterator.exists(l => l.contains("cosine_fx") && l.trim.startsWith("*(")),
      s"cosine_fx not inside a codegen span:\n$plan")
    // smoke the generated code path end to end
    assert(math.abs(df.agg(min("c")).head().getDouble(0) - 1.0) < 1e-9)
  }

  test("usable from SQL text after registration") {
    CosineFxExpr.register(spark)
    graft.Tables.embeddings(spark, sf).createOrReplaceTempView("emb")
    val r = spark.sql(
      """SELECT cosine_fx(
        |  transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)),
        |  transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT))) AS c
        |FROM emb LIMIT 5""".stripMargin).collect()
    assert(r.forall(row => math.abs(row.getDouble(0) - 1.0) < 1e-9))
  }

  test("misuse on non-fixed-point arrays fails at analysis, not silently") {
    CosineFxExpr.register(spark)
    graft.Tables.embeddings(spark, sf).createOrReplaceTempView("emb_raw")
    // the natural float column: must be an analysis error, not wrong numbers
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_fx(embedding, embedding) FROM emb_raw").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_fx"))
  }

  test("microbench: native at least as fast as HOF (informational)") {
    CosineFxExpr.register(spark)
    val p = pairs.cache(); p.count()
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val hof = time(p.select(sum(VectorFns.cosineFx(col("va"), col("vb")))).collect())
    val native = time(p.select(sum(call_function("cosine_fx", col("va"), col("vb")))).collect())
    info(f"HOF $hof%.3fs vs native $native%.3fs over ${p.count()} pairs")
    p.unpersist()
    // no hard assert — timing noise; the parity tests above carry correctness
  }
}
