package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` over a BROADCAST-distributed Bloom filter.
  *
  * Spark's built-in `BloomFilterMightContain` requires the serialized
  * filter as a foldable CONSTANT, which embeds the whole byte array in the
  * expression tree — every task binary then carries the filter. Fine at
  * ~1 MB; wrong at the tens-of-MB filters a 100 TB decontamination run
  * wants (billions of benchmark shingles at a useful FPP). This expression
  * carries only the `Broadcast` HANDLE (bytes): the serialized filter
  * ships once per executor over the torrent broadcast path, and the
  * deserialized `BloomFilter` materializes lazily once per executor JVM
  * via the transient lazy val — task closures stay O(handle).
  *
  * Same semantic contract as the built-in (no false negatives, bounded
  * false positives), evaluated against the same `xxhash64` key space via
  * `mightContainLong`. Inside whole-stage codegen: `doGenCode` emits a
  * direct virtual call through a reference object, no boxing.
  */
case class BloomBcastExpr(bloom: Broadcast[Array[Byte]], child: Expression)
    extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloom.value))

  /** Accessor for generated code (codegen classes live outside this
    * package, so the lazy val itself cannot be referenced directly).
    */
  def deserializedFilter: BloomFilter = filter

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bloom_might_contain_bcast expects a BIGINT hash " +
        s"(xxhash64 the key first), got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_bcast"

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS expression (cheap: broadcast handle + child node),
    // never the deserialized filter — referencing the filter would
    // serialize it back into the codegen references and defeat the point
    val ref = ctx.addReferenceObj("bloomBcastExpr", this,
      classOf[BloomBcastExpr].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.deserializedFilter().mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomBcastExpr {

  /** Register a temp function bound to THIS broadcast filter; returns the
    * content-addressed unique name (same convention as
    * [[PqEncodeExpr.register]] — concurrent sessions with different
    * filters cannot race to the same binding).
    */
  def register(spark: SparkSession, bloom: Broadcast[Array[Byte]]): String = {
    val unique = f"bloom_might_contain_bcast_${bloom.id}%08x"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      unique, exprs => BloomBcastExpr(bloom, exprs(0)), "scala_udf")
    unique
  }
}
