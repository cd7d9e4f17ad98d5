package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.TestSpark

/** Property-level equivalence for the two custom join operators: on
  * arbitrary inputs, the scalable formulation must equal the naive
  * (obviously-correct) one — bin join ≡ BETWEEN nested loop, as-of join ≡
  * per-row argmax of earlier right rows. Inputs include negatives and
  * empty/inverted intervals, so truncating-div monotonicity around zero
  * is covered too.
  */
object JoinPropertySpec extends Properties("CustomJoins") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val smallLong = Gen.chooseNum(-50L, 50L)

  property("binJoin == naive range join") =
    forAll(Gen.listOfN(12, smallLong),
      Gen.listOfN(6, Gen.zip(smallLong, smallLong)),
      Gen.oneOf(1L, 3L, 10L)) {
      (ps: List[Long], ivs: List[(Long, Long)], w: Long) =>
        import spark.implicits._
        val points = ps.zipWithIndex.toDF("ms", "pid")
        val intervals = ivs.zipWithIndex.map { case ((a, b), i) => (a, b, i) }
          .toDF("lo", "hi", "iid")
        val got = RangeJoin.binJoin(points, intervals, "ms", "lo", "hi", w)
          .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
        val want = points.join(intervals,
            col("ms") >= col("lo") && col("ms") < col("hi"))
          .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
        got == want
    }

  property("asofJoin == per-row latest-at-or-before reference") =
    forAll(Gen.listOfN(10, Gen.zip(Gen.chooseNum(1L, 4L), smallLong)),
      Gen.listOfN(10, Gen.zip(Gen.chooseNum(1L, 4L), smallLong))) {
      (ls: List[(Long, Long)], rs: List[(Long, Long)]) =>
        import spark.implicits._
        // unique (key, ts) on the right — the operator's documented contract
        val rUnique = rs.distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i * 100L) }
        val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i) }
          .toDF("k", "ms", "lid")
        val right = rUnique.toDF("k", "ms", "price")
        val rows = AsofJoin.asofJoin(left, right, "k", "ms", Seq("price"))
          .select(col("lid"), col("asof.price"))
          .collect()
          .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        // cardinality first: toMap alone would mask duplicate emissions
        val got = rows.toMap
        val cardinalityOk = rows.length == ls.size
        // reference: for each left row, the right row of the same key with
        // the greatest ms <= left.ms
        val want = ls.zipWithIndex.map { case ((k, t), i) =>
          i -> rUnique.filter(r => r._1 == k && r._2 <= t)
            .sortBy(_._2).lastOption.map(_._3)
        }.toMap
        cardinalityOk && got == want
    }
}
