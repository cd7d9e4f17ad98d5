package graft.cdc

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.TestSpark
import graft.streaming.CdcStream

/** Property tests for the apply-fold (SURVEY.md §5):
  *  - the declarative snapshot equals a sequential row-at-a-time
  *    interpretation of the changelog (the reference's semantics);
  *  - folding the changelog through `mergeBatch` under ANY batch split
  *    yields the same state as one-shot application (micro-batch boundary
  *    insensitivity — the exactly-once argument).
  */
object CdcPropertySpec extends Properties("CdcApply") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12).withMaxSize(40)

  private lazy val spark = TestSpark.spark

  // (key, invoice, kind) kind: 0 insert, 1 update, 2 delete, 3 truncate
  private val eventGen = for {
    kind <- Gen.frequency((5, 0), (3, 1), (2, 2), (1, 3))
    key <- Gen.choose(0, 7)
    inv <- Gen.choose(0, 99)
  } yield (kind, key, inv)

  private val logGen = Gen.listOf(eventGen).map(_.zipWithIndex)

  private def toDf(events: List[((Int, Int, Int), Int)]) = {
    import spark.implicits._
    val rows = events.map { case ((kind, key, inv), idx) =>
      val img = Some(CdcSchema.Invoice(key, inv))
      val (before, after) = kind match {
        case 0 => (None, img)
        case 1 => (Some(CdcSchema.Invoice(key, inv - 1)), img)
        case 2 => (img, None)
        case _ => (None, None)
      }
      CdcSchema.CdcEvent(idx.toLong, Some("cudt" (kind).toString), before, after, Some(idx.toLong))
    }
    spark.createDataset(rows).toDF()
  }

  /** Reference semantics: one event at a time, in pos order. */
  private def sequentialFold(events: List[((Int, Int, Int), Int)]): Map[Int, Int] = {
    var state = Map.empty[Int, Int]
    events.sortBy(_._2).foreach { case ((kind, key, inv), _) =>
      kind match {
        case 0 | 1 => state += (key -> inv)
        case 2 => state -= key
        case _ => state = Map.empty
      }
    }
    state
  }

  property("snapshot == sequential row-at-a-time interpretation") =
    forAll(logGen) { events =>
      val got = CdcApply.snapshot(toDf(events)).collect()
        .map(r => r.getLong(0).toInt -> r.getLong(1).toInt).toMap
      got == sequentialFold(events)
    }

  property("mergeBatch is insensitive to micro-batch boundaries") =
    forAll(logGen, Gen.choose(0, 100)) { (events, splitPct) =>
      val df = toDf(events)
      val splitAt = events.size * splitPct / 100
      val b1 = toDf(events.take(splitAt))
      val b2 = toDf(events.drop(splitAt))
      val incremental = CdcStream.snapshotOf(
        CdcStream.mergeBatch(CdcStream.mergeBatch(CdcStream.emptyState(spark), b1), b2))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val oneShot = CdcApply.snapshot(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      incremental == oneShot
    }
}
