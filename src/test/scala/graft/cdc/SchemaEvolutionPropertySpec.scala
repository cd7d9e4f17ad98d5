package graft.cdc

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-level guarantees for the DDL-history fold
  * ([[SchemaEvolution.evolve]]) — pure driver-side logic, no Spark jobs:
  *
  *  - replaying any prefix of an already-applied history is a no-op
  *    (at-least-once delivery / checkpoint-recovery re-derivation);
  *  - folding a history in one call equals folding it in arbitrary
  *    chunks (micro-batch boundaries cannot change the evolved spec);
  *  - the base columns survive every history, in order, and every added
  *    column appears exactly once.
  */
object SchemaEvolutionPropertySpec extends Properties("SchemaEvolution") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val colName = Gen.oneOf("c_a", "c_b", "c_c", "c_d", "c_e")
  private val colType = Gen.oneOf("INT", "BIGINT", "VARCHAR(16)", "TEXT")

  // ADD COLUMN statements (possibly duplicated names — idempotence), plus
  // inert DDL noise the captured history also carries
  private val ddlGen: Gen[String] = Gen.frequency(
    4 -> Gen.zip(colName, colType).map { case (c, t) =>
      s"ALTER TABLE invoice ADD COLUMN $c $t" },
    1 -> Gen.const("CREATE TABLE other (id INT)"),
    1 -> Gen.const("DROP INDEX idx ON invoice"),
    // widening an always-present base column stays legal at any point
    1 -> Gen.const("ALTER TABLE invoice MODIFY COLUMN invoice_number BIGINT"))

  private val historyGen: Gen[List[String]] = Gen.listOfN(8, ddlGen)

  private def fold(ddls: Seq[String]) =
    SchemaEvolution.evolve(CdcSchema.invoiceSpec, CdcSchema.invoiceType, ddls)

  property("replaying an applied prefix is a no-op") =
    forAll(historyGen, Gen.chooseNum(0, 8)) { (h, n) =>
      val once = fold(h)
      val replayed = SchemaEvolution.evolve(once._1, once._2, h.take(n))
      replayed == once
    }

  property("one fold == chunked folds at any micro-batch boundaries") =
    forAll(historyGen, Gen.chooseNum(1, 7)) { (h, cut) =>
      val whole = fold(h)
      val (a, b) = h.splitAt(cut)
      val first = fold(a)
      val chunked = SchemaEvolution.evolve(first._1, first._2, b)
      chunked == whole
    }

  property("base columns survive in order; added columns unique") =
    forAll(historyGen) { h =>
      val (spec, ty) = fold(h)
      val names = ty.fieldNames.toSeq
      names.take(2) == Seq("order_id", "invoice_number") &&
        names.distinct == names &&
        spec.valueCols.startsWith(Seq("invoice_number")) &&
        spec.valueCols.toSet.subsetOf(names.toSet - "order_id")
    }
}
