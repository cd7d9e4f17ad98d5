package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[FuzzyJoin.tokenJaccardJoin]] must equal the brute-force all-pairs
  * jaccard at EVERY df split point — hotDf=MaxValue degenerates to the
  * pure cold count-join, hotDf=0 forces everything through the
  * prefix-filtered rescue, and mid values exercise the mixed path where
  * cold counts and hot-set intersections compose. Zero recall loss is
  * the claim; the fixture is built so qualifying pairs exist in each
  * regime (shared rare tokens, shared stop-tokens, and all-stop-token
  * records whose only evidence is hot).
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // token sets: records 1/3/5 on the left, 2/4/6/8 on the right.
  //  - (1,2): 5 shared of 5/5 → j = 5/5... sets equal → j=1.0
  //  - (3,4): 4 shared of 5/5 → j = 4/6 = 0.667 (fails 0.8, passes 0.6)
  //  - (5,6): all-stop-token twins (5 shared of 5/5) → hot-only at low hotDf
  //  - (5,8): disjoint-ish control
  private val stop = Seq("the", "of", "and", "to", "in")
  private val L: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("aardvark", "bramble", "cataract", "dulcimer", "ephemera"),
    3L -> Seq("farrago", "gossamer", "halcyon", "inkling", "juniper"),
    5L -> stop)
  private val R: Seq[(Long, Seq[String])] = Seq(
    2L -> Seq("aardvark", "bramble", "cataract", "dulcimer", "ephemera"),
    4L -> Seq("farrago", "gossamer", "halcyon", "inkling", "kelpie"),
    6L -> stop,
    8L -> Seq("farrago", "lambent", "mascaron", "nacreous", "obsidian"))

  private def brute(num: Long, den: Long): Set[(Long, Long, Long)] =
    (for {
      (lid, ls) <- L; (rid, rs) <- R
      i = (ls.toSet & rs.toSet).size.toLong
      if i * den >= num * (ls.size + rs.size - i)
    } yield (lid, rid, i)).toSet

  private def run(num: Long, den: Long, hotDf: Long): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val l = L.flatMap { case (id, ts) => ts.map(id -> _) }.toDF("id", "tok")
    val r = R.flatMap { case (id, ts) => ts.map(id -> _) }.toDF("id", "tok")
    FuzzyJoin.tokenJaccardJoin(l, r, num, den, hotDf)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
  }

  for (hotDf <- Seq(0L, 1L, 2L, Long.MaxValue); (num, den) <- Seq((4L, 5L), (3L, 5L)))
    test(s"parity vs brute force at hotDf=$hotDf t=$num/$den") {
      assert(run(num, den, hotDf) === brute(num, den))
    }

  test("stop-token twins are found even when every token is hot (rescue path)") {
    // at hotDf=0 the (5,6) pair has no cold evidence at all
    assert(run(4L, 5L, 0L).contains((5L, 6L, 5L)))
    assert(brute(4L, 5L).contains((5L, 6L, 5L)))
  }

  test("driver query matches its own oracle shape on sf0.001") {
    val out = FuzzyJoin.textFuzzyJoin(spark, "/root/testdata/sf0.001")
    assert(out.columns.toSeq ===
      Seq("l_id", "r_id", "shared", "nl", "nr", "jaccard"))
    // odd ids left, even ids right, by construction
    out.collect().foreach { row =>
      assert(row.getLong(0) % 2 === 1L)
      assert(row.getLong(1) % 2 === 0L)
    }
  }
}
