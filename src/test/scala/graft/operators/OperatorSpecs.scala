package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Structural/recall assertions for the operator packs on sf0.001. The
  * value-level correctness gate is the driver's DuckDB compare (and
  * tools/verify_local.sh locally); these specs pin properties the oracle
  * cannot see — sketch recall, determinism, plan-independent invariants.
  */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("q1 groups the 6 (returnflag, linestatus) combinations") {
    assert(Relational.q1PricingSummary(spark, sf).count() === 6)
  }

  test("top-k is deterministically ordered and bounded") {
    val rows = Relational.qTopkOrders(spark, sf).collect()
    assert(rows.length === 20)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("semi + anti join partition the customer table") {
    val semi = Relational.qJoinSemi(spark, sf).collect()
      .map(_.getAs[Long]("n_customers")).sum
    val anti = Relational.qJoinAnti(spark, sf).count()
    val total = graft.Tables.customer(spark, sf).count()
    assert(semi + anti === total)
  }

  test("retention: offset-0 row holds the full cohort and bounds every later day") {
    val rows = Relational.qEventsRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_day"))
    byCohort.foreach { case (c, rs) =>
      val at0 = rs.filter(_.getAs[Int]("day_offset") == 0)
      assert(at0.length === 1, s"cohort $c missing its day-0 row")
      // every cohort member is active on its first day, so day 0 is max
      assert(rs.forall(_.getAs[Long]("n_active") <= at0.head.getAs[Long]("n_active")))
      assert(rs.forall(_.getAs[Int]("day_offset") >= 0))
    }
  }

  test("length histogram: power-of-two buckets partition the corpus") {
    val rows = TextAnalysis.corpusLengthHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === graft.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(java.lang.Long.bitCount(b) === 1, s"bucket $b not a power of two")
      val (n, t) = (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"))
      // every doc in the bucket has bucket <= tokens < 2*bucket
      assert(t >= b * n && t < 2 * b * n)
    }
  }

  test("sessionize: n_sessions never exceeds n_events and both positive") {
    val rows = Relational.qEventsSessionize(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Long]("n_sessions") >= 1 &&
        r.getAs[Long]("n_sessions") <= r.getAs[Long]("n_events")))
  }
}

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private lazy val exactPairs = Dedup.dedupNgramJaccard(spark, sf).collect()
    .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

  test("exact jaccard finds the injected near-dup pairs") {
    assert(exactPairs.size >= 20)
  }

  test("minhash LSH recalls >= 90% of exact near-dup pairs") {
    val got = Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val recall = (exactPairs & got).size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"minhash recall $recall")
  }

  test("simhash banding recalls >= 85% of exact near-dup pairs") {
    // Whether a jaccard-0.8 pair lands within hamming <= 7 of a 128-bit
    // simhash is probabilistic IN THE HASH (measured on this corpus:
    // 0.857 with the md5-derived oracle-exact bits; hamming <= 7 of 128
    // is a relatively tighter radius than the old 64-bit scheme's, the
    // price of the 16-bit bands that keep candidate volume linear at
    // scale). The deterministic contract is the pigeonhole guarantee,
    // pinned below.
    val got = Dedup.dedupSimhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val recall = (exactPairs & got).size.toDouble / exactPairs.size
    assert(recall >= 0.85, s"simhash recall $recall")
  }

  test("simhash banding emits EXACTLY the hamming <= 7 pairs (pigeonhole)") {
    import org.apache.spark.sql.functions._
    // brute-force all-pairs hamming over the signatures = ground truth;
    // 8x16-bit bands guarantee any pair within hamming <= 7 shares a band
    val sigs = Dedup.simhashSignatures(spark, sf)
    val brute = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (bit_count(col("a.sim_hi").bitwiseXOR(col("b.sim_hi"))) +
          bit_count(col("a.sim_lo").bitwiseXOR(col("b.sim_lo")))).as("h"))
      .filter(col("h") <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.dedupSimhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(got === brute)
  }

  test("simhash hot-bucket rescue is exact: cap=0 (pure rescue) == uncapped") {
    // cap=0 routes EVERY bucket through the 14-bit sub-band rescue;
    // pigeonhole (<= 7 flips in the 112 non-band bits over 8 sub-bands)
    // says the recovered pair set is identical to the uncapped join's.
    // A mid cap exercises both paths side by side.
    def pairs(cap: Long) =
      Dedup.dedupSimhashCapped(spark, sf, cap).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Number]("hamming").longValue())).toSet
    val uncapped = pairs(Long.MaxValue)
    assert(uncapped.nonEmpty)
    assert(pairs(0L) === uncapped)
    assert(pairs(3L) === uncapped)
  }

  test("containment: directional, in [0.9,1], and covers full-dup pairs both ways") {
    val rows = Dedup.dedupContainment(spark, sf).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("containment"))).toMap
    assert(rows.nonEmpty)
    assert(rows.values.forall(c => c >= 0.9 && c <= 1.0))
    // i <= min(na,nb) gives C(a->b) >= J and C(b->a) >= J, so every
    // jaccard >= 0.9 pair must appear in BOTH directions
    val hiJaccard = Dedup.dedupNgramJaccard(spark, sf).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.9)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(hiJaccard.nonEmpty)
    hiJaccard.foreach { case (a, b) =>
      assert(rows.contains((a, b)) && rows.contains((b, a)),
        s"jaccard>=0.9 pair ($a,$b) missing a containment direction")
    }
  }

  test("overlap build refuses past the candidate budget with a minhash pointer; " +
      "unchanged below it") {
    // force the predictor over budget: the sf0.001 corpus has a tiny but
    // non-zero Σ df², so a budget of 1 trips the guard deterministically
    spark.conf.set("spark.graft.overlap.candidateBudget", "1")
    try {
      val e = intercept[IllegalStateException](
        Dedup.overlapPairsPlan(spark, sf).count())
      assert(e.getMessage.contains("dedup_keep_best_minhash"))
      assert(e.getMessage.contains("candidateBudget"))
    } finally spark.conf.unset("spark.graft.overlap.candidateBudget")
    // and with the default budget the build is untouched (non-empty at
    // this sf; full value parity is the brute-join spec below)
    assert(Dedup.overlapPairsPlan(spark, sf).count() > 0)
  }

  test("prefix-filtered overlap == brute count join (zero recall loss, exact i)") {
    // overlapPairsBrute is the plain Σ df² co-occurrence count join —
    // ground truth by construction. Equality of the full measure rows
    // (not just pair keys) pins zero recall loss from the prefix +
    // positional + length filters AND exact i from the array-intersect
    // verification.
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"), r.getAs[Long]("i"),
        r.getAs[Long]("nlo"), r.getAs[Long]("nhi"),
        r.getAs[Double]("jaccard"))).sortBy(t => (t._1, t._2)).toSeq
    val truth = rows(Dedup.overlapPairsBrute(spark, sf))
    assert(truth.nonEmpty)
    assert(rows(Dedup.overlapPairsPlan(spark, sf)) === truth,
      "prefix-filtered build diverges from the brute count join")
  }

  test("minhash bucket cap + identical-signature rescue semantics") {
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val uncappedRows = Dedup.dedupMinhashLshCapped(spark, sf, Long.MaxValue).collect()
    val uncapped = uncappedRows
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // fixture buckets are far under the production cap: output identical
    assert(pairSet(Dedup.dedupMinhashLsh(spark, sf)) === uncapped)
    // cap = 0 forces every bucket over cap: eligible side empty, output
    // is the pure identical-signature rescue — exactly the est = 1.0
    // subset of the uncapped pairs (est 1.0 ⟺ all 32 slots equal ⟺ same
    // full signature), each emitted at est 1.0
    val rescueRows = Dedup.dedupMinhashLshCapped(spark, sf, 0L).collect()
    assert(rescueRows.forall(_.getAs[Double]("est_jaccard") == 1.0))
    val expectedRescue = uncappedRows
      .filter(_.getAs[Double]("est_jaccard") == 1.0)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(rescueRows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet === expectedRescue)
    assert(expectedRescue.nonEmpty,
      "fixture has no identical-signature pair — rescue test is vacuous")
  }

  test("repeated spans match a brute-force reimplementation") {
    // independent Scala reimplementation on the collected fixture: exact
    // string 3-grams (no hashing), cross-doc presence count, interval
    // merge — pins the whole operator, not just its SQL mirror
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.split("\\s+").toSeq)
      .toMap
    val grams = docs.map { case (id, ts) =>
      id -> ts.sliding(3).zipWithIndex
        .collect { case (g, p) if g.length == 3 => (p, g) }.toSeq
    }
    val docsWith = grams.toSeq
      .flatMap { case (id, gs) => gs.map { case (_, g) => (g, id) } }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val expected = docs.map { case (id, ts) =>
      val dupPos = grams(id).collect { case (p, g) if docsWith(g) >= 2 => p }.sorted
      var spans = List.empty[(Int, Int)]
      for (p <- dupPos) spans match {
        case (s, e) :: rest if p <= e + 1 => spans = (s, math.max(e, p + 2)) :: rest
        case _ => spans = (p, p + 2) :: spans
      }
      val lens = spans.map { case (s, e) => e - s + 1 }
      (id, ts.length.toLong, spans.length.toLong, lens.sum.toLong,
        if (lens.isEmpty) 0L else lens.max.toLong)
    }.toSet
    val got = Dedup.dedupRepeatedSpans(spark, sf).collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens"),
        r.getAs[Long]("max_span"))).toSet
    assert(got === expected)
    assert(got.exists(_._4 > 0), "fixture has no repeated span — test is vacuous")
  }

  test("decontamination spans match a brute-force reimplementation") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.split("\\s+").toSeq)
      .toMap
    def grams8(ts: Seq[String]) = ts.sliding(8).zipWithIndex
      .collect { case (g, p) if g.length == 8 => (p, g.mkString(" ")) }.toSeq
    val evalSet = docs.collect { case (id, ts) if id % 7 == 0 => grams8(ts) }
      .flatten.map(_._2).toSet
    val expected = docs.collect { case (id, ts) if id % 7 != 0 =>
      val hitPos = grams8(ts).collect { case (p, g) if evalSet(g) => p }.sorted
      var spans = List.empty[(Int, Int)]
      for (p <- hitPos) spans match {
        case (s, e) :: rest if p <= e + 1 => spans = (s, math.max(e, p + 7)) :: rest
        case _ => spans = (p, p + 7) :: spans
      }
      val lens = spans.map { case (s, e) => e - s + 1 }
      (id, ts.length.toLong, spans.length.toLong, lens.sum.toLong,
        if (lens.isEmpty) 0L else lens.max.toLong)
    }.filter(_._3 > 0).toSet
    val got = Dedup.textDecontaminateSpans(spark, sf).collect().map(r =>
      (r.getAs[Long]("train_doc"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_spans"), r.getAs[Long]("contaminated_tokens"),
        r.getAs[Long]("max_span"))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "fixture has no contaminated span — test is vacuous")
  }

  test("self-dedup clip matches a brute-force reimplementation (first-wins canonical)") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.split("\\s+").toSeq)
      .toMap
    val grams = docs.map { case (id, ts) =>
      id -> ts.sliding(3).zipWithIndex
        .collect { case (g, p) if g.length == 3 => (p, g) }.toSeq
    }
    val byGram = grams.toSeq
      .flatMap { case (id, gs) => gs.map { case (_, g) => (g, id) } }
      .groupBy(_._1).map { case (g, xs) =>
        val ids = xs.map(_._2).distinct
        g -> (ids.size, ids.min)
      }
    val expected = docs.flatMap { case (id, ts) =>
      val clipPos = grams(id).collect {
        case (p, g) if byGram(g)._1 >= 2 && byGram(g)._2 != id => p
      }.sorted
      if (clipPos.isEmpty) None
      else {
        val covered = clipPos.flatMap(p => p to p + 2).toSet
        val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
        Some((id, ts.length.toLong, kept.length.toLong, kept.mkString(" ")))
      }
    }.toSet
    val got = Dedup.dedupClipRepeated(spark, sf).collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("kept_tokens"), r.getAs[String]("clean_text"))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "fixture has no clipped doc — test is vacuous")
    // the globally smallest doc_id is canonical for every gram it holds:
    // first-wins means it is never clipped
    assert(!got.exists(_._1 == docs.keySet.min))
  }

  test("clip is consistent with the span plan it executes") {
    val spans = Dedup.textDecontaminateSpans(spark, sf).collect()
      .map(r => r.getAs[Long]("train_doc") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("contaminated_tokens"))).toMap
    val clipped = Dedup.textClipContaminated(spark, sf).collect()
    assert(clipped.map(_.getAs[Long]("train_doc")).toSet === spans.keySet,
      "clip and span plans disagree on which docs are contaminated")
    clipped.foreach { r =>
      val (id, n, kept, text) = (r.getAs[Long]("train_doc"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("kept_tokens"),
        r.getAs[String]("clean_text"))
      val (sn, sc) = spans(id)
      assert(n === sn)
      assert(kept === n - sc, s"doc $id: kept $kept != $n - $sc")
      val emitted = if (text.isEmpty) 0L else text.split(" ").length.toLong
      assert(emitted === kept, s"doc $id: clean_text has $emitted tokens, expected $kept")
    }
  }

  test("exact dedup keeps one representative per fingerprint") {
    val df = Dedup.dedupExact(spark, sf)
    val total = graft.Tables.documents(spark, sf).count()
    val kept = df.count()
    val dups = df.agg(org.apache.spark.sql.functions.sum("n_dups")).head.getLong(0)
    assert(kept + dups === total)
  }

  test("keep-best retains the max-quality member of every cluster") {
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster"))
    val kept = Dedup.dedupKeepBest(spark, sf).collect()
    assert(kept.map(_.getAs[Long]("cluster")).toSet ===
      clusters.map(_._2).toSet)
    assert(kept.length === clusters.map(_._2).distinct.length)
    val score = TextAnalysis.textQuality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val byCluster = clusters.groupBy(_._2)
    kept.foreach { r =>
      val members = byCluster(r.getAs[Long]("cluster")).map(_._1)
      assert(r.getAs[Long]("n_members") === members.length.toLong)
      val (bestScore, negId) = members.map(d => (score(d), -d)).max
      assert(r.getAs[Long]("doc_id") === -negId)
      assert(r.getAs[Double]("score") === bestScore)
    }
    // the fixture's injected near-dups guarantee a non-trivial cluster,
    // so the retention choice is actually exercised
    assert(kept.exists(_.getAs[Long]("n_members") > 1))
  }

  test("keep-best over the minhash graph: brute CC + retention parity") {
    // Independent reimplementation: union-find over the minhash pair
    // list, then per-component (max score, min doc_id) — the operator's
    // generalized clustersOf/keepBestOf must match exactly.
    val pairs = Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_a") -> r.getAs[Long]("doc_b"))
    val docs = graft.Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getAs[Long]("doc_id"))
    val parent = scala.collection.mutable.Map(docs.map(d => d -> d): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val score = TextAnalysis.textQuality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val expected = docs.groupBy(find).map { case (root, members) =>
      val (bestScore, negId) = members.map(d => (score(d), -d)).max
      root -> ((-negId, bestScore, members.length.toLong))
    }
    val kept = Dedup.dedupKeepBestMinhash(spark, sf).collect()
    assert(kept.length === expected.size)
    kept.foreach { r =>
      val (doc, sc, n) = expected(r.getAs[Long]("cluster"))
      assert(r.getAs[Long]("doc_id") === doc)
      assert(r.getAs[Double]("score") === sc)
      assert(r.getAs[Long]("n_members") === n)
    }
    // the minhash graph on this fixture must produce at least one real
    // near-dup cluster, or the variant proves nothing beyond singletons
    assert(kept.exists(_.getAs[Long]("n_members") > 1))

    // the cluster-size histogram is the same graph viewed as a report:
    // its (size -> count) must equal the keep-best rows' n_members
    // distribution, and its mass must cover the whole corpus
    val hist = Dedup.dedupClusterHistogram(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster_size") -> r.getAs[Long]("n_clusters"))
      .toMap
    val fromKept = kept.groupBy(_.getAs[Long]("n_members"))
      .view.mapValues(_.length.toLong).toMap
    assert(hist === fromKept)
    assert(hist.map { case (sz, n) => sz * n }.sum === docs.length.toLong)
  }

}

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("min-max scale: [0,1] bounds, extremes hit per dimension, round-trip exact") {
    import org.apache.spark.sql.functions.col
    val scaled = Similarity.embeddingMinmaxScale(spark, sf).collect()
    val raw = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1)).toMap
    val dim = raw.values.head.length
    assert(scaled.length === raw.size * dim)
    val byDim = scaled.groupBy(_.getAs[Int]("i"))
    assert(byDim.keySet === (0 until dim).toSet)
    byDim.foreach { case (_, rows) =>
      val xs = rows.map(_.getAs[Double]("xs"))
      assert(xs.forall(v => v >= 0.0 && v <= 1.0))
      // a non-degenerate dimension must hit both extremes exactly
      assert(xs.min === 0.0 && xs.max === 1.0)
    }
    // round-trip: xs * (mx - mn) + mn recovers the input within one ulp
    val mins = (0 until dim).map(i => raw.values.map(_(i)).min.toDouble)
    val maxs = (0 until dim).map(i => raw.values.map(_(i)).max.toDouble)
    scaled.foreach { r =>
      val (v, i) = (r.getAs[Long]("vec_id"), r.getAs[Int]("i"))
      val back = r.getAs[Double]("xs") * (maxs(i) - mins(i)) + mins(i)
      assert(math.abs(back - raw(v)(i).toDouble) < 1e-9)
    }
  }

  test("brute-force top-k: 10 rows, strictly ordered, cosine in [-1,1]") {
    val rows = Similarity.annCosineTopk(spark, sf).collect()
    assert(rows.length === 10)
    val cos = rows.map(_.getAs[Double]("cosine"))
    assert(cos.sameElements(cos.sortBy(-_)))
    assert(cos.forall(c => c >= -1.0 && c <= 1.0))
  }

  test("LSH-probed top-k recalls a usable fraction of brute force") {
    // Uniform random embeddings are LSH's worst case (no clusters); the
    // hamming<=2 ring's ceiling on this corpus is ~3/10 — pin that floor
    // so a banding regression (recall 0) is caught.
    val brute = Similarity.annCosineTopk(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val lsh = Similarity.annLshTopk(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert((brute & lsh).size >= 2, s"lsh overlap ${(brute & lsh).size}")
  }

  test("fixed-point cosine of a vector with itself is 1 within 1 ulp-ish") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFns
    val self = graft.Tables.embeddings(spark, sf)
      .select(VectorFns.fixedPoint(col("embedding")).as("v"))
      .select(VectorFns.cosineFx(col("v"), col("v")).as("c"))
      .agg(min("c"), max("c")).head()
    assert(self.getDouble(0) >= 0.9999999 && self.getDouble(1) <= 1.0000001)
  }

  test("range search: sorted desc, all >= tau, consistent with brute top-k") {
    val rows = Similarity.annRangeSearch(spark, sf).collect()
    assert(rows.nonEmpty)
    val cos = rows.map(_.getAs[Double]("cosine"))
    assert(cos.sameElements(cos.sortBy(-_)))
    assert(cos.forall(_ >= 0.15))
    // every top-10 hit above tau must appear in the radius result
    val ids = rows.map(_.getAs[Long]("vec_id")).toSet
    Similarity.annCosineTopk(spark, sf).collect()
      .filter(_.getAs[Double]("cosine") >= 0.15)
      .foreach(r => assert(ids.contains(r.getAs[Long]("vec_id"))))
  }

  test("per-label top-k emits exactly 3 per label") {
    val rows = Similarity.annTopkByLabel(spark, sf).collect()
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    assert(byLabel.values.forall(_.length === 3))
  }
}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("batched decode emits one feature row per blob, deterministically") {
    val a = graft.multimodal.Multimodal.decodeFeatures(spark, sf).collect()
      .sortBy(_.doc_id)
    val b = graft.multimodal.Multimodal.decodeFeatures(spark, sf).collect()
      .sortBy(_.doc_id)
    assert(a.length === graft.Tables.documents(spark, sf).count())
    assert(a.toSeq === b.toSeq) // pure function of bytes — repeatable
    assert(a.forall(f => f.width >= 64 && f.height >= 64 && f.channels === 3))
  }

  test("blob byte length equals source text length (ascii corpus)") {
    val mismatches = graft.multimodal.Multimodal.multimodalBlobStats(spark, sf)
      .join(graft.Tables.documents(spark, sf), "doc_id")
      .filter(org.apache.spark.sql.functions.col("n_bytes") =!=
        org.apache.spark.sql.functions.length(org.apache.spark.sql.functions.col("text")))
      .count()
    assert(mismatches === 0)
  }
}

/** Parity: the compact HOF formulations and the codegen'd relational
  * formulations used on hot paths must agree exactly.
  */
class FormulationParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("keyed consistency diff == exceptAll diff on key-unique inputs") {
    import spark.implicits._
    // keys only-in-a, only-in-b, disagreeing, agreeing — all four shapes
    val a = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("order_id", "invoice_number")
    val b = Seq((2L, 20L), (3L, 31L), (4L, 40L)).toDF("order_id", "invoice_number")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val generic = rows(graft.cdc.CdcApply.consistencyDiff(a, b))
    val keyed = rows(graft.cdc.CdcApply.consistencyDiffByKey(a, b, "order_id"))
    assert(keyed === generic)
    assert(keyed === Seq((1L, 10L, "a"), (3L, 30L, "a"), (3L, 31L, "b"), (4L, 40L, "b")))
    // and on the real dual-formulation snapshots (expected empty)
    val log = graft.cdc.Changelog.synthetic(spark, sf)
    val ga = graft.cdc.CdcApply.snapshot(log).cache()
    val gb = graft.cdc.CdcApply.snapshotViaWindow(log).cache()
    assert(graft.cdc.CdcApply.consistencyDiffByKey(ga, gb, "order_id").count() ===
      graft.cdc.CdcApply.consistencyDiff(ga, gb).count())
  }

  test("keyed consistency diff surfaces an unmatched ALL-NULL row") {
    import spark.implicits._
    // an all-null row present only in `a`: the null-extended outer-join
    // side makes the row structs null-safe-EQUAL, so only the presence
    // markers can reveal it — regression for the ADVICE r5 finding
    val a = Seq[(Option[Long], Option[Long])]((Some(1L), Some(10L)), (None, None))
      .toDF("order_id", "invoice_number")
    val b = Seq[(Option[Long], Option[Long])]((Some(1L), Some(10L)))
      .toDF("order_id", "invoice_number")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).sorted.toSeq
    val generic = rows(graft.cdc.CdcApply.consistencyDiff(a, b))
    val keyed = rows(graft.cdc.CdcApply.consistencyDiffByKey(a, b, "order_id"))
    assert(keyed === generic)
    assert(keyed === Seq((-1L, -1L, "a")))
  }

  test("relational shingles == HOF shingles (same (doc_id, shingle) set)") {
    import org.apache.spark.sql.functions._
    val hof = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(graft.functions.TextFns.shingles(
          graft.functions.TextFns.tokens(col("text")), 3)).as("sh"))
      .distinct()
    val relational = Dedup.dedupNgramJaccard(spark, sf) // forces docShingles
    // compare via the public surface: identical jaccard pair sets
    val viaHof = {
      val sizes = hof.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = hof.as("x").join(hof.as("y"),
          col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("i"))
      inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jaccard", col("i").cast("double") / (col("na") + col("nb") - col("i")))
        .filter(col("jaccard") >= 0.8)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
    }
    val a = relational.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = viaHof.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a === b)
  }

  test("explode-agg simhash == HOF simhash, bit for bit") {
    import org.apache.spark.sql.functions._
    val hof = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.TextFns.simhash128(
        graft.functions.TextFns.tokens(col("text"))).as("sim"))
      .select(col("doc_id"),
        element_at(col("sim"), 1).as("hi"), element_at(col("sim"), 2).as("lo"))
    val rel = Dedup.simhashSignatures(spark, sf)
    val diff = hof.as("a").join(rel.as("b"), "doc_id")
      .filter(col("a.hi") =!= col("b.sim_hi") || col("a.lo") =!= col("b.sim_lo"))
      .count()
    assert(diff === 0)
  }
}

/** Sketch accuracy: the HLL++ estimate must track the exact cardinality. */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct within 5% of exact") {
    val rows = Relational.qApproxDistinct(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}

/** IVF ANN: determinism and recall vs brute force. */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("IVF top-k is deterministic with usable recall (vs brute force)") {
    val brute = Similarity.annCosineTopk(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val ivf1 = Similarity.annIvfTopk(spark, sf).collect().map(_.getAs[Long]("vec_id"))
    val ivf2 = Similarity.annIvfTopk(spark, sf).collect().map(_.getAs[Long]("vec_id"))
    assert(ivf1.toSeq === ivf2.toSeq) // fixed-seed k-means => repeatable
    val lsh = Similarity.annLshTopk(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val ivfRecall = (brute & ivf1.toSet).size
    val lshRecall = (brute & lsh).size
    info(s"recall@10: ivf=$ivfRecall lsh=$lshRecall")
    assert(ivfRecall >= 2)
  }

  test("IVF index at rest: probing cells is partition-pruned I/O") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("ivf").toString + "/index"
    Similarity.writeIvfIndex(spark, sf, out)
    // hive-style cell dirs on disk
    val dirs = new java.io.File(s"$out/cells").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("cell=")) >= 2, dirs.mkString(","))
    val probed = Similarity.readIvfCells(spark, out, Seq(0, 1))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), s"no partition pruning:\n$plan")
    // pruned read returns exactly the probed cells' rows, nothing else
    val full = spark.read.parquet(s"$out/cells")
    val expected = full.filter(col("cell").isin(0, 1)).count()
    assert(probed.count() === expected && expected > 0)
    assert(probed.select("cell").distinct().collect().map(_.getInt(0)).toSet === Set(0, 1))
  }

  test("IVF serving path: external vector answered from the index alone") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("ivfv").toString + "/index"
    Similarity.writeIvfIndex(spark, sf, out)
    val qvec = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).collect()(0)
      .getSeq[Double](0).toArray
    val forVec = Similarity.annIvfTopkFromIndexForVec(spark, out, qvec)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // the stored row itself lives in a probed cell: exact self-match first
    assert(forVec.head === ((0L, 1.0)))
    // and the rest agrees with the in-memory formulation's candidates
    val inMem = Similarity.annIvfTopk(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val overlap = (forVec.map(_._1).toSet - 0L) & inMem
    info(s"overlap with in-memory IVF: ${overlap.size}")
    assert(overlap.size >= 7)
  }
}

class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("PQ-ADC top-k is deterministic with usable recall (vs brute force)") {
    val brute = Similarity.annCosineTopk(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val pq1 = Similarity.annPqTopk(spark, sf).collect().map(_.getAs[Long]("vec_id"))
    val pq2 = Similarity.annPqTopk(spark, sf).collect().map(_.getAs[Long]("vec_id"))
    assert(pq1.toSeq === pq2.toSeq) // fixed-seed codebooks => repeatable
    val recall = (brute & pq1.toSet).size
    info(s"recall@10: pq=$recall")
    // ADC candidates + exact re-rank: expect most of the true top-10
    assert(recall >= 8)
  }

  test("native pq_encode bit-matches the interpreted HOF reference") {
    import org.apache.spark.sql.functions.{array, col}
    val cbs = Similarity.pqCodebooks(spark, sf)
    val emb = graft.Tables.embeddings(spark, sf)
    val hof = emb.select(col("vec_id"),
      array(cbs.indices.map(j => Similarity.pqCodeColHof(cbs, j)): _*).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val native = emb.select(col("vec_id"),
      Similarity.pqNative(spark, cbs, col("embedding")).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(native.nonEmpty && native.size === hof.size)
    assert(native === hof)
  }

  test("PQ index at rest: codes-only scoring reproduces the in-memory result") {
    val out = java.nio.file.Files.createTempDirectory("pq").toString + "/index"
    Similarity.writePqIndex(spark, sf, out)
    val fromIndex = Similarity.annPqTopkFromIndex(spark, sf, out)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inMemory = Similarity.annPqTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex === inMemory)
    // the at-rest working set is an order of magnitude smaller than the
    // full-precision vectors
    def bytes(p: String): Long = {
      val f = new java.io.File(p)
      if (f.isDirectory) f.listFiles.map(x => bytes(x.getPath)).sum else f.length
    }
    val codesB = bytes(s"$out/codes")
    val vecsB = bytes(s"$sf/embeddings.parquet")
    info(s"codes=${codesB}B embeddings=${vecsB}B")
    assert(codesB < vecsB / 2)
  }

  test("external-vector serving path matches the stored-query path") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("pqv").toString + "/index"
    Similarity.writePqIndex(spark, sf, out)
    // bring vec 0's embedding as an EXTERNAL vector: the serving path must
    // reproduce the stored-query result, plus the self-match it has no
    // reason to exclude
    val qvec = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).collect()(0)
      .getSeq[Double](0).toArray
    val forVec = Similarity.annPqTopkFromIndexForVec(spark, sf, out, qvec)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(forVec.head._1 === 0L && forVec.head._2 === 1.0) // self-match first
    val stored = Similarity.annPqTopkFromIndex(spark, sf, out)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(forVec.filterNot(_._1 == 0L) === stored.take(forVec.size - 1))
  }

  test("NaN codeword distance never locks the argmin (parity with HOF)") {
    import org.apache.spark.sql.functions.{array, col}
    // degenerate codebook: codeword 0 of subspace 0 is all-NaN (what an
    // empty Lloyd's cluster would produce). `d < NaN` is false for every
    // finite d, so an unguarded argmin would stick at best=0; HOF
    // array_min orders NaN above every finite double and picks the
    // finite minimum. Both formulations must agree.
    val cbs = Array.tabulate(16, 16, 4) { (j, c, i) =>
      if (j == 0 && c == 0) Double.NaN else (j + c + i).toDouble
    }
    import spark.implicits._
    val emb = Seq((1L, Array.tabulate(64)(i => i.toFloat / 64)))
      .toDF("vec_id", "embedding")
    val hof = emb.select(array(cbs.indices.map(j =>
      Similarity.pqCodeColHof(cbs, j)): _*).as("codes"))
      .collect()(0).getSeq[Int](0).toList
    val native = emb.select(
      Similarity.pqNative(spark, cbs, col("embedding")).as("codes"))
      .collect()(0).getSeq[Int](0).toList
    assert(native === hof)
    assert(native.head != 0) // the NaN codeword lost to a finite one
  }

  test("too-short input: native yields whole-null codes (deliberate " +
    "divergence from HOF's per-subspace null elements)") {
    import org.apache.spark.sql.functions.col
    val cbs = Similarity.pqCodebooks(spark, sf)
    import spark.implicits._
    val short = Seq((1L, Array.tabulate(32)(_.toFloat))).toDF("vec_id", "embedding")
    val row = short.select(
      Similarity.pqNative(spark, cbs, col("embedding")).as("codes")).collect()(0)
    assert(row.isNullAt(0))
  }
}

/** Composed IVF-PQ index: cell pruning × code-only scoring. */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("IVF-PQ at rest: pruned cells, code-only scoring, exact self-match first") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("ivfpq").toString + "/index"
    Similarity.writeIvfPqIndex(spark, sf, out)
    // codes live cell-partitioned on disk
    val dirs = new java.io.File(s"$out/codes").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("cell=")) >= 2, dirs.mkString(","))
    val qvec = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).collect()(0)
      .getSeq[Double](0).toArray
    val df = Similarity.annIvfPqTopkFromIndexForVec(spark, sf, out, qvec)
    // the candidate scan must be partition-pruned to the probed cells
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), s"no partition pruning:\n$plan")
    val rows = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
    // the stored row's own cell is a probed cell: exact self-match first
    assert(rows.head === ((0L, 1.0)))
    // determinism (fixed seeds end to end)
    val again = Similarity.annIvfPqTopkFromIndexForVec(spark, sf, out, qvec)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq === again.toSeq)
    // probing 4/16 cells still recovers a usable share of brute top-10
    val brute = Similarity.annCosineTopk(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val overlap = (rows.map(_._1).toSet - 0L) & brute
    info(s"IVF-PQ overlap with brute top-10: ${overlap.size}")
    assert(overlap.size >= 3)
  }
}

/** Winnowing fingerprints: near-dups overlap heavily, unrelated docs don't. */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("near-dup pairs share most fingerprints; random pairs share few") {
    val idx = Dedup.winnowIndex(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val nearDups = Dedup.dedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDups.nonEmpty)
    val overlaps = nearDups.map { case (a, b) =>
      val (fa, fb) = (idx(a), idx(b))
      (fa & fb).size.toDouble / math.min(fa.size, fb.size)
    }
    assert(overlaps.forall(_ >= 0.8), s"near-dup overlaps: ${overlaps.min}")
    // control: consecutive non-near-dup ids
    val dupSet = nearDups.flatMap(p => Seq(p._1, p._2)).toSet
    val controls = idx.keys.toSeq.sorted.filterNot(dupSet).take(20)
      .sliding(2, 2).collect { case Seq(a, b) =>
        (idx(a) & idx(b)).size.toDouble / math.min(idx(a).size, idx(b).size)
      }.toSeq
    assert(controls.forall(_ <= 0.5), s"control overlaps too high: ${controls.max}")
  }
}

/** Multimodal pipeline stages beyond decode: resize + frame sampling. */
class MultimodalPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("resize fits every image within the bounding box, deterministically") {
    val r = graft.multimodal.Multimodal.resizeFeatures(spark, sf, 100, 100).collect()
    assert(r.length === graft.Tables.documents(spark, sf).count())
    assert(r.forall(f => f.scale_w <= 100 && f.scale_h <= 100))
    assert(r.forall(f => f.scale_w <= f.width && f.scale_h <= f.height))
  }

  test("frame sampling emits every stride-th window with in-bounds offsets") {
    val frames = graft.multimodal.Multimodal.frameSample(spark, sf, 32, 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(f => f.frame_idx % 4 == 0 && f.offset == f.frame_idx * 32))
    val again = graft.multimodal.Multimodal.frameSample(spark, sf, 32, 4).collect()
    assert(frames.sortBy(f => (f.doc_id, f.frame_idx)).toSeq ===
      again.sortBy(f => (f.doc_id, f.frame_idx)).toSeq)
  }
}

/** Library facade smoke: session comes back configured with native fns. */
class GraftFacadeSpec extends AnyFunSuite {
  test("Graft.session registers cosine_fx") {
    val s = graft.Graft.session("local[4]")
    // same-JVM getOrCreate may return the shared test session; the contract
    // is that cosine_fx is registered on whatever comes back
    val r = s.sql("SELECT cosine_fx(array(1L, 2L), array(2L, 4L)) AS c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }
}

/** SQL-text reachability of the whole table surface. */
class SqlViewsSpec extends AnyFunSuite {
  test("registerViews makes every fixture table SQL-queryable") {
    val spark = TestSpark.spark
    graft.Graft.registerViews(spark, TestSpark.sf0001)
    val joined = spark.sql(
      """SELECT r_name, COUNT(*) AS n FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin).collect()
    assert(joined.length === 5)
    // events view must carry the converted timestamp type
    val t = spark.sql("SELECT MIN(ts) FROM events").schema.head.dataType
    assert(t.typeName === "timestamp")
  }
}

class TextCensusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("ngram topk: exactly k rows, counts non-increasing, rank dense from 1") {
    val rows = TextAnalysis.textNgramTopk(spark, sf).collect()
    assert(rows.length === 20)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getAs[Int]("rank")).toSeq === (1 to 20))
  }

  test("rarity: one row per doc, in [0,1), hand-computed values on a toy corpus") {
    val rows = TextAnalysis.textRarityScore(spark, sf).collect()
    assert(rows.length === graft.Tables.documents(spark, sf).count())
    assert(rows.forall { r =>
      val x = r.getAs[Double]("rarity"); x >= 0.0 && x < 1.0
    })
    // deployment form pinned against hand-computed exact values:
    // df: a->2 docs, b->1, c->1, d->1; N=3
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "a a a"), (2L, "a b"), (3L, "c c d")).toDF("doc_id", "text")
    val tf = docs
      .select(col("doc_id"), explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val got = TextAnalysis.textRarityScoreFor(tf, docs.agg(count(lit(1)).as("n")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rarity")).toMap
    // d1: (3*3-6)/9, d2: (2*3-3)/6, d3: (3*3-3)/9
    assert(got(1L) === 3.0 / 9.0)
    assert(got(2L) === 3.0 / 6.0)
    assert(got(3L) === 6.0 / 9.0)
  }

  test("repetition: ratios in [0,1], every doc with >=2 tokens present") {
    val rows = TextAnalysis.textRepetition(spark, sf).collect()
    assert(rows.length === graft.Tables.documents(spark, sf).count())
    assert(rows.forall { r =>
      val d = r.getAs[Double]("dup_word_ratio")
      val t = r.getAs[Double]("top_bigram_ratio")
      d >= 0.0 && d <= 1.0 && t > 0.0 && t <= 1.0
    })
  }

  test("pack shards: greedy-fill bound — a shard exceeds budget only by its own docs") {
    val rows = TextAnalysis.textPackShards(spark, sf).collect()
    assert(rows.length === graft.Tables.documents(spark, sf).count())
    val byShard = rows.groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("shard")))
    byShard.foreach { case ((src, shard), docs) =>
      val total = docs.map(_.getAs[Long]("n_tokens")).sum
      val maxDoc = docs.map(_.getAs[Long]("n_tokens")).max
      assert(total < TextAnalysis.packBudget + maxDoc,
        s"shard ($src,$shard) overfilled: $total")
    }
    // shards are contiguous from 0 per source
    byShard.keys.groupBy(_._1).foreach { case (_, ks) =>
      val ids = ks.map(_._2).toSeq.sorted
      assert(ids === (0L until ids.length))
    }
  }

  test("shuffle-pack: a seeded permutation — every doc once, shards balanced, files contiguous") {
    val rows = TextAnalysis.textShufflePack(spark, sf).collect()
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.length.toLong === total)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length.toLong === total)
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet.forall(s => s >= 0 && s < 8))
    // uniform-hash balance: no shard more than 2x the mean (500 docs / 8)
    val sizes = byShard.values.map(_.length)
    assert(sizes.max <= 2 * (total / 8).toInt, s"skewed shards: $sizes")
    byShard.values.foreach { docs =>
      val inOrder = docs.sortBy(_.getAs[Long]("pos"))
      // pos is 1..n dense, file ids start at 0 and never decrease or skip
      assert(inOrder.map(_.getAs[Long]("pos")).toSeq ===
        (1L to docs.length.toLong))
      // greedy fill: file ids start at 0 and never decrease (a jump > 1
      // is possible only when one doc alone spans a whole budget)
      val files = inOrder.map(_.getAs[Long]("file_in_shard")).toSeq
      assert(files.head === 0L)
      assert(files.sliding(2).forall {
        case Seq(a, b) => b >= a
        case _         => true
      })
    }
  }

  test("multi-epoch repack: epoch k re-ranks the pack output without re-tokenizing " +
      "and equals the from-scratch epoch-k pack; epochs genuinely differ") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sf)
    val e0 = TextAnalysis.shufflePackOf(docs).localCheckpoint(eager = true)
    // derived epoch 1 (re-rank of (doc_id, n_tokens) only — repackEpoch
    // accepts no text column, so re-tokenization is impossible by type)
    val derived = TextAnalysis.repackEpoch(e0, 1)
    val scratch = TextAnalysis.shufflePackOf(docs, seed = "epoch-1")
    assert(derived.exceptAll(scratch).count() === 0)
    assert(scratch.exceptAll(derived).count() === 0)
    // the permutation actually changes across epochs: same docs, but the
    // (shard, pos) assignment must not be identical
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("doc_id"), col("shard"), col("pos"))
    assert(key(e0).exceptAll(key(derived)).count() > 0,
      "epoch-1 permutation identical to epoch-0")
    // n_tokens is carried through unchanged (the reuse that makes epoch
    // k free of the corpus scan)
    assert(key(derived).count() === e0.count())
  }

  test("bloom-prefiltered decontaminate == exact form; plan carries the bloom probe") {
    val exact = Dedup.textDecontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val df = Dedup.textDecontaminateBloom(spark, sf)
    // the train-side scan is pruned by might_contain BEFORE any join
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("bloom_might_contain_bcast"), plan)
    val bloom = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(bloom === exact)
  }

  test("streaming-gate bloom admission == exact decontaminateAdmit") {
    // the per-version-bloom form the pipeline soak runs: bloom prune +
    // exact verify must admit the identical set (no false negatives,
    // verified positives), across versions of different sizes
    val docs = graft.Tables.documents(spark, sf)
    val train = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 7 =!= 0)
    for (mod <- Seq(14L, 7L)) {
      val ev = Dedup.evalShingleHashes(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % mod === 0))
        .persist()
      val exactIds = Dedup.decontaminateAdmit(train, ev)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val bloom = spark.sparkContext.broadcast(Dedup.evalBloomOf(spark, ev))
      val bloomIds = Dedup.decontaminateAdmitBloom(spark, train, ev, bloom)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(bloomIds === exactIds)
      ev.unpersist()
    }
  }

  test("decontaminate: train/eval partition respected, overlaps positive") {
    val rows = Dedup.textDecontaminate(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("train_doc") % 7 != 0 &&
      r.getAs[Long]("eval_doc") % 7 == 0 && r.getAs[Long]("n_shared") >= 1))
  }

  test("decontaminate against an external benchmark corpus flags copied spans only") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven"), // 7 tokens: no complete 8-gram
      (3L, "red orange yellow green blue indigo violet ultra infra x")
    ).toDF("doc_id", "text")
    // benchmark doc 100 copies an 8-token span from train doc 1; 101 shares nothing
    val benchmark = Seq(
      (100L, "prefix alpha beta gamma delta epsilon zeta eta theta suffix"),
      (101L, "completely different words that overlap with nothing at all")
    ).toDF("doc_id", "text")
    val hits = Dedup.textDecontaminateAgainst(train, benchmark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.toSeq === Seq((1L, 100L, 1L)))
  }

  test("domain report: doc_share sums to 1 and n_docs to the corpus size") {
    val rows = TextAnalysis.corpusDomainReport(spark, sf).collect()
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    val share = rows.map(_.getAs[Double]("doc_share")).sum
    assert(math.abs(share - 1.0) < 1e-9)
  }
}
