package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-relation set-similarity join — entity resolution between TWO
  * catalogs (link a new crawl against a reference corpus, reconcile
  * records across sources), where the dedup family's self-join operators
  * don't apply. Exact token-set Jaccard at an exact RATIONAL threshold
  * `num/den`: every comparison is integer arithmetic (`i·den ≥
  * num·(nl+nr−i)`, `q = ⌈t·n⌉ = (n·num+den−1) div den`), so there is no
  * floating-point boundary to silently drop a qualifying pair — and the
  * DuckDB oracle replays the identical integers.
  *
  * Same 100 TB discipline as [[Dedup.overlapPairsPlan]], generalized to
  * two relations:
  *
  *  - COLD tokens (per-side document frequency ≤ hotDf on BOTH sides)
  *    meet in one equi-join + count; output per token is `df_l·df_r ≤
  *    hotDf·min(df_l,df_r)`, so the stage is linear in corpus size, never
  *    `Σ df_l·df_r` (a stop-token shared by 1% of both catalogs is a
  *    data-dependent quadratic without the split).
  *  - HOT-token contributions come from per-record sorted hot-set
  *    `array_intersect` for pairs already connected by a cold token.
  *  - Pairs with NO shared cold token are rescued by a prefix-filtered
  *    join (SSJoin/All-Pairs with a PPJoin positional bound): jaccard ≥
  *    num/den forces `i ≥ ⌈t·n_l⌉` AND `i ≥ ⌈t·n_r⌉` (from `i·den ≥
  *    num·(n_l+n_r−i)` and `i ≤ n_r` resp. `i ≤ n_l`), so under any
  *    global total token order the smallest common token sits within
  *    rank `n − q + 1` on BOTH sides — joining left hot prefixes against
  *    right hot tokens under that positional bound finds every
  *    qualifying all-hot pair. Zero recall loss, spec-pinned at forced
  *    split points.
  */
object FuzzyJoin {
  private type Q = (SparkSession, String) => DataFrame

  /** Per-side document-frequency split point: tokens with df above this
    * are HOT and excluded from the cold co-occurrence count join,
    * bounding its output at `HotDf · |token occurrences|`; the all-hot
    * remainder is rescued by the prefix+positional join below. (The
    * within-corpus analog in [[Dedup]] dropped its df split entirely for
    * a pure prefix-filtered build; the cross-relation form keeps it —
    * two relations of different sizes make the cold join's bound cheap
    * to keep and the split is load-bearing for the spec's forced
    * branches.)
    */
  val HotDf = 256L

  /** All pairs (l_id, r_id) with exact token-set Jaccard ≥ num/den.
    *
    * `left`/`right`: DISTINCT (id, tok) rows — one row per member of each
    * record's token set (callers tokenize however fits: words, q-grams,
    * shingles). Returns (l_id, r_id, shared, nl, nr, jaccard).
    */
  def tokenJaccardJoin(left: DataFrame, right: DataFrame,
                       num: Long, den: Long,
                       hotDf: Long = HotDf): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"threshold $num/$den not in (0,1]")
    val l = left.select(col("id").as("l_id"), col("tok"))
    val r = right.select(col("id").as("r_id"), col("tok"))
    val nl = l.groupBy(col("l_id")).agg(count(lit(1)).as("nl"))
    val nr = r.groupBy(col("r_id")).agg(count(lit(1)).as("nr"))
    // one df frame over both sides: hot if EITHER side exceeds hotDf
    // (the cold-join bound needs both factors bounded); (dft, tok) is
    // the shared global total order for the prefix ranks
    val dfs = l.groupBy(col("tok")).agg(count(lit(1)).as("dfl"))
      .join(r.groupBy(col("tok")).agg(count(lit(1)).as("dfr")),
        Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("dfl"), lit(0L)).as("dfl"),
        coalesce(col("dfr"), lit(0L)).as("dfr"))
      .withColumn("hot", col("dfl") > hotDf || col("dfr") > hotDf)
      .withColumn("dft", col("dfl") + col("dfr"))
    val lt = l.join(dfs, "tok")
    val rt = r.join(dfs, "tok")

    val coldPairs = lt.filter(!col("hot")).select(col("l_id"), col("tok"))
      .join(rt.filter(!col("hot")).select(col("r_id"), col("tok")), "tok")
      .groupBy(col("l_id"), col("r_id")).agg(count(lit(1)).as("i_cold"))
    val hotSetL = lt.filter(col("hot")).groupBy(col("l_id"))
      .agg(sort_array(collect_list(col("tok"))).as("hs_l"))
    val hotSetR = rt.filter(col("hot")).groupBy(col("r_id"))
      .agg(sort_array(collect_list(col("tok"))).as("hs_r"))
    // token type is caller-chosen (strings, shingle hashes, …) — derive
    // the empty hot-set's element type from the input
    val emptyArr = array().cast(
      org.apache.spark.sql.types.ArrayType(l.schema("tok").dataType))
    val viaCold = coldPairs
      .join(hotSetL, Seq("l_id"), "left").join(hotSetR, Seq("r_id"), "left")
      .select(col("l_id"), col("r_id"),
        (col("i_cold") + size(array_intersect(
          coalesce(col("hs_l"), emptyArr),
          coalesce(col("hs_r"), emptyArr)))).as("i"))

    // hot-only rescue: ranks are over ALL of a record's tokens in the
    // shared (dft, tok) order; only the hot rows join
    def ranked(side: DataFrame, id: String, n: DataFrame, nCol: String) =
      side.withColumn("rn",
          row_number().over(Window.partitionBy(col(id)).orderBy(col("dft"), col("tok"))))
        .join(n, id)
        .withColumn("q", expr(s"($nCol * $num + $den - 1) div $den"))
        .filter(col("hot"))
        .select(col(id), col("tok"), col("rn"), col(nCol), col("q"))
    val hotRankedL = ranked(lt, "l_id", nl, "nl")
    val hotRankedR = ranked(rt, "r_id", nr, "nr")
    val hotOnly = hotRankedL.filter(col("rn") <= col("nl") - col("q") + 1).as("p")
      .join(hotRankedR.as("f"),
        col("p.tok") === col("f.tok") &&
          col("f.rn") <= col("f.nr") - col("p.q") + 1)
      .select(col("p.l_id").as("l_id"), col("f.r_id").as("r_id"))
      .distinct()
      .join(coldPairs.select(col("l_id"), col("r_id")), Seq("l_id", "r_id"), "left_anti")
      .join(hotSetL, "l_id").join(hotSetR, "r_id")
      .select(col("l_id"), col("r_id"),
        size(array_intersect(col("hs_l"), col("hs_r"))).cast("long").as("i"))

    viaCold.unionByName(hotOnly)
      .join(nl, "l_id").join(nr, "r_id")
      .filter(col("i") * den >= lit(num) * (col("nl") + col("nr") - col("i")))
      .select(col("l_id"), col("r_id"), col("i").as("shared"),
        col("nl"), col("nr"),
        (col("i").cast("double") / (col("nl") + col("nr") - col("i")))
          .as("jaccard"))
  }

  /** Fuzzy-join the odd-id half of `documents` (the "new crawl") against
    * the even-id half (the "reference corpus") on word-3-gram shingle
    * Jaccard ≥ 4/5 — the cross-catalog admission probe at the dedup
    * family's threshold, over the same shared shingle index.
    */
  def textFuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.docShingles(s, dir)
    tokenJaccardJoin(
      sh.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id").as("id"), col("sh").as("tok")),
      sh.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("id"), col("sh").as("tok")),
      num = 4, den = 5)
      .orderBy(col("l_id"), col("r_id"))
  }

  val queries: Map[String, Q] = Map(
    "text_fuzzy_join" -> ((s, d) => textFuzzyJoin(s, d)))

  val oracles: Map[String, String] = Map(
    // the shared shingle index stores 60-bit md5 hashes (Dedup.docShingles)
    // — the oracle hashes identically, keeping the contract value-exact
    "text_fuzzy_join" ->
      s"""${Dedup.shinglesCte},
        |ls AS (SELECT doc_id AS l_id, sh FROM sh WHERE doc_id % 2 = 1),
        |rs AS (SELECT doc_id AS r_id, sh FROM sh WHERE doc_id % 2 = 0),
        |nls AS (SELECT l_id, COUNT(*) AS nl FROM ls GROUP BY l_id),
        |nrs AS (SELECT r_id, COUNT(*) AS nr FROM rs GROUP BY r_id),
        |ip AS (
        |  SELECT l_id, r_id, COUNT(*) AS shared
        |  FROM ls JOIN rs USING (sh) GROUP BY l_id, r_id)
        |SELECT l_id, r_id, shared, nl, nr,
        |       CAST(shared AS DOUBLE) / (nl + nr - shared) AS jaccard
        |FROM ip JOIN nls USING (l_id) JOIN nrs USING (r_id)
        |WHERE shared * 5 >= 4 * (nl + nr - shared)
        |ORDER BY l_id, r_id""".stripMargin)
}
