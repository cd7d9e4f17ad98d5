package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Text-analysis operators over the `documents` table — the language-ID /
  * quality-scoring / token-counting / fingerprinting surface a training-data
  * pipeline needs (north star [EXT] in SURVEY.md §2).
  *
  * All per-document features are computed with array higher-order functions
  * on the tokenized text — one scan, no explode, no shuffle until the final
  * (optional) ordering. At 100 TB this is a map-only stage.
  */
object TextAnalysis {
  private type Q = (SparkSession, String) => DataFrame

  /** Stopword list used by quality scoring (fixture vocabulary). */
  val stopwords: Seq[String] = Seq("the", "a", "value", "data")

  // DuckDB-side tokenization shared by all oracles.
  private val docsCte =
    """WITH docs AS (
      |  SELECT doc_id, lang, text, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents)""".stripMargin

  // ------------------------------------------------------------- tokens
  /** BPE-style pre-tokenizer pattern (GPT-2-like shape, narrowed to the
    * corpus alphabet): runs of letters / digits / other, each optionally
    * absorbing one leading space — the unit a byte-pair encoder would
    * merge over. Identical regex semantics in Spark (Java regex) and
    * DuckDB (RE2) for this pattern.
    */
  val bpeishPattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  /** Token counting: whitespace tokens, BPE-ish subword units, characters,
    * mean token length.
    */
  def textTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(TextFns.tokens(col("text"))).as("n_tokens"),
        size(regexp_extract_all(col("text"), lit(bpeishPattern), lit(0))).as("n_bpeish"),
        length(col("text")).as("n_chars"),
        (TextFns.tokenChars(col("text")).cast("double") /
          size(TextFns.tokens(col("text")))).as("avg_tok_len"))
      .orderBy(col("doc_id"))

  private val textTokensSql =
    s"""$docsCte
       |SELECT doc_id, len(toks) AS n_tokens,
       |  len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS n_bpeish,
       |  length(text) AS n_chars,
       |  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / len(toks) AS avg_tok_len
       |FROM docs ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ quality
  /** Quality scoring: stopword ratio, lexical diversity, composite score —
    * the length/punct/stopword-ratio family of filters used to gate
    * training corpora.
    */
  /** The quality score as one column expression — the single source of
    * truth [[textQuality]], [[Dedup.dedupKeepBest]] and the pipeline
    * soak's admission gate all evaluate (drift between the query and the
    * gate would make the soak's one-shot equivalence vacuous).
    */
  def scoreExpr(text: Column): Column = {
    val toks = TextFns.tokens(text)
    size(array_distinct(toks)).cast("double") / size(toks) *
      (lit(1.0) - TextFns.countIn(toks, stopwords).cast("double") / size(toks))
  }

  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_uniq"),
        TextFns.countIn(toks, stopwords).as("n_stop"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("uniq_ratio", col("n_uniq").cast("double") / col("n_tokens"))
      .withColumn("score", col("uniq_ratio") * (lit(1.0) - col("stop_ratio")))
      .orderBy(col("doc_id"))
  }

  // single source of truth for the oracle's stopword membership test
  private val stopSql = stopwords.map(w => s"'$w'").mkString("t -> t IN (", ", ", ")")

  private val textQualitySql =
    s"""$docsCte
       |SELECT doc_id, len(toks) AS n_tokens,
       |  len(list_distinct(toks)) AS n_uniq,
       |  len(list_filter(toks, $stopSql)) AS n_stop,
       |  CAST(len(list_filter(toks, $stopSql)) AS DOUBLE) / len(toks) AS stop_ratio,
       |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio,
       |  (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) *
       |        (1.0 - CAST(len(list_filter(toks, $stopSql)) AS DOUBLE) / len(toks)) AS score
       |FROM docs ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ lang id
  /** Language-ID heuristic: score fixed token-frequency profiles and take
    * the argmax. The fixture corpus is synthetic (same vocabulary under
    * every label), so the profiles here are structural stand-ins — a real
    * deployment swaps in char-n-gram profile tables; the Spark shape
    * (per-doc feature counts → argmax, map-only) is the part that scales.
    */
  def textLangid(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        TextFns.countIn(toks, Seq("the")).as("f_the"),
        TextFns.countIn(toks, Seq("a")).as("f_a"),
        size(toks).as("n"))
      .withColumn("pred_lang",
        when(col("f_the") > col("f_a"), "en")
          .when(col("f_a") > col("f_the"), "es")
          .otherwise("und"))
      .select(col("doc_id"), col("lang"), col("pred_lang"),
        (col("lang") === col("pred_lang")).as("agree"))
      .orderBy(col("doc_id"))
  }

  private val textLangidSql =
    s"""$docsCte, f AS (
       |  SELECT doc_id, lang,
       |    len(list_filter(toks, t -> t = 'the')) AS f_the,
       |    len(list_filter(toks, t -> t = 'a')) AS f_a
       |  FROM docs)
       |SELECT doc_id, lang,
       |  CASE WHEN f_the > f_a THEN 'en' WHEN f_a > f_the THEN 'es' ELSE 'und' END AS pred_lang,
       |  lang = (CASE WHEN f_the > f_a THEN 'en' WHEN f_a > f_the THEN 'es' ELSE 'und' END) AS agree
       |FROM f ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------- fingerprint
  /** Content fingerprint: md5 over the canonical (whitespace-normalized)
    * token stream — the key exact dedup groups on.
    */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        TextFns.fingerprint(col("text")).as("fp"),
        size(TextFns.tokens(col("text"))).as("n_tokens"))
      .orderBy(col("doc_id"))

  private val textFingerprintSql =
    s"""$docsCte
       |SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp, len(toks) AS n_tokens
       |FROM docs ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- tf-idf
  /** Top-3 characteristic terms per document by tf·(N/df) — the tf-idf
    * family with the RAW inverse document frequency instead of its log:
    * ln() is not bit-reproducible across engines (Java vs C runtime
    * libms), while tf·N is an exact integer and one IEEE division is —
    * and the log is monotone in N/df, so for fixed tf the per-term
    * RANKING the query publishes is unchanged. Deterministic total order
    * via (score desc, term asc).
    *
    * Plan shape: the (doc, term, tf) frame is tokenized/exploded ONCE and
    * materialized through the [[graft.Shared]] registry (the corpus term
    * index — same lifecycle as the bigram frame), so df can be a plain
    * `tf.groupBy(term).count()` joined back WITHOUT recomputing the
    * explode (Spark reuses exchanges, not divergent aggregates — the
    * materialization is what makes the two-consumer form safe). The
    * groupBy form matters at scale: a term-partitioned window count would
    * buffer one task with |docs| rows for every stopword-grade term —
    * the textbook skewed-key killer — while partial aggregation absorbs
    * hot terms map-side and the join's build side is one row per distinct
    * term. N broadcast in-plan; doc-keyed ranking window with Spark's
    * WindowGroupLimit pushing the top-3.
    */
  def textTfidfTopk(s: SparkSession, dir: String): DataFrame = {
    val tf = tfRows(s, dir)
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term").asc)
    tf.join(dft, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n")).cast("double") / col("df"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("term"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** The corpus term index: one (doc_id, term, tf) row per distinct term
    * per document — tokenize + explode + count ONCE, memoized through the
    * Shared registry so every consumer (the per-doc tf side and the
    * corpus-wide df aggregation) reads the same blocks.
    */
  private def tfRows(s: SparkSession, dir: String): DataFrame =
    graft.Shared.materialize(s, dir, "tf_rows") {
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
    }

  private val textTfidfTopkSql =
    s"""$docsCte,
       |terms AS (SELECT doc_id, unnest(toks) AS term FROM docs),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
       |dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, dft.df,
       |         CAST(tf.tf * n.n AS DOUBLE) / dft.df AS score
       |  FROM tf JOIN dft USING (term), n),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |                               ORDER BY score DESC, term ASC) AS rn
       |  FROM scored)
       |SELECT doc_id, rn, term, tf, df, score
       |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin

  // -------------------------------------------------- length histogram
  /** Corpus length distribution in power-of-two buckets — the standard
    * first diagnostic over a training corpus (truncation pressure, short-
    * doc fraction). The bucket is the highest power of two ≤ n computed
    * EXACTLY via the binary-string length (`1 << (len(bin(n)) - 1)`) —
    * no floating log2, whose rounding at bucket boundaries would differ
    * between engines. Map-only into a ~60-row aggregate.
    */
  def corpusLengthHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(size(TextFns.tokens(col("text"))).cast("long").as("n"))
      // n >= 1 keeps the invariant bucket <= n true: a zero-token doc has
      // no highest-power-of-two bucket (bin(0) would land it in bucket 1)
      .filter(col("n") >= 1)
      .withColumn("bucket", expr("shiftleft(cast(1 as bigint), length(bin(n)) - 1)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("total_tokens"))
      .orderBy(col("bucket"))

  private val corpusLengthHistogramSql =
    s"""$docsCte,
       |n AS (SELECT CAST(len(toks) AS BIGINT) AS n FROM docs WHERE len(toks) >= 1)
       |SELECT (CAST(1 AS BIGINT) << (length(bin(n)) - 1)) AS bucket,
       |       COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS total_tokens
       |FROM n GROUP BY 1 ORDER BY bucket""".stripMargin

  // ------------------------------------------------------ token rarity
  /** Corpus-statistical quality score: mean document-frequency rarity of a
    * document's tokens. A doc of corpus-ubiquitous tokens (boilerplate,
    * stopword soup) scores near 0; one of tokens few other documents use
    * scores near 1 — the "statistical LM" quality signal a curation
    * pipeline uses without an external model. Defined exactly as
    *   rarity = (n_toks·N − Σ_tok df(tok)) / (n_toks·N)
    * over token OCCURRENCES (tf-weighted), so the whole computation is
    * integer arithmetic with ONE final double division — bit-identical in
    * any engine (no transcendental log-prob, which is not correctly
    * rounded and would break hash-equality). Reuses the shared
    * `tf_rows` term index; the df side is a map-side-combined count per
    * distinct term, joined back on the bounded `term` key — the same
    * skew-safe shape as tf-idf, map-only after the join.
    */
  def textRarityScore(s: SparkSession, dir: String): DataFrame =
    textRarityScoreFor(tfRows(s, dir),
      Tables.documents(s, dir).agg(count(lit(1)).as("n")))

  /** Deployment form over an arbitrary (doc_id, term, tf) index and a
    * 1-row corpus-size frame; the oracle query above is its
    * specialization to the `documents` table.
    */
  def textRarityScoreFor(tf: DataFrame, n: DataFrame): DataFrame = {
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(dft, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_toks"), sum(col("tf") * col("df")).as("sum_df"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("n_toks"),
        ((col("n_toks") * col("n") - col("sum_df")).cast("double") /
          (col("n_toks") * col("n"))).as("rarity"))
      .orderBy(col("doc_id"))
  }

  private val textRarityScoreSql =
    s"""$docsCte,
       |terms AS (SELECT doc_id, unnest(toks) AS term FROM docs),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
       |dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |per_doc AS (
       |  SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_toks,
       |         CAST(SUM(tf.tf * dft.df) AS BIGINT) AS sum_df
       |  FROM tf JOIN dft USING (term) GROUP BY tf.doc_id)
       |SELECT doc_id, n_toks,
       |  CAST(n_toks * n.n - sum_df AS DOUBLE) / (n_toks * n.n) AS rarity
       |FROM per_doc, n ORDER BY doc_id""".stripMargin

  // ------------------------------------------- corpus-curation pipeline
  /** The composed curation pass a training-data pipeline runs end to end:
    * quality-gate (stopword/diversity score), exact-dedup survivors
    * (min doc_id per content fingerprint), then per-language corpus
    * stats. One declarative plan — Catalyst fuses the gate into the scan,
    * and the dedup survivor comes from a fingerprint window over the same
    * subtree; at 100 TB this is ONE filtered scan + one fingerprint
    * shuffle + one tiny agg.
    */
  def textCurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val gated = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_uniq"),
        TextFns.countIn(toks, stopwords).as("n_stop"),
        TextFns.fingerprint(col("text")).as("fp"))
      .withColumn("score",
        (col("n_uniq").cast("double") / col("n_tokens")) *
          (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")))
      .filter(col("score") >= 0.5 && col("n_tokens") >= 20)
    // dedup survivor via a fingerprint window, NOT groupBy(fp)+semi-join:
    // divergent aggregates over one subtree are not exchange-reused, so
    // the join form would tokenize the corpus twice (the tf-idf lesson)
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    gated
      .withColumn("min_doc", min(col("doc_id")).over(wFp))
      .filter(col("doc_id") === col("min_doc"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
      // exact integer sum ÷ count — identical IEEE division both engines
      .withColumn("avg_tokens", col("n_tokens").cast("double") / col("n_docs"))
      .orderBy(col("lang"))
  }

  private val textCurationPipelineSql =
    s"""$docsCte,
       |gated AS (
       |  SELECT doc_id, lang, len(toks) AS n_tokens,
       |         md5(array_to_string(toks, ' ')) AS fp,
       |         (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) *
       |           (1.0 - CAST(len(list_filter(toks, $stopSql)) AS DOUBLE) / len(toks)) AS score
       |  FROM docs),
       |g AS (SELECT * FROM gated WHERE score >= 0.5 AND n_tokens >= 20),
       |kept AS (SELECT fp, MIN(doc_id) AS doc_id FROM g GROUP BY fp)
       |SELECT g.lang, COUNT(*) AS n_docs, CAST(SUM(g.n_tokens) AS BIGINT) AS n_tokens,
       |       CAST(SUM(g.n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens
       |FROM g JOIN kept ON g.fp = kept.fp AND g.doc_id = kept.doc_id
       |GROUP BY g.lang ORDER BY g.lang""".stripMargin

  // ------------------------------------------- deterministic sampling
  /** Reproducible stratified sampling — the way a pipeline carves
    * training subsets that can be re-derived bit-for-bit later: a
    * document is sampled iff the md5 hex of its id starts below a
    * threshold character. Hex digits are uniform, so `< "4"` keeps
    * 4/16 = 25% in expectation, per stratum, with no RNG and no state;
    * membership is a pure function of the id, so the sample is stable
    * under re-runs, retries, and engine changes (md5 is the oracle-exact
    * hash; see the winnowing note). Reports per-language sampled/total
    * counts and the realized rate.
    */
  def textSampleStratified(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        (md5(col("doc_id").cast("string")) < "4").as("sampled"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"))
      .withColumn("rate",
        col("n_sampled").cast("double") / col("n_total"))
      .orderBy(col("lang"))

  private val textSampleStratifiedSql =
    """SELECT lang, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '4' THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  CAST(SUM(CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '4' THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*) AS rate
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------------ n-gram stats
  /** All (non-distinct) word bigrams of a token array, 1-based windows —
    * the counting complement of `TextFns.shingles` (which dedups for
    * set-similarity). HOF transform is per-row compute; the only shuffle
    * downstream is the count aggregation.
    */
  private def bigramsOf(toks: org.apache.spark.sql.Column) =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** One exploded (doc_id, n_tokens, n_uniq, bigram) row set — tokenize
    * ONCE (projected before any consumer so the split/distinct run once
    * per document, not once per referencing expression), explode once,
    * memoized through the Shared registry for every bigram consumer in
    * the pack (census + repetition share it).
    */
  private def bigramRows(s: SparkSession, dir: String): DataFrame =
    graft.Shared.materialize(s, dir, "bigram_rows") {
      Tables.documents(s, dir)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_uniq"),
          explode(bigramsOf(col("toks"))).as("bigram"))
    }

  /** Corpus-wide top-20 bigrams by frequency — the n-gram census a
    * data-mixing pass runs to spot boilerplate and over-represented
    * phrases. Plan shape: explode → partial+final hash agg (map-side
    * combine absorbs the heavy hitters) → TakeOrderedAndProject; the
    * global rank window runs AFTER the limit, over 20 rows, so no
    * single-partition stage ever sees more than k rows.
    */
  def textNgramTopk(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("bigram").asc)
    bigramRows(s, dir)
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram").asc)
      .limit(20)
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("bigram"), col("cnt"))
  }

  private val textNgramTopkSql =
    s"""$docsCte,
       |idx AS (SELECT doc_id, toks,
       |               unnest(generate_series(1, len(toks) - 1)) AS i
       |        FROM docs),
       |b AS (SELECT toks[i] || ' ' || toks[i + 1] AS bigram FROM idx),
       |c AS (SELECT bigram, COUNT(*) AS cnt FROM b GROUP BY 1),
       |top AS (SELECT * FROM c ORDER BY cnt DESC, bigram LIMIT 20)
       |SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, bigram) AS rank, bigram, cnt
       |FROM top ORDER BY rank""".stripMargin

  // ----------------------------------------------------- repetition
  /** Repetition-based quality gate (the Gopher-rules family): per-doc
    * duplicate-word fraction (1 − uniq/total) and top-bigram fraction
    * (most frequent bigram ÷ bigram count). Highly repetitive docs are
    * the classic low-quality signature that length/stopword filters miss.
    * One scan: token stats ride the groupBy keys through the bigram
    * count, so the doc subtree is never recomputed (divergent aggregates
    * are not exchange-reused — the tf-idf lesson).
    */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    bigramRows(s, dir)
      .groupBy(col("doc_id"), col("n_tokens"), col("n_uniq"), col("bigram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n_tokens"), col("n_uniq"))
      .agg(max(col("c")).as("max_bg"))
      .select(col("doc_id"), col("n_tokens"),
        (lit(1.0) - col("n_uniq").cast("double") / col("n_tokens"))
          .as("dup_word_ratio"),
        (col("max_bg").cast("double") / (col("n_tokens") - 1))
          .as("top_bigram_ratio"))
      .withColumn("repetitive",
        col("dup_word_ratio") > 0.8 || col("top_bigram_ratio") > 0.1)
      .orderBy(col("doc_id"))
  }

  private val textRepetitionSql =
    s"""$docsCte,
       |idx AS (SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nu,
       |               toks, unnest(generate_series(1, len(toks) - 1)) AS i
       |        FROM docs),
       |c AS (SELECT doc_id, n, nu, toks[i] || ' ' || toks[i + 1] AS bigram,
       |             COUNT(*) AS c
       |      FROM idx GROUP BY 1, 2, 3, 4),
       |a AS (SELECT doc_id, n, nu, MAX(c) AS max_bg FROM c GROUP BY 1, 2, 3)
       |SELECT doc_id, n AS n_tokens,
       |  1.0 - CAST(nu AS DOUBLE) / n AS dup_word_ratio,
       |  CAST(max_bg AS DOUBLE) / (n - 1) AS top_bigram_ratio,
       |  (1.0 - CAST(nu AS DOUBLE) / n > 0.8)
       |    OR (CAST(max_bg AS DOUBLE) / (n - 1) > 0.1) AS repetitive
       |FROM a ORDER BY doc_id""".stripMargin

  // --------------------------------------------------- domain report
  /** Corpus composition report per (source, lang): the mixing table a
    * training run is provisioned from. Share-of-corpus comes from an
    * unpartitioned window over the ALREADY-AGGREGATED result (|sources| ×
    * |langs| rows), so the single-partition stage is O(groups), never
    * O(corpus).
    */
  def corpusDomainReport(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    Tables.documents(s, dir)
      .select(col("source"), col("lang"), size(toks).as("n_toks"),
        col("n_chars"))
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks").cast("long")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .withColumn("avg_chars", col("n_chars").cast("double") / col("n_docs"))
      .withColumn("doc_share", col("n_docs").cast("double") /
        sum(col("n_docs")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .orderBy(col("source"), col("lang"))
  }

  private val corpusDomainReportSql =
    """WITH g AS (
      |  SELECT source, lang, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
      |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
      |  FROM documents GROUP BY 1, 2)
      |SELECT source, lang, n_docs, n_tokens, n_chars,
      |  CAST(n_chars AS DOUBLE) / n_docs AS avg_chars,
      |  CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS BIGINT) AS doc_share
      |FROM g ORDER BY source, lang""".stripMargin

  // ---------------------------------------------------- mixture sampling
  /** Mixture rebalancing: per-language TARGET sampling rates (downsample
    * the dominant language to rebalance the mix — the knob the
    * `corpus_domain_report` table informs), applied with the same
    * deterministic md5-threshold membership as the stratified sample:
    * two hex digits give 1/256 rate granularity, membership is a pure
    * function of doc_id, so the mixture is reproducible bit-for-bit and
    * composable with any other deterministic subset. Reports
    * target vs realized rate per language.
    */
  def textSampleMixture(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        // en: 0x40/0x100 = 25%; others 0xc0/0x100 = 75%
        (md5(col("doc_id").cast("string")) <
          when(col("lang") === "en", "40").otherwise("c0")).as("sampled"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"))
      .withColumn("target_rate",
        when(col("lang") === "en", 0.25).otherwise(0.75))
      .withColumn("rate", col("n_sampled").cast("double") / col("n_total"))
      .orderBy(col("lang"))

  private val textSampleMixtureSql =
    """SELECT lang, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN md5(CAST(doc_id AS VARCHAR)) <
      |    (CASE WHEN lang = 'en' THEN '40' ELSE 'c0' END)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  CAST(CASE WHEN lang = 'en' THEN 0.25 ELSE 0.75 END AS DOUBLE) AS target_rate,
      |  CAST(SUM(CASE WHEN md5(CAST(doc_id AS VARCHAR)) <
      |    (CASE WHEN lang = 'en' THEN '40' ELSE 'c0' END)
      |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS rate
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // --------------------------------------------------- sequence packing
  /** Token budget per packed shard (training-sequence granularity). */
  val packBudget = 4096L

  /** Sequence packing: assign each document to a fixed-token-budget shard
    * — the step that turns a curated corpus into training shards. Shard
    * ids come from a running token total per source (greedy packing in
    * deterministic doc_id order), so the assignment is a pure function of
    * the corpus: reproducible across engines, runs, and partitionings.
    * The cumulative window partitions by `source` — shards never span
    * sources, and each source's prefix-sum runs in parallel; no
    * single-partition global window at any scale.
    */
  def textPackShards(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // shard of a doc = budget-bin of the tokens BEFORE it (greedy
      // fill). `div` = exact integral division: the `/` operator on two
      // longs is DOUBLE division, which only truncates identically to
      // DuckDB's `//` while the budget stays a power of two
      .withColumn("shard",
        expr(s"(cum_tokens - n_tokens) div $packBudget"))
      .orderBy(col("source"), col("doc_id"))
  }

  private val textPackShardsSql =
    s"""$docsCte,
       |t AS (
       |  SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
       |         CAST(SUM(len(toks)) OVER (PARTITION BY source ORDER BY doc_id
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM (SELECT d.doc_id, d.source,
       |          string_split_regex(trim(d.text), '\\s+') AS toks
       |        FROM documents d))
       |SELECT doc_id, source, n_tokens, cum_tokens,
       |       (cum_tokens - n_tokens) // $packBudget AS shard
       |FROM t ORDER BY source, doc_id""".stripMargin

  // ------------------------------------------------- epoch shuffle+pack
  /** Seeded deterministic epoch shuffle + in-shard packing: the step that
    * turns a curated corpus into ONE training epoch's read order. A new
    * seed is a new epoch permutation; the whole assignment is a pure
    * function of (corpus, seed) — reproducible across runs, engines, and
    * partitionings, resumable mid-epoch from (shard, pos).
    *
    * Scale shape (the reason this is NOT `ORDER BY rand()`): a global
    * sort of 100 TB is an all-data range-exchange whose skew is hostage
    * to the sampler. Here the permutation is hash-factored instead —
    * shard = uniform hash bucket (map-only, balanced by construction),
    * order WITHIN shard = the same hash (one shuffle on shard id, local
    * sort per shard, `pos`/`file_in_shard` from one window pass). Readers
    * stream shards independently; no stage ever sees a global order.
    * The in-shard token packing reuses [[packBudget]] greedy fill, so a
    * packed file is the unit a data loader maps to one sequence batch.
    */
  def textShufflePack(s: SparkSession, dir: String): DataFrame =
    shufflePackOf(Tables.documents(s, dir))

  /** [[textShufflePack]] over an arbitrary `(doc_id, text, …)` frame —
    * the form the continuous-curation pipeline calls on its admitted
    * corpus (same assignment, same window shapes).
    */
  def shufflePackOf(docs: DataFrame, shards: Long = 8L,
                    seed: String = "epoch-0"): DataFrame =
    packFrom(docs.select(col("doc_id"),
      size(TextFns.tokens(col("text"))).cast("long").as("n_tokens")),
      shards, seed)

  /** Epoch k's permutation derived from a PRIOR epoch's persisted pack
    * output — the multi-epoch path a training run actually takes: the
    * pack output already carries `n_tokens`, so epoch k is a pure
    * re-ranking of `(doc_id, n_tokens)` — the corpus text is never
    * re-tokenized (type-level: this function accepts no text column).
    * By construction `repackEpoch(shufflePackOf(docs, seed=e0), k)` ==
    * `shufflePackOf(docs, seed = "epoch-k")` — the permutation is a
    * pure function of (doc_id, seed) and the token counts are
    * epoch-invariant; pinned by spec and by the epoch-1 driver oracle.
    * At 100 TB each additional epoch costs one map stage + one 16-byte-
    * row shard exchange over (doc_id, n_tokens) — the text columns
    * (the actual terabytes) are untouched.
    */
  def repackEpoch(packed: DataFrame, epoch: Long, shards: Long = 8L): DataFrame =
    packFrom(packed.select(col("doc_id"), col("n_tokens")), shards,
      s"epoch-$epoch")

  private def packFrom(withTokens: DataFrame, shards: Long,
                       seed: String): DataFrame = {
    val rank = md5(concat_ws("|", lit(seed), col("doc_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("rk"), col("doc_id"))
    val wRun = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    withTokens
      .select(col("doc_id"), rank.as("rk"), col("n_tokens"))
      .withColumn("shard",
        pmod(conv(substring(col("rk"), 1, 15), 16, 10).cast("long"),
          lit(shards)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wRun))
      .withColumn("file_in_shard",
        expr(s"(cum_tokens - n_tokens) div $packBudget"))
      .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"),
        col("file_in_shard"))
      .orderBy(col("shard"), col("pos"))
  }

  /** Epoch 1 derived from epoch 0's output — the driver-facing proof
    * that the multi-epoch path re-ranks without re-tokenizing and still
    * lands on exactly the from-scratch epoch-1 assignment (the oracle
    * computes epoch 1 from the raw text).
    */
  def textShufflePackEpoch1(s: SparkSession, dir: String): DataFrame =
    repackEpoch(textShufflePack(s, dir), 1)

  private def shufflePackSqlFor(seed: String) =
    s"""WITH r AS (
       |  SELECT doc_id, md5('$seed' || '|' || doc_id) AS rk,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, rk, n_tokens,
       |    ('0x' || substr(rk, 1, 15))::BIGINT % 8 AS shard
       |  FROM r),
       |t AS (
       |  SELECT doc_id, shard, n_tokens,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY rk, doc_id)
       |      AS BIGINT) AS pos,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY rk, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM s)
       |SELECT doc_id, shard, pos, n_tokens,
       |       (cum_tokens - n_tokens) // $packBudget AS file_in_shard
       |FROM t ORDER BY shard, pos""".stripMargin

  private val textShufflePackSql = shufflePackSqlFor("epoch-0")
  private val textShufflePackEpoch1Sql = shufflePackSqlFor("epoch-1")

  // ------------------------------------------------------- fuzzy match
  /** Edit-distance fuzzy matching over a bounded sample (doc_id < 30
    * pairwise on 60-char prefixes): the string-similarity complement to
    * shingle Jaccard. Levenshtein is O(m·n) per pair — at scale it's a
    * re-rank step after cheap blocking, never the candidate generator, so
    * the query shape (small-side cross join → exact distance) is the
    * honest one.
    */
  def textFuzzySample(s: SparkSession, dir: String): DataFrame = {
    val sample = Tables.documents(s, dir)
      .filter(col("doc_id") < 30)
      .select(col("doc_id"), substring(col("text"), 1, 60).as("prefix"))
    sample.as("a").join(sample.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        levenshtein(col("a.prefix"), col("b.prefix")).as("edit_dist"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val textFuzzySampleSql =
    """WITH s AS (
      |  SELECT doc_id, substring(text, 1, 60) AS prefix FROM documents WHERE doc_id < 30)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       levenshtein(a.prefix, b.prefix) AS edit_dist
      |FROM s a JOIN s b ON a.doc_id < b.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------ pii scrub
  /** PII redaction — the standard pre-training scrub stage: emails and
    * SSN-shaped ids replaced by typed sentinels, per-kind counts kept for
    * the curation report. Map-only: codegen'd `regexp_replace` /
    * `regexp_count` passes, no shuffle until the final ordering — at
    * 100 TB this is a pure scan stage like the rest of the text ladder.
    *
    * The fixture corpus contains no PII, so the query PLANTS deterministic
    * synthetic PII first (an email on every 17th doc, an id on every 23rd,
    * both derived from doc_id) and scrubs that: redaction does measurable
    * work and the DuckDB oracle recomputes the identical plant + scrub.
    * Patterns use only RE2-safe constructs (character classes + bounded
    * repetition) so Java and DuckDB regex semantics agree.
    */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val idRe = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  def textPiiScrub(s: SparkSession, dir: String): DataFrame = {
    // fixed-width digit groups by construction (no format-function parity
    // risk): 100..999, 10..99, 1000..9999
    val planted = Tables.documents(s, dir).select(
      col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 17 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 23 === 0,
          concat(lit(" ref "), (col("doc_id") % 900 + 100).cast("string"),
            lit("-"), (col("doc_id") % 90 + 10).cast("string"),
            lit("-"), (col("doc_id") % 9000 + 1000).cast("string")))
          .otherwise(lit(""))).as("text"))
    planted.select(
      col("doc_id"),
      regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
        idRe, "<ID>").as("clean_text"),
      regexp_count(col("text"), lit(emailRe)).as("n_emails"),
      regexp_count(col("text"), lit(idRe)).as("n_ids"))
      .orderBy(col("doc_id"))
  }

  private val textPiiScrubSql =
    s"""WITH planted AS (
       |  SELECT doc_id,
       |    text ||
       |    CASE WHEN doc_id % 17 = 0
       |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       |         ELSE '' END ||
       |    CASE WHEN doc_id % 23 = 0
       |         THEN ' ref ' || CAST(doc_id % 900 + 100 AS VARCHAR)
       |              || '-' || CAST(doc_id % 90 + 10 AS VARCHAR)
       |              || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
       |         ELSE '' END AS text
       |  FROM documents)
       |SELECT doc_id,
       |  regexp_replace(regexp_replace(text,
       |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
       |    '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<ID>', 'g') AS clean_text,
       |  len(regexp_extract_all(text,
       |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
       |  len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS n_ids
       |FROM planted ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ export
  val queries: Map[String, Q] = Map(
    "text_pii_scrub" -> (textPiiScrub _),
    "text_fuzzy_sample" -> (textFuzzySample _),
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_fingerprint" -> (textFingerprint _),
    "text_tfidf_topk" -> (textTfidfTopk _),
    "text_rarity_score" -> (textRarityScore _),
    "corpus_length_histogram" -> (corpusLengthHistogram _),
    "text_curation_pipeline" -> (textCurationPipeline _),
    "text_sample_stratified" -> (textSampleStratified _),
    "text_ngram_topk" -> (textNgramTopk _),
    "text_pack_shards" -> (textPackShards _),
    "text_shuffle_pack" -> (textShufflePack _),
    "text_shuffle_pack_epoch1" -> (textShufflePackEpoch1 _),
    "text_sample_mixture" -> (textSampleMixture _),
    "text_repetition" -> (textRepetition _),
    "corpus_domain_report" -> (corpusDomainReport _))

  val oracles: Map[String, String] = Map(
    "text_pii_scrub" -> textPiiScrubSql,
    "text_fuzzy_sample" -> textFuzzySampleSql,
    "text_tokens" -> textTokensSql,
    "text_quality" -> textQualitySql,
    "text_langid" -> textLangidSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_tfidf_topk" -> textTfidfTopkSql,
    "text_rarity_score" -> textRarityScoreSql,
    "corpus_length_histogram" -> corpusLengthHistogramSql,
    "text_curation_pipeline" -> textCurationPipelineSql,
    "text_sample_stratified" -> textSampleStratifiedSql,
    "text_ngram_topk" -> textNgramTopkSql,
    "text_pack_shards" -> textPackShardsSql,
    "text_shuffle_pack" -> textShufflePackSql,
    "text_shuffle_pack_epoch1" -> textShufflePackEpoch1Sql,
    "text_sample_mixture" -> textSampleMixtureSql,
    "text_repetition" -> textRepetitionSql,
    "corpus_domain_report" -> corpusDomainReportSql)
}
