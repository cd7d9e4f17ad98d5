package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator pack; each pack pairs its Spark
  * queries with DuckDB oracle SQL over the same parquet tables. Keys and
  * output column names match between the two (the driver's compare sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The CDC replica snapshot — the reference's raison d'être
    * (`/root/reference/tests/test_consistency.py:56-75`).
    */
  def entry(spark: SparkSession): DataFrame =
    cdc.CdcApply.snapshot(cdc.Changelog.synthetic(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    cdc.CdcQueries.queries ++ operators.Relational.queries ++
      operators.TextAnalysis.queries ++ operators.Dedup.queries ++
      operators.Similarity.queries ++ multimodal.Multimodal.queries ++
      operators.Skew.queries ++ operators.AsofJoin.queries ++
      operators.RangeJoin.queries ++ operators.IncrementalDedup.queries ++
      operators.IncrementalNearDup.queries ++
      operators.IncrementalKeepBest.queries ++
      operators.IncrementalVecIndex.queries ++ operators.FuzzyJoin.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for genuinely non-SQL ops
    * (driver records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    cdc.CdcQueries.oracles ++ operators.Relational.oracles ++
      operators.TextAnalysis.oracles ++ operators.Dedup.oracles ++
      operators.Similarity.oracles ++ multimodal.Multimodal.oracles ++
      operators.Skew.oracles ++ operators.AsofJoin.oracles ++
      operators.RangeJoin.oracles ++ operators.IncrementalDedup.oracles ++
      operators.IncrementalNearDup.oracles ++
      operators.IncrementalKeepBest.oracles ++
      operators.IncrementalVecIndex.oracles ++ operators.FuzzyJoin.oracles
}
