package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic parquet tables (TESTDATA.md).
  *
  * Scans go through `spark.read.parquet` so Catalyst's DSv2 pushdown applies:
  * any filter/projection a query adds reaches the parquet reader as
  * `PushedFilters` / a narrowed `ReadSchema`. Nothing is cached here — each
  * query declares its own plan and the vectorized reader + whole-stage
  * codegen handle the rest.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * natively ([PARQUET_TYPE_ILLEGAL]). Read nanos as long via the legacy
    * flag and rebuild a proper (microsecond) timestamp — floor-truncation,
    * matching DuckDB's ns→coarser conversions exactly.
    */
  def events(s: SparkSession, d: String): DataFrame = synchronized {
    // synchronized: the flag lives in SESSION conf and is consulted at
    // schema resolution inside `load` — two threads calling events()
    // concurrently (parallel test suites share one session) can interleave
    // one caller's restore into the other's resolution window, yielding a
    // TIMESTAMP_NTZ ts that breaks the ns→µs rebuild below
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try {
      val raw = load(s, d, "events")
      raw.schema("ts").dataType match {
        // TIMESTAMP(NANOS) physical int64 (pre-r8 driver testdata), read
        // under nanosAsLong: rebuild µs with floor division (not `div`,
        // which truncates toward zero — DuckDB's ns→µs conversion floors,
        // and the two differ for pre-1970 values)
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
        // native timestamp[us] (r8+ driver testdata): no rebuild; cast
        // NTZ→TIMESTAMP so downstream plans see the same type the nanos
        // path produced (session tz is UTC — identical instants)
        case _ =>
          raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      }
    } finally {
      // the flag is consulted at schema resolution (the read above); restore
      // so later reads of other nanos files fail loudly instead of silently
      // yielding long columns
      prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
