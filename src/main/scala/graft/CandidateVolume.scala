package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement utility for the df-split exact-overlap join: times the
  * full `overlap_pairs` computation with the production [[graft.operators.Dedup.HotDf]]
  * split against the pure count-join plan (`hotDf = Long.MaxValue` — the
  * pre-round-6 shape), on the given corpus and on a BOILERPLATE-INJECTED
  * copy of it (the same fixed sentence appended to a percentage of docs —
  * the hot-shingle skew the split exists for). Prints one JSON line per
  * (corpus, plan) cell; the skewed-corpus ratio is the number recorded in
  * README.
  *
  * Usage: `graft.CandidateVolume [sfDir] [boilerPct]`
  * (defaults /root/testdata/sf0.01, 5 — i.e. 5% of docs get boilerplate).
  */
object CandidateVolume {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.filter(_.nonEmpty).getOrElse("/root/testdata/sf0.01")
    val pct = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // boilerplate-injected copy: one fixed 12-token sentence appended to
    // pct% of docs → ~10 shingles whose df is pct% of the corpus
    val boilerDir = "/tmp/graft_boiler"
    val boiler = "terms of service apply to this content all rights reserved worldwide"
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("text",
        when(col("doc_id") % 100 < pct, concat(col("text"), lit(" " + boiler)))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$boilerDir/documents.parquet")

    def timePlan(d: String, hotDf: Long, tag: String): Long = {
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.overlapPairsPlan(spark, d, hotDf).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"corpus":"$d","plan":"$tag","hotDf":$hotDf,"pairs":$n,"sec":$sec%.2f}""")
      n
    }
    val a = timePlan(dir, operators.Dedup.HotDf, "df_split")
    val b = timePlan(dir, Long.MaxValue, "count_join")
    require(a == b, s"plan mismatch on clean corpus: $a vs $b")
    val c = timePlan(boilerDir, operators.Dedup.HotDf, "df_split")
    val d = timePlan(boilerDir, Long.MaxValue, "count_join")
    require(c == d, s"plan mismatch on boilerplate corpus: $c vs $d")
    spark.stop()
  }
}
