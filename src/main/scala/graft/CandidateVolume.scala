package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement utility for the exact-overlap build: times the full
  * `overlap_pairs` computation with the production prefix-filtered plan
  * ([[graft.operators.Dedup.overlapPairsPlan]]) against the brute Σ df²
  * count join ([[graft.operators.Dedup.overlapPairsBrute]]), on the
  * given corpus and on a BOILERPLATE-INJECTED copy of it (the same fixed
  * sentence appended to a percentage of docs — the hot-shingle skew the
  * prefix filter exists for). Prints one JSON line per (corpus, plan)
  * cell; the skewed-corpus ratio is the number recorded in README.
  *
  * Usage: `graft.CandidateVolume [sfDir] [boilerPct]`
  * (defaults /root/testdata/sf0.01, 5 — i.e. 5% of docs get boilerplate).
  *
  * ADVERSARIAL mode — `graft.CandidateVolume tinyboiler [nDocs]`
  * (default 5000, the sf0.1 document count): a synthetic corpus of TINY
  * docs that are 100% boilerplate — every doc is 4 sentences drawn
  * deterministically from a pool of 12, so EVERY shingle is hot
  * (df ≈ nDocs/3) and each doc's prefix is a large fraction of the whole
  * doc. This is the one shape the prefix filter gets the least leverage
  * on: near-all pairs share a prefix shingle while few clear the 0.8/0.9
  * thresholds, so the cell measures pure candidate-join fan-out with
  * small qualifying output. Only the prefix plan is timed here — the
  * count join on an all-hot corpus is the known-quadratic shape the
  * prefix filter replaced (it times out by construction; that result is
  * already recorded for the injected corpus).
  */
object CandidateVolume {
  def main(args: Array[String]): Unit = {
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

    def timePlan(d: String, plan: (SparkSession, String) => DataFrame,
                 tag: String): Long = {
      val t0 = System.nanoTime()
      val n = plan(spark, d).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"corpus":"$d","plan":"$tag","pairs":$n,"sec":$sec%.2f}""")
      n
    }
    val prefixPlan = (s: SparkSession, d: String) =>
      operators.Dedup.overlapPairsPlan(s, d)
    val brutePlan = (s: SparkSession, d: String) =>
      operators.Dedup.overlapPairsBrute(s, d)

    if (args.headOption.contains("tinyboiler")) {
      val nDocs = args.lift(1).map(_.toInt).getOrElse(5000)
      // per-run scratch dir: runs with different sizes never clobber
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_tinyboiler_$nDocs"
      val pool = Seq(
        "terms of service apply to this content all rights reserved worldwide",
        "click here to subscribe to our newsletter for weekly updates today",
        "copyright notice this page is protected by applicable international law",
        "all trademarks are property of their respective owners in all regions",
        "by continuing to browse you accept our use of tracking cookies",
        "this site uses cookies to improve your experience and our service",
        "please enable javascript in your browser to view this page correctly",
        "sign in to your account to continue reading the full article",
        "the opinions expressed here are those of the authors alone entirely",
        "for customer support contact our help desk via the form below",
        "unauthorized reproduction of this material is strictly prohibited by law",
        "prices and availability are subject to change without any prior notice")
      // 4 deterministic pseudo-random sentences per doc: multiplicative
      // stepping by a unit coprime to 12 gives 4 DISTINCT indices per doc
      // and a different subset mix across docs — no RNG, replayable
      val poolCol = array(pool.map(lit): _*)
      spark.range(nDocs.toLong).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 4).map(k =>
          element_at(poolCol,
            (pmod(col("id") * 7 + lit(k) * (col("id") % 5 + 1), lit(12)) + 1).cast("int"))): _*)
          .as("text"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      timePlan(dir, prefixPlan, "prefix")
      spark.stop()
      return
    }

    val dir = args.headOption.filter(_.nonEmpty).getOrElse("/root/testdata/sf0.01")
    val pct = args.lift(1).map(_.toInt).getOrElse(5)
    // scratch dir derived from the input corpus and injection rate, so
    // concurrent or successive runs with different fixtures never
    // clobber each other's corpus mid-measurement
    val boilerDir = s"${System.getProperty("java.io.tmpdir")}/graft_boiler_" +
      s"${new java.io.File(dir).getName}_$pct"
    val boiler = "terms of service apply to this content all rights reserved worldwide"
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("text",
        when(col("doc_id") % 100 < pct, concat(col("text"), lit(" " + boiler)))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$boilerDir/documents.parquet")

    val a = timePlan(dir, prefixPlan, "prefix")
    val b = timePlan(dir, brutePlan, "count_join")
    require(a == b, s"plan mismatch on clean corpus: $a vs $b")
    val c = timePlan(boilerDir, prefixPlan, "prefix")
    val d = timePlan(boilerDir, brutePlan, "count_join")
    require(c == d, s"plan mismatch on boilerplate corpus: $c vs $d")
    spark.stop()
  }
}
