package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measure the 128-bit simhash recall trade against the jaccard-0.8 exact
  * near-dup pairs, as a function of the hamming threshold — the operating
  * knob `dedupSimhash` fixes at 7 (the largest radius the 8×16-bit bands
  * recall EXACTLY, by pigeonhole).
  *
  * Two curves per corpus:
  *   - `intrinsic(t)`: fraction of exact jaccard-0.8 pairs within hamming
  *     ≤ t of each other — what a perfect candidate generator would recall
  *     at threshold t. Pure property of the hash on this corpus; the
  *     ceiling for ANY banding scheme at that radius.
  *   - `banded(t)`: fraction recalled by the SHIPPED candidate generator
  *     (8×16-bit band equality) at threshold t. Equal to intrinsic for
  *     t ≤ 7 (pigeonhole: ≤ 7 flipped bits cannot touch all 8 bands);
  *     for t > 7 the gap is what a wider scheme (16×16 bands over a
  *     256-bit signature — same plan shape, bands stay 16-bit so bucket
  *     occupancy stays corpus/65536) would buy back.
  *
  * Cost: one signature aggregation over the corpus plus one join of the
  * (small) exact-pair set onto the signatures — no all-pairs stage, so it
  * runs at any corpus size the exact oracle itself can run at.
  *
  * Usage: `graft.SimhashRecall [docsDir ...]` (default: the 500-doc spec
  * corpus sf0.001 and the 5000-doc sf0.1). Prints one JSON line per
  * corpus; the round-9 measured table lives in `dedupSimhash`'s scaladoc.
  */
object SimhashRecall {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")
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
    dirs.foreach(d => println(measure(spark, d)))
    spark.stop()
  }

  def measure(s: SparkSession, dir: String): String = {
    val exact = Dedup.dedupNgramJaccard(s, dir)
      .select(col("doc_a"), col("doc_b"))
    val sigs = Dedup.simhashSignatures(s, dir)
    // hamming + shared-band flag for each exact pair (pair-count-sized)
    val pairs = exact
      .join(sigs.select(col("doc_id").as("doc_a"),
        col("sim_hi").as("hi_a"), col("sim_lo").as("lo_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"),
        col("sim_hi").as("hi_b"), col("sim_lo").as("lo_b")), "doc_b")
      .select(
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).as("hamming"),
        // shares a band ⇔ some 16-bit slice of the xor is all-zero
        exists(sequence(lit(0), lit(7)), b =>
          when(b < 4,
              call_function("shiftrightunsigned",
                col("lo_a").bitwiseXOR(col("lo_b")), lit(16) * b))
            .otherwise(
              call_function("shiftrightunsigned",
                col("hi_a").bitwiseXOR(col("hi_b")), lit(16) * (b - 4)))
            .bitwiseAND(lit(0xFFFFL)) === 0L).as("shares_band"))
      .collect()
    val n = pairs.length.max(1)
    val thresholds = Seq(3, 5, 7, 9, 11, 13, 15)
    val rows = thresholds.map { t =>
      val intrinsic = pairs.count(_.getAs[Int]("hamming") <= t)
      val banded = pairs.count(r =>
        r.getAs[Int]("hamming") <= t && r.getAs[Boolean]("shares_band"))
      f""""t$t":{"intrinsic":${intrinsic.toDouble / n}%.3f,"banded":${banded.toDouble / n}%.3f}"""
    }
    s"""{"metric":"simhash_recall","dir":"$dir","exact_pairs":${pairs.length},${rows.mkString(",")}}"""
  }
}
