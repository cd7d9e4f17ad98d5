package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput soak for the incremental dedup index: generate an N-doc
  * corpus (ScaleProbe's deterministic generator — bounded dup clusters,
  * so admitted counts stay predictable), split it into K parquet drops,
  * stream them through `IncrementalDedup.runIngest` (one manifest-
  * committed ingest per micro-batch against the persisted fingerprint
  * index), then assert the final registry EQUALS a one-shot exact dedup
  * of the whole corpus and print one JSON line with docs/s.
  *
  * What this demonstrates beyond IncrementalDedupSpec's unit fixtures:
  * the index survives K successive commits at volume (manifest churn, GC,
  * bucket rewrite amplification) and ingest throughput stays flat as the
  * index grows — the O(batch), never O(state), claim measured rather
  * than argued.
  *
  * Usage: `graft.IngestSoak [nDocs] [nBatches] [workDir] [compactEvery]
  * [compactWhenSegments]` — at most one compaction policy nonzero.
  */
object IngestSoak {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(100000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val base = args.lift(2).filter(_.nonEmpty).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-ingest-soak").toString)
    val compactEvery = args.lift(3).map(_.toInt).getOrElse(0)
    val compactWhenSegments = args.lift(4).map(_.toInt).getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    ScaleProbe.writeDocuments(spark, s"$base/corpus", nDocs)
    val corpus = spark.read.parquet(s"$base/corpus/documents.parquet")
      .select(col("doc_id"), col("text"))
    // K doc_id-range drops, one parquet file dir each (the "crawl drops")
    val per = (nDocs + nBatches - 1) / nBatches
    (0 until nBatches).foreach { b =>
      corpus.filter(col("doc_id") >= b * per && col("doc_id") < (b + 1) * per)
        // one file per drop: the file source triggers per FILE, so without
        // the coalesce each drop's ~cpus part files become that many tiny
        // micro-batches and per-batch commit overhead swamps the measurement
        .coalesce(1)
        .write.mode("overwrite").parquet(f"$base/drops/d$b%03d")
    }

    val indexDir = s"$base/index"
    // worst read amplification actually hit during the run (the final
    // manifest alone can't show it — a compaction may have just folded)
    val observedMax = new java.util.concurrent.atomic.AtomicInteger(0)
    val t0 = System.nanoTime()
    val q = IncrementalDedup.runIngest(
      spark.readStream
        .schema(corpus.schema)
        .option("maxFilesPerTrigger", 1) // one drop per micro-batch
        .parquet(s"$base/drops/d*"),
      indexDir, s"$base/ckpt", compactEvery = compactEvery,
      compactWhenSegments = compactWhenSegments,
      onBatch = (_, segs) => { observedMax.getAndAccumulate(segs, math.max); () })
    q.processAllAvailable(); q.stop()
    val sec = (System.nanoTime() - t0) / 1e9

    val admitted = operators.IncrementalDedup.snapshot(spark, indexDir)
    val expected = corpus
      .select(functions.TextFns.fingerprint(col("text")).as("fp"), col("doc_id"))
      .groupBy("fp").agg(min("doc_id").as("doc_id"))
    val diff = admitted.exceptAll(expected).count() +
      expected.exceptAll(admitted).count()
    val buckets = streaming.BucketState.readManifest(spark, indexDir).buckets
    val versions = buckets.values.flatten.toSet.size
    // read amplification: segments a snapshot/anti-join must merge per
    // bucket — the quantity compactEvery exists to bound
    val maxSegs = if (buckets.isEmpty) 0 else buckets.values.map(_.size).max
    println(s"""{"metric":"ingest_soak","docs":$nDocs,"batches":$nBatches,""" +
      s""""compact_every":$compactEvery,""" +
      s""""compact_when_segments":$compactWhenSegments,""" +
      s""""sec":${math.round(sec * 1000) / 1000.0},""" +
      s""""docs_per_sec":${math.round(nDocs / sec)},""" +
      s""""admitted":${admitted.count()},"snapshot_diff":$diff,""" +
      s""""live_versions":$versions,"max_segments_per_bucket":$maxSegs,""" +
      s""""max_segments_observed":${observedMax.get()}}""")
    spark.stop()
  }

  private val IncrementalDedup = operators.IncrementalDedup
}
