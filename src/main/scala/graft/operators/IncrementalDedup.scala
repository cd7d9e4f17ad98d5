package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.TextFns
import graft.streaming.BucketState

/** Incremental exact dedup against a PERSISTED fingerprint index — the
  * ingest shape a training-data pipeline actually runs: the curated
  * corpus already holds N fingerprints; a new crawl drop arrives; admit
  * only never-seen content WITHOUT rescanning the corpus.
  *
  * The index is [[BucketState]] bucket-partitioned parquet
  * (`p = pmod(xxhash64(fp), nBuckets)`): an incoming batch reads only the
  * buckets its own fingerprints hash into (partition-pruned paths) and
  * APPENDS one immutable segment holding only its survivors — prior
  * segments are never rewritten (LSM-style; `BucketState.compact` folds
  * the segment list back to one). Both I/O sides are O(batch): at 100 TB
  * of state a 1 GB drop reads just the fingerprint column store of the
  * touched buckets, never the corpus, and writes only its own new
  * fingerprints. The `_CURRENT` manifest rename is the single commit
  * point; survivors are staged BEFORE it, so a crash-replay of a
  * committed batch returns the identical survivor set (guarded by the
  * recorded input fingerprint, exactly like the CDC replica's
  * `runPartitioned`).
  *
  * One-shot equivalence: chunked ingest in ascending doc_id order lands
  * on the same (fp → min doc_id) set as `Dedup`'s exact pass over the
  * union — pinned by IncrementalDedupSpec.
  */
object IncrementalDedup {

  private val survivorSchema = StructType(Seq(
    StructField("fp", StringType), StructField("doc_id", LongType)))

  private def bucketOf(fp: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(fp), lit(nBuckets.toLong))

  private def emptyIdx(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      survivorSchema.add("p", LongType))

  /** Stored tombstone ids `(doc_id)` — one pruned read of the reserved
    * bucket (see [[Retraction]]).
    */
  private def storedTombs(spark: SparkSession, indexDir: String,
                          m: BucketState.Manifest): DataFrame =
    BucketState.readBuckets(spark, indexDir,
      m.buckets.view.filterKeys(_ == Retraction.TombBucket).toMap,
      emptyIdx(spark))
      .select(col("doc_id"))

  /** Admit `docs` (columns `doc_id`, `text`) against the index at
    * `indexDir`: returns the survivors — one `(fp, doc_id)` row per
    * content fingerprint never seen before, min doc_id within the batch —
    * and durably appends them to the index. `batchId` must be the
    * caller's monotonically increasing batch sequence (a streaming
    * foreachBatch id, or 0,1,2… for a batch backfill); replaying a
    * committed batchId with identical input is an idempotent no-op that
    * returns the same survivors, with different input it fails loudly.
    */
  /** `retractIds`: an optional takedown set committed WITH this batch —
    * tombstones staged in the same version dir and the same manifest
    * rename (see [[Retraction]] for the declared semantics). The
    * retraction applies BEFORE this batch's admissions: a fingerprint
    * whose stored winner is named here reads as never-seen, so this
    * batch (and every later one) can readmit the content.
    */
  def ingest(spark: SparkSession, indexDir: String, docs: DataFrame,
             batchId: Long, nBuckets: Int = 64,
             retractIds: Option[DataFrame] = None): DataFrame = {
    val newVersion = batchId + 1
    val survivorsDir = s"$indexDir/survivors/$newVersion"
    val retract = retractIds.map(Retraction.normIds(_).persist())

    // in-batch winners: min doc_id per fingerprint (window, not
    // groupBy+self-join — one pass over the batch). Null text/id rows are
    // dropped up front: a null fingerprint has no content to dedup on,
    // and its null bucket would land in Hive's default-partition dir,
    // which the numeric bucket listing cannot parse.
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val batchFps = docs
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"),
        TextFns.fingerprint(col("text")).as("fp"))
      .withColumn("min_doc", min(col("doc_id")).over(wFp))
      .filter(col("doc_id") === col("min_doc"))
      .select(col("fp"), col("doc_id"))
      .persist()
    try {
      // one action for fingerprint + touched buckets — the second full
      // pass over the batch was pure per-commit fixed overhead
      val (dataFp, touched) = BucketState.inputFingerprintAndBuckets(
        batchFps, bucketOf(col("fp"), nBuckets))
      val batchFp = Retraction.mixFp(dataFp,
        retract.map(BucketState.inputFingerprint))

      // Leased manifest read + locked fresh-read commit: the concurrent-
      // writer protocol (applyLsmBatch pattern) that makes a BACKGROUND
      // compactConcurrent safe. The lease pins every referenced version
      // dir against the compaction's GC while the anti-join below is
      // still scanning it; the locked commit merges this batch's segment
      // into the manifest AS IT IS at commit time, so a swap that landed
      // mid-ingest is preserved rather than clobbered.
      val (m, lease) = BucketState.readManifestLeased(spark, indexDir)
      try {
        // Stale-sequence + committed-replay guards shared with the CDC
        // replica (BucketState.checkBatch): a committed replay is durable —
        // survivors were staged before the commit rename — but only if the
        // recorded input fingerprint proves this really is the same batch.
        BucketState.checkBatch(m, batchId, batchFp) match {
          case BucketState.AlreadyCommitted => ()
          case BucketState.Proceed(proposed) =>
            val physicalVersion = BucketState.reserveVersion(indexDir, proposed)
            try {
              // manifest-keyed session view: per drop the registry read
              // is one batch-sized delta leaf, the touched prune an
              // in-memory filter (see BucketState.readStoreView)
              val prev = BucketState
                .readStoreView(spark, indexDir, m, emptyIdx(spark))
                .filter(col("p").isin(touched.toSeq: _*))
              // surviving view: stored tombstones ∪ this batch's own
              // retraction set mask the fingerprint registry BEFORE the
              // batch's admissions (on replay the batch's tombstones are
              // already stored — same set, same view, bit-identical).
              // Takedown-free stores (no tombstone bucket in the
              // manifest, no retraction in-flight) skip the mask — the
              // r14 read path, restored (Retraction.hasTombs)
              val tombs: Option[DataFrame] =
                if (retract.isEmpty && !Retraction.hasTombs(m)) None
                else Some(retract.fold(storedTombs(spark, indexDir, m))(r =>
                  storedTombs(spark, indexDir, m).unionByName(r).distinct()))
              val prevLive = Retraction.maskIfAny(prev, tombs, "doc_id")

              val survivors = batchFps
                .join(prevLive.select(col("fp")), Seq("fp"), "left_anti")
                .persist()

              // ONE staging job: the batch's index SEGMENT (append-only
              // LSM — the new version dir holds ONLY this batch's
              // survivors; prior segments are never rewritten, so bytes
              // written per batch are O(batch), not O(touched state);
              // the first formulation rewrote prev ∪ survivors per
              // touched bucket — quadratic total writes, measured by
              // graft.IngestSoak) PLUS the batch's durable survivor
              // ANSWER riding the same write under the reserved staging
              // bucket, renamed out before the commit (claimAnswer —
              // the r15 form ran these as two jobs per batch). Both
              // branches read the SAME persisted frame; the manifest
              // rename below stays the only commit point, so crash
              // consistency is unchanged. Read amplification grows one
              // segment per batch until a compaction folds them.
              val segRows = survivors
                .withColumn("p", bucketOf(col("fp"), nBuckets))
                .unionByName(survivors
                  .withColumn("p", lit(BucketState.AnswerBucket)))
              // tombstone rows ride the same segment and the same
              // commit: (fp = null, doc_id, p = TombBucket)
              retract.fold(segRows)(r => segRows.unionByName(
                  r.select(lit(null).cast(StringType).as("fp"),
                    col("doc_id"), lit(Retraction.TombBucket).as("p"))))
                .repartition(col("p"))
                .write.mode("overwrite").partitionBy("p")
                .parquet(s"$indexDir/v=$physicalVersion")
              survivors.unpersist()
              BucketState.claimAnswer(spark, s"$indexDir/v=$physicalVersion",
                survivorsDir, survivorSchema)

              val outBuckets =
                BucketState.listBuckets(spark, s"$indexDir/v=$physicalVersion")
              BucketState.manifestLock(indexDir).synchronized {
                val mNow = BucketState.readManifest(spark, indexDir)
                val next = outBuckets.foldLeft(mNow.buckets)((acc, b) =>
                  acc.updated(b, acc.getOrElse(b, Set.empty[Long]) + physicalVersion))
                BucketState.commitManifest(spark, indexDir, next,
                  Some(newVersion -> batchFp))
              }
            } finally BucketState.releaseVersion(indexDir, physicalVersion)
        }
      } finally BucketState.releaseReads(lease)
      // GC AFTER the lease release (reads are done): this batch's own
      // lease would otherwise spare every dir a mid-ingest background
      // fold superseded — and since no later GC is guaranteed to run,
      // the folded dirs would leak on disk past the last batch.
      // Conditional: an append-only ingest creates no garbage of its
      // own, so the sweep runs only when a fold left lease-spared dirs
      // behind (or on the process's first call — crash orphans).
      BucketState.gcVersionsIfDirty(spark, indexDir)
    } finally { batchFps.unpersist(); retract.foreach(_.unpersist()) }
    spark.read.schema(survivorSchema).parquet(survivorsDir)
  }

  /** Streaming ingress for the index: each micro-batch of documents is
    * one [[ingest]] call keyed by the checkpoint's batchId — the replay
    * guarantees above are exactly Structured Streaming's foreachBatch
    * contract (a crash between the manifest commit and the checkpoint
    * commit replays the batch; the fingerprint check makes it a no-op).
    *
    * Two compaction policies, at most one active (both fold the
    * accumulated segments back to one dir from the stream's own thread,
    * so the single-writer contract holds):
    *
    *  - `compactEvery` = N: fixed cadence, every N batches. Bounds read
    *    amplification at N segments/bucket, but fires on schedule even
    *    when the state shape doesn't need it — a narrow drop that touched
    *    3 of 64 buckets still triggers a whole-index rewrite.
    *  - `compactWhenSegments` = K: ADAPTIVE — compact when the MEASURED
    *    max segments-per-bucket (one tiny manifest read per batch)
    *    reaches K. Read amplification is bounded at K by construction,
    *    and the rewrite runs only when the state shape demands it: skewed
    *    or narrow drops accumulate segments per bucket slowly, so the
    *    index can absorb many more batches between rewrites than any
    *    cadence guess for the same bound. This is the production knob;
    *    cadence remains for deterministic-schedule tests.
    *
    * `onBatch` (batchId, maxSegmentsPerBucket-after-ingest) is a probe
    * hook for soaks/specs; default no-op.
    */
  /** `asyncCompaction = true` dispatches the due fold to a background
    * thread ([[BucketState.maybeCompactConcurrent]]) instead of running
    * it from the stream's thread — ingest commits keep landing O(batch)
    * while the index folds, made safe by the locked leased-read commit
    * protocol [[ingest]] now uses (the CDC LSM contract, carried over).
    * Default stays synchronous: deterministic segment counts for specs.
    */
  def runIngest(docs: DataFrame, indexDir: String, checkpointDir: String,
                compactEvery: Int = 0, compactWhenSegments: Int = 0,
                nBuckets: Int = 64,
                onBatch: (Long, Int) => Unit = (_, _) => (),
                asyncCompaction: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery == 0 || compactWhenSegments == 0,
      "set at most one compaction policy: compactEvery (cadence) or " +
        "compactWhenSegments (adaptive)")
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        ingest(spark, indexDir, batch, batchId, nBuckets = nBuckets)
        val m = BucketState.readManifest(spark, indexDir)
        val maxSegs =
          if (m.buckets.isEmpty) 0 else m.buckets.values.map(_.size).max
        onBatch(batchId, maxSegs)
        val due =
          (compactEvery > 0 && (batchId + 1) % compactEvery == 0) ||
            (compactWhenSegments > 0 && maxSegs >= compactWhenSegments)
        if (due)
          BucketState.maybeCompactConcurrent(spark, indexDir, asyncCompaction,
            resolve = Retraction.foldTombstones(_, "doc_id"))
        ()
      }
      .start()
  }

  /** The full deduped corpus registry: every admitted (fp, doc_id),
    * resolved through the committed manifest, minus stored takedowns.
    *
    * MATERIALIZED under a read lease: the lazy form resolved its file
    * paths at plan time and read them at the caller's first action —
    * an async compaction's GC could delete exactly those dirs in
    * between (the ingest path has been lease-protected since the
    * concurrent-fold work; the serving path was the remaining gap).
    * The registry is corpus-shaped by definition, so the eager
    * checkpoint is the same full pass any consumer was about to run.
    */
  def snapshot(spark: SparkSession, indexDir: String): DataFrame = {
    val (m, lease) = BucketState.readManifestLeased(spark, indexDir)
    try {
      val all = BucketState.readBuckets(spark, indexDir, m.buckets,
        emptyIdx(spark))
      // data rows (fp non-null — tombstones carry a null fp) minus every
      // stored tombstone: the surviving registry (mask skipped entirely
      // on a takedown-free store — Retraction.hasTombs)
      Retraction.maskIfAny(all.filter(col("fp").isNotNull),
          if (Retraction.hasTombs(m)) Some(storedTombs(spark, indexDir, m))
          else None, "doc_id")
        .select(col("fp"), col("doc_id"))
        .localCheckpoint(eager = true)
    } finally BucketState.releaseReads(lease)
  }

  // --------------------------------------------------- driver query
  /** Driver-facing demonstration: ingest the documents table in two
    * doc_id-ordered chunks through a fresh index, then publish the final
    * registry. Chunking by ascending id makes the incremental result
    * provably equal to a one-shot exact dedup (min doc_id per
    * fingerprint), which is exactly what the DuckDB oracle computes —
    * the equality IS the correctness statement for the incremental path.
    */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame =
    dedupIncrementalAt(s, dir,
      java.nio.file.Files.createTempDirectory("graft-increm").toString)

  private[graft] def dedupIncrementalAt(s: SparkSession, dir: String,
                                        indexDir: String): DataFrame = {
    val docs = graft.Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val ids = docs.agg(min("doc_id"), max("doc_id")).collect()(0)
    val mid = (ids.getLong(0) + ids.getLong(1)) / 2
    // 16 buckets at demo scale: bucket count trades pruning granularity
    // against files-per-version; a production index sizes it to state
    // volume (buckets ~ state / target-file-size), not batch volume
    ingest(s, indexDir, docs.filter(col("doc_id") <= mid), batchId = 0,
      nBuckets = 16).count()
    ingest(s, indexDir, docs.filter(col("doc_id") > mid), batchId = 1,
      nBuckets = 16).count()
    // materialize the answer, then reclaim the per-run index dir: the
    // snapshot frame lazily reads the dir, so delete only after the
    // eager checkpoint (repeated verify/bench runs would otherwise
    // accrete dead index state under /tmp)
    val out = snapshot(s, indexDir).orderBy(col("fp"))
      .localCheckpoint(eager = true)
    graft.Shared.deleteDirTree(indexDir)
    out
  }

  private val dedupIncrementalSql =
    """WITH docs AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents)
      |SELECT md5(array_to_string(toks, ' ')) AS fp,
      |       CAST(MIN(doc_id) AS BIGINT) AS doc_id
      |FROM docs GROUP BY 1 ORDER BY fp""".stripMargin

  /** Driver-facing demonstration of the STREAMING read path: the same
    * corpus in FOUR ascending quartile chunks. From the third chunk on,
    * the ingest's stored read runs against the manifest-keyed session
    * view ([[graft.streaming.BucketState.readStoreView]] — the second
    * EXTENDING read is the streaming signature that builds it; the
    * fourth chunk appends one delta leaf), so the DuckDB equality gates
    * the cached-read path itself, where the 2-chunk `dedup_incremental`
    * stays on the direct read by the same heuristic. Ascending chunks
    * keep the final registry provably equal to the one-shot answer, so
    * the oracle is shared.
    */
  def dedupIncrementalStream(s: SparkSession, dir: String): DataFrame = {
    val indexDir =
      java.nio.file.Files.createTempDirectory("graft-increm-stream").toString
    val docs = graft.Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val ids = docs.agg(min("doc_id"), max("doc_id")).collect()(0)
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val cuts = Seq(lo - 1) ++ (1 to 3).map(i => lo + (hi - lo) * i / 4) ++
      Seq(hi)
    cuts.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      ingest(s, indexDir,
        docs.filter(col("doc_id") > a && col("doc_id") <= b),
        batchId = i, nBuckets = 16).count()
    }
    val out = snapshot(s, indexDir).orderBy(col("fp"))
      .localCheckpoint(eager = true)
    graft.Shared.deleteDirTree(indexDir)
    out
  }

  /** Driver-facing demonstration of DELETION: chunk 1 (ids ≤ mid)
    * ingests, then chunk 2 arrives WITH a takedown of every chunk-1 id
    * divisible by 5 — the tombstones commit with chunk 2's batch and
    * apply before its admissions, so content whose stored winner was
    * retracted is readmitted by its first chunk-2 carrier. The final
    * surviving registry must equal the sequence replay the DuckDB
    * oracle computes: phase-1 winners minus the takedown, plus phase-2
    * winners over the not-surviving fingerprints. The NON-RETROACTIVE
    * edge is load-bearing: a chunk-1 duplicate of a retracted winner is
    * NOT resurrected (its row was never stored), which is exactly what
    * the oracle's phase split encodes — a final-state filter would get
    * this wrong.
    */
  def dedupIncrementalRetract(s: SparkSession, dir: String): DataFrame =
    dedupIncrementalRetractAt(s, dir,
      java.nio.file.Files.createTempDirectory("graft-increm-ret").toString)

  private[graft] def dedupIncrementalRetractAt(s: SparkSession, dir: String,
                                               indexDir: String): DataFrame = {
    val docs = graft.Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val ids = docs.agg(min("doc_id"), max("doc_id")).collect()(0)
    val mid = (ids.getLong(0) + ids.getLong(1)) / 2
    ingest(s, indexDir, docs.filter(col("doc_id") <= mid), batchId = 0,
      nBuckets = 16).count()
    val takedown = docs.filter(col("doc_id") <= mid &&
      pmod(col("doc_id"), lit(5)) === 0).select(col("doc_id"))
    ingest(s, indexDir, docs.filter(col("doc_id") > mid), batchId = 1,
      nBuckets = 16, retractIds = Some(takedown)).count()
    val out = snapshot(s, indexDir).orderBy(col("fp"))
      .localCheckpoint(eager = true)
    graft.Shared.deleteDirTree(indexDir)
    out
  }

  // Sequence replay: mid and the takedown set are deterministic in the
  // data, so the oracle recomputes both phases — surviving phase-1
  // winners, then phase-2 winners over fingerprints with no surviving
  // registry row.
  private val dedupIncrementalRetractSql =
    """WITH docs AS (
      |  SELECT doc_id,
      |         md5(array_to_string(string_split_regex(trim(text), '\s+'), ' ')) AS fp
      |  FROM documents),
      |mid AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM docs),
      |w1 AS (
      |  SELECT fp, MIN(doc_id) AS doc_id FROM docs, mid
      |  WHERE doc_id <= m GROUP BY fp),
      |surv AS (SELECT fp, doc_id FROM w1 WHERE doc_id % 5 <> 0),
      |w2 AS (
      |  SELECT fp, MIN(doc_id) AS doc_id FROM docs, mid
      |  WHERE doc_id > m AND fp NOT IN (SELECT fp FROM surv)
      |  GROUP BY fp)
      |SELECT fp, CAST(doc_id AS BIGINT) AS doc_id
      |FROM (SELECT * FROM surv UNION ALL SELECT * FROM w2)
      |ORDER BY fp""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_incremental_stream" -> (dedupIncrementalStream _),
    "dedup_incremental_retract" -> (dedupIncrementalRetract _))

  val oracles: Map[String, String] = Map(
    "dedup_incremental" -> dedupIncrementalSql,
    // the 4-chunk stream form converges to the same one-shot answer —
    // the shared oracle IS the statement that chunking (and the cached
    // read path it exercises) is invisible in the result
    "dedup_incremental_stream" -> dedupIncrementalSql,
    "dedup_incremental_retract" -> dedupIncrementalRetractSql)
}
