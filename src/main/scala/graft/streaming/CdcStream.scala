package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.cdc.{CdcApply, CdcSchema, Changelog}

/** The live CDC path: Structured Streaming over the envelope stream,
  * sharing every transformation with the batch replay (SURVEY.md §3 —
  * "batch-mode replay over the changelog = same code path").
  *
  * Topology (mirrors `/root/reference/kafka-consumer-service/main.py:34-93`):
  *
  *   source (kafka / files) ──► tombstone filter ──► narrow from_json
  *        ├──► audit sink: every non-tombstone envelope, appended raw
  *        │    (reference `main.py:44-45` — the event-sourcing log)
  *        └──► foreachBatch: incremental keyed merge into replica state
  *
  * In production the source is `format("kafka")` with
  * `subscribe=source.dev.invoice` (reference `main.py:25-29`); tests use the
  * file source with the same value-column contract, which exercises an
  * identical plan. Exactly-once: the merge is idempotent (max-pos-per-key
  * over a monotonic binlog position), so at-least-once redelivery and
  * micro-batch replay after checkpoint recovery converge to the same state.
  */
object CdcStream {

  /** Per-key typed state for [[typedLatestPerKey]]: latest position and
    * after-image (None = delete marker, kept for idempotent re-merge).
    */
  final case class KeyState(pos: Long, after: Option[CdcSchema.Invoice])

  /** State/snapshot schema: one row per key — the latest event's position
    * and after-image (null after = tombstone marker kept for idempotent
    * re-merge), plus one `key IS NULL` row carrying the truncate horizon.
    */

  /** Kafka ingress (production): value bytes → normalized changelog. */
  def fromKafka(spark: SparkSession, bootstrap: String, topic: String): DataFrame = {
    val raw = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "latest") // reference main.py:27 auto_offset_reset
      .load()
      .select(col("value").cast("string").as("value"),
        (col("timestamp").cast("double") * 1000).cast("long").as("kafka_ts"))
    Changelog.fromEnvelopeJson(raw, "value", Some("kafka_ts"))
  }

  /** File ingress (tests / replay): one envelope JSON per line. */
  def fromFiles(spark: SparkSession, dir: String): DataFrame =
    Changelog.fromEnvelopeJson(
      spark.readStream.text(dir).withColumnRenamed("value", "raw"), "raw")

  /** Audit-log projection of the raw stream — every non-tombstone message,
    * truncates included, re-serialized (reference P4: `to_json` of the
    * payload paired with the ingest timestamp).
    */
  def auditProjection(changelog: DataFrame): DataFrame =
    changelog.select(
      col("ts_ms").as("timestamp"),
      to_json(struct(col("pos"), col("op"), col("before"), col("after"))).as("kafka_message"))

  /** One incremental merge step: fold a micro-batch of changelog events
    * into the keyed state. Pure (DataFrame → DataFrame), so it is unit-
    * testable and usable from `foreachBatch` verbatim.
    *
    * Semantics: new truncate horizon = max(old, batch's); rows (state and
    * batch alike) at or below the horizon are erased; survivors resolve by
    * max pos per key. Delete markers stay in state so a late-redelivered
    * older event cannot resurrect a deleted key — which makes the step
    * idempotent and insensitive to batch boundaries (proven by
    * CdcPropertySpec: any split of the changelog folds to the same state).
    */
  def mergeBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    val newHorizon = batch
      .filter(col("before").isNull && col("after").isNull)
      .agg(coalesce(max(col("pos")), lit(Long.MinValue)).as("bh"))
    val oldHorizon = state
      .filter(col("key").isNull)
      .agg(coalesce(max(col("pos")), lit(Long.MinValue)).as("sh"))
    val horizon = broadcast(
      newHorizon.crossJoin(oldHorizon)
        .select(greatest(col("bh"), col("sh")).as("h")))

    val batchEvents = batch
      .filter(!(col("before").isNull && col("after").isNull))
      .select(
        coalesce(col("after.order_id"), col("before.order_id")).as("key"),
        col("pos"), col("after"))
      // key IS NULL is reserved for the horizon row; the ingress gate
      // (Changelog.isValidEnvelope) already rejects keyless events, this
      // keeps a hand-built batch from poisoning the horizon
      .filter(col("key").isNotNull)
    val stateEvents = state.filter(col("key").isNotNull)
      .select(col("key"), col("pos"), col("after"))

    val merged = stateEvents.unionByName(batchEvents)
      .crossJoin(horizon)
      .filter(col("pos") > col("h"))
      .groupBy(col("key"))
      .agg(max_by(struct(col("pos"), col("after")), col("pos")).as("m"))
      .select(col("key"), col("m.pos").as("pos"), col("m.after").as("after"))

    val horizonRow = horizon.select(
      lit(null).cast("int").as("key"), col("h").as("pos"),
      lit(null).cast(CdcSchema.invoiceType).as("after"))
    merged.unionByName(horizonRow)
  }

  /** Empty state (schema only). */
  def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("after", CdcSchema.invoiceType))))

  /** Replica view of a state: live keys, reference column shape. */
  def snapshotOf(state: DataFrame): DataFrame =
    state.filter(col("key").isNotNull && col("after").isNotNull)
      .select(
        col("after.order_id").cast("long").as("order_id"),
        col("after.invoice_number").cast("long").as("invoice_number"))
      .orderBy(col("order_id"))

  /** Run a changelog stream to a versioned parquet state + audit log.
    *
    * Each micro-batch: (1) append the audit projection; (2) merge into the
    * keyed state, written to `stateDir/v=<batchId+1>` — versioned dirs make
    * the write atomic-by-rename and replay after checkpoint recovery
    * idempotent (a re-run batch overwrites its own version, and merge
    * idempotency makes the content identical).
    */
  def run(changelog: DataFrame, auditDir: String, stateDir: String,
          checkpointDir: String): StreamingQuery = {
    changelog.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        val spark = rawBatch.sparkSession
        val batch = rawBatch.persist() // the body runs several actions; scan once
        try {
          writeAudit(batch, auditDir, batchId)
          val prev = latestStateVersion(spark, stateDir) match {
            case Some((v, df)) =>
              // A state version newer than this batch means the checkpoint was
              // reset against a retained stateDir — reading max(v) would then
              // silently freeze the fold. Fail loudly instead.
              require(v <= batchId + 1,
                s"stateDir has version v=$v but the stream is at batch $batchId: " +
                  "checkpointDir and stateDir must be retained (or cleared) together")
              df
            case None => emptyState(spark)
          }
          mergeBatch(prev, batch)
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$stateDir/v=${batchId + 1}")
        } finally batch.unpersist()
        ()
      }
      .start()
  }

  /** Idempotent audit append: each micro-batch owns the partition dir
    * `batch=<id>` and overwrites it, so a checkpoint-recovery replay of the
    * batch cannot double-append events (a plain append would). Readers see
    * the extra `batch` partition column.
    */
  private def writeAudit(batch: DataFrame, auditDir: String, batchId: Long): Unit =
    auditProjection(batch).write.mode("overwrite")
      .parquet(s"$auditDir/batch=$batchId")

  /** Typed per-key state via `flatMapGroupsWithState` — the
    * KeyValueGroupedDataset alternative to the foreachBatch merge for
    * latencies where per-batch parquet rewrites are too coarse. State per
    * key is (pos, after): max-pos-wins, delete markers retained, so
    * redelivery is idempotent — identical semantics to [[mergeBatch]].
    *
    * Scope note: cross-key TRUNCATE cannot be expressed inside a
    * per-key state function (groups are isolated by design); feed this
    * from `CdcApply.afterTruncateHorizon` (batch) or handle truncates as
    * a state-store generation upstream. Emits (order_id, invoice_number
    * nullable) per updated key, update-mode.
    */
  def typedLatestPerKey(changelog: org.apache.spark.sql.Dataset[CdcSchema.CdcEvent])
      : DataFrame = {
    import CdcStream.KeyState
    import changelog.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    changelog
      .groupByKey(e => e.after.orElse(e.before).map(_.order_id).getOrElse(Int.MinValue))
      .flatMapGroupsWithState[KeyState, (Int, Option[Int])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Int, events: Iterator[CdcSchema.CdcEvent], state: GroupState[KeyState]) =>
          val incoming = events.maxByOption(_.pos)
          val best = (incoming.map(e => KeyState(e.pos, e.after)).toSeq ++
            state.getOption.toSeq).maxByOption(_.pos)
          best match {
            case Some(b) if !state.getOption.exists(_.pos >= b.pos) =>
              state.update(b)
              Iterator.single((key, b.after.map(_.invoice_number)))
            case _ => Iterator.empty
          }
      }
      .toDF("order_id", "invoice_number")
  }

  /** Bucketed incremental state: the 100 TB shape of the merge.
    *
    * [[run]] rewrites the whole state per micro-batch — O(|state|), fine
    * for small replicas, wrong at scale. Here the state lives as parquet
    * hash-partitioned by `p = pmod(key, nBuckets)` (horizon row in
    * `p = -1`); each micro-batch:
    *
    *  1. computes the touched buckets from the batch's keys (a ≤ nBuckets
    *     driver-side collect);
    *  2. reads ONLY those buckets back (partition-pruned scan);
    *  3. merges (same [[mergeBatch]] fold — buckets partition the
    *     keyspace, so per-bucket merge ≡ global merge);
    *  4. rewrites only the touched partition dirs via dynamic partition
    *     overwrite.
    *
    * Cost per batch is O(|touched buckets|) ≈ O(|delta|), independent of
    * total state size. A TRUNCATE touches every bucket by definition (the
    * horizon invalidates rows everywhere) — that one rare event pays a
    * full rewrite, which is exactly what a truncate is.
    *
    * Durability scope: the staged write guarantees a durable recompute
    * source, but the final dynamic-overwrite commit is not atomic ACROSS
    * bucket directories — a crash inside that commit window can leave a
    * touched bucket deleted-but-not-replaced, and the re-run's `prev` then
    * misses that bucket's untouched keys. Single-writer deployments
    * tolerate this by re-seeding from the audit log; a production
    * deployment at scale puts this state on a transactional table format
    * (a manifest-committed table) where the same merge is one atomic
    * commit. Crash mid-write:
    * the checkpoint re-runs the batch and the idempotent merge converges
    * to the same content (same guarantee as the versioned writer).
    */
  def runPartitioned(changelog: DataFrame, auditDir: String, stateDir: String,
                     checkpointDir: String, nBuckets: Int = 64): StreamingQuery = {
    changelog.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        val spark = rawBatch.sparkSession
        val batch = rawBatch.persist() // 3 more actions below; scan the source once
        try {
        writeAudit(batch, auditDir, batchId)

        val hasTruncate = batch
          .filter(col("before").isNull && col("after").isNull).limit(1).count() > 0
        val batchBuckets = batch
          .select(pmod(coalesce(col("after.order_id"), col("before.order_id"))
            .cast("long"), lit(nBuckets.toLong)).as("p"))
          .filter(col("p").isNotNull).distinct()
          .collect().map(_.getLong(0))

        val stateExists = hadoopFs(spark, stateDir)
          .exists(new org.apache.hadoop.fs.Path(stateDir))
        val prev =
          if (!stateExists) emptyState(spark).withColumn("p", lit(-1L))
          else {
            val all = spark.read.parquet(stateDir)
            if (hasTruncate) all // horizon moved: every bucket is affected
            else all.filter(col("p").isin((batchBuckets :+ -1L).map(Long.box): _*))
          }

        // Stage the merged delta to a side directory FIRST. The final write
        // overwrites the very files `prev` reads from, so the merge must be
        // durably materialized with a recompute path that does not touch
        // stateDir — cached blocks are not enough (eviction/executor loss
        // mid-write would recompute from deleted files). The staging dir is
        // only removed after the state write commits; a crash in between
        // leaves it behind to be harmlessly overwritten by the re-run.
        // repartition by p: one file per bucket dir, not buckets×partitions
        // slivers.
        val staging = s"$stateDir.staging"
        mergeBatch(prev.drop("p"), batch)
          .withColumn("p",
            when(col("key").isNull, lit(-1L))
              .otherwise(pmod(col("key").cast("long"), lit(nBuckets.toLong))))
          .repartition(col("p"))
          .write.mode("overwrite").partitionBy("p").parquet(staging)

        // Dynamic overwrite only replaces partitions present in the output —
        // a truncate can leave a bucket with zero rows, which dynamic mode
        // would silently keep stale. Truncate batches therefore use a
        // static (full-dir) overwrite, which is also semantically what a
        // truncate is. Per-write option: no session-conf mutation to leak
        // or race.
        spark.read.parquet(staging)
          .write
          .option("partitionOverwriteMode", if (hasTruncate) "static" else "dynamic")
          .mode("overwrite").partitionBy("p").parquet(stateDir)
        hadoopFs(spark, staging)
          .delete(new org.apache.hadoop.fs.Path(staging), true)
        } finally batch.unpersist()
        ()
      }
      .start()
  }

  /** FileSystem for a path via the session's Hadoop conf — works for
    * local, HDFS, and object-store state dirs alike (java.io.File would
    * silently see "no state" on any non-local URI and discard prior state).
    */
  private def hadoopFs(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Replica snapshot of a bucketed state dir. */
  def partitionedSnapshot(spark: SparkSession, stateDir: String): DataFrame =
    snapshotOf(spark.read.parquet(stateDir).drop("p"))

  /** Newest state version under `stateDir`, if any. */
  def latestStateVersion(spark: SparkSession, stateDir: String): Option[(Long, DataFrame)] = {
    val fs = hadoopFs(spark, stateDir)
    val root = new org.apache.hadoop.fs.Path(stateDir)
    if (!fs.exists(root)) None
    else {
      val versions = fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
        .map(_.getPath.getName.stripPrefix("v=").toLong)
      if (versions.isEmpty) None
      else {
        val v = versions.max
        Some((v, spark.read.parquet(s"$stateDir/v=$v")))
      }
    }
  }
}
