package graft.cdc

import org.apache.spark.sql.types._

/** Wire-format schema for the CDC change stream.
  *
  * The reference's change stream is a Debezium envelope per Kafka message: a
  * self-describing JSON document `{schema, payload}` where `payload` is
  * `{before, after, source, op, ts_ms, transaction}` (see
  * `/root/reference/kafka-consumer-service/example/insert.json:169-195`). The
  * embedded per-message Connect `schema` block (`insert.json:2-168`) is ~90%
  * of the bytes and is never read by the consumer — so we declare a *narrow*
  * payload schema and let `from_json` prune at parse time: unparsed fields
  * cost nothing (schema-based pruning is the one manual optimization here;
  * at 100 TB of envelopes this is the difference between parsing ~10% of the
  * bytes and all of them).
  *
  * Types follow `/root/reference/mysql/init-script/script.sql:3-7` (source:
  * `INT NOT NULL` twice) and
  * `/root/reference/clickhouse/init-script/db-table-init.sql:11-17` (sink:
  * `UInt64` — Spark has no unsigned, so the replica widens to LongType; the
  * in-contract domain is 32-bit so no overflow is possible).
  */
object CdcSchema {

  /** Row image of `dev.invoice` — before/after payload struct. */
  val invoiceType: StructType = StructType(Seq(
    StructField("order_id", IntegerType, nullable = true),
    StructField("invoice_number", IntegerType, nullable = true)))

  /** The slice of `payload.source` the engine reads: `pos` is the monotonic
    * binlog order key (`example/insert.json:187`), `ts_ms` the source wall
    * clock. db/table kept for multi-table routing at scale.
    */
  val sourceType: StructType = StructType(Seq(
    StructField("ts_ms", LongType, nullable = true),
    StructField("pos", LongType, nullable = true),
    StructField("db", StringType, nullable = true),
    StructField("table", StringType, nullable = true)))

  /** `ddl`/`databaseName` identify Debezium *schema-change* events
    * (emitted because the reference config sets `include.schema.changes:
    * "true"`, `debezium-config-push.sh:21`; history topic `:20`). They are
    * parsed so ingress can ROUTE them: a schema-change payload has a
    * `source.pos` and no row images, which the nullity dispatch would
    * otherwise read as a TRUNCATE — a DDL event must never move the
    * truncate horizon.
    */
  def payloadTypeFor(imageType: StructType): StructType = StructType(Seq(
    StructField("before", imageType, nullable = true),
    StructField("after", imageType, nullable = true),
    StructField("source", sourceType, nullable = true),
    StructField("op", StringType, nullable = true),
    StructField("ts_ms", LongType, nullable = true),
    StructField("ddl", StringType, nullable = true),
    StructField("databaseName", StringType, nullable = true)))

  val payloadType: StructType = payloadTypeFor(invoiceType)

  /** Narrow envelope: only `payload` is parsed; the Connect `schema` block is
    * pruned by omission. [[envelopeTypeFor]] is the same narrow parse for an
    * arbitrary table's row-image type — the streaming ingress is
    * parameterized by it, not hard-wired to the invoice shape.
    */
  def envelopeTypeFor(imageType: StructType): StructType = StructType(Seq(
    StructField("payload", payloadTypeFor(imageType), nullable = true)))

  val envelopeType: StructType = envelopeTypeFor(invoiceType)

  /** Flat, engine-internal changelog schema — the normalized form every CDC
    * ingress (Kafka envelope, file fixture, synthesized batch changelog)
    * is brought into before the apply-fold. `pos` totally orders events per
    * key (the wire guarantees a monotonic binlog position); `ts_ms` is the
    * event wall clock (epoch millis).
    */
  val changelogType: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("op", StringType, nullable = true),
    StructField("before", invoiceType, nullable = true),
    StructField("after", invoiceType, nullable = true),
    StructField("ts_ms", LongType, nullable = true)))

  /** Table shape the apply-fold is parameterized over: primary-key column
    * plus value columns. The reference hard-codes these
    * (`main.py:52` column list, `main.py:57` PK name); here the reference's
    * per-op behaviors are *derived* from the spec instead of baked in:
    * UPDATE's SET-list = after minus PK (P6 — [[valueCols]]), the UPDATE
    * match predicate = PK equality (P7 — [[key]]), and DELETE's full-row
    * match (P8) is subsumed by max-pos nullity on the whole image.
    */
  final case class CdcTableSpec(key: String, valueCols: Seq[String]) {
    require(!valueCols.contains(key), s"key $key must not repeat in valueCols")
    /** P5: the full, order-stable column list (PK first). */
    def allCols: Seq[String] = key +: valueCols
  }

  /** The reference's `dev.invoice` table as a spec. */
  val invoiceSpec: CdcTableSpec = CdcTableSpec("order_id", Seq("invoice_number"))

  /** A ≥3-value-column shape (mixed int/string) exercising the generic
    * fold — no reference analogue; see `Changelog.syntheticWide`.
    */
  val wideType: StructType = StructType(Seq(
    StructField("order_id", IntegerType, nullable = true),
    StructField("invoice_number", IntegerType, nullable = true),
    StructField("amount", IntegerType, nullable = true),
    StructField("status", StringType, nullable = true)))

  val wideSpec: CdcTableSpec = CdcTableSpec("order_id", Seq("invoice_number", "amount", "status"))

  /** Typed view of a row image, for Dataset paths / stateful streaming. */
  final case class Invoice(order_id: Int, invoice_number: Int)

  /** Typed changelog event. Op classification in the engine is by
    * before/after nullity — the wire `op` field ('c'/'u'/'d'/'t') is carried
    * but, like the reference (`main.py:49-90` never reads it), not trusted
    * for dispatch.
    */
  final case class CdcEvent(
      pos: Long,
      op: Option[String],
      before: Option[Invoice],
      after: Option[Invoice],
      ts_ms: Option[Long])
}
