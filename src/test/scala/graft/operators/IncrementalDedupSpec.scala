package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Incremental dedup against the persisted fingerprint index: survivor
  * semantics, partition-pruned incrementality (untouched buckets carry
  * forward by manifest reference), crash-replay idempotency, and the
  * reset-sequence guard — the properties the one-shot DuckDB oracle for
  * `dedup_incremental` cannot see.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp() =
    java.nio.file.Files.createTempDirectory("increm-spec").toString

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("first batch: in-batch dups collapse to min doc_id; all fps admitted") {
    val dir = tmp()
    val out = IncrementalDedup.ingest(spark, dir,
      docsOf(1L -> "aa bb", 2L -> "aa bb", 3L -> "cc dd"), batchId = 0)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.values.toSet === Set(1L, 3L))
    assert(IncrementalDedup.snapshot(spark, dir).count() === 2)
  }

  test("second batch admits only never-seen content; index accumulates") {
    val dir = tmp()
    IncrementalDedup.ingest(spark, dir,
      docsOf(1L -> "aa bb", 3L -> "cc dd"), batchId = 0)
    val out = IncrementalDedup.ingest(spark, dir,
      docsOf(10L -> "aa bb", 11L -> "ee ff"), batchId = 1)
      .collect().map(r => r.getLong(1)).toSet
    assert(out === Set(11L)) // "aa bb" already indexed
    val snap = IncrementalDedup.snapshot(spark, dir)
      .collect().map(_.getLong(1)).toSet
    assert(snap === Set(1L, 3L, 11L))
  }

  test("untouched buckets carry forward by reference, not rewrite") {
    val dir = tmp()
    // enough distinct docs that batch 1 populates many buckets
    val batch1 = docsOf((1L to 40L).map(i => i -> s"w$i x$i y$i"): _*)
    IncrementalDedup.ingest(spark, dir, batch1, batchId = 0, nBuckets = 16)
    // one new doc: touches at most a few buckets
    IncrementalDedup.ingest(spark, dir, docsOf(100L -> "zz qq"),
      batchId = 1, nBuckets = 16)
    val m = graft.streaming.BucketState.readManifest(spark, dir).buckets
    assert(m.values.flatten.toSet.contains(1L), "untouched buckets must still reference v=1")
    val v2 = graft.streaming.BucketState.listBuckets(spark, s"$dir/v=2")
    assert(v2.nonEmpty && v2.size < m.size,
      s"v=2 must hold only the touched buckets, got ${v2.size} of ${m.size}")
  }

  test("replaying a committed batch is an idempotent no-op with identical survivors") {
    val dir = tmp()
    IncrementalDedup.ingest(spark, dir, docsOf(1L -> "aa bb"), batchId = 0)
    val first = IncrementalDedup.ingest(spark, dir,
      docsOf(5L -> "cc dd", 6L -> "aa bb"), batchId = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val replay = IncrementalDedup.ingest(spark, dir,
      docsOf(5L -> "cc dd", 6L -> "aa bb"), batchId = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(replay === first)
    assert(IncrementalDedup.snapshot(spark, dir).count() === 2)
  }

  test("replaying a committed batchId with DIFFERENT input fails loudly") {
    val dir = tmp()
    IncrementalDedup.ingest(spark, dir, docsOf(1L -> "aa bb"), batchId = 0)
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.ingest(spark, dir, docsOf(2L -> "totally other"),
        batchId = 0)
    }
    assert(e.getMessage.contains("fingerprint"))
  }

  test("streaming ingress: one ingest per micro-batch through a real stream") {
    import org.apache.spark.sql.types._
    val in = java.nio.file.Files.createTempDirectory("increm-stream").toString
    val dir = tmp()
    val ckpt = tmp()
    def write(name: String, rows: (Long, String)*) =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/$name"),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n").getBytes)
    write("a.json", 1L -> "aa bb", 2L -> "cc dd")
    write("b.json", 5L -> "aa bb", 6L -> "ee ff")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
    val q = IncrementalDedup.runIngest(stream, dir, ckpt)
    q.processAllAvailable(); q.stop()
    val snap = IncrementalDedup.snapshot(spark, dir)
      .collect().map(_.getLong(1)).toSet
    assert(snap === Set(1L, 2L, 6L)) // doc 5 is duplicate content across batches
  }

  test("runIngest compactEvery bounds segments while the stream runs") {
    import org.apache.spark.sql.types._
    val in = java.nio.file.Files.createTempDirectory("increm-autoc").toString
    val dir = tmp(); val ckpt = tmp()
    (0 until 4).foreach { b =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/d$b.json"),
        s"""{"doc_id":${b + 1},"text":"w$b x$b"}""".getBytes)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = IncrementalDedup.runIngest(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in),
      dir, ckpt, compactEvery = 2)
    q.processAllAvailable(); q.stop()
    assert(IncrementalDedup.snapshot(spark, dir).count() === 4)
    val live = graft.streaming.BucketState.readManifest(spark, dir)
      .buckets.values.flatten.toSet
    assert(live.size <= 2, s"segments not compacted: $live")
  }

  test("adaptive policy: compacts when MEASURED segments/bucket reach the bound") {
    import org.apache.spark.sql.types._
    val in = java.nio.file.Files.createTempDirectory("increm-adapt").toString
    val dir = tmp(); val ckpt = tmp()
    (0 until 4).foreach { b =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/d$b.json"),
        s"""{"doc_id":${b + 1},"text":"w$b x$b"}""".getBytes)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // nBuckets=1 forces every batch onto one bucket: segments grow 1/batch
    val observed = scala.collection.mutable.ListBuffer.empty[Int]
    val q = IncrementalDedup.runIngest(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in),
      dir, ckpt, compactWhenSegments = 2, nBuckets = 1,
      onBatch = (_, segs) => { observed.synchronized { observed += segs }; () })
    q.processAllAvailable(); q.stop()
    assert(IncrementalDedup.snapshot(spark, dir).count() === 4)
    // the bound held at every observation point, and was actually hit
    // (compaction fired, not vacuously bounded)
    assert(observed.nonEmpty && observed.max === 2, s"observed=$observed")
    val live = graft.streaming.BucketState.readManifest(spark, dir)
      .buckets.values.flatten.toSet
    assert(live.size === 1, s"expected compacted index, live versions: $live")
  }

  test("adaptive policy: does NOT compact while drops land in disjoint buckets") {
    import org.apache.spark.sql.types._
    val in = java.nio.file.Files.createTempDirectory("increm-adapt2").toString
    val dir = tmp(); val ckpt = tmp()
    (0 until 4).foreach { b =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/d$b.json"),
        s"""{"doc_id":${b + 1},"text":"w$b x$b"}""".getBytes)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // 64 buckets, four distinct single-doc drops: each touches its own
    // bucket (deterministic — xxhash64 over fixed fps), so measured
    // segments/bucket stays 1 and the adaptive policy never rewrites —
    // where compactEvery=2 would have compacted the index twice
    val q = IncrementalDedup.runIngest(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in),
      dir, ckpt, compactWhenSegments = 2, nBuckets = 64)
    q.processAllAvailable(); q.stop()
    assert(IncrementalDedup.snapshot(spark, dir).count() === 4)
    val live = graft.streaming.BucketState.readManifest(spark, dir)
      .buckets.values.flatten.toSet
    assert(live.size === 4, s"adaptive policy must not have compacted: $live")
  }

  test("cadence and adaptive compaction policies are mutually exclusive") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .json(java.nio.file.Files.createTempDirectory("increm-excl").toString)
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.runIngest(stream, tmp(), tmp(),
        compactEvery = 2, compactWhenSegments = 2)
    }
    assert(e.getMessage.contains("at most one compaction policy"))
  }

  test("compaction folds many versions into one; reads and ingest continue") {
    val dir = tmp()
    // three batches → manifest references up to three version dirs
    IncrementalDedup.ingest(spark, dir, docsOf(1L -> "aa bb"), batchId = 0, nBuckets = 4)
    IncrementalDedup.ingest(spark, dir, docsOf(2L -> "cc dd"), batchId = 1, nBuckets = 4)
    IncrementalDedup.ingest(spark, dir, docsOf(3L -> "ee ff"), batchId = 2, nBuckets = 4)
    val before = IncrementalDedup.snapshot(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    graft.streaming.BucketState.compact(spark, dir)
    val m = graft.streaming.BucketState.readManifest(spark, dir)
    assert(m.buckets.values.flatten.toSet.size === 1, "one live version after compaction")
    val after = IncrementalDedup.snapshot(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after === before)
    // superseded version dirs are gone
    val vdirs = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.startsWith("v=")).toSet
    assert(vdirs === Set(s"v=${m.buckets.values.flatten.toSet.head}"))

    // a crash-replay of the LAST pre-compaction batch is still recognized
    // as committed (the fp line survives compaction verbatim)
    val replay = IncrementalDedup.ingest(spark, dir, docsOf(3L -> "ee ff"), batchId = 2,
      nBuckets = 4)
    assert(replay.collect().map(_.getLong(1)).toSet === Set(3L))
    assert(IncrementalDedup.snapshot(spark, dir).count() === 3)

    // ingest keeps working: physical dirs renumber past the compaction
    IncrementalDedup.ingest(spark, dir, docsOf(9L -> "gg hh"), batchId = 3, nBuckets = 4)
    assert(IncrementalDedup.snapshot(spark, dir).count() === 4)
  }

  test("null text/id rows are dropped, not written to an unparseable bucket dir") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = tmp()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val withNulls = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "aa bb"), Row(2L, null), Row(null, "cc dd")),
      schema)
    val out = IncrementalDedup.ingest(spark, dir, withNulls, batchId = 0)
      .collect().map(_.getLong(1)).toSet
    assert(out === Set(1L))
    // a second batch still works (no Hive default-partition dir to choke on)
    IncrementalDedup.ingest(spark, dir, docsOf(5L -> "ee ff"), batchId = 1)
    assert(IncrementalDedup.snapshot(spark, dir).count() === 2)
  }

  test("property: ANY batch split converges to first-batch-then-min-id winners") {
    import org.scalacheck.{Gen, Prop}
    import org.scalatest.prop.Configuration
    val words = Gen.oneOf("aa", "bb", "cc")
    val docGen = for { a <- words; b <- words } yield s"$a $b" // 9 contents
    val corpusGen = for {
      texts <- Gen.listOfN(12, docGen)
      cut1 <- Gen.choose(0, texts.length)
      cut2 <- Gen.choose(0, texts.length)
    } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      math.min(cut1, cut2), math.max(cut1, cut2))
    val prop = Prop.forAll(corpusGen) { case (docs, c1, c2) =>
      val dir = tmp()
      val batches = Seq(docs.take(c1), docs.slice(c1, c2), docs.drop(c2))
      batches.zipWithIndex.foreach { case (b, i) =>
        IncrementalDedup.ingest(spark, dir, docsOf(b: _*), batchId = i.toLong,
          nBuckets = 4)
      }
      val got = IncrementalDedup.snapshot(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // reference: per content, the winner is the min doc_id of the
      // EARLIEST batch containing it (lexicographic on (batch, doc_id))
      val expected = docs
        .map { case (id, t) =>
          val batch = batches.indexWhere(_.exists(_._1 == id))
          (t, (batch, id))
        }
        .groupBy(_._1).map { case (_, rows) => rows.map(_._2).min._2 }
        .toSet
      got.values.toSet == expected
    }
    val cfg = org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(8)
    val res = org.scalacheck.Test.check(cfg, prop)
    assert(res.passed, res.status.toString)
  }

  test("driver queries reclaim their per-run index dir on success") {
    val sf = TestSpark.sf0001
    def run(name: String, q: (org.apache.spark.sql.SparkSession, String, String)
        => org.apache.spark.sql.DataFrame): Unit = {
      val idx = java.nio.file.Files.createTempDirectory(s"hygiene-$name")
      assert(q(spark, sf, idx.toString).count() > 0, s"$name returned no rows")
      assert(!java.nio.file.Files.exists(idx),
        s"$name left its per-run index dir behind: $idx")
    }
    run("exact", IncrementalDedup.dedupIncrementalAt)
    run("neardup", IncrementalNearDup.nearDupIncrementalAt)
    run("keepbest", IncrementalKeepBest.keepBestIncrementalAt)
  }

  test("chunked ingest equals one-shot exact dedup on the fixture corpus") {
    val sf = TestSpark.sf0001
    val got = IncrementalDedup.dedupIncremental(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = graft.Tables.documents(spark, sf)
      .select(graft.functions.TextFns.fingerprint(col("text")).as("fp"),
        col("doc_id"))
      .groupBy("fp").agg(min("doc_id").as("doc_id"))
      .orderBy("fp")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }
}
