package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Partition-pruned layout + columnar/text format roundtrips. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("partitioned write prunes non-matching partitions at read") {
    val out = java.nio.file.Files.createTempDirectory("layout").toString + "/events"
    Layout.writeEventsPartitioned(spark, sf, out)
    val df = Layout.readEventType(spark, out, "click")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition filter in:\n$plan")
    // pruned read returns exactly the partition's rows
    val expected = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(df.count() === expected)
    // directory layout is hive-style
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("event_type=")))
  }

  test("documents roundtrip identically through orc, json, and csv") {
    val base = java.nio.file.Files.createTempDirectory("fmt").toString
    val docs = graft.Tables.documents(spark, sf)
    val canonical = docs.orderBy("doc_id").collect().toSeq

    docs.write.mode("overwrite").orc(s"$base/orc")
    assert(spark.read.orc(s"$base/orc").orderBy("doc_id").collect().toSeq === canonical)

    docs.write.mode("overwrite").json(s"$base/json")
    val viaJson = spark.read.schema(docs.schema).json(s"$base/json")
    assert(viaJson.orderBy("doc_id").collect().toSeq === canonical)

    docs.write.mode("overwrite")
      .option("quote", "\"").option("escape", "\"").option("header", "true")
      .csv(s"$base/csv")
    val viaCsv = spark.read.schema(docs.schema)
      .option("quote", "\"").option("escape", "\"").option("header", "true")
      .csv(s"$base/csv")
    assert(viaCsv.orderBy("doc_id").collect().toSeq === canonical)
  }
}
