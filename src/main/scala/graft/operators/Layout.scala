package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-layout utilities: partitioned writes for partition-pruned reads.
  *
  * At 100 TB the cheapest scan is the one that never happens: writing a
  * fact table partitioned by its dominant filter column turns
  * `WHERE event_type = 'x'` into directory pruning — the scan lists one
  * partition's files and reads nothing else (`PartitionFilters` in the
  * plan, asserted by LayoutSpec). Hive-style layout, no catalog needed.
  */
object Layout {

  /** Write `events` Hive-partitioned by event_type (+ sorted within
    * partitions by ts so min/max row-group stats make ts range filters
    * effective too).
    *
    * The sort leads with the partition column: a partitioned write
    * requires child ordering on its partition columns, so sorting by ts
    * alone would make Spark insert its own Sort(event_type) on top —
    * paying a second sort AND losing the ts clustering whenever that sort
    * spills (spill-merge does not preserve the input order of equal keys).
    * (event_type, ts) satisfies the required prefix, so one sort does
    * both jobs and the ts clustering is contractual.
    */
  def writeEventsPartitioned(s: SparkSession, sfDir: String, out: String): Unit =
    Tables.events(s, sfDir)
      .repartition(col("event_type"))
      .sortWithinPartitions(col("event_type"), col("ts"))
      .write.mode("overwrite")
      .partitionBy("event_type")
      .parquet(out)

  /** Read back with a partition filter — prunes at the directory level. */
  def readEventType(s: SparkSession, out: String, eventType: String): DataFrame =
    s.read.parquet(out).filter(col("event_type") === eventType)
}
