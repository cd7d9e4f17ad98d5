// Library-consumer demo: drive graft as an EXTERNAL dependency — no
// graft package, only its public API — through the workflow a
// training-data team actually runs:
//
//   1. CDC replica snapshot (the reference service's core contract)
//   2. corpus curation: quality gate -> minhash near-dup clusters ->
//      keep-best retention
//   3. deterministic epoch shuffle + packed shard order for the loader
//
// Compile and run against the built classes (no sbt needed; see
// examples/run_demo.sh):
//
//   java -cp "/opt/spark/jars/*" scala.tools.nsc.Main \
//     -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
//     -d /tmp/graft-demo examples/CurationDemo.scala
//   java $ADD_OPENS -cp "/tmp/graft-demo:target/scala-2.13/classes:/opt/spark/jars/*" \
//     CurationDemo /root/testdata/sf0.001
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-curation-demo")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. the reference's consistency contract: fold the changelog into
    //    a replica snapshot
    val snapshot = graft.SparkEntry.entry(spark)
    println(s"replica snapshot rows: ${snapshot.count()}")

    // 2. curation: keep the best member of every minhash near-dup
    //    cluster (full pipeline: shingles -> signatures -> banded LSH ->
    //    connected components -> max-quality retention)
    val kept = graft.operators.Dedup.dedupKeepBestMinhash(spark, sfDir)
    val clusters = kept.count()
    val multi = kept.filter(col("n_members") > 1).count()
    println(s"curated corpus: $clusters canonical docs ($multi real clusters)")

    // 3. deterministic training order over the curated ids — a pure
    //    function of (corpus, seed), resumable from (shard, pos)
    val docs = graft.Tables.documents(spark, sfDir)
      .join(kept.select(col("doc_id")), Seq("doc_id"))
    val epoch = graft.operators.TextAnalysis
      .shufflePackOf(docs, shards = 4L, seed = "demo-epoch-0")
    epoch.groupBy(col("shard")).agg(count(lit(1)).as("docs"),
        max(col("file_in_shard")).as("files"))
      .orderBy(col("shard"))
      .collect()
      .foreach(r => println(s"shard ${r.getLong(0)}: ${r.getLong(1)} docs, " +
        s"${r.getLong(2) + 1} packed file(s)"))

    spark.stop()
  }
}
