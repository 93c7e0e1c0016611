package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** The incremental-OPTIMIZE contract behind q166
  * ([[graft.sources.PartitionedOps.optimizeDayPartitions]]): the
  * maintenance pass rewrites exactly the over-threshold partitions,
  * leaves compacted partitions byte-untouched, preserves table content
  * across generations, and is idempotent. */
class IncCompactSpec extends SparkSpecBase {

  test("incremental OPTIMIZE: rewrites only fragmented partitions, preserves content, idempotent") {
    val root = Files.createTempDirectory("graft_incopt").resolve("tbl")
    val boundary = lit("2024-01-16").cast("date")
    val ev = Tables(spark, sf, "events").withColumn("day", to_date(col("ts")))
    def ingest(part: org.apache.spark.sql.DataFrame): Unit = part
      .repartition(4, pmod(col("event_id"), lit(4)))
      .write.mode("append").partitionBy("day").parquet(root.toString)
    def snapshot(): Map[String, Set[String]] =
      Files.list(root).iterator.asScala
        .filter(_.getFileName.toString.startsWith("day=")).map { p =>
          p.getFileName.toString -> Files.list(p).iterator.asScala
            .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
        }.toMap

    // generation 1: history lands fragmented, OPTIMIZE compacts it all
    ingest(ev.where(col("day") < boundary))
    val r1 = graft.sources.PartitionedOps
      .optimizeDayPartitions(spark, root.toString)
    assert(r1.nonEmpty && r1.forall(_ < "day=2024-01-16"), r1.toString)
    val gen1 = snapshot()
    assert(gen1.values.forall(_.size == 1), "gen 1 not fully compacted")

    // generation 2: new days land; the incremental pass must rewrite
    // EXACTLY them and leave every gen-1 file name in place
    ingest(ev.where(col("day") >= boundary))
    val r2 = graft.sources.PartitionedOps
      .optimizeDayPartitions(spark, root.toString)
    assert(r2.nonEmpty && r2.forall(_ >= "day=2024-01-16"),
           s"incremental pass touched gen-1 partitions: $r2")
    val after = snapshot()
    assert(gen1.forall { case (k, v) => after(k) == v },
           "gen-1 files disturbed by the incremental pass")
    assert(after.values.forall(_.size == 1), "gen 2 not fully compacted")

    // content invariant: two generations of maintenance are a pure
    // re-organization of the original table
    val got = spark.read.parquet(root.toString)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"content drift: $got vs $want")

    // idempotence: nothing left over threshold, third pass is a no-op
    assert(graft.sources.PartitionedOps
             .optimizeDayPartitions(spark, root.toString).isEmpty)
  }
}
