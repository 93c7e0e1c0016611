package graft.sources

import graft.{OpModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-layout scan paths (SURVEY.md §4): static partition
  * pruning and dynamic partition pruning (DPP), demonstrated by writing
  * the events table out partitioned by `event_type` — the layout a
  * 100 TB ingest would use — and reading it back.
  *
  *  - q62: a literal partition predicate never touches the other
  *    partition directories (`PartitionFilters` in the scan, asserted in
  *    PlanShapeSpec).
  *  - q63: the partition predicate arrives only through a join with a
  *    filtered dimension; Spark inserts a dynamic pruning subquery so
  *    the fact scan still skips partitions at runtime.
  */
object PartitionedOps extends OpModule {

  /** Writes events partitioned by event_type under a per-sfDir temp path
    * (once per JVM) and returns its location. */
  def partitionedEventsDir(s: SparkSession, d: String): String = synchronized {
    val key = d.replaceAll("[^a-zA-Z0-9]", "_")
    val dir = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_part_events_$key")
    if (!java.nio.file.Files.exists(dir)) {
      // write to a scratch dir, then atomic-rename into place: a crashed
      // partial write must never be mistaken for the cached copy
      val scratchRoot = java.nio.file.Files.createTempDirectory("graft_part_scratch")
      val scratch = scratchRoot.resolve("events")
      try {
        Tables(s, d, "events")
          .write.mode("overwrite").partitionBy("event_type")
          .parquet(scratch.toString)
        try java.nio.file.Files.move(scratch, dir,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          // lost a cross-process race: someone else completed it. On
          // Linux a rename onto an existing non-empty dir surfaces as
          // DirectoryNotEmptyException (ENOTEMPTY), not
          // FileAlreadyExistsException — accept any FileSystemException
          // as long as the winner's copy is in place.
          case e: java.nio.file.FileSystemException
            if java.nio.file.Files.exists(dir) =>
        }
      } finally { // the scratch tree is garbage on every path post-move
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.exists(scratchRoot)) {
          java.nio.file.Files.walk(scratchRoot).iterator.asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
    }
    dir.toString
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_partition_pruning" -> { (s, d) =>
      s.read.parquet(partitionedEventsDir(s, d))
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"),
             sum(col("value").cast("decimal(18,6)")).cast("double")
               .as("sum_value"))
        .orderBy("user_id")
    },

    "q63_dynamic_pruning" -> { (s, d) =>
      import s.implicits._
      // tiny dimension over the partition column; only 2 of 5 categories
      // survive the filter, so DPP should skip 3 partition dirs at
      // runtime. The dim must be a file scan (not a LocalRelation, whose
      // filter would be constant-folded away) for the DPP rule to see a
      // selective predicate.
      val dimDir = s"${sys.props("java.io.tmpdir")}/graft_event_dim"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dimDir))) {
        Seq(("click", "interactive"), ("view", "interactive"),
            ("purchase", "transactional"), ("signup", "lifecycle"),
            ("error", "diagnostic")).toDF("et", "category")
          .write.mode("overwrite").parquet(dimDir)
      }
      val dim = s.read.parquet(dimDir)
      s.read.parquet(partitionedEventsDir(s, d))
        .join(dim.where(col("category") === "interactive"),
              col("event_type") === col("et"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")
    }
  )

  def oracles: Map[String, String] = Map(
    "q62_partition_pruning" ->
      """SELECT user_id, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q63_dynamic_pruning" ->
      """SELECT event_type, count(*) AS cnt FROM events
        |WHERE event_type IN ('click', 'view')
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
