package graft.streaming

import graft.OpModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming demo (SURVEY.md §2B stream_demo): the q36
  * tumbling-window aggregation re-run as a real `readStream` →
  * watermark → windowed agg → memory-sink pipeline with
  * `Trigger.AvailableNow`. Batch/stream parity means it shares q36's
  * oracle.
  *
  * Scale notes: in production this runs micro-batch with a RocksDB
  * state store; the 10-minute watermark bounds window state and drops
  * late rows (exercised with a two-batch file source in
  * StreamingSpec — with AvailableNow over a static file nothing is
  * late, so parity with the batch oracle holds exactly).
  */
object StreamOps extends OpModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_demo" -> { (s, d) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawSchema = s.read.parquet(s"$d/events.parquet").schema
      // The file stream source wants a directory; stage the input file
      // into one. Stable per-sfDir path: repeated runs reuse it instead
      // of leaking a fresh temp dir per invocation.
      val dir = java.nio.file.Paths.get(
        s"${sys.props("java.io.tmpdir")}/graft_stream_" +
          d.replaceAll("[^a-zA-Z0-9]", "_"))
      java.nio.file.Files.createDirectories(dir)
      val target = dir.resolve("events.parquet")
      if (!java.nio.file.Files.exists(target)) {
        // copy to a scratch name then atomic-rename: an interrupted copy
        // must never be mistaken for the staged file (same invariant as
        // PartitionedOps' cache), and a concurrent second JVM either
        // wins the rename or observes the winner's complete file
        val scratch = java.nio.file.Files.createTempFile(dir, ".staging", ".tmp")
        java.nio.file.Files.copy(java.nio.file.Paths.get(s"$d/events.parquet"),
          scratch, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        try java.nio.file.Files.move(scratch, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileSystemException
            if java.nio.file.Files.exists(target) => // lost the race
            java.nio.file.Files.deleteIfExists(scratch)
        }
      }
      val qname = "graft_stream_demo"
      val query = s.readStream
        .schema(rawSchema)
        .parquet(dir.toString)
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("hour_start"), col("event_type"),
                col("cnt"))
        .writeStream
        .format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      s.table(qname).orderBy("hour_start", "event_type")
    }
  )

  def oracles: Map[String, String] = Map(
    "stream_demo" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type, count(*) AS cnt
        |FROM events GROUP BY hour_start, event_type
        |ORDER BY hour_start, event_type""".stripMargin
  )
}
