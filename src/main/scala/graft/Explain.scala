package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` output for every declared query — the
  * plan-audit artifact behind the scale claims in SURVEY.md §4
  * (pushdown, pruning, broadcast choices, shuffle counts).
  *
  * Usage: runMain graft.Explain [sfDir] [outDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/graft_plans")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    // optional extra args: restrict to these query names (r19: per-change
    // before/after plan dumps for plans/r19/ without a full sweep)
    val only = args.drop(2).toSet
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
        val exchanges = "Exchange".r.findAllIn(txt).size
        println(f"$name%-24s exchanges=$exchanges")
      } catch {
        case e: Throwable => println(s"$name EXPLAIN FAILED: ${e.getMessage}")
      } finally PinScope.drain() // pinned queries eager-count at build time
    }
    spark.stop()
  }
}
