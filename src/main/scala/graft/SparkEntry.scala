package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory) and
  * §7 (build plan). Each operator family lives in its own [[OpModule]];
  * this object concatenates them for the Verify/Bench harness.
  */
object SparkEntry {

  private val modules: Seq[OpModule] = Seq(
    operators.RelationalOps,
    operators.AggregateOps,
    operators.WindowOps,
    operators.SortSetOps,
    operators.TimeWindowOps,
    functions.ScalarFnOps,
    functions.UdfOps,
    operators.LlmOps,
    operators.AdvancedOps,
    operators.TypedOps,
    operators.DedupExtOps,
    operators.TextExtOps,
    operators.SimilarityExtOps,
    operators.MultimodalExtOps,
    operators.CorpusExtOps,
    operators.StatsExtOps,
    operators.StatsModelOps,
    operators.CausalOps,
    sources.SourceOps,
    sources.PartitionedOps,
    streaming.StreamOps,
    mr.MisterOps
  )

  /** Flagship query (TPC-H Q1-style pricing summary) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q14_agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (◐). */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
