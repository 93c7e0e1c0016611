package graft.sources

import graft.{OpModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV/JSON source+sink round-trip (SURVEY.md §2B src_csv_json).
  * Writes `nation` to CSV (header) and JSON line files in a fresh temp
  * dir, reads both back with an explicit schema (never inference at
  * scale), and reports row counts + key checksums — equal to the
  * parquet source by construction, which is what the oracle asserts.
  */
object SourceOps extends OpModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_csv_json" -> { (s, d) =>
      val n = Tables(s, d, "nation")
      // stable per-sfDir path + overwrite: repeated runs reuse one dir
      // instead of leaking a fresh temp dir per invocation
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_src_" +
        d.replaceAll("[^a-zA-Z0-9]", "_")
      n.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
      n.write.mode("overwrite").json(s"$tmp/json")
      val schema = n.schema
      val csv = s.read.schema(schema).option("header", "true").csv(s"$tmp/csv")
      val js = s.read.schema(schema).json(s"$tmp/json")
      def stats(df: DataFrame, src: String): DataFrame =
        df.agg(count(lit(1)).as("rows"),
               sum(col("n_nationkey")).cast("long").as("keysum"))
          .select(lit(src).as("src"), col("rows"), col("keysum"))
      stats(csv, "csv").unionAll(stats(js, "json")).orderBy("src")
    }
  )

  def oracles: Map[String, String] = Map(
    "src_csv_json" ->
      """SELECT 'csv' AS src, count(*) AS rows,
        |  CAST(sum(n_nationkey) AS BIGINT) AS keysum FROM nation
        |UNION ALL
        |SELECT 'json', count(*), CAST(sum(n_nationkey) AS BIGINT) FROM nation
        |ORDER BY src""".stripMargin
  )
}
