package graft.sources

import graft.{OpModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Non-parquet source+sink round-trips (SURVEY.md §2B src_csv_json +
  * src_orc_text, added r2). Writes `nation` out in each format in a
  * stable per-sfDir temp dir, reads it back with an explicit schema
  * (never inference at scale), and reports row counts + key checksums —
  * equal to the parquet source by construction, which is what the
  * oracle asserts.
  */
object SourceOps extends OpModule {

  // stable per-sfDir path + overwrite: repeated runs reuse one dir
  // instead of leaking a fresh temp dir per invocation
  private def tmpDir(d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_src_" +
      d.replaceAll("[^a-zA-Z0-9]", "_")

  private def stats(df: DataFrame, src: String): DataFrame =
    df.agg(count(lit(1)).as("rows"),
           sum(col("n_nationkey")).cast("long").as("keysum"))
      .select(lit(src).as("src"), col("rows"), col("keysum"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_csv_json" -> { (s, d) =>
      val n = Tables(s, d, "nation")
      val tmp = tmpDir(d)
      n.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
      n.write.mode("overwrite").json(s"$tmp/json")
      val schema = n.schema
      val csv = s.read.schema(schema).option("header", "true").csv(s"$tmp/csv")
      val js = s.read.schema(schema).json(s"$tmp/json")
      stats(csv, "csv").unionAll(stats(js, "json")).orderBy("src")
    },

    // Columnar ORC + raw text-line round-trip: text is one string
    // column per line, so the record is serialized with an explicit
    // delimiter and parsed back — the minimal ingest shape for
    // line-oriented corpora.
    "src_orc_text" -> { (s, d) =>
      val n = Tables(s, d, "nation")
      val tmp = tmpDir(d)
      n.write.mode("overwrite").orc(s"$tmp/orc")
      n.select(concat_ws("|", col("n_nationkey"), col("n_name")).as("value"))
        .write.mode("overwrite").text(s"$tmp/text")
      val orc = s.read.schema(n.schema).orc(s"$tmp/orc")
      val txt = s.read.text(s"$tmp/text")
        .select(split(col("value"), "\\|").getItem(0)
          .cast("long").as("n_nationkey"))
      stats(orc, "orc").unionAll(stats(txt, "text")).orderBy("src")
    }
  )

  def oracles: Map[String, String] = Map(
    "src_csv_json" ->
      """SELECT 'csv' AS src, count(*) AS rows,
        |  CAST(sum(n_nationkey) AS BIGINT) AS keysum FROM nation
        |UNION ALL
        |SELECT 'json', count(*), CAST(sum(n_nationkey) AS BIGINT) FROM nation
        |ORDER BY src""".stripMargin,

    "src_orc_text" ->
      """SELECT 'orc' AS src, count(*) AS rows,
        |  CAST(sum(n_nationkey) AS BIGINT) AS keysum FROM nation
        |UNION ALL
        |SELECT 'text', count(*), CAST(sum(n_nationkey) AS BIGINT) FROM nation
        |ORDER BY src""".stripMargin
  )
}
