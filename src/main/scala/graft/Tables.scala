package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-provided star schema (TESTDATA.md).
  * All queries read tables exclusively through this entry point so that a
  * future catalog/bucketing layer can swap the physical source in one place.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is physically INT64 TIMESTAMP(NANOS) parquet, which
      // Spark 4 refuses to map to TimestampType (PARQUET_TYPE_ILLEGAL).
      // Read nanos as long and truncate to microseconds — the same
      // truncation DuckDB applies on read, so oracle parity holds.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}

/** One operator family = one module; SparkEntry concatenates them. */
trait OpModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

/** Shared float-determinism helpers (SURVEY.md §7.3/§7.4).
  *
  * Cross-engine hash-matching rules used by every declared query:
  *  - money/value sums: cast each term to DECIMAL inside the sum (exact
  *    integer arithmetic, immune to partition order), cast the result back
  *    to a fixed DECIMAL type so Spark and DuckDB output identical scale;
  *  - averages: exact decimal sum -> cast to double -> divide by count ->
  *    round. Both engines then perform the identical two double ops on
  *    identical operands, so results are bit-equal;
  *  - never emit a raw cross-row double aggregate.
  */
object Det {
  /** Exact decimal term for use inside sum(). */
  def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Order-insensitive exact sum, fixed output type decimal(18,4). */
  def decSum(c: Column): Column = sum(dec(c)).cast("decimal(18,4)")

  /** Order-insensitive average: exact decimal sum / count, rounded. */
  def decAvg(c: Column, scale: Int = 6): Column =
    round(sum(dec(c)).cast("double") / count(lit(1)), scale)

  /** Scalar round-half-away-from-zero at 4 dp — the semantics shared by
    * Spark's `round` (HALF_UP) and DuckDB's `round` on doubles; used in
    * JVM-side hot loops where BigDecimal would dominate the cost. */
  def round4(x: Double): Double = {
    val y = x * 10000.0
    (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)) / 10000.0
  }
}
