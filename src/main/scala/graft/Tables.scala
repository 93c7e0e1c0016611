package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-provided star schema (TESTDATA.md).
  * All queries read tables exclusively through this entry point so that a
  * future catalog/bucketing layer can swap the physical source in one place.
  */
object Tables {

  /** events.ts has shipped in two physical forms across driver testdata
    * generations: INT64 TIMESTAMP(NANOS) (pre-r12 — Spark 4 refuses to
    * map it to TimestampType, so it is read as long via the
    * nanosAsLong legacy conf and truncated to µs, the same truncation
    * DuckDB applies on read) and plain µs TIMESTAMP_NTZ (r12 data —
    * Spark reads it natively as TimestampNTZType). Normalize either to
    * session-zone TimestampType instants; harness sessions run UTC, so
    * the NTZ cast reproduces exactly the naive-µs instants DuckDB sees.
    * Schema-adaptive so a future regeneration in either form keeps
    * working. */
  def tsNorm(dt: org.apache.spark.sql.types.DataType): Column = dt match {
    case org.apache.spark.sql.types.LongType =>
      expr("timestamp_micros(ts DIV 1000)")
    case org.apache.spark.sql.types.TimestampNTZType =>
      col("ts").cast("timestamp")
    case _ => col("ts")
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // (guarded: don't re-mutate session conf on every read)
      if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
            .contains("true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", tsNorm(raw.schema("ts").dataType))
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
  *    integer arithmetic, immune to partition order), then cast the final
  *    result to DOUBLE. The decimal stays *inside* the aggregate for
  *    order-insensitivity; the output is double because downstream
  *    comparators (pandas/pyarrow) canonicalize DECIMAL and float64
  *    differently (`Decimal('138014.0000')` vs `138014.0`) even when the
  *    values are identical — a double output hands both engines the same
  *    float64. The final decimal→double cast is a single correctly-rounded
  *    conversion of the same exact rational in both engines, so it is
  *    bit-equal;
  *  - averages: exact decimal sum -> cast to double -> divide by count ->
  *    round. Both engines then perform the identical two double ops on
  *    identical operands, so results are bit-equal;
  *  - never emit a raw cross-row double aggregate, and never emit a
  *    DECIMAL-typed output column.
  */
object Det {
  /** Exact decimal term for use inside sum(). */
  def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Order-insensitive exact sum; double output (see scaladoc above). */
  def decSum(c: Column): Column = sum(dec(c)).cast("double")

  /** Same, with an explicit decimal scale for the internal terms. */
  def decSumS(c: Column, scale: Int): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

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
