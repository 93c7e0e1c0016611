package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucket-distributed global-order primitives (added r14) — the shared
  * machinery behind the round's de-funneling of every query that used
  * to sort a FACT table through one unpartitioned window (the q329
  * backbone defect class, caught per-query by WindowBoundednessSpec):
  * q270/q275's sorted-neighborhood leads and q273's running
  * nearest-control fills.
  *
  * The discipline (the q141/q146 bucket-prefix pattern, generalized):
  * split the global order into VALUE-RANGE BUCKETS via a caller-chosen
  * expression that is monotone non-decreasing in the leading sort key,
  * do all per-row window work PARTITIONED by bucket (parallel,
  * spill-safe sorts of n/|buckets| rows), and stitch the seams through
  * a |buckets|-row census table — the only unpartitioned window in the
  * result runs over that census, which is resolution-bounded at any
  * corpus size. Results are bit-identical to the single-partition
  * global window (the bucket key is a prefix of the global order), so
  * every consumer keeps its unchanged DuckDB oracle.
  *
  * At 1000-executor scale the bucket expression is the parallelism
  * knob: pick the value resolution so buckets ≈ a few × executor
  * count. (A skewed value distribution concentrates buckets exactly
  * like any range partitioning — the standard fix is a finer
  * resolution, which only grows the census table.)
  */
private[graft] object GlobalOrder {

  /** Global `row_number() OVER (ORDER BY order...)` as a two-level
    * bucket rank: within-bucket ranks run parallel, exclusive
    * cumulative bucket counts come back via a broadcast of the census.
    * Adds column `grn` (LONG, 1-based). `bucket` MUST be monotone
    * non-decreasing in `order.head` (caller-declared; the census
    * offsets assume bucket order = global order). */
  def rank(df: DataFrame, bucket: Column, order: Seq[Column],
           grn: String = "grn"): DataFrame = {
    // the within-bucket ranked table PINS once: the census, the probe
    // side and the successor side all read the materialized blocks —
    // one input scan and one window pass total, not one per consumer
    val (ranked, rh) = org.apache.spark.sql.graft.InternalPin.pin(
      df.withColumn("__bkt", bucket)
        .withColumn("__br", row_number().over(
          Window.partitionBy("__bkt").orderBy(order: _*))))
    rh.count(); graft.PinScope.retain(rh)
    val offs = ranked.groupBy("__bkt").agg(count(lit(1)).as("__bn"))
      .withColumn("__off", coalesce(sum("__bn").over(
          Window.orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__off"))
    ranked.join(broadcast(offs), Seq("__bkt"))
      .withColumn(grn, col("__off") + col("__br"))
      .drop("__bkt", "__br", "__off")
  }

  /** The global k-neighborhood join that replaces `lead(·, j)` columns
    * over a global sort: ranks `df` by `order` (via [[rank]]), then
    * equi-joins each row to its next 1..k successors on the rank key.
    * Returns one row per (row, successor) with the successor's columns
    * suffixed "2" — rows at the global tail simply have fewer
    * successors (exactly the rows the lead-based form null-filtered).
    * `carry` names the columns to keep from both sides. */
  def neighbors(df: DataFrame, bucket: Column, order: Seq[Column],
                k: Int, carry: Seq[String]): DataFrame = {
    val ranked = rank(df, bucket, order)
    val probes = ranked.select(
      carry.map(col) :+
        explode(array((1 to k).map(j => col("grn") + j): _*)).as("__g2"): _*)
    val succ = ranked.select(
      col("grn").as("__g2") +: carry.map(c => col(c).as(c + "2")): _*)
    probes.join(succ, Seq("__g2")).drop("__g2")
  }
}
