package graft.functions

import graft.{Det, OpModule, Tables}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Geometric mean as a typed [[Aggregator]] (the declared UDAF surface,
  * SURVEY.md §2B q40). Buffer = (Σ ln x, n); merge is associative and
  * commutative, so the aggregation runs partial+final exactly like a
  * built-in — no data skew or single-reducer bottleneck at scale.
  */
object GeoMeanAgg extends Aggregator[Double, (Double, Long), Double] {
  def zero: (Double, Long) = (0.0, 0L)
  def reduce(b: (Double, Long), a: Double): (Double, Long) =
    (b._1 + math.log(a), b._2 + 1)
  def merge(b1: (Double, Long), b2: (Double, Long)): (Double, Long) =
    (b1._1 + b2._1, b1._2 + b2._2)
  def finish(b: (Double, Long)): Double = math.exp(b._1 / b._2)
  def bufferEncoder: Encoder[(Double, Long)] = Encoders.product[(Double, Long)]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Space-Saving heavy-hitters sketch (Metwally et al.) as a typed
  * [[Aggregator]] — CONSTANT-memory top-k counting: the buffer holds at
  * most `k` counters regardless of how many distinct values stream
  * through, which is the 100 TB form of "top tokens/domains/urls"
  * (an exact groupBy needs state linear in the key space; this needs
  * O(k) per partition and one O(k) merge).
  *
  * Guarantees (property-tested in PropertySpec): every tracked count
  * OVERESTIMATES its true count by at most its recorded error, i.e.
  * `true ≤ est ≤ true + err`, and any value with true frequency
  * > n/k is guaranteed to be tracked. When `k` ≥ the number of
  * distinct values nothing is ever evicted and every count is EXACT —
  * the declared q88 runs in that regime (k=64 vs a 31-token vocab), so
  * its DuckDB oracle is the plain exact top-10.
  *
  * merge follows the standard Space-Saving (Misra-Gries-equivalent)
  * mergeable-summaries discipline: a key absent from one sketch may
  * have been EVICTED there after accumulating up to that sketch's
  * minimum count, so the merge adds the other side's min count to both
  * the count and the error of every one-sided key (min = 0 while a
  * sketch is below capacity — nothing was ever evicted), then keeps
  * the top-k counters by count. That preserves `true ≤ est ≤ true +
  * err` and the > n/k recall guarantee across any merge tree
  * (Agarwal et al., "Mergeable Summaries"). Associative+commutative,
  * so Spark runs it partial+final like any built-in — per-partition
  * sketches map-side, one tiny merge, no token ever shuffles.
  */
class SpaceSavingAgg(k: Int)
    extends Aggregator[String, Map[String, (Long, Long)], Map[String, Long]] {
  def zero: Map[String, (Long, Long)] = Map.empty
  def reduce(b: Map[String, (Long, Long)], tok: String): Map[String, (Long, Long)] =
    b.get(tok) match {
      case Some((c, e)) => b.updated(tok, (c + 1, e))
      case None if b.size < k => b.updated(tok, (1L, 0L))
      case None =>
        // evict the min-count counter (token tie-break: deterministic);
        // the newcomer inherits its count as an upper-bound error
        val (mt, (mc, _)) = b.minBy { case (t, (c, _)) => (c, t) }
        (b - mt).updated(tok, (mc + 1, mc))
    }
  /** A sketch's eviction floor: a key it does NOT track can have true
    * count at most this (0 below capacity — nothing evicted yet). */
  private def floor(b: Map[String, (Long, Long)]): Long =
    if (b.size < k) 0L else b.valuesIterator.map(_._1).min
  def merge(b1: Map[String, (Long, Long)],
            b2: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    val (f1, f2) = (floor(b1), floor(b2))
    val comb = (b1.keySet ++ b2.keySet).iterator.map { t =>
      val (c1, e1) = b1.getOrElse(t, (f1, f1))
      val (c2, e2) = b2.getOrElse(t, (f2, f2))
      t -> (c1 + c2, e1 + e2)
    }.toMap
    if (comb.size <= k) comb
    else comb.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.take(k).toMap
  }
  def finish(b: Map[String, (Long, Long)]): Map[String, Long] =
    b.map { case (t, (c, _)) => t -> c }
  def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** UDF / UDAF surface (SURVEY.md §2B q39–q40).
  *
  * q39 deliberately uses a Scala UDF (an opaque black box to Catalyst —
  * no codegen fusion, no pushdown through it); the oracle is the
  * equivalent CASE expression. In production code prefer the native
  * `when()` chain — the UDF exists to declare the extension surface.
  */
object UdfOps extends OpModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_udf_scalar" -> { (s, d) =>
      val band = udf((p: Double) =>
        if (p < 100000) "LOW" else if (p < 300000) "MID" else "HIGH")
      Tables(s, d, "orders")
        .groupBy(band(col("o_totalprice")).as("band"))
        .agg(count(lit(1)).as("cnt"),
             Det.decSum(col("o_totalprice")).as("sum_price"))
        .orderBy("band")
    },

    "q40_udaf" -> { (s, d) =>
      val geo = udaf(GeoMeanAgg)
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(geo(col("l_extendedprice")), 4).as("geo_price"),
             count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    },

    // Constant-memory heavy hitters (added r6) — see [[SpaceSavingAgg]].
    // k=64 ≥ the 31-token vocab, so the sketch is provably exact here
    // and the oracle is the plain top-10; sub-capacity error bounds are
    // property-tested separately.
    "q88_heavy_hitters" -> { (s, d) =>
      val hh = udaf(new SpaceSavingAgg(64))
      Tables(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .agg(hh(col("tok")).as("m"))
        .select(explode(col("m")))
        .toDF("token", "cnt")
        .orderBy(desc("cnt"), col("token"))
        .limit(10)
    }
  )

  def oracles: Map[String, String] = Map(
    "q39_udf_scalar" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'LOW'
        |            WHEN o_totalprice < 300000 THEN 'MID'
        |            ELSE 'HIGH' END AS band,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY band ORDER BY band""".stripMargin,

    "q40_udaf" ->
      """SELECT l_returnflag,
        |  round(exp(avg(ln(l_extendedprice))), 4) AS geo_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // exact because k=64 exceeds the vocabulary — see SpaceSavingAgg
    "q88_heavy_hitters" ->
      """SELECT tok AS token, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY tok ORDER BY cnt DESC, token LIMIT 10""".stripMargin
  )
}
