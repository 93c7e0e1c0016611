package graft.mr

import graft.{OpModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** Faithful re-expression of the reference's user-facing API surface —
  * the `prepare / map / reduce / run` job contract of Jaymon/mister
  * (`mister/__init__.py`, reconstructed in SURVEY.md §2A [HIGH]) — on
  * Spark's execution model.
  *
  * Mapping (SURVEY.md §1.2): the reference's `prepare` (split input
  * into one chunk per worker process) becomes partitioning of a
  * `Dataset`; `map` (per-process transform) runs via `mapPartitions`
  * on executors; `reduce` stays a driver-side fold over the collected
  * per-partition values — exactly the reference's single-reducer
  * semantics. For anything beyond reference-parity workloads, prefer
  * the declarative operators (e.g. q31 wordcount): Spark's partial
  * aggregation distributes the reduce instead of serializing it on the
  * driver.
  */
abstract class MisterJob[T, M, O] extends Serializable {
  /** Per-partition map, like the reference's `map(*args)` running in a
    * forked worker over its chunk. */
  def map(rows: Iterator[T]): M

  /** Driver-side fold of worker outputs, like `reduce(output, value)`. */
  def reduce(output: O, value: M): O

  /** Initial fold value (the reference starts from `output=None`). */
  def zero: O

  /** Fork/collect/fold, like the reference's `run()`. `parallelism`
    * plays the role of the worker-process count (`prepare`'s `count`). */
  def run(ds: Dataset[T], parallelism: Int)(implicit enc: Encoder[M]): O = {
    val parts = if (parallelism > 0) ds.repartition(parallelism) else ds
    parts.mapPartitions(it => Iterator.single(map(it)))
      .collect()
      .foldLeft(zero)(reduce)
  }

  /** Scale variant of [[run]] for jobs whose `reduce` is associative
    * and commutative with `M = O` (true of the reference's canonical
    * Counter-merge word count): the fold happens as a tree on the
    * executors (`treeReduce`) instead of serializing every worker
    * output through the driver — at 1000 executors the driver handles
    * O(log n) merged values, not n. Identical result to [[run]] for
    * any lawful monoid reduce (asserted in spec). */
  def runDistributed(ds: Dataset[T], parallelism: Int)(
      implicit enc: Encoder[M], ev: M =:= O): O = {
    val parts = if (parallelism > 0) ds.repartition(parallelism) else ds
    val mapped = parts.mapPartitions(it => Iterator.single(map(it)))
    // mapPartitions emits one row per partition (even empty ones), so
    // treeReduce only lacks input on a zero-partition RDD — check the
    // partition count (free) rather than isEmpty (an extra Spark job)
    if (mapped.rdd.getNumPartitions == 0) zero
    else {
      val merged = mapped.rdd.treeReduce(
        (a, b) => ev.flip(reduce(ev(a), b)), depth = 2)
      reduce(zero, merged)
    }
  }
}

/** The reference README's flagship word-count job expressed in the
  * MisterJob API. */
class WordCountJob extends MisterJob[String, Map[String, Long], Map[String, Long]] {
  def map(rows: Iterator[String]): Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    // limit -1 keeps trailing empty tokens — Spark SQL split() semantics
    rows.foreach(_.split(" ", -1).foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L)))
    m.toMap
  }
  def reduce(output: Map[String, Long], value: Map[String, Long]): Map[String, Long] =
    value.foldLeft(output) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
  def zero: Map[String, Long] = Map.empty
}

/** Declares the MR surface as a query: word count via the reference API
  * shape, sharing q31's top-20 oracle semantics. */
object MisterOps extends OpModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_mr_wordcount" -> { (s, d) =>
      import s.implicits._
      val texts = Tables(s, d, "documents").select(col("text")).as[String]
      val counts = new WordCountJob().run(texts, 8)
      counts.toSeq.toDF("token", "cnt")
        .orderBy(col("cnt").desc, col("token").asc)
        .limit(20)
    }
  )

  def oracles: Map[String, String] = Map(
    "q55_mr_wordcount" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20""".stripMargin
  )
}
