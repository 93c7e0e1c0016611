package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.storage.StorageLevel

/** Materializes a DataFrame on a persisted INTERNAL-row RDD and restarts
  * the logical plan from it — the same mechanics `Dataset.localCheckpoint`
  * uses (UnsafeRow copies, no Row object round-trip), but returning the
  * RDD handle so iterative operators can FREE each round's blocks once
  * the next round no longer needs them (checkpoint blocks bypass the
  * cache manager, so `Dataset.unpersist` can't release them).
  *
  * Lives in this package because `QueryExecution.toRdd` rebuilding needs
  * the `private[sql]` `internalCreateDataFrame`.
  *
  * Boundedness tags (r15, closing the r14 verdict's WindowBoundedness
  * loophole): a pinned RDD is an ARBITRARY-size opaque leaf — the
  * boundedness walk in WindowBoundednessSpec cannot see through it to
  * the plan that built it, so it used to trust every pin, which let a
  * fact-scaled pin carry an unpartitioned window past the guard. Now
  * the CALLER declares: [[pinBounded]] asserts "this table is k-/
  * calendar-/cap-bounded, never fact-scaled" (beam fronts, picked
  * sets, anchor samples, layout bounds) and registers the RDD id in
  * [[boundedIds]]; plain [[pin]] stays untagged and the walk treats
  * the leaf as fact-scaled (fail-safe). Tags are audited where made —
  * the declaring call site carries the size argument (a row cap
  * visible in the builder: a limit(k), a ≤|cents| collect, a k-round
  * union) — and the spec fails loudly on any unpartitioned window
  * over an untagged pin, which is exactly the defect class the guard
  * exists to stop. Registry is id-keyed and session-lifetime (ints;
  * pins themselves are freed by PinScope/unpersist — the tag of a
  * freed id is inert because its LogicalRDD is gone too).
  */
object InternalPin {
  private val boundedIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Is the pinned RDD with this id caller-declared bounded? Untagged
    * (or unknown) ids are NOT bounded — the fail-safe default. */
  def isBounded(rddId: Int): Boolean = boundedIds.contains(rddId)

  def pin(df: DataFrame): (DataFrame, RDD[InternalRow]) =
    pinTagged(df, bounded = false)

  /** [[pin]] with the caller's declaration that the pinned table's
    * row count is bounded by a constant of the QUERY (k, cap, cell
    * count, calendar), never by the corpus — the tag that lets an
    * unpartitioned window ride the pin past WindowBoundednessSpec. */
  def pinBounded(df: DataFrame): (DataFrame, RDD[InternalRow]) =
    pinTagged(df, bounded = true)

  private def pinTagged(df: DataFrame, bounded: Boolean)
      : (DataFrame, RDD[InternalRow]) = {
    // toRdd yields REUSED mutable UnsafeRows — copy before persisting
    val rdd = df.queryExecution.toRdd.map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (bounded) boundedIds.add(rdd.id)
    val out = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, df.schema)
    (out, rdd)
  }
}
