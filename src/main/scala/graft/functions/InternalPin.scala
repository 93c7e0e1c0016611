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
  */
object InternalPin {
  def pin(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    // toRdd yields REUSED mutable UnsafeRows — copy before persisting
    val rdd = df.queryExecution.toRdd.map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val out = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, df.schema)
    (out, rdd)
  }
}
