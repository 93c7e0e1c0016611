package graft

import org.apache.spark.rdd.RDD

/** Deferred release for [[org.apache.spark.sql.graft.InternalPin]] blocks
  * whose lifetime must outlive the query FUNCTION but not the query RUN.
  *
  * Iterative declared queries (q138's BFS) pin intermediate rounds so the
  * final plan reads materialized blocks instead of replaying the banding
  * pipeline once per reference. The function, however, returns a LAZY
  * DataFrame: releasing the pins before the harness consumes it races
  * block removal against the consume (and loses — the consume then
  * recomputes the whole lineage, which is exactly what pinning was meant
  * to avoid). So the query retains its handles here and the harness
  * (Bench / Verify / specs) drains the scope AFTER consuming the result —
  * the same release point [[graft.operators.DedupExtOps.clusterTable]]
  * reaches by writing parquet before unpersisting.
  *
  * Single-JVM coordination only (like BucketedCache's lock map): the
  * local[n] harness and tests share one scope; a multi-tenant deployment
  * would scope pins per query execution instead.
  */
object PinScope {
  private val handles = scala.collection.mutable.ArrayBuffer.empty[RDD[_]]

  def retain(h: RDD[_]): Unit = synchronized { handles += h }

  /** Release every retained pin (async) and empty the scope. Safe to call
    * when empty; callers invoke it once per consumed query. */
  def drain(): Unit = synchronized {
    handles.foreach(_.unpersist(blocking = false))
    handles.clear()
  }
}
