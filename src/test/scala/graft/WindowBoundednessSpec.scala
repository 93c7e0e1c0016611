package graft

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The r13 verdict's #5: turn every "bounded by design" claim about an
  * unpartitioned window into a GUARD. An unpartitioned Window is a
  * single-partition sort of its whole input — fine over a calendar-/
  * k-bounded table, a one-executor funnel over anything that scales
  * with the fact tables (exactly the q329 backbone defect r14 fixed).
  * This sweep walks every registered query's OPTIMIZED logical plan
  * and fails when an unpartitioned Window sits above a subtree that
  * reaches fact-scaled input without passing a cardinality-bounding
  * node.
  *
  * What bounds (r15, closing the r14 verdict's two loopholes):
  *  - Limit — a top-k cut bounds unconditionally.
  *  - Aggregate — bounds ONLY when its grouping keys avoid the
  *    declared fact-id columns below; an Aggregate grouped per
  *    doc_id/vec_id/event_id/orderkey (or a pair/edge id derived from
  *    them) is itself corpus-sized, so it bounds only if its INPUT is
  *    already bounded. This replaces the r14 walk's blanket trust in
  *    every Aggregate, which let per-fact-key windows pass silently.
  *  - LogicalRDD (pinned intermediates) — bounds ONLY when the pin
  *    was made with [[org.apache.spark.sql.graft.InternalPin
  *    .pinBounded]], the caller's audited declaration that the
  *    pinned table is k-/cap-/calendar-bounded. Untagged pins are
  *    treated as fact-scaled (fail-safe): this replaces the r14
  *    walk's blanket trust in every childless leaf, which let a
  *    fact-scaled pin carry an unpartitioned window past the guard.
  *  - LocalRelation / other non-scan leaves — bounded (literal or
  *    driver-constructed tables).
  *
  * Streaming queries are WALKED like everything else (r15; the r14
  * spec excluded any name containing "stream" wholesale): their
  * micro-batch drain happens at construction, so the plan this spec
  * sees is the batch POST-PROCESSING over the memory sink's output —
  * previously unguarded. The sink's table is a bounded leaf by the
  * streaming design discipline (the sink holds the ANSWER, never
  * per-row stream contents — q330's docstring records the OOM that
  * taught this), and any window the post-processing adds above
  * fact-scaled re-reads now fails here like any other offender.
  */
class WindowBoundednessSpec extends SparkSpecBase {

  /** Queries with a KNOWN-bounded unpartitioned window over a subtree
    * this walk cannot prove bounded. Every entry needs a reason. */
  private val allowlist: Map[String, String] = Map(
    "q173_skyline" ->
      ("the global frontier pass windows over the OUTPUT of the " +
        "64-group partitioned local frontier (two-phase skyline: a " +
        "row dominated in any subset is dominated globally), so its " +
        "input is ~|frontier|x64, not the orders table — the walk " +
        "sees only Filter/Window between the global window and the " +
        "scan"),
    "q195_topk_ties" ->
      ("the global rank <= 3 filter gets Catalyst's " +
        "InferWindowGroupLimit map-side bounded-heap prune below the " +
        "singleton exchange (plan-asserted in PlanShapeSpec), so the " +
        "single-partition window sees ~3 survivors per input " +
        "partition, never the lineitem table"))

  /** Column names that scale with the fact tables — grouping on any
    * of these yields a corpus-sized cell table, so an Aggregate keyed
    * on them does NOT bound. Derived pair/edge ids (id_a/id_b,
    * src/dst, new_id/old_id) are fact-id aliases the dedup/graph
    * families emit. Deliberately NOT listed: user_id (150 users — a
    * dimension), custkey/suppkey/partkey (dimension tables, sub-fact
    * cardinality at every SF and sub-linear growth by the testdata
    * contract). */
  private val factIds = Set(
    "doc_id", "vec_id", "event_id", "o_orderkey", "l_orderkey",
    "id_a", "id_b", "src", "dst", "new_id", "old_id")

  private def groupsOnFactId(a: Aggregate): Boolean =
    a.groupingExpressions.exists(_.references.exists(
      att => factIds.contains(att.name.toLowerCase)))

  private def bounded(p: LogicalPlan): Boolean = p match {
    case a: Aggregate =>
      !groupsOnFactId(a) || a.children.forall(bounded)
    case _: GlobalLimit | _: LocalLimit => true // top-k cuts
    case _: LogicalRelation             => false // fact scan / artifact
    case lr: LogicalRDD => // pinned intermediate: only a caller-tagged
      org.apache.spark.sql.graft.InternalPin.isBounded(lr.rdd.id)
    case leaf if leaf.children.isEmpty  => true // local/literal leaves
    case other => other.children.forall(bounded)
  }

  test("no query plans an unpartitioned window over fact-scaled input") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val bad = plan.collect {
          case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) => w
        }
        if (bad.nonEmpty && !allowlist.contains(name))
          offenders += s"$name (${bad.size} unbounded global window(s))"
      } finally PinScope.drain()
    }
    assert(offenders.isEmpty,
           "unpartitioned windows over fact-scaled input — partition " +
             "the window, bound its input, tag the pin with pinBounded " +
             "(only if genuinely k-/cap-bounded), or allowlist with a " +
             "reason:\n" + offenders.mkString("\n"))
  }
}
