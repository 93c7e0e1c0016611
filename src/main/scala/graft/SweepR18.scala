package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 scale sweep (BASELINE.md): the round's re-keyed gate
  * family + new declared operators over the three volumes (SweepR16's
  * protocol — local[32], cold = first consumption including artifact
  * builds, warm = second consumption, row count after the timed
  * region), plus the serving-shape A/B the r17 verdict's #1 asked
  * for: the two-level assignment pass with the fine-group side
  * BROADCAST (the under-ceiling shape) vs FORCED past the ceiling
  * (ccid-co-bucketed shuffled hash — the 10⁹-vector census-point
  * shape, runnable at any volume by forcing the declared switch to
  * 0). The A/B shows the shuffle shape RUNS and what it costs at a
  * geometry the broadcast still wins — the switch point itself is the
  * measured ceiling, not these volumes.
  *
  * Also completes the r17 verdict's #5: q376–q379 landed after the
  * r17 closing trio with 100×-only rows; this sweep carries them at
  * all three volumes.
  */
object SweepR18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq(
      "q345_stream_semdedup", "q356_stream_semdedup_sqrt",
      "q369_twolevel_assign", "q370_twolevel_recall",
      "q371_stream_gate_admit", "q375_gate_rebuild",
      "q376_twolevel_bands", "q377_model_promote",
      "q378_packlog_vacuum", "q379_lm_order_census",
      "q380_router_config", "q381_modellog_vacuum", "q382_repin_diff",
      "q383_admitlog_vacuum", "q384_banded_admit")
    val dirs0 = Seq("/root/testdata/sf0.1", "/tmp/sf10x13", "/tmp/sf100x")
    val dirs = if (args.exists(_.startsWith("/")))
                 args.filter(_.startsWith("/")).toSeq
               else dirs0
    val rest = args.filterNot(_.startsWith("/"))
    val abOnly = rest.contains("ab")
    val sel = if (rest.filterNot(_ == "ab").isEmpty) qs
              else qs.filter(rest.contains)
    val unknown = rest.filterNot(r => qs.contains(r) || r == "ab")
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")} — a mistyped " +
        "arg must fail loudly, not run an empty sweep")
    for (d <- dirs) {
      spark.read.parquet(s"$d/nation.parquet").count()
      if (!abOnly) for (q <- sel if SparkEntry.queries.contains(q)) {
        def consume(): Unit =
          SparkEntry.queries(q)(spark, d).write.format("noop")
            .mode("overwrite").save()
        try {
          val c0 = System.nanoTime()
          consume(); PinScope.drain()
          val cold = (System.nanoTime() - c0) / 1e9
          val t0 = System.nanoTime()
          consume()
          val dt = (System.nanoTime() - t0) / 1e9
          val n = SparkEntry.queries(q)(spark, d).count()
          println(f"SWEEP $d $q $dt%.2f s (cold $cold%.2f s, $n rows)")
        } catch {
          case e: Throwable =>
            println(s"SWEEP $d $q FAILED: ${e.getMessage}")
        } finally PinScope.drain()
      }
      // serving-shape A/B: the full-corpus two-level assignment pass
      // (q369's hybrid geometry, synthetic cap 8) under both join
      // shapes — identical plans except the fine-group side
      val simx = operators.SimilarityExtOps
      val kAgg = greatest(ceil(sqrt(count(lit(1)))).cast("long"),
                          expr("(count(1) + 7) DIV 8").cast("long"))
      for ((label, ceiling) <- Seq(
             ("assign_broadcast", simx.TwoLevelBroadcastCeilingBytes),
             ("assign_shuffle", 0L))) {
        try {
          def run(): Long = {
            val em = simx.latticeFrame(spark, d, Long.MaxValue)
            val (_, asg) = simx.hybridCellAssign(em, kAgg,
              twoLevel = true, fineBroadcastCeiling = ceiling)
            val t0 = System.nanoTime()
            asg.write.format("noop").mode("overwrite").save()
            System.nanoTime() - t0
          }
          run() // warm the source cache / JIT
          val dt = run() / 1e9
          println(f"SWEEP $d twolevel_$label $dt%.2f s")
        } catch {
          case e: Throwable =>
            println(s"SWEEP $d twolevel_$label FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
