package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 scale sweep (BASELINE.md): the round's new/re-keyed gate
  * family over the three volumes (SweepR16's protocol — local[32],
  * cold = first consumption including artifact builds, warm = second
  * consumption, row count after the timed region), plus the AT-REST
  * serving A/B the r18 verdict's #2 asked for: the v1 serving
  * assignment (modelArrivals' shape) FORCED past the broadcast
  * ceiling under (a) the per-plan repacked fine side (the r18 shape —
  * model-side groupBy exchange in the plan) vs (b) the ccid-bucketed
  * at-rest routing table (zero exchange on the model side — the
  * layout carries the distribution). Run at a geometry the broadcast
  * still wins outright; the A/B prices what the committed layout buys
  * once the 10⁹-vector census point forces the shuffle shape.
  */
object SweepR19 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq(
      "q345_stream_semdedup", "q371_stream_gate_admit",
      "q375_gate_rebuild", "q377_model_promote", "q380_router_config",
      "q381_modellog_vacuum", "q382_repin_diff", "q383_admitlog_vacuum",
      "q384_banded_admit", "q385_promote_cycle", "q386_flagged_rejudge",
      "q387_model_churn", "q388_gate_fsck", "q389_log_fsck",
      "q390_cache_fsck")
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
      // AT-REST serving A/B: the v1 serving assignment forced past
      // the ceiling, per-plan repack vs the committed ccid-bucketed
      // routing table (both shuffled-hash; only the model side's
      // exchange differs)
      val simx = operators.SimilarityExtOps
      val SnapshotLog = sources.PartitionedOps.SnapshotLog
      try {
        val root = streaming.StreamOps.gateModelRoot(spark, d, upTo = 1)
        val model = SnapshotLog.read(spark, root,
          streaming.StreamOps.gateModelPin(root))
        val atRest = spark.table(simx.semDedupTwoFineTable(spark, d))
        for ((label, fine) <- Seq(
               ("serve_shuffle_repack", None),
               ("serve_shuffle_atrest", Some(atRest)))) {
          def run(): Long = {
            val arr = streaming.StreamOps.modelArrivals(spark, d,
              model, fine, fineBroadcastCeiling = 0L)
            val t0 = System.nanoTime()
            arr.write.format("noop").mode("overwrite").save()
            System.nanoTime() - t0
          }
          run() // warm the source cache / JIT
          val dt = run() / 1e9
          println(f"SWEEP $d twolevel_$label $dt%.2f s")
        }
      } catch {
        case e: Throwable =>
          println(s"SWEEP $d twolevel_atrest_ab FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
