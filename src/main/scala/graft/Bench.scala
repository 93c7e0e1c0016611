package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/IO paths once so the first timed query
    // doesn't absorb session startup (~3-4 s of JIT + codegen compile).
    // Best-effort: a broken sfDir must NOT abort the run here — the
    // per-query loop records each failure as -1 and the headline goes
    // null, which the scraper can parse; an uncaught crash emits no
    // JSON line at all (verified against a missing-table scratch dir).
    try spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count().count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up failed: ${e.getMessage}")
    }
    // optional extra args (after the output path): restrict to these
    // query names — local scale experiments; the driver passes none
    val only = args.drop(1).toSet
    val qs0 = if (only.isEmpty) SparkEntry.queries
              else SparkEntry.queries.view.filterKeys(only).toMap
    // deterministic name order: run-to-run timings are comparable, and
    // q82 (the cheaper fixpoint query) always precedes q83, so q83's
    // median reflects warm codegen, not first-fixpoint JIT warm-up
    def onePass(): Seq[(String, Double)] =
      qs0.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        // a failed query records -1 (not a bogus elapsed time), so a
        // regression is visible in the JSON instead of silently timed.
        // Consume via the noop sink, NOT count(): count(1) lets the
        // optimizer PRUNE aggregate expressions and final projections
        // (a grouping-less aggregate counts 1 row while skipping its
        // min/max/sum work entirely — caught r12 when q208's 480M-md5
        // fan-out "ran" in 0.5 s), so count-based timings measure the
        // plan's row-count skeleton. The noop DSv2 sink materializes
        // EVERY output column on the executors with zero driver
        // collection and zero I/O — the honest "run the whole query"
        // protocol.
        val ok = try {
                   fn(spark, sfDir).write.format("noop")
                     .mode("overwrite").save(); true
                 }
                 catch { case e: Throwable =>
                   System.err.println(s"[bench] $name failed: ${e.getMessage}")
                   false }
                 finally PinScope.drain() // release pins AFTER the consume
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    // Two passes, per-query MIN (r10 verdict #7): single-pass captures
    // on a shared box carry ambient-load bursts (r9: a uniform 1.3x;
    // r10: a contiguous q88–q95 segment at 3–14x) that every round
    // needed a written reconciliation against the recorded medians.
    // Pass 1 additionally absorbs the one-time artifact/JIT builds, so
    // min(pass1, pass2) approximates the steady-state median the repo
    // records, at the cost of ~2 min of extra driver wall-clock. A
    // query that failed in EITHER pass stays -1 (min propagates the
    // failure — a flaky query must read as broken, not fast).
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .flatMap(p => scala.util.Try(p.toInt).toOption).getOrElse(2).max(1)
    // 1-minute load average read at each pass boundary (r15 verdict
    // #8: the r15 closing trio's pass 3 ran 387 s vs 346/355 under
    // ambient load and the reconciliation was prose — recording the
    // machine load per pass lets a future regression screen separate
    // code from contention mechanically). Best-effort: absent
    // /proc/loadavg (non-Linux) records -1.
    def loadavg(): Double =
      try new String(Files.readAllBytes(Paths.get("/proc/loadavg")))
        .split(" ")(0).toDouble
      // NonFatal only (r16 ADVICE): a Throwable catch would swallow a
      // fatal JVM error (OOM) mid-read and misreport it as load -1
      catch { case scala.util.control.NonFatal(_) => -1.0 }
    val passLoads = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    val allPasses = (1 to passes).map { _ =>
      val l0 = loadavg()
      val r = onePass()
      passLoads += ((l0, loadavg()))
      r
    }
    val results = allPasses.transpose.map { timings =>
      val name = timings.head._1
      val ts = timings.map(_._2)
      name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // warm-sensitivity census (r16, SURVEY §12.1 #5): queries whose
    // FIRST pass reads ≥ 2×+0.5 s over their steady-state — exactly
    // the set that false-flags a single-pass regression screen (the
    // r16 trio flagged q165/q259 for ~1.4 s of JIT warm-up each).
    // Recording [first, best] per offender lets a future screen
    // subtract warm-up mechanically instead of re-running the 2-pass
    // protocol to clear flags. Empty when passes == 1 (no steady
    // state to compare against).
    val warmSensitive =
      if (passes < 2) Seq.empty
      else allPasses.head.zip(results).collect {
        case ((n1, first), (n2, best))
          if n1 == n2 && best >= 0 && first > 2 * best + 0.5 =>
          s"\"$n1\":[$first,$best]"
      }
    val warm = warmSensitive.mkString("{", ",", "}")
    // any failure invalidates the headline: emit value null so a crash
    // can never read as a speedup (a partial sum looks like a better
    // total than a clean round); per-query -1s and `failures` tell the
    // reader what broke
    val total = results.map(_._2).filter(_ >= 0).sum
    val failures = results.map(_._2).count(_ < 0)
    val value = if (failures > 0) "null" else total.toString
    val loads = passLoads
      .map { case (a, b) => s"[$a,$b]" }.mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$value,"unit":"sec","failures":$failures,"passes":$passes,"loadavg":$loads,"warm_sensitive":$warm,"queries":$qs,"sf":"$sfDir"}"""
    // The driver's tail capture is 2000 chars (BENCH_r09-r11 all came
    // back parsed:null — the full per-query map outgrew the buffer at
    // ~160 queries and the judge had to reconcile via the file copy).
    // Stdout therefore carries a SHORT line: the honest total/failures
    // plus only the BASELINE.md-anchored headline queries (3-decimal),
    // with nq + a pointer to the full-precision file. The file keeps
    // the complete map, unchanged format.
    val headline = Seq(
      "q05_join_inner4", "q09_join_semi", "q10_join_anti", "q14_agg_hash",
      "q16_agg_distinct", "q17_agg_rollup", "q22_win_rank", "q28_topk",
      "q29_setops", "q35_fn_json_map", "q36_win_tumbling", "q38_win_session",
      "q42_dedup_near", "q43_sim_topk", "q46_dedup_minhash",
      "q56_dedup_embedding", "q78_stream_stream_join", "q87_decontaminate",
      "q94_tfidf", "q100_ann_pq")
    val resMap = results.toMap
    val shortQs = headline.flatMap(k => resMap.get(k).map(v =>
        "\"" + k + "\":" + (if (v < 0) "-1" else f"$v%.3f")))
      .mkString("{", ",", "}")
    val shortJson =
      s"""{"metric":"total","value":$value,"unit":"sec","failures":$failures,"passes":$passes,"loadavg":$loads,"nq":${results.size},"queries":$shortQs,"full":"bench_result.json","sf":"$sfDir"}"""
    println(shortJson)
    val outPath = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_OUT"))
      .getOrElse("bench_result.json")
    try Files.writeString(Paths.get(outPath), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
