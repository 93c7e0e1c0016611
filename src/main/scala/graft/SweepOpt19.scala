package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 optimization profiling harness: stage-level timings for
  * the bench's top offenders, so each change targets the measured
  * stage instead of the guessed one (guide §1.1). Each probe times
  * one piece of a query's pipeline via the noop sink / the same
  * pin-count protocol the query itself uses. Ad-hoc by design; not
  * part of the driver contract.
  */
object SweepOpt19 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$d/nation.parquet").count()
    // job/task census per probe: separates scheduler-round-trip cost
    // (many jobs, little task time) from real compute (task time ≈ wall)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            taskMs.addAndGet(e.taskMetrics.executorRunTime)
      })
    def t(tag: String)(f: => Unit): Unit = {
      val (j0, m0) = (jobs.get(), taskMs.get())
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100) // let straggling listener events drain
      println(f"PROBE $tag $dt%.2f s  jobs=${jobs.get() - j0} " +
        f"taskTime=${(taskMs.get() - m0) / 1e3}%.2f s")
    }
    def consume(name: String): Unit = {
      SparkEntry.queries(name)(spark, d).write.format("noop")
        .mode("overwrite").save()
      PinScope.drain()
    }
    for (q <- args if q != "beam" && q != "sim") t(q)(consume(q))
    // stage-level probe of q300's pipeline (arg "sim")
    if (args.contains("sim")) {
      val docs = Tables(spark, d, "documents")
      var fp: org.apache.spark.sql.DataFrame = null
      t("sim.fps") {
        val (x, h) = org.apache.spark.sql.graft.InternalPin
          .pin(operators.DedupExtOps.simhash64Fps(spark, docs))
        h.count(); PinScope.retain(h); fp = x
      }
      var capped: org.apache.spark.sql.DataFrame = null
      t("sim.bands_cap") {
        val bands = (0 until 4).map(b =>
            fp.select(col("doc_id"), lit(b).as("band"),
                      substring(col("fp"), b * 16 + 1, 16).as("bk")))
          .reduce(_ unionAll _)
        val (x, h) = org.apache.spark.sql.graft.InternalPin.pin(bands
          .withColumn("bn", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("band", "bk")))
          .where(col("bn") <= 64).drop("bn"))
        h.count(); PinScope.retain(h); capped = x
        println(s"  rows(capped bands) = ${x.count()}")
      }
      var cand: org.apache.spark.sql.DataFrame = null
      t("sim.cand") {
        val (x, h) = org.apache.spark.sql.graft.InternalPin.pin(capped
          .select(col("band"), col("bk"), col("doc_id").as("id_a"))
          .join(capped.select(col("band"), col("bk"),
                              col("doc_id").as("id_b")), Seq("band", "bk"))
          .where(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct())
        h.count(); PinScope.retain(h); cand = x
        println(s"  rows(cand) = ${x.count()}")
      }
      t("sim.verify") {
        val hamExpr = (1 to 64).map(i =>
          s"CASE WHEN substr(fpa, $i, 1) <> substr(fpb, $i, 1) " +
            "THEN 1 ELSE 0 END").mkString(" + ")
        cand
          .join(fp.select(col("doc_id").as("id_a"), col("fp").as("fpa")),
                Seq("id_a"))
          .join(fp.select(col("doc_id").as("id_b"), col("fp").as("fpb")),
                Seq("id_b"))
          .withColumn("hamming", expr(hamExpr).cast("long"))
          .where(col("hamming") <= 3)
          .select(col("id_a"), col("id_b"), col("hamming"))
          .orderBy("id_a", "id_b")
          .write.format("noop").mode("overwrite").save()
      }
      t("sim.full") { consume("q300_simhash_hamming") }
      PinScope.drain()
    }
    // stage-level probe of q329's pipeline (arg "beam")
    if (args.contains("beam")) {
      val W = org.apache.spark.sql.expressions.Window
      val em = Tables(spark, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val G = org.apache.spark.sql.graft.GraftFunctions
      var bb: org.apache.spark.sql.DataFrame = null
      t("beam.backbone") {
        val (x, h) = org.apache.spark.sql.graft.InternalPin
          .pin(operators.SimilarityExtOps.beamBackbone(em))
        h.count(); PinScope.retain(h); bb = x
      }
      var sims: org.apache.spark.sql.DataFrame = null
      t("beam.sims") {
        val q0 = em.where(col("vec_id") === 0).select(col("v").as("qv"))
        val (x, h) = org.apache.spark.sql.graft.InternalPin.pin(bb
          .crossJoin(broadcast(q0))
          .select(col("vec_id").as("id"), col("mr"),
                  round(G.cosineSimilarity(col("v"), col("qv")), 4).as("sim")))
        h.count(); PinScope.retain(h); sims = x
      }
      t("beam.graphbuild") {
        val packed = bb
          .agg(collect_list(struct(col("vec_id"), col("v"))).as("coll"))
        val (x, h) = org.apache.spark.sql.graft.InternalPin.pin(bb
          .select(col("vec_id").as("src"), col("v").as("vsrc"))
          .crossJoin(broadcast(packed))
          .select(col("src"),
                  G.cosineTopKAll(col("vsrc"), col("src"), col("coll"), 8)
                    .as(Seq("dst", "es")))
          .select("src", "dst"))
        h.count(); PinScope.retain(h)
      }
      t("beam.rest") { consume("q329_ann_beam") }
      PinScope.drain()
    }
    spark.stop()
  }
}
