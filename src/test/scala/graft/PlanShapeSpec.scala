package graft

/** Plan-shape guards for the SURVEY.md §4 claims: pushdown fires, hints
  * are honored, top-k avoids a full sort, aggregation is two-phase. */
class PlanShapeSpec extends SparkSpecBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q02: filter and projection reach the parquet scan") {
    val p = plan("q02_scan_pruned")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("l_shipdate"), p)
    // column pruning: quantity/price columns never read
    assert(!p.contains("l_quantity"), "scan reads pruned column l_quantity")
  }

  test("q06: broadcast hint yields a BroadcastHashJoin") {
    assert(plan("q06_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q05: dimension joins broadcast, no cartesian anywhere") {
    val p = plan("q05_join_inner4")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q28: global top-k uses TakeOrderedAndProject, not a full sort") {
    assert(plan("q28_topk").contains("TakeOrderedAndProject"))
  }

  test("q14: aggregation is two-phase (partial + final HashAggregate)") {
    val p = plan("q14_agg_hash")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q53: native cosine expression runs inside whole-stage codegen") {
    val df = SparkEntry.queries("q53_ann_query")(spark, sf)
    df.collect() // finalize the AQE plan so codegen wrapping is visible
    val p = df.queryExecution.executedPlan.toString
    // "*(n) Project [...cosine_similarity...]" = the project evaluating the
    // expression is inside a WholeStageCodegen stage
    assert("""\*\(\d+\) Project \[[^\n]*cosine_similarity""".r
             .findFirstIn(p).isDefined, p)
    // the expression itself must not be a CodegenFallback
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[org.apache.spark.sql.graft.CosineSimilarity]))
  }

  test("q43: broadcast brute force — no driver collect, bounded top-k") {
    val df = SparkEntry.queries("q43_sim_topk")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // one-row packed collection arrives via a broadcast exchange (the
    // driver never .collect()s), the CosineTopK generator block-scans
    // it, and the global top-k is a bounded TakeOrderedAndProject
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("cosine_topk"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q71: batched ANN probes buckets via broadcast hash joins") {
    val df = SparkEntry.queries("q71_ann_batch")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q73: IVF assignment is a map-local codegen'd argmin, no window sort") {
    val df = SparkEntry.queries("q73_ann_ivf")(spark, sf)
    df.collect() // finalize the AQE plan
    val p = df.queryExecution.executedPlan.toString
    // the round-3 shape shuffled+sorted the n×C crossJoin through a
    // row_number window; the assignment stage must now be shuffle-free
    assert(!p.contains("Window"), s"window sort back in the assignment stage:\n$p")
    // codegen'd map pass over the broadcast packed centroids
    assert("""\*\(\d+\) Project \[[^\n]*argmin_centroid""".r.findFirstIn(p).isDefined, p)
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[org.apache.spark.sql.graft.ArgminCentroid]))
  }

  test("q100: PQ coding+ADC is one codegen'd map pass, bounded candidate cut") {
    val df = SparkEntry.queries("q100_ann_pq")(spark, sf)
    df.collect() // finalize the AQE plan
    val p = df.queryExecution.executedPlan.toString
    // codes and asymmetric distances evaluate in a codegen'd Project
    // over the broadcast packed codebooks — no shuffle, no window sort
    assert("""\*\(\d+\) Project \[[^\n]*argmin_centroid""".r.findFirstIn(p).isDefined, p)
    assert(p.contains("squared_l2"), p)
    assert(!p.contains("Window"), s"window sort in the PQ pipeline:\n$p")
    // the ADC candidate cut is a bounded top-k, never a full sort
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[org.apache.spark.sql.graft.SquaredL2]))
  }

  test("q105: IVF-PQ keeps the codegen'd coding+ADC pass and bounded cut") {
    val df = SparkEntry.queries("q105_ann_ivfpq")(spark, sf)
    df.collect() // finalize the AQE plan
    val p = df.queryExecution.executedPlan.toString
    // cell restriction arrives broadcast; codes + ADC still evaluate in
    // a codegen'd Project, the candidate cut is still a bounded top-k
    assert("""\*\(\d+\) Project \[[^\n]*argmin_centroid""".r.findFirstIn(p).isDefined, p)
    assert(p.contains("squared_l2"), p)
    assert(!p.contains("Window"), s"window sort in the IVF-PQ pipeline:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q46: banding is one codegen'd kernel pass — no signature aggregation") {
    val df = SparkEntry.queries("q46_dedup_minhash")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the whole shingle→md5→minima→band computation is a single
    // per-document expression; the pre-r9 groupBy(doc_id) signature
    // aggregation (and its exchange) must be gone from the plan
    assert(p.contains("minhash_band_keys"), p)
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[org.apache.spark.sql.graft.MinHashBandKeys]))
  }

  test("q96/q227: winnowed minimizer emission is a pure map — no pre-shuffle window") {
    // the r13 reshape: the per-doc windowed-min selection runs as a
    // higher-order-function chain over each doc's own gram array, so
    // the r12 posexplode + doc-keyed Window passes (each an extra
    // full-gram-stream exchange) must be gone. q96's plan has no
    // window at all; q227 keeps exactly ONE — the hot-bucket cap over
    // the already-winnowed minimizer stream, not the gram tier.
    val p96 = plan("q96_decontaminate_exact")
    assert(!p96.contains("Window [") && !p96.contains("PosExplode"),
           s"q96: a window/posexplode pass crept back:\n$p96")
    val p227 = plan("q227_minimizer_pairs")
    assert(!p227.contains("PosExplode"),
           s"q227: the posexplode emission came back:\n$p227")
    // the self-join duplicates the capped subtree, so the cap window
    // appears once per side — both partition on the minimizer key m,
    // never on doc_id (the r12 gram-tier shape)
    val wins = "Window \\[[^\\n]*".r.findAllIn(p227).toSeq
    assert(wins.size == 2 &&
             wins.forall(_.contains("windowspecdefinition(m#")),
           s"q227: unexpected window set ${wins.mkString("; ")}:\n$p227")
  }

  test("q300: fingerprint fold is a map stage — no exchange before the pin") {
    // the four-formulation measurement (BASELINE r13 wave 3) shipped
    // the mapPartitions fold precisely for this property: a corpus
    // fingerprints with zero exchange; only the band/candidate
    // machinery shuffles
    val df = SparkEntry.queries("q300_simhash_hamming")(spark, sf)
    try {
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("Scan ExistingRDD") || p.contains("ExistingRDD"),
             s"q300 does not read the pinned fingerprint table:\n$p")
    } finally PinScope.drain()
  }

  test("q52: LSH signature expression runs inside whole-stage codegen") {
    val df = SparkEntry.queries("q52_lsh_buckets")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) [^\n]*lsh_signature""".r.findFirstIn(p).isDefined, p)
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[org.apache.spark.sql.graft.LshSignature]))
  }

  test("bucketed co-located join: SortMergeJoin with zero exchanges") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucket_test").toString
    Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$tmp/li").saveAsTable("graft_li_ptest")
    Tables(spark, sf, "orders").select("o_orderkey", "o_custkey")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$tmp/or").saveAsTable("graft_or_ptest")
    val j = spark.table("graft_li_ptest")
      .join(spark.table("graft_or_ptest").hint("merge"),
            col("l_orderkey") === col("o_orderkey"))
    j.collect()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
  }

  test("q113: funnel is one scan and one user_id shuffle (r9 shape was three of each)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q113_funnel")(spark, sf)
      val plan = df.queryExecution.executedPlan
      val scans = plan.collectWithSubqueries { case s: FileSourceScanExec => s }
      assert(scans.length == 1,
             s"funnel must read events once, saw ${scans.length} scans")
      val p = plan.toString
      // the three staged windows share one Exchange+Sort on user_id and
      // the per-user groupBy reuses that partitioning; the only other
      // exchange is the global rollup's SinglePartition
      assert("""Exchange hashpartitioning\(user_id""".r.findAllIn(p).size == 1, p)
      assert(!p.contains("Join"), s"funnel regressed to stage joins:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q119: merge apply is a zero-exchange full-outer SortMergeJoin") {
    val df = SparkEntry.queries("q119_merge_apply")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("SortMergeJoin") && fin.contains("FullOuter"), p)
    // both sides are bucket-sorted on the key: the apply itself needs
    // no exchange AND no sort; the only exchange in the whole plan is
    // the final presentation orderBy (rangepartitioning)
    assert(!fin.contains("Exchange hashpartitioning"),
           s"merge apply shuffled a bucketed side:\n$p")
    assert("""Exchange rangepartitioning""".r.findAllIn(fin).size == 1, p)
  }

  test("q139: sweep-line is one scan and one event_type shuffle") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q139_max_concurrency")(spark, sf)
      val plan = df.queryExecution.executedPlan
      val scans = plan.collectWithSubqueries { case s: FileSourceScanExec => s }
      assert(scans.length == 1,
             s"sweep must read events once (exploded boundaries, not a " +
             s"self-union), saw ${scans.length} scans")
      val p = plan.toString
      // running sum + peak stack on one event_type Exchange+Sort and
      // the final per-type agg reuses the partitioning (q113's trick)
      assert("""Exchange hashpartitioning\(event_type"""
               .r.findAllIn(p).size == 1, p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q140: correlation matrix is ONE scan and a two-phase 15-moment agg") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q140_corr_matrix")(spark, sf)
      val plan = df.queryExecution.executedPlan
      val scans = plan.collectWithSubqueries { case s: FileSourceScanExec => s }
      assert(scans.length == 1,
             s"all 15 moments must come from one lineitem scan, saw " +
             s"${scans.length} scans")
      val p = plan.toString
      assert(p.contains("partial_sum") || p.contains("Partial"),
             s"moment agg lost its map-side combine:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q141: KS cumulative counts are a bucket-distributed prefix sum") {
    val df = SparkEntry.queries("q141_ks_test")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the per-value interior cumsum must run partitioned by the range
    // bucket — a global ORDER BY window here would be a one-reducer
    // funnel at scale
    assert(p.contains("Exchange hashpartitioning(b"),
           s"KS prefix sum lost its bucket partitioning:\n$p")
  }

  test("q144: chi-squared totals come from the 35-row cell table, one fact scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q144_chi2_independence")(spark, sf)
      val plan = df.queryExecution.executedPlan
      val scans = plan.collectWithSubqueries { case s: FileSourceScanExec => s }
      assert(scans.length == 1,
             s"row/column/grand totals must window over the cell table, " +
             s"not rescan events; saw ${scans.length} scans")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q145: PSI cells come from one fact scan; min/max is a broadcast") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q145_psi_drift")(spark, sf)
      val plan = df.queryExecution.executedPlan
      val scans = plan.collectWithSubqueries { case s: FileSourceScanExec => s }
      // one scan feeds the binning, one feeds the 2-value min/max
      // broadcast — totals and the PSI sum window over the ≤10-row
      // cell table, never the facts
      assert(scans.length <= 2,
             s"PSI must not rescan events for totals, saw " +
             s"${scans.length} scans")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q146: Gini ranks are a bucket-distributed prefix sum") {
    val df = SparkEntry.queries("q146_gini")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // interior cumsums must run partitioned by (prio, bucket) — a
    // plain per-prio rank window is a one-reducer-per-group funnel
    assert(p.contains("Exchange hashpartitioning(prio") &&
           p.contains(", b"),
           s"Gini rank lost its bucket partitioning:\n$p")
  }

  test("q62: literal partition predicate prunes at the scan") {
    val p = plan("q62_partition_pruning")
    assert(p.contains("PartitionFilters"), p)
    assert("""PartitionFilters: \[[^\]]*event_type""".r.findFirstIn(p).isDefined, p)
  }

  test("q63: join-derived partition predicate uses dynamic pruning") {
    val p = plan("q63_dynamic_pruning").toLowerCase
    assert(p.contains("dynamicpruning"), p)
  }

  test("q13: as-of is union + one window — no join, single user_id shuffle") {
    val df = SparkEntry.queries("q13_join_asof")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the replaced shape joined purchases×signups per user (pair
    // amplification); the union+last() shape must contain no join at all
    assert(!p.contains("Join"), s"as-of regressed to a join:\n$p")
    assert(p.contains("Window"), p)
    // count shuffles in the final plan only (AQE echoes the initial plan)
    val fin = p.split("== Initial Plan ==")(0)
    assert("""Exchange hashpartitioning\(user_id""".r.findAllIn(fin).size == 1, p)
  }

  /** Asserts the persisted-index invariant shared by q76/q79: between
    * the probe join and the index table's scan there is NO shuffle —
    * downstream of the join the query may shuffle its (small) OUTPUT
    * freely, but the (100 TB) index side is never re-shuffled per batch.
    * Plans without AQE so the tree is traversable without query-stage
    * wrappers; the invariant under test is static. Returns the executed
    * plan string for extra per-query assertions. */
  private def assertIndexSideUnshuffled(qname: String, tablePrefix: String): String = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries(qname)(spark, sf)
      val plan = df.queryExecution.executedPlan
      def pathToIndexScan(p: SparkPlan): Option[List[SparkPlan]] = p match {
        case s: FileSourceScanExec
          if s.tableIdentifier.exists(_.table.startsWith(tablePrefix)) =>
          Some(List(s))
        case _ =>
          p.children.flatMap(pathToIndexScan).headOption.map(p :: _)
      }
      val path = pathToIndexScan(plan)
      assert(path.isDefined, s"index scan not found:\n$plan")
      val belowJoin = path.get.reverse.takeWhile(
        !_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
      assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeLike]),
             s"index side shuffled below the probe join:\n$plan")
      plan.toString
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q76: persisted band index joins without shuffling the index side") {
    // EnsureRequirements accepts the bucketed scan's
    // HashPartitioning(bk, 8) as-is for the merge join
    val p = assertIndexSideUnshuffled("q76_dedup_incremental", "graft_bandidx")
    assert(p.contains("SelectedBucketsCount"), p)
  }

  test("q79: persisted IVF index probes without shuffling the index side") {
    // probe cells arrive broadcast; the index is only ever streamed
    val p = assertIndexSideUnshuffled("q79_ann_index", "graft_ivfidx")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q110: rollup is a pure sketch merge — the fact table is never rescanned") {
    // the point of a MERGEABLE sketch artifact: any-day-range rollups
    // read the tiny persisted sketch table, never the events facts
    val df = SparkEntry.queries("q110_hll_daily_union")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_hllidx"), s"rollup does not scan the artifact:\n$p")
    assert(!p.contains("events.parquet"),
           s"rollup rescans the fact table:\n$p")
  }

  test("q323: the CMS merge+probe reads the persisted artifact, broadcast-joined") {
    // the mergeable-artifact contract (q110's discipline): the merge
    // reads graft_cmsidx; the 256-row merged sketch reaches the probe
    // through a broadcast, never a shuffle of the probe side
    val df = SparkEntry.queries("q323_cms_artifact")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_cmsidx"), s"probe does not scan the artifact:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"merged cells not broadcast:\n$p")
  }

  test("q324: prefix-filter join is equi-keyed end to end — no cartesian anywhere") {
    // AllPairs' whole point: candidates come from an equi-join on the
    // prefix shingle and verification from equi-joins on doc keys —
    // a cartesian or broadcast-nested-loop anywhere means the filter
    // degenerated to all-pairs
    try {
      val df = SparkEntry.queries("q324_setsim_prefix")(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"cartesian in the pair join:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ in the pair join:\n$p")
    } finally PinScope.drain()
  }

  test("q325: the ALS step is one user-keyed two-phase aggregation") {
    // the trainer's scale claim: millions of independent solves behind
    // ONE keyed aggregation — partial/final HashAggregate over the
    // fact join, the solve itself pure projection work
    val df = SparkEntry.queries("q325_als_user_step")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q339: the batch probe reads the persisted SemDeDup model, never re-fits") {
    // the q334/q131 discipline on the embedding-cluster tier: the
    // declared plan scans the cid-bucketed graft_semidx artifact; any
    // parquet scan of the embeddings is the ODD batch (the even
    // corpus is never rescanned, the 3-round Lloyd never re-runs)
    try {
      val df = SparkEntry.queries("q339_semdedup_incremental")(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("graft_semidx"),
             s"probe does not scan the artifact:\n$p")
      val scans = p.split("\n")
        .filter(l => l.contains("embeddings.parquet") && l.contains("FileScan"))
      assert(scans.forall(_.contains("% 2) = 1")),
             s"even corpus rescanned outside the artifact:\n${scans.mkString("\n")}")
    } finally PinScope.drain()
  }

  test("q329: backbone rank sorts only live census buckets, never the corpus") {
    // the r13 verdict's one `weak`: the backbone used to rank
    // row_number() OVER (ORDER BY md5(vec_id)) with no partitioning —
    // a single-partition sort of the whole corpus. The r14 shape
    // censuses 256 md5-prefix buckets first (map-side-combined
    // counts), keeps only buckets whose cumulative offset intersects
    // the 4096 cut, and ranks ONLY those buckets' rows — the rank
    // window must sit ABOVE the broadcast live-bucket prefilter, and
    // must partition on the prefix
    import org.apache.spark.sql.functions._
    val em = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val df = operators.SimilarityExtOps.beamBackbone(em)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the corpus rank window partitions on the md5 prefix
    val rankWin = "Window \\[row_number\\(\\)[^\\n]*".r.findFirstIn(p)
    assert(rankWin.exists(_.contains("pfx#")),
           s"corpus rank window not partitioned by prefix:\n$p")
    // and its input is the live-bucket broadcast join, not a raw scan:
    // in the tree print the Window line precedes its children, so the
    // join and the corpus scan both appear after it
    val wIdx = p.indexOf(rankWin.get)
    val jIdx = p.indexOf("BroadcastHashJoin", wIdx)
    val sIdx = p.indexOf("embeddings.parquet", wIdx)
    assert(jIdx > wIdx && sIdx > jIdx,
           s"rank window input is not live-bucket prefiltered:\n$p")
  }

  test("q329: beam hops read pinned views, never replan the corpus") {
    // the staged-walk contract: the declared result joins the pinned
    // final beam against the pinned sims — no parquet rescan of the
    // embeddings in the outer query
    try {
      val df = SparkEntry.queries("q329_ann_beam")(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("FileScan") && !p.contains("ParquetScan"),
             s"outer beam query replans the corpus scan:\n$p")
      assert(!p.contains("CartesianProduct"), p)
    } finally PinScope.drain()
  }

  test("q342: the walk reads the persisted graph artifact; the outer query never rescans the corpus") {
    // the production pair of q329: the k-NN graph is the offline
    // graft_beamgraph artifact (built once, IVF-bucketed); the
    // declared result joins pinned beams against pinned sims — no
    // parquet scan and no cartesian in the outer plan
    try {
      val df = SparkEntry.queries("q342_ann_graph_beam")(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("FileScan") && !p.contains("ParquetScan"),
             s"outer walk replans a scan:\n$p")
      assert(!p.contains("CartesianProduct"), p)
      // and the hop inputs really come from the artifact: the session
      // must have registered the bucketed graph table
      assert(spark.catalog.tableExists(
               BucketedCache.tableName("beamgraph", sf)),
             "graph artifact not registered")
    } finally PinScope.drain()
  }

  test("q350: the insert probes the persisted graph artifact; only the batch rescans") {
    // the graph tier's batch-vs-index contract: standing edges, hubs,
    // AND node vectors all come from graft_beamgraphinc — the even
    // corpus is never rescanned and the standing graph never rebuilt;
    // the one parquet scan is the odd insert batch
    val df = SparkEntry.queries("q350_graph_insert")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_beamgraphinc"),
           s"insert does not probe the artifact:\n$p")
    val scans = p.split("\n")
      .filter(l => l.contains("embeddings.parquet") && l.contains("FileScan"))
    assert(scans.nonEmpty && scans.forall(_.contains("% 2) = 1")),
           s"even corpus rescanned outside the artifact:\n${scans.mkString("\n")}")
  }

  test("q334: the k-NN probe reads the persisted grid index; only the batch rescans") {
    // the batch-vs-index contract (q131's discipline): the even
    // corpus lives in graft_knnidx; the one parquet scan is the odd
    // probe batch
    val df = SparkEntry.queries("q334_knn_index")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_knnidx"), s"probe does not scan the artifact:\n$p")
    // every parquet scan of the embeddings is the ODD probe batch
    // (AQE prints initial+final plans, so count-based checks misfire)
    val scans = p.split("\n")
      .filter(l => l.contains("embeddings.parquet") && l.contains("FileScan"))
    assert(scans.nonEmpty && scans.forall(_.contains("% 2) = 1")),
           s"even corpus rescanned outside the index:\n${scans.mkString("\n")}")
  }

  test("q223: as-of joins through AsOfJoinExec — two key exchanges, no window buffer") {
    // the custom operator's contract: EnsureRequirements plans exactly
    // the two key-hash exchanges an equi-join would pay, the merge
    // replaces the window form's per-key union buffering
    val df = SparkEntry.queries("q223_asof_exec")(spark, sf)
    df.collect()
    // AQE's toString repeats the initial plan — assert on the final
    // section only (node simpleStrings drop the Exec suffix)
    val full = df.queryExecution.executedPlan.toString
    val p = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    assert(p.contains("AsOfJoin"), s"custom operator not planned:\n$p")
    assert(!p.contains("Window"), s"window fallback leaked in:\n$p")
    val exchanges =
      "Exchange (hash|range)partitioning".r.findAllIn(p).length
    // 2 key-hash exchanges + the final orderBy's range exchange
    assert(exchanges <= 3, s"$exchanges exchanges:\n$p")
  }

  test("q221: audience report is pure bitmap algebra — the fact table is never rescanned") {
    // the exact-bitmap twin of q110's invariant: AND/OR probes read
    // the persisted bitmap table, never the events facts
    val df = SparkEntry.queries("q221_bitmap_audience")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_bmidx"), s"report does not scan the artifact:\n$p")
    assert(!p.contains("events.parquet"),
           s"report rescans the fact table:\n$p")
  }

  test("q128: quantile rollup is a pure sketch merge — the fact table is never rescanned") {
    // q110's invariant for the quantile artifact: any-range percentile
    // rollups read the tiny persisted sketch table, never the facts
    val df = SparkEntry.queries("q128_kll_daily_union")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_kllidx"), s"rollup does not scan the artifact:\n$p")
    assert(!p.contains("events.parquet"),
           s"rollup rescans the fact table:\n$p")
  }

  test("q131: incremental rollup scans the artifact plus ONE fact slice — history never recomputes") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q131_rollup_incremental")(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val p = plan.toString
      assert(p.contains("graft_rollupidx"),
             s"rollup does not scan the artifact:\n$p")
      // events appears exactly twice: the batch slice + the 1-row
      // max-day subquery — NEVER a third scan recomputing history
      val eventScans = plan.collectWithSubqueries {
        case s: FileSourceScanExec
          if s.toString.contains("events.parquet") => s }
      assert(eventScans.length == 2,
             s"expected batch-slice + max-day scans, got ${eventScans.length}:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q107: persisted coded index probes without shuffling the index side") {
    // probe cells and queries arrive broadcast; the coded index is
    // only ever streamed, and the ADC scores from the STORED codes —
    // the squared_l2 codeword lookup runs over index columns, with no
    // argmin (re-coding) anywhere in the probe plan
    val p = assertIndexSideUnshuffled("q107_ann_pq_index", "graft_pqidx")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("squared_l2"), p)
    assert(!p.contains("argmin_centroid"),
           s"probe plan re-codes vectors instead of reading stored codes:\n$p")
  }

  test("q120: semantic sweep probes the coded index — no re-coding, no index shuffle") {
    // q107's invariants rerun verbatim on the second consumer of the
    // coded index: the eval batch arrives broadcast, the train side is
    // only ever streamed from the bucketed table, ADC reads STORED
    // codes (squared_l2 lookup, no argmin anywhere in the probe plan)
    val p = assertIndexSideUnshuffled("q120_decontaminate_semantic",
                                      "graft_pqidx")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("squared_l2"), p)
    assert(!p.contains("argmin_centroid"),
           s"probe plan re-codes vectors instead of reading stored codes:\n$p")
  }

  test("q227/q341: minimizer queries ride the persisted signature index") {
    // r14: the corpus's winnowed minimizer stream is a persisted
    // m-bucketed artifact — q227 must read it (never re-derive the
    // gram stream: no documents scan in its plan) and q341's batch
    // probe must not re-shuffle the index side
    val p227 = SparkEntry.queries("q227_minimizer_pairs")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p227.contains("graft_minpairidx"),
           s"q227 does not scan the signature artifact:\n$p227")
    assert(!p227.contains("documents.parquet"),
           s"q227 re-derives the gram stream:\n$p227")
    val p341 = assertIndexSideUnshuffled("q341_minimizer_incremental",
                                         "graft_minpairidx")
    assert(p341.contains("SelectedBucketsCount"), p341)
  }

  test("q340: persisted Hamming-band index probes without shuffling the index side") {
    // the q76 invariant on the SimHash family: the batch bands shuffle
    // onto the index's bk bucketing; the even corpus's fingerprinted
    // postings are never rescanned or re-shuffled
    try {
      val p = assertIndexSideUnshuffled("q340_hamming_incremental",
                                        "graft_hamidx")
      assert(p.contains("SelectedBucketsCount"), p)
    } finally PinScope.drain()
  }

  test("q99: persisted gram index probes without shuffling the index side") {
    // the eval batch shuffles onto the index's bucketed m-partitioning;
    // the train-side posting lists are never rescanned or re-shuffled
    val p = assertIndexSideUnshuffled("q99_decontaminate_incr", "graft_gramidx")
    assert(p.contains("SelectedBucketsCount"), p)
  }

  test("q103: persisted minimizer index probes without shuffling the index side") {
    // the exact-substring tier under the same batch-vs-index
    // discipline — r13: the persisted index holds WINNOWED minimizer
    // posting lists (graft_minidx8), not every gram position
    val p = assertIndexSideUnshuffled("q103_decontaminate_exact_incr",
                                      "graft_minidx8")
    assert(p.contains("SelectedBucketsCount"), p)
  }

  test("q104: composed pipeline probes BOTH persisted artifacts, recomputes neither") {
    // the point of q104: the cluster table AND the gram index are
    // session artifacts with a lifecycle — the pipeline's plan must
    // scan both bucketed tables and re-run neither the fixpoint (no
    // pinned-RDD scan) nor the train-side index build
    val df = SparkEntry.queries("q104_pipeline_prep")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_clusters"),
           s"pipeline does not scan graft_clusters:\n$p")
    assert(p.contains("graft_gramidx"),
           s"pipeline does not scan graft_gramidx:\n$p")
    assert(!p.contains("ExistingRDD"),
           s"pipeline re-embeds the fixpoint's pinned RDD:\n$p")
  }

  test("q302: pipeline v3 probes all three persisted artifacts, recomputes none") {
    // q104's contract extended: clusters + 3-shingle index + the r13
    // winnowed minimizer index are all session artifacts — the plan
    // must scan all three bucketed tables and re-run neither the
    // fixpoint nor either index build
    val df = SparkEntry.queries("q302_pipeline_prep_v3")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    for (t <- Seq("graft_clusters", "graft_gramidx", "graft_minidx8"))
      assert(p.contains(t), s"pipeline v3 does not scan $t:\n$p")
    assert(!p.contains("ExistingRDD"),
           s"pipeline v3 re-embeds the fixpoint's pinned RDD:\n$p")
  }

  test("q347: pipeline v4 probes all three r14 artifacts, recomputes none") {
    // q302's contract on the new tier set: the funnel's plan must scan
    // the minimizer signature index, the Hamming band index and the
    // SemDeDup model — and re-run none of their builds (the only
    // corpus work is the batch-side emissions and probes)
    try {
      val df = SparkEntry.queries("q347_pipeline_prep_v4")(spark, sf)
      df.collect()
      for (t <- Seq("minpairidx", "hamidx", "semidx"))
        assert(spark.catalog.tableExists(BucketedCache.tableName(t, sf)),
               s"pipeline v4 did not register graft_$t")
      val p = df.queryExecution.executedPlan.toString
      // the declared rollup reads the pinned drop sets + the batch
      // docs scan; any documents scan in it is the odd batch
      val scans = p.split("\n")
        .filter(l => l.contains("documents.parquet") && l.contains("FileScan"))
      assert(scans.forall(_.contains("% 2) = 1")),
             s"even corpus rescanned in the funnel:\n${scans.mkString("\n")}")
    } finally PinScope.drain()
  }

  test("q303: MATCH_RECOGNIZE reduction is one scan and one user_id shuffle") {
    // the RLE matcher's whole scale claim: every window (row-level
    // chg/run_id/rn_run AND the run-level leads/match_no) partitions
    // by user and shares ONE Exchange; the only other exchange is the
    // output sort's range partitioning
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q303_match_recognize")(spark, sf)
      val plan = df.queryExecution.executedPlan
      val scans = plan.collectWithSubqueries { case s: FileSourceScanExec => s }
      assert(scans.length == 1,
             s"matcher must read events once, saw ${scans.length} scans")
      val p = plan.toString
      assert("""Exchange hashpartitioning\(user_id""".r.findAllIn(p).size == 1,
             s"expected exactly one user_id exchange:\n$p")
      assert(!p.contains("Exchange SinglePartition"),
             s"matcher grew a global window:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("per-key top-k family gets map-side WindowGroupLimit pruning from Catalyst") {
    // the brief's extension ladder, applied honestly: prefer the
    // optimizer's own operator over a custom one. Spark 3.5+
    // InferWindowGroupLimit rewrites Filter(row_number <= k over
    // (part, order)) into a PARTIAL WindowGroupLimit before the
    // shuffle plus a final one after — per-key bounded-heap pruning,
    // i.e. the map-side combine of rank windows, which is exactly
    // what a hand-built TopKPerKey operator would provide. Assert it
    // fires on every declared per-key top-k query so a query-shape
    // change that breaks the pattern (non-literal k, a rank hidden
    // where the rule can't see it) surfaces here, not as a silent
    // full-sort regression at scale.
    for (q <- Seq("q71_ann_batch", "q79_ann_index",
                  "q107_ann_pq_index", "q94_tfidf", "q143_weighted_sample")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("WindowGroupLimit"),
             s"$q lost WindowGroupLimit pruning:\n$p")
    }
  }

  test("q09/q10: semi and anti joins plan as joins, not subquery loops") {
    assert(plan("q09_join_semi").contains("LeftSemi"))
    assert(plan("q10_join_anti").contains("LeftAnti"))
  }

  test("q83: cluster table broadcasts to both corpus joins, no merge join") {
    val df = SparkEntry.queries("q83_dedup_keep_best")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the tiny cluster table must reach the corpus via broadcast on the
    // inner (clustered) AND anti (singleton) branches; the corpus is
    // never shuffled for a join, and the window sorts only the
    // clustered sliver (inside the broadcast-join branch)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q82/q83: clusters come from the persisted table, not a fixpoint re-run") {
    // the r7 verdict's one scale flaw: keep-best re-ran the whole
    // connected-components fixpoint q82 had just computed. Both queries
    // must now read the bucketed graft_clusters artifact — their plans
    // scan it and contain NO pinned-RDD scan (the fixpoint's signature
    // node); the fixpoint runs only inside the one-time table build
    for (q <- Seq("q82_dedup_clusters", "q83_dedup_keep_best")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(p.contains("graft_clusters"), s"$q does not scan graft_clusters:\n$p")
      assert(!p.contains("ExistingRDD"),
             s"$q still embeds the fixpoint's pinned RDD:\n$p")
    }
  }

  test("q94: df join is threshold-driven — AQE broadcasts it, no hint forced") {
    val df = SparkEntry.queries("q94_tfidf")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the tf ⋈ dfreq join carries NO broadcast hint (a web-scale
    // vocabulary is not a broadcastable dimension); at test scale the
    // runtime statistics still turn it into a broadcast join — the
    // plan is chosen by threshold, not forced by the query
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q97: z-order layout prunes row groups for BOTH predicate families") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val total = Tables(spark, sf, "lineitem").count()
      val dir = sources.PartitionedOps.zorderLineitemDir(spark, sf)
      def readRows(pred: org.apache.spark.sql.Column): Long = {
        val df = spark.read.parquet(dir).where(pred)
          .agg(count(lit(1)))
        df.collect()
        val scans = df.queryExecution.executedPlan
          .collectWithSubqueries { case s: FileSourceScanExec => s }
        assert(scans.length == 1)
        scans.head.metrics("numOutputRows").value
      }
      val b = Tables(spark, sf, "lineitem")
        .agg(min("l_partkey"), max("l_partkey")).head
      val cut = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 8
      val dateRead = readRows(
        col("l_shipdate") >= lit("1996-06-01").cast("date") &&
          col("l_shipdate") < lit("1996-09-01").cast("date"))
      val pkRead = readRows(col("l_partkey") <= cut)
      // 3 bits per dimension: a range partition pins 2 of each family's
      // cell bits, so either predicate family should touch ~1/4 of the
      // layout (vs 100% for the off-key family on q90's single-key
      // sort); 0.5 leaves headroom for range-boundary fuzz
      assert(dateRead > 0 && dateRead < total * 0.5,
             s"date family read $dateRead of $total")
      assert(pkRead > 0 && pkRead < total * 0.5,
             s"partkey family read $pkRead of $total")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q124: compaction collapses the file count AND restores range-scan pruning") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def parquetFiles(dir: String): Long = {
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(
          java.nio.file.Files.list(java.nio.file.Paths.get(dir))) { st =>
          st.iterator.asScala.count(_.getFileName.toString.endsWith(".parquet"))
            .toLong
        }
      }
      val fragDir = sources.PartitionedOps.fragmentedEventsDir(spark, sf)
      val compDir = sources.PartitionedOps.compactedEventsDir(spark, sf)
      val (nFrag, nComp) = (parquetFiles(fragDir), parquetFiles(compDir))
      assert(nFrag >= 32, s"fragment fixture too coarse: $nFrag files")
      assert(nComp * 8 <= nFrag,
             s"compaction must collapse files >= 8x: $nFrag -> $nComp")
      // the range scan must read a fraction of the compacted layout
      // (ts-clustered row groups prune on the pushed predicate) while
      // the SAME predicate on the fragmented layout reads everything
      // (every fragment covers the whole span)
      def readRows(dir: String): (Long, Long) = {
        val pred = col("day") >= lit("2024-01-10").cast("date") &&
          col("day") < lit("2024-01-15").cast("date")
        val df = spark.read.parquet(dir).where(pred).agg(count(lit(1)))
        df.collect()
        val scans = df.queryExecution.executedPlan
          .collectWithSubqueries { case s: FileSourceScanExec => s }
        assert(scans.length == 1)
        (scans.head.metrics("numOutputRows").value,
         spark.read.parquet(dir).count())
      }
      val (compRead, total) = readRows(compDir)
      val (fragRead, _) = readRows(fragDir)
      assert(compRead > 0 && compRead < total / 2,
             s"compacted scan read $compRead of $total — no pruning")
      assert(fragRead > total * 9 / 10,
             s"fragmented control read only $fragRead of $total — " +
               "fixture unexpectedly prunes, the comparison proves nothing")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q90: sorted layout skips row groups — scan reads a fraction of the table") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // plan without AQE so the scan is reachable without stage wrappers
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q90_sorted_layout")(spark, sf)
      df.collect() // materialize so the scan metric is populated
      val plan = df.queryExecution.executedPlan
      val scans = plan.collectWithSubqueries { case s: FileSourceScanExec => s }
      assert(scans.length == 1, s"expected one scan:\n$plan")
      assert(scans.head.metadata("PushedFilters").contains("l_shipdate"),
             s"date predicate not pushed to parquet:\n$plan")
      val total = Tables(spark, sf, "lineitem").count()
      val read = scans.head.metrics("numOutputRows").value
      // the 3-month window is ~3% of rows; row-group granularity means
      // the reader decodes somewhat more, but stat-based skipping must
      // eliminate the bulk of the table
      assert(read < total * 0.3,
             s"row-group pruning ineffective: read $read of $total rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q86: profile is one scan of documents (multi-distinct via Expand)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // static shape under test — plan without AQE so the tree has no
    // query-stage wrappers hiding the scan from collect()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q86_profile_stats")(spark, sf)
        .queryExecution.executedPlan
      val scans = plan.collectWithSubqueries {
        case s: FileSourceScanExec => s }
      assert(scans.length == 1,
             s"profiler must read the table once, saw ${scans.length} scans")
      assert(plan.toString.contains("Expand"), plan.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q162: AQE splits the skewed lang partition; result equals the salted twin") {
    import org.apache.spark.sql.functions._
    // sf0.01: the en partition (~64 KB of text, ~6-12 KB compressed on
    // the wire) exceeds the query's scaled 2 KB skew threshold
    val d01 = "/root/testdata/sf0.01"
    val df = SparkEntry.queries("q162_join_skew_aqe")(spark, d01)
    val rows = df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
           s"AQE skew split did not fire on the en partition:\n$p")
    // the manually-salted twin (q60's technique on the same cohort
    // join) must produce the identical row set — the two mitigations
    // are interchangeable on a batch join
    val salt = 8
    val docs = Tables(spark, d01, "documents")
      .select(col("doc_id"), col("lang"),
              length(col("text")).cast("long").as("doc_chars"))
    val cohort = docs.groupBy("lang")
      .agg(count(lit(1)).as("lang_docs"),
           sum(col("doc_chars").cast("long")).as("lang_chars"))
      .withColumn("sr", explode(array((0 until salt).map(lit(_)): _*)))
    val salted = docs.withColumn("sl", pmod(col("doc_id"), lit(salt)))
      .join(cohort, Seq("lang")).where(col("sl") === col("sr"))
      .select(col("doc_id"), col("lang"), col("doc_chars"),
              col("lang_docs"), col("lang_chars"),
              round(col("doc_chars").cast("double") /
                    col("lang_chars").cast("double"), 6).as("char_share"))
      .orderBy("doc_id").collect()
    assert(rows.toSeq == salted.toSeq,
           "AQE-split join and manually-salted join disagree")
  }

  test("q163: ANALYZE stats flip the join to broadcast; without stats it shuffles") {
    import org.apache.spark.sql.functions._
    val d01 = "/root/testdata/sf0.01"
    // WITH stats + CBO (the declared query): the filtered orders side
    // is estimated from row count × selectivity(o_totalprice > 498k)
    // and comes in under the threshold → BroadcastHashJoin, no hint
    val df = SparkEntry.queries("q163_cbo_broadcast")(spark, d01)
    df.collect()
    val withStats = df.queryExecution.executedPlan.toString
    assert(withStats.contains("BroadcastHashJoin"),
           s"stats+CBO did not produce a broadcast join:\n$withStats")
    // WITHOUT stats (plain file relation, same threshold, AQE off so
    // runtime sizes can't rescue the estimate): the filter does not
    // shrink a size-only estimate — only column pruning scales it
    // (279 KB file × 2/9 columns ≈ 60 KB > the 32 KB threshold) → the
    // STATIC plan must fall back to a shuffle join
    val iso = spark.newSession()
    iso.conf.set("spark.sql.adaptive.enabled", "false")
    iso.conf.set("spark.sql.autoBroadcastJoinThreshold", (32 * 1024).toString)
    val noStats = Tables(iso, d01, "lineitem")
      .join(Tables(iso, d01, "orders").where(col("o_totalprice") > 498000),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_items"))
      .queryExecution.executedPlan.toString
    assert(noStats.contains("SortMergeJoin") ||
             noStats.contains("ShuffledHashJoin"),
           s"no-stats contrast unexpectedly broadcast:\n$noStats")
  }

  test("q165: CBO reorders the written fact-fact-first join; without stats the written order survives") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.functions._
    val d01 = "/root/testdata/sf0.01"
    def innermostJoins(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect { case j: Join => j }
        .filter(_.children.forall(_.collect { case j: Join => j }.isEmpty))
    // WITH stats + CBO: the query is written (lineitem ⋈ orders) ⋈
    // customer; the optimizer must rewrite so the innermost join is
    // (orders ⋈ filtered customer) — lineitem joins LAST
    // a join subtree "touches lineitem" iff lineitem attributes (the
    // l_-prefixed columns) appear in its output — relation strings
    // don't carry table names for either catalog or file relations
    def touchesLineitem(j: Join): Boolean =
      j.output.exists(_.name.startsWith("l_"))
    val df = SparkEntry.queries("q165_cbo_reorder")(spark, d01)
    df.collect()
    val inner = innermostJoins(df.queryExecution.optimizedPlan)
    assert(inner.nonEmpty, "no joins in the optimized plan")
    assert(inner.forall(!touchesLineitem(_)),
           s"CBO did not reorder lineitem out of the innermost join:\n" +
             df.queryExecution.optimizedPlan)
    // WITHOUT stats (plain file relations, CBO off): the written order
    // survives — the innermost join is exactly lineitem ⋈ orders
    val iso = spark.newSession()
    val noStats = Tables(iso, d01, "lineitem")
      .join(Tables(iso, d01, "orders"),
            col("l_orderkey") === col("o_orderkey"))
      .join(Tables(iso, d01, "customer")
              .where(col("c_mktsegment") === "BUILDING"),
            col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey").agg(count(lit(1)).as("n_items"))
    val inner2 = innermostJoins(noStats.queryExecution.optimizedPlan)
    assert(inner2.exists(touchesLineitem),
           "no-stats contrast unexpectedly reordered the join")
  }

  test("q166: every day partition of the incremental layout ends single-file") {
    SparkEntry.queries("q166_compact_incremental")(spark, sf).collect()
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_inc_compact_events_" +
        sf.replaceAll("[^a-zA-Z0-9]", "_"))
    val days = java.nio.file.Files.list(root).iterator.asScala
      .filter(_.getFileName.toString.startsWith("day=")).toSeq
    assert(days.size == 30, s"expected 30 day partitions, saw ${days.size}")
    for (dd <- days) {
      val files = java.nio.file.Files.list(dd).iterator.asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      assert(files.size == 1,
             s"$dd not compacted: ${files.map(_.getFileName)}")
    }
  }

  test("q169: the runtime bloom filter guards the fact scan; disabled twin plans the same join bare") {
    import org.apache.spark.sql.functions._
    val d01 = "/root/testdata/sf0.01"
    // declared query: InjectRuntimeFilter must wrap the lineitem probe
    // side in might_contain(...) fed by a bloom aggregate over the
    // filtered orders side — visible in the final adaptive plan
    val df = SparkEntry.queries("q169_runtime_bloom")(spark, d01)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
           s"no runtime bloom filter in the executed plan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
           s"q169's join must stay a shuffle join (broadcast pinned off):\n$plan")
    // contrast: same query, injection disabled — same shuffle join,
    // no bloom guard (the filter is pure pruning the engine ADDS)
    val iso = spark.newSession()
    iso.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    iso.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val bare = Tables(iso, d01, "lineitem")
      .join(Tables(iso, d01, "orders")
              .where(col("o_totalprice") > 400000)
              .select("o_orderkey", "o_orderpriority"),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"))
    bare.collect()
    val barePlan = bare.queryExecution.executedPlan.toString
    assert(!barePlan.contains("might_contain"),
           s"disabled twin still carries a bloom filter:\n$barePlan")
  }

  test("q154/q161: derivations read the pinned cell table, never the facts") {
    // r10 shipped these with docstrings claiming one fact scan while
    // the lazy cell table was referenced 2x/3x (the r10 ADVICE item);
    // both now pin the cell table at build time (the q148 discipline),
    // so the DECLARED plan must contain ZERO events scans — every
    // branch (range/binning for q154; base + two shifted self-joins
    // for q161) reads the materialized pinned blocks.
    import org.apache.spark.sql.execution.FileSourceScanExec
    for (q <- Seq("q154_value_histogram", "q161_forecast_screen")) {
      try {
        val plan = SparkEntry.queries(q)(spark, sf)
          .queryExecution.executedPlan
        val factScans = plan.collectWithSubqueries {
          case s: FileSourceScanExec
            if s.toString.contains("events.parquet") => s }
        assert(factScans.isEmpty,
               s"$q must derive from the pinned cell table, saw " +
               s"${factScans.length} fact scans")
        assert(plan.toString.contains("Scan ExistingRDD"),
               s"$q lost its pinned cell table:\n$plan")
      } finally PinScope.drain()
    }
  }

  test("q170: LATERAL decorrelates to one rank window with map-side WindowGroupLimit prune") {
    val df = SparkEntry.queries("q170_join_lateral")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // DecorrelateInnerQuery turns the per-nation ORDER BY ... LIMIT 2
    // into ONE rank window over a single shuffled customer scan — never
    // a per-outer-row re-execution (which would plan as a nested loop)
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // Spark's rank-limit pushdown prunes each group to its top-2 BEFORE
    // the shuffle (partial WindowGroupLimit below the Exchange) — the
    // 100 TB guarantee that only ~2×|groups| rows ever cross the wire
    val shuffleIdx = p.indexOf("Exchange hashpartitioning")
    assert(shuffleIdx > 0, p)
    assert(p.indexOf("WindowGroupLimit", shuffleIdx) > 0,
           s"no map-side WindowGroupLimit below the customer shuffle:\n$p")
  }

  test("q171: correlated subqueries decorrelate to aggregate + semi joins, none per-row") {
    val df = SparkEntry.queries("q171_subquery_scalar")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the IN becomes a left semi join; each correlated scalar aggregate
    // becomes an aggregated (outer-join) branch — per-row subquery
    // re-execution would appear as a nested loop or an InSubqueryExec
    assert(p.contains("LeftSemi"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(!p.contains("InSubqueryExec"), p)
  }

  test("q172: window and union-length aggregate share ONE user_id exchange") {
    val df = SparkEntry.queries("q172_interval_union")(spark, sf)
    df.collect()
    // AQE's toString repeats the tree under "== Initial Plan ==" —
    // count exchanges in the final plan only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the running-max window shuffles on user_id once; the per-user
    // aggregate reuses that partitioning (grouping key = partition key)
    // so no second hash exchange ever appears — only the final
    // presentation sort's range exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("Window"), p)
  }

  test("q174: PIT join is a keyed equi join with the interval as residual, never a nested loop") {
    val df = SparkEntry.queries("q174_pit_join")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the as-of lookup must plan as an equi join on the surrogate key
    // (interval predicate as residual filter) — a planner that only
    // sees the range condition degenerates to BroadcastNestedLoopJoin,
    // which is corpus×dim at 100 TB
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("q175: BM25 term filter runs below the aggregate; top-k is bounded") {
    val df = SparkEntry.queries("q175_bm25")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the fixed-query filter must hit the exploded token stream BEFORE
    // the (doc, term) aggregate — the corpus-sized explosion never
    // shuffles; and the final top-k must be TakeOrderedAndProject, not
    // a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
    // tree prints root-first: the term filter must print BEFORE the
    // explode it consumes (filter directly on the generated stream)
    // and AFTER an aggregate (i.e. below it in the plan)
    val filt = """Filter [^\n]*hash""".r.findFirstMatchIn(p)
      .map(_.start).getOrElse(-1)
    val gen = p.indexOf("Generate explode")
    assert(filt >= 0 && gen > filt,
           s"no term filter directly above the explode:\n$p")
    assert(p.lastIndexOf("HashAggregate", filt) >= 0,
           s"term filter not below the (doc, term) aggregate:\n$p")
  }

  test("q177/q179: stat windows and aggregates share the narrow count shuffle") {
    // both operators reduce the corpus to a narrow keyed count table,
    // then run every window on partitionings derived from that ONE
    // shuffle — the final presentation sort and (for q177) the argmax
    // regroup are the only other exchanges; no window may force a
    // second corpus-wide exchange
    for (q <- Seq("q177_cusum_change", "q179_freq_bins")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(hashEx <= 2, s"$q: $hashEx hash exchanges — window lost " +
        s"the count-table partitioning:\n$p")
      assert(p.contains("Window"), p)
    }
  }

  test("q181: mode is a two-phase pair count, then an argmax over value groups") {
    val df = SparkEntry.queries("q181_agg_mode")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // partial+final HashAggregate on (type, cents): the corpus
    // combines map-side; the window then ranks the DOMAIN-bound value
    // groups, never corpus rows
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Window"), p)
    assert(p.indexOf("Window") < p.indexOf("HashAggregate"),
           s"argmax window must consume the value-group aggregate:\n$p")
  }

  test("q183: lookback join stays a keyed equi join with residual, never a nested loop") {
    val df = SparkEntry.queries("q183_attribution_linear")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the 7-day window must ride the user_id equi key as a residual
    // condition — a planner that only sees the time range degenerates
    // to a per-purchase scan of all touches
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("q185: three deadline windows stack on ONE user_id exchange (q113's shape)") {
    val df = SparkEntry.queries("q185_funnel_windowed")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
           s"funnel stages split across extra exchanges:\n$p")
    assert("Window".r.findAllIn(p).size >= 1, p)
  }

  test("q187: postings probe prunes to the query terms' buckets, never rescans the corpus") {
    val df = SparkEntry.queries("q187_bm25_index")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the term filter on the bucket key prunes the index scan at
    // planning time: a 3-term query reads at most 3 of the 8 buckets
    assert("""SelectedBucketsCount: [1-3] out of 8""".r
             .findFirstIn(p).isDefined,
           s"bucket pruning did not fire on the postings scan:\n$p")
    // and the probe never touches the corpus — the index IS the data
    assert(!p.contains("documents.parquet"),
           s"q187 rescanned the corpus instead of probing the index:\n$p")
  }

  test("q358: phrase probe prunes to the terms' buckets, never rescans the corpus") {
    val df = SparkEntry.queries("q358_phrase_index")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the 5 distinct phrase terms filter on the bucket key, so the
    // positional-index scan prunes at planning time (q187's rule)
    assert("""SelectedBucketsCount: [1-5] out of 8""".r
             .findFirstIn(p).isDefined,
           s"bucket pruning did not fire on the positional index:\n$p")
    assert(!p.contains("documents.parquet"),
           s"q358 rescanned the corpus instead of probing the index:\n$p")
  }

  test("q359: only the batch scans documents; the standing index is bucket-pruned") {
    val df = SparkEntry.queries("q359_phrase_incremental")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""SelectedBucketsCount: [1-5] out of 8""".r
             .findFirstIn(p).isDefined,
           s"bucket pruning did not fire on the standing index:\n$p")
    // every documents FileScan must carry the odd-batch predicate —
    // the standing half is served by the artifact, never re-tokenized
    val scans = p.split("\n").filter(l =>
      l.contains("FileScan") && l.contains("documents.parquet"))
    assert(scans.nonEmpty, s"no batch scan found:\n$p")
    assert(scans.forall(_.contains("% 2) = 1")),
           s"a documents scan is not batch-restricted:\n$p")
  }

  test("q195: rank-limit pushdown prunes map-side below the singleton window") {
    val df = SparkEntry.queries("q195_topk_ties")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the global rank window must be fed by a partial WindowGroupLimit
    // BELOW its SinglePartition exchange — each input partition ships
    // only its own rank-≤3 candidates
    val ex = p.indexOf("Exchange SinglePartition")
    assert(ex > 0, p)
    assert(p.indexOf("WindowGroupLimit", ex) > 0,
           s"no map-side WindowGroupLimit below the singleton exchange:\n$p")
  }

  test("q354: per-phrase top-5 prunes map-side; postings are term-filtered at emission") {
    val df = SparkEntry.queries("q354_phrase_search")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the rank <= 5 filter must plan a partial WindowGroupLimit below
    // the phrase-keyed exchange (the q195 mechanism): each input
    // partition ships at most 5 candidate docs per phrase
    assert(p.contains("WindowGroupLimit"),
           s"no map-side WindowGroupLimit for the per-phrase top-5:\n$p")
    // and the postings emission keeps only the query terms — the
    // adjacency join's inputs carry the IN-list filter, never the
    // full token stream
    assert(p.contains("t#") && (p.contains(" IN (") || p.contains("INSET")),
           s"postings not term-filtered at emission:\n$p")
  }

  test("q173: two-phase skyline — grouped local prune, then single-partition frontier") {
    val df = SparkEntry.queries("q173_skyline")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // phase 1: windows partitioned by the pmod group run parallel;
    // phase 2: the global frontier windows run on ONE partition that
    // only ever receives the pruned ~frontier×groups rows
    assert(p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("Exchange SinglePartition"), p)
    assert("Window".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bench protocol: noop sink executes what count() prunes") {
    // the r12 harness fix's regression guard: count(1) lets the
    // optimizer drop aggregate expressions (a grouping-less aggregate
    // knows its row count without computing its aggregates), so a
    // count-based bench never times them. raise_error inside the
    // aggregate proves it: count() succeeds BECAUSE the expression
    // never ran; the noop write must throw BECAUSE it runs everything.
    import org.apache.spark.sql.functions._
    val df = spark.range(10).agg(
      sum(expr("CASE WHEN id = 5 THEN " +
               "CAST(raise_error('aggregate was executed') AS BIGINT) " +
               "ELSE id END")).as("boom"))
    assert(df.count() == 1L, "count() should skip the aggregate work")
    val thrown = intercept[Exception] {
      df.write.format("noop").mode("overwrite").save()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.toString +: chain(e.getCause))
    assert(chain(thrown).exists(_.contains("aggregate was executed")),
           s"unexpected failure: ${chain(thrown).mkString(" <- ")}")
  }

  test("q202: closed-form clamp rides ONE user shuffle; groupBy reuses it") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q202_clamped_ledger")(spark, sf)
        .queryExecution.executedPlan
      // exchange 1: hashpartitioning(user_id) feeding the stacked
      // prefix-sum/running-min windows AND the per-user aggregate;
      // exchange 2: the presentation orderBy. Nothing else — the
      // sequential-looking ledger never costs a second data movement.
      val ex = plan.collect { case e: ShuffleExchangeLike => e }
      assert(ex.size == 2, s"expected 2 exchanges, got ${ex.size}:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q204: PIT features are one window pass — no self-join, 2 exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q204_pit_features")(spark, sf)
        .queryExecution.executedPlan
      val p = plan.toString
      assert(!p.contains("Join"), s"PIT features must not self-join:\n$p")
      val ex = plan.collect { case e: ShuffleExchangeLike => e }
      // user_id window shuffle + presentation orderBy only
      assert(ex.size == 2, s"expected 2 exchanges, got ${ex.size}:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q206: audience probe scans only the artifact; buckets absorb the distinct") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // build/refresh the artifact through the declared query once
      SparkEntry.queries("q206_audience_artifact")(spark, sf).collect()
      PinScope.drain()
      val tbl = spark.catalog.listTables().collect()
        .map(_.name).filter(_.startsWith("graft_audience")).head
      val probe = spark.table(tbl)
        .where(org.apache.spark.sql.functions.col("day")
                 .between("2024-01-08", "2024-01-21"))
        .select("user_id", "event_type").distinct()
      val plan = probe.queryExecution.executedPlan
      val scans = plan.collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty && scans.forall(
               _.tableIdentifier.exists(_.table.startsWith("graft_audience"))),
             s"probe must read the artifact, never the fact table:\n$plan")
      // grouping on (user_id, event_type) is satisfied by the user_id
      // bucket distribution — the re-distinct costs ZERO exchanges
      val ex = plan.collect { case e: ShuffleExchangeLike => e }
      assert(ex.isEmpty,
             s"range re-distinct should ride the bucket layout:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      PinScope.drain()
    }
  }

  test("q229: rank algebra lives on the value-group table, facts join once") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q229_auc_rank")(spark, sf)
      val p = df.queryExecution.executedPlan
      // the orders-lineitem label join + per-order agg happen BELOW the
      // pin, so the executed plan above it must carry no join on fact
      // tables — only the domain-bound cum/npos join
      val joins = p.toString
      assert(!joins.contains("CartesianProduct"), joins)
      // cumCounts' interior cumsums run partitioned (prio, bucket) —
      // no single-partition global window over the value groups
      assert(!joins.contains("SinglePartition) AS"), joins)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      PinScope.drain()
    }
  }

  test("q230/q231: one fact scan; margins are windows over the cell table") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for ((q, fact) <- Seq("q230_target_encoding" -> "orders",
                            "q231_mutual_info" -> "events")) {
        val p = SparkEntry.queries(q)(spark, sf)
          .queryExecution.executedPlan.toString
        val factScans = s"$fact\\.parquet".r.findAllIn(p).size
        assert(factScans == 1,
               s"$q: fact table scans $factScans times:\n$p")
        PinScope.drain()
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q233: the EWMA unroll rides ONE event_type exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q233_ewma_spikes")(spark, sf)
      val plan = df.queryExecution.executedPlan
      val ex = plan.collect { case e: ShuffleExchangeLike => e }
      // one shuffle for the type-keyed window; the groupBy reuses its
      // partitioning (q113's shape) — plus the final tiny sort
      assert(ex.size <= 2, s"q233 shuffles ${ex.size}x:\n$plan")
      // all 64 lags + the spike rule evaluate in ONE Window operator
      val winOps = "\\bWindow\\b".r.findAllIn(plan.toString).size
      assert(winOps <= 2, s"q233 stacked $winOps Window operators:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      PinScope.drain()
    }
  }

  test("q234: pair generation is array algebra — no fact self-join") {
    val df = SparkEntry.queries("q234_basket_rules")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the basket path must contain a generator over the collected
    // arrays, not a lineitem-lineitem sort-merge self-join
    assert(p.contains("Generate"), p)
    assert(!p.contains("CartesianProduct"), p)
    PinScope.drain()
  }

  test("q245: the certified branch plans a semi join, never the term join") {
    val df = SparkEntry.queries("q245_join_size_pk")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // customer_orders certifies → LeftSemi appears; the events self
    // branch keeps the general inner count-table join
    assert(p.contains("LeftSemi"), p)
  }

  test("q246: the batch probe never rescans the base corpus") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // ensure the index exists, then inspect a fresh plan
      SparkEntry.queries("q246_novelty_incremental")(spark, sf).collect()
      PinScope.drain()
      val p = SparkEntry.queries("q246_novelty_incremental")(spark, sf)
        .queryExecution.executedPlan.toString
      // the documents table appears for the batch grams + the source
      // dim read; the BASE side must come from the bucketed index, so
      // no scan of documents.parquet may sit under the anti join's
      // build side — count total corpus scans and require the index
      // table to appear
      assert(p.contains("graft_gramfirst"), p)
      val scans = "documents\\.parquet".r.findAllIn(p).size
      assert(scans <= 3, s"base corpus rescanned ($scans scans):\n$p")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      PinScope.drain()
    }
  }

  test("q244: checksums are partial-aggregated — map-side combine, no sort") {
    val df = SparkEntry.queries("q244_table_checksum")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // commutative sum ⇒ two-phase HashAggregate per branch, never a
    // SortAggregate or a global sort below the union
    assert(!p.contains("SortAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 6, p)
  }

  test("q247-q250: rank statistics run on pinned / value-group tables") {
    // q247 collapses the corpus to value groups in ONE fact scan; the
    // ordered rank window then runs on that domain-bound table
    val p247 = SparkEntry.queries("q247_mann_whitney")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(p247).size == 1, p247)
    // q248/q249/q250 pay their single fact scan at pin time (kmLife /
    // supplierEraRev / the daily cell table); the returned statistic
    // plan must read pinned blocks only — zero parquet rescans
    for (name <- Seq("q248_logrank", "q249_spearman", "q250_lead_lag")) {
      try {
        val p = SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        assert(!p.contains("FileScan") && !p.contains("ParquetScan"),
               s"$name replans the fact scan instead of reading the pin")
      } finally PinScope.drain()
    }
  }

  test("q251-q254: test statistics are cell-table algebra after one pass") {
    // q251/q252: ONE events scan into a map-side-combined cell table
    // (types / arms), nothing else touches parquet
    for (name <- Seq("q251_anova", "q252_cuped")) {
      val p = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert("FileScan|Scan parquet".r.findAllIn(p).size == 1,
             s"$name should scan exactly one fact table\n" + p)
      assert(!p.contains("SortAggregate"), p)
    }
    // q253: the orders⋈lineitem label join is the only fact term (two
    // scans); the AP window rides the value-group table, and no
    // corpus-sized sort exists below the window's tiny input
    val p253 = SparkEntry.queries("q253_avg_precision")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(p253).size == 2, p253)
    // q254: one orders scan + two BROADCAST dim joins; the BH stage is
    // windows over the 25-row cell table — no extra exchange-heavy join
    val p254 = SparkEntry.queries("q254_bh_fdr")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(p254).size == 3, p254)
    assert("BroadcastHashJoin".r.findAllIn(p254).size == 2, p254)
    assert(!p254.contains("SortMergeJoin"), p254)
  }

  test("q255-q258: time-series/attribution stay fact-scan bound") {
    // q255: the lineitem⋈part join is the only fact term (two scans
    // into brand-bound moment cells, no sort agg)
    val p255 = SparkEntry.queries("q255_elasticity")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(p255).size == 2, p255)
    assert(!p255.contains("SortAggregate"), p255)
    // q256: ONE fact scan collapses to daily cells; the centered-MA
    // window and the 7-row rollup ride that table
    val p256 = SparkEntry.queries("q256_seasonal_index")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(p256).size == 1, p256)
    // q257: purchases and touches are two filtered reads of the one
    // events table, joined USER-keyed (the band is a residual
    // predicate, not a join strategy change)
    val p257 = SparkEntry.queries("q257_attribution_decay")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(p257).size == 2, p257)
    // q258: the fact scan is paid once at pin time; the backtest plan
    // reads pinned cell blocks only
    try {
      val p258 = SparkEntry.queries("q258_forecast_backtest")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p258.contains("FileScan") && !p258.contains("ParquetScan"),
             "q258 replans the fact scan instead of reading the pin")
    } finally PinScope.drain()
  }

  test("q259-q262: text statistics stay gram-shuffle bound") {
    // q259/q260: ONE corpus scan each — the readability score is pure
    // map-side string algebra, the Zipf fit one token-keyed shuffle
    for (name <- Seq("q259_readability", "q260_zipf_fit")) {
      val p = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert("FileScan|Scan parquet".r.findAllIn(p).size == 1,
             s"$name should scan the corpus exactly once\n" + p)
    }
    // q261: the gram projection + the ≤|sources| doc-count side — two
    // reads, the doc-count join a broadcast
    val p261 = SparkEntry.queries("q261_template_shingles")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(p261).size <= 3, p261)
    assert("BroadcastHashJoin".r.findAllIn(p261).size >= 1, p261)
    // q262: the gram projection is RE-DERIVED for each consumer (two
    // self-join sides + two size branches = 4 cheap projected scans)
    // rather than pinned — q219's pin-artifacts-never-corpora rule;
    // the set-size sides broadcast onto the tiny pair table
    val p262 = SparkEntry.queries("q262_source_mirror")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(p262).size <= 4, p262)
    assert("BroadcastHashJoin".r.findAllIn(p262).size >= 2, p262)
  }

  test("q263-q266: experiment/model-eval plans stay cell-table bound") {
    // q263: one orders scan + a broadcast customer dim into |segments|
    // 2x2 cells — never a shuffle join
    val p263 = SparkEntry.queries("q263_cmh_test")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(p263).size == 2, p263)
    assert("BroadcastHashJoin".r.findAllIn(p263).size == 1, p263)
    assert(!p263.contains("SortMergeJoin"), p263)
    // q264: two events reads (user universe + observed days) feeding a
    // broadcast grid — pure scalar algebra after
    val p264 = SparkEntry.queries("q264_power_analysis")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(p264).size <= 2, p264)
    // q265: the vocab ladder broadcasts to the draw side; the interval
    // containment is a broadcast nested-loop over |draws| x |vocab|
    // (the total and ladder sides re-derive the cheap token agg
    // rather than pinning a corpus-sized stream — q219's rule)
    val p265 = SparkEntry.queries("q265_neg_sampling")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(p265).size <= 3, p265)
    assert(p265.contains("BroadcastNestedLoopJoin"), p265)
    // q266: the corpus text is tokenized ONCE at pin time — the
    // returned plan may rescan the cheap (doc_id, lang) projection for
    // priors but must never re-read the text column
    try {
      val p266 = SparkEntry.queries("q266_crossval_nb")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p266.contains("text"), "q266 rescans the corpus text")
    } finally PinScope.drain()
  }

  test("q268-q270: stats artifact / kNN / blocking plan shapes") {
    // q268: summary + boundaries both ride the pinned value-group
    // table — the returned plan never rescans orders
    try {
      val p268 = SparkEntry.queries("q268_stats_artifact")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p268.contains("FileScan") && !p268.contains("ParquetScan"),
             "q268 replans the fact scan instead of reading the pin")
    } finally PinScope.drain()
    // q269: the pair stage is per-basket array algebra (one ok-keyed
    // agg), item counts broadcast, top-3 via WindowGroupLimit
    val p269 = SparkEntry.queries("q269_item_knn")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p269).size >= 2, p269)
    assert(p269.contains("WindowGroupLimit"), p269)
    // q270 (reshaped r14): the neighborhood rides GlobalOrder's
    // bucket-distributed rank — the declared plan reads the pinned
    // ranked table (no fact rescan), the census offsets arrive
    // broadcast, and the successor lookup is a rank-key equi join
    // (never a cartesian)
    try {
      val p270 = SparkEntry.queries("q270_sorted_neighborhood")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p270.contains("FileScan") && !p270.contains("ParquetScan"),
             "q270 replans the fact scan instead of reading the pin")
      assert(p270.contains("ExistingRDD"), p270)
      assert(!p270.contains("CartesianProduct"), p270)
    } finally PinScope.drain()
  }

  test("q271-q274: causal family plan shapes") {
    // q271: dims resolve via broadcasts (region→nation→customer and the
    // orders spend agg), no sort-merge join anywhere; one orders shuffle
    val p271 = SparkEntry.queries("q271_diff_in_diff")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p271).size >= 3, p271)
    assert(!p271.contains("SortMergeJoin"), p271)
    // q272: everything past the one lineitem fold rides the pinned
    // 11-row bin table — the returned plan never rescans the facts
    try {
      val p272 = SparkEntry.queries("q272_isotonic_calibration")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p272.contains("FileScan") && !p272.contains("ParquetScan"),
             "q272 replans the fact scan instead of reading the pin")
      assert(p272.contains("BroadcastHashJoin"), p272)
    } finally PinScope.drain()
    // q273 (reshaped r14): the four nearest-control fills are BUCKET-
    // partitioned windows, the census carry arrives broadcast — still
    // no treated×control join, and every per-row window is
    // partitioned (the unpartitioned ones ride the ~110-row census)
    val df273 = SparkEntry.queries("q273_propensity_match")(spark, sf)
    df273.collect()
    val p273 = df273.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("BroadcastHashJoin".r.findAllIn(p273).size >= 2, p273)
    assert(!p273.contains("SortMergeJoin") &&
           !p273.contains("CartesianProduct"), p273)
    // the running fills partition on the bucket key bk
    assert("windowspecdefinition\\(bk#".r.findAllIn(p273).size >= 2, p273)
    // q274: one (user, day) fold into the pinned cell table; the
    // lattice and both v-lookups ride it via broadcasts — no fact
    // rescans, no shuffle joins
    try {
      val p274 = SparkEntry.queries("q274_shapley_attribution")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p274.contains("FileScan") && !p274.contains("ParquetScan"),
             "q274 replans the fact scan instead of reading the pin")
      assert("BroadcastHashJoin".r.findAllIn(p274).size >= 2, p274)
      assert(!p274.contains("SortMergeJoin"), p274)
    } finally PinScope.drain()
  }

  test("q275-q278: linkage / ESD / sequence / density plan shapes") {
    // q275 (candidates reshaped r14): one dim scan (the u-estimation
    // stack) — the blocking neighborhood reads GlobalOrder's pinned
    // ranked table; the 1-row weight table crosses in via broadcast;
    // nothing shuffles on pair volume
    try {
      val p275 = SparkEntry.queries("q275_fellegi_sunter")(spark, sf)
        .queryExecution.executedPlan.toString
      assert("FileScan|Scan parquet".r.findAllIn(p275).size == 1, p275)
      assert(p275.contains("ExistingRDD"), p275)
      // the 1-row weight table crosses in via broadcast; the only
      // merge join allowed is the successor lookup's rank-key equi
      // join (3n rows, linear — never pair-quadratic, never cartesian)
      assert(p275.contains("BroadcastNestedLoopJoin") &&
             !p275.contains("CartesianProduct"), p275)
    } finally PinScope.drain()
    // q276: the three unrolled rounds ride the pinned daily cells —
    // no fact rescan; removals are broadcast anti-joins
    try {
      val p276 = SparkEntry.queries("q276_esd_outliers")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p276.contains("FileScan") && !p276.contains("ParquetScan"),
             "q276 replans the fact scan instead of reading the pin")
      assert("LeftAnti".r.findAllIn(p276).size >= 2, p276)
    } finally PinScope.drain()
    // q277: numerator and denominator both read the pinned 26-row
    // pattern table — one fact scan total, at pin time
    try {
      val p277 = SparkEntry.queries("q277_seq_2patterns")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p277.contains("FileScan") && !p277.contains("ParquetScan"),
             "q277 replans the fact scan instead of reading the pin")
    } finally PinScope.drain()
    // q278: clusters and noise both ride the pinned grid cells; labels
    // attach via broadcast
    try {
      val p278 = SparkEntry.queries("q278_dbscan_grid")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p278.contains("FileScan") && !p278.contains("ParquetScan"),
             "q278 replans the fact scan instead of reading the pin")
      assert(p278.contains("BroadcastHashJoin"), p278)
    } finally PinScope.drain()
  }

  test("q279-q281: attribution / layout / split plan shapes") {
    // q279: all 12 value-iteration steps (5 variants together) ride the
    // pinned transition matrix — the returned plan has no fact scan
    // and every join is broadcast-sized
    try {
      val p279 = SparkEntry.queries("q279_markov_attribution")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p279.contains("FileScan") && !p279.contains("ParquetScan"),
             "q279 replans the fact scan instead of reading the pin")
      assert(!p279.contains("SortMergeJoin"), p279)
    } finally PinScope.drain()
    // q280 (reshaped r13): the two layouts are INDEPENDENT branches —
    // one column-pruned scan + one bucketed row_number window each
    // (the layout bounds collect once at build and ride as literals;
    // the bucket-offset tables ride the pinned cell pass), and the
    // branches meet only at the ≤N/512-row group tables
    val p280 = SparkEntry.queries("q280_zorder_skipping")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(p280).size == 2, p280)
    assert("Window \\[row_number".r.findAllIn(p280).size == 2, p280)
    // q281: one dimension scan; rank and count windows share the one
    // stratum partitioning (parallel per stratum, never global)
    val p281 = SparkEntry.queries("q281_stratified_split")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(p281).size == 1, p281)
    assert(!p281.contains("Join"), p281)
    assert("Exchange hashpartitioning\\(seg".r.findAllIn(p281).size == 1,
           p281)
  }

  test("q282-q283: funnel / drift plan shapes") {
    // q282: ONE documents scan; all four filters and both cumulative
    // ladders are one map-side projection into one 1-row aggregate
    val p282 = SparkEntry.queries("q282_filter_funnel")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(p282).size == 1, p282)
    assert(!p282.contains("Join"), p282)
    // q283: global sums, norms and the per-source roll-up all ride the
    // pinned |sources|×64 cell table — no fact rescans
    try {
      val p283 = SparkEntry.queries("q283_embed_drift")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p283.contains("FileScan") && !p283.contains("ParquetScan"),
             "q283 replans the fact scan instead of reading the pin")
      assert(p283.contains("BroadcastHashJoin"), p283)
    } finally PinScope.drain()
  }

  test("q369: two-level assignment is broadcast-only — the corpus never shuffle-joins") {
    // the production assigner's scale claim: both argmin levels ride
    // BROADCAST sides (the packed coarse row, the per-coarse fine
    // groups) — the corpus is never the build side of a shuffle join
    // for its own assignment. The only exchanges in the plan belong
    // to the BUILD side (the k·kc routing window), which is
    // cell-count-, not corpus-, scaled.
    import org.apache.spark.sql.functions._
    val em = operators.SimilarityExtOps.latticeFrame(spark, sf, Long.MaxValue)
    val kAgg = greatest(ceil(sqrt(count(lit(1)))).cast("long"),
                        expr("(count(1) + 7) DIV 8").cast("long"))
    val (_, asg) = operators.SimilarityExtOps
      .hybridCellAssign(em, kAgg, twoLevel = true)
    asg.collect() // finalize the AQE plan
    val p = asg.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
           s"fine-group probe is not a broadcast equi-join: $p")
    assert(!p.contains("SortMergeJoin"),
           "the corpus shuffle-joined for its own assignment")
  }

  test("two-level fine side: broadcast under the declared ceiling, ccid-co-bucketed shuffle past it") {
    // the r18 wiring of the r17-measured switch: at test geometry the
    // fine-group side prices far under TwoLevelBroadcastCeilingBytes,
    // so the default shape is the explicit broadcast; forcing the
    // ceiling to 0 models the 10⁹-vector census point (side ≈ 1.18 GB,
    // ProbeRouterBuild) and must flip the SAME plan to the
    // ccid-co-bucketed SHUFFLED HASH join — both sides hash-partition
    // on ccid, no sort, no corpus broadcast — with an identical
    // assignment (the switch changes the plan, never the answer)
    import org.apache.spark.sql.functions._
    val simx = operators.SimilarityExtOps
    val em = simx.latticeFrame(spark, sf, Long.MaxValue)
    val kAgg = greatest(ceil(sqrt(count(lit(1)))).cast("long"),
                        expr("(count(1) + 7) DIV 8").cast("long"))
    val (_, under) = simx.hybridCellAssign(em, kAgg, twoLevel = true)
    val underRows = under.collect()
    val up = under.queryExecution.executedPlan.toString
    assert(up.contains("BroadcastHashJoin") &&
             !up.contains("ShuffledHashJoin"),
           s"under-ceiling shape is not the broadcast: $up")
    val (_, past) = simx.hybridCellAssign(em, kAgg, twoLevel = true,
      fineBroadcastCeiling = 0L)
    val pastRows = past.collect()
    val pp = past.queryExecution.executedPlan.toString
    assert(pp.contains("ShuffledHashJoin"),
           s"past-ceiling shape is not the co-bucketed shuffle join: $pp")
    assert(!pp.contains("SortMergeJoin"),
           "the corpus sorted for its own assignment")
    assert(underRows.map(r => (r.getLong(0), r.getLong(2))).toSet ==
             pastRows.map(r => (r.getLong(0), r.getLong(2))).toSet,
           "the join shape changed the assignment")
  }

  test("q387: the promote-push churn reads committed model logs only — never the corpus") {
    // the query's scale claim made test-enforced: a delta between two
    // model versions costs two MODEL scans (the committed log files),
    // not a corpus pass — every file scan in the executed plan must
    // sit under a committed-log root, none under the testdata corpus
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q387_model_churn")(spark, sf)
      val scans = df.queryExecution.executedPlan
        .collectWithSubqueries { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, "q387 plan shows no file scans")
      val corpus = scans.flatMap(_.relation.location.rootPaths)
        .filter(_.toString.contains("/testdata/"))
      assert(corpus.isEmpty,
             s"q387 scanned the corpus instead of the logs: $corpus")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("fine routing table AT REST: the past-ceiling serving join reads the ccid bucketing — zero exchange on the model side") {
    // r19 (the r18 verdict's #2): the nightly model's packed fine
    // groups are COMMITTED ccid-bucketed (semDedupTwoFineTable), so
    // the past-ceiling shuffled-hash serving join takes its model-side
    // distribution from the LAYOUT — the only hashpartitioning
    // exchange left in the plan is the arrival side's. The per-plan
    // repack baseline at the same forced ceiling carries the extra
    // model-side exchange (the groupBy pack), and both shapes must
    // produce the identical assignment.
    val SnapshotLog = sources.PartitionedOps.SnapshotLog
    val simx = operators.SimilarityExtOps
    val root = streaming.StreamOps.gateModelRoot(spark, sf, upTo = 1)
    val model = SnapshotLog.read(spark, root,
      streaming.StreamOps.gateModelPin(root))
    val atRest = spark.table(simx.semDedupTwoFineTable(spark, sf))
    // AQE's toString prints the Final AND Initial plans — count
    // exchanges in the FINAL section only
    def hashEx(p: String) =
      "Exchange hashpartitioning".r
        .findAllIn(p.split("== Initial Plan ==")(0)).size
    val rest = streaming.StreamOps.modelArrivals(spark, sf, model,
      Some(atRest), fineBroadcastCeiling = 0L)
    val restRows = rest.collect()
    val rp = rest.queryExecution.executedPlan.toString
    assert(rp.contains("ShuffledHashJoin"),
           s"past-ceiling at-rest shape is not the shuffled hash: $rp")
    assert(!rp.contains("SortMergeJoin"),
           "the corpus sorted for its own serving join")
    assert(hashEx(rp) == 1,
           s"expected ONLY the arrival-side exchange, got ${hashEx(rp)}: $rp")
    val repack = streaming.StreamOps.modelArrivals(spark, sf, model,
      None, fineBroadcastCeiling = 0L)
    val repackRows = repack.collect()
    val kp = repack.queryExecution.executedPlan.toString
    assert(hashEx(kp) > 1,
           s"repack baseline has no model-side exchange — degenerate: $kp")
    assert(restRows.map(r => (r.getLong(0), r.getLong(1))).toSet ==
             repackRows.map(r => (r.getLong(0), r.getLong(1))).toSet,
           "the at-rest layout changed the assignment")
  }

  test("q308: boosting algebra rides the pinned cell table; train RMSE is monotone") {
    // the trainer's whole scale story: ONE fact scan folds to the
    // ≤|qty|×|disc| cell table at pin time, and the 3-round unrolled
    // CTE chain (which re-references the cells once per round) must
    // read the CACHE — zero FileScan in the boosting plan — while the
    // squared-loss RMSE strictly decreases each round (the gradient
    // step certification)
    try {
      val df = SparkEntry.queries("q308_gbt_stumps")(spark, sf)
      val rows = df.collect()
      assert(rows.length == 3, s"expected 3 boosting rounds, got ${rows.length}")
      val rmse = rows.sortBy(_.getLong(0)).map(_.getDouble(6))
      assert(rmse.zip(rmse.tail).forall { case (a, b) => b < a },
             s"train RMSE not strictly decreasing: ${rmse.mkString(", ")}")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("FileScan") && !p.contains("ParquetScan"),
             "q308 replans the fact scan instead of reading the pinned cells")
    } finally PinScope.drain()
  }
}
