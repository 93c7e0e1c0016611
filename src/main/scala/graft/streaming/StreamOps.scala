package graft.streaming

import graft.{OpModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming demos (SURVEY.md §2B):
  *
  *  - stream_demo: the q36 tumbling-window aggregation re-run as a real
  *    `readStream` → watermark → windowed agg → memory-sink pipeline
  *    with `Trigger.AvailableNow`. Batch/stream parity means it shares
  *    q36's oracle.
  *  - q78_stream_stream_join: q75's click-attribution interval join as
  *    a watermarked STREAM⋈STREAM inner join — each side bounds the
  *    other's state via the event-time range condition, so the join
  *    runs with finite state on an unbounded stream. Shares q75's
  *    oracle (with AvailableNow over a static file nothing is late, so
  *    the streaming result equals the batch interval join exactly).
  *
  * Scale notes: in production these run micro-batch with a RocksDB
  * state store; watermarks bound window/join state and drop late rows
  * (exercised with two-batch file sources in StreamingSpec).
  */
object StreamOps extends OpModule {

  /** Lists the parquet parts of a source table (single `t.parquet`
    * FILE — driver testdata — or a `t.parquet/` DIRECTORY of part
    * files, the shape anything Spark wrote has; the r9/r12 sweeps both
    * caught a file-only assumption staging an EMPTY dir) together with
    * a short fingerprint of the source's physical layout (sorted part
    * names + sizes + mtimes). */
  private def partsAndFingerprint(src: java.nio.file.Path,
                                  defaultName: String)
      : (Seq[(java.nio.file.Path, String)], String) = {
    val parts: Seq[(java.nio.file.Path, String)] =
      if (java.nio.file.Files.isDirectory(src)) {
        import scala.jdk.CollectionConverters._
        // Files.list holds a directory handle until closed — materialize
        // the part list inside Using so repeated staging can't leak fds
        scala.util.Using.resource(java.nio.file.Files.list(src)) { st =>
          st.iterator.asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(p => p -> p.getFileName.toString).toSeq
            .sortBy(_._2)
        }
      } else Seq(src -> defaultName)
    val sig = parts.map { case (p, n) =>
      s"$n:${java.nio.file.Files.size(p)}:" +
        java.nio.file.Files.getLastModifiedTime(p).toMillis
    }.mkString("|")
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    (parts, fp)
  }

  /** Stages a source table into a tmp directory for the file stream
    * source (which wants a directory), one staged copy per
    * `copies(partName)` entry.
    *
    * The staging dir name is keyed by the SOURCE LAYOUT FINGERPRINT
    * (r12 ADVICE): if the table at `d` is rebuilt — single file
    * re-materialized as a part directory, testdata regenerated in
    * place, parts added — the fingerprint changes and a FRESH dir is
    * staged from scratch, instead of the old stable-path scheme
    * silently serving stale parts alongside new ones (doubling rows).
    * Stale fingerprint dirs linger in tmp; that is the price of never
    * deleting files a concurrent reader may hold open.
    *
    * Within a dir: per-file scratch + atomic rename means a concurrent
    * second JVM either wins each rename or observes the winner's
    * complete file; scratch copies (dot-prefixed, so the file source
    * ignores them) are cleaned up on every path. */
  private def stageParts(prefix: String, d: String, table: String)
                        (copies: String => Seq[String]): String = {
    val src = java.nio.file.Paths.get(s"$d/$table.parquet")
    val (parts, fp) = partsAndFingerprint(src, s"$table.parquet")
    val dir = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/${prefix}_" +
        d.replaceAll("[^a-zA-Z0-9]", "_") + s"_$fp")
    java.nio.file.Files.createDirectories(dir)
    for ((part, name) <- parts; copy <- copies(name)) {
      val target = dir.resolve(copy)
      if (!java.nio.file.Files.exists(target)) {
        val scratch =
          java.nio.file.Files.createTempFile(dir, ".staging", ".tmp")
        try {
          java.nio.file.Files.copy(part, scratch,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          try java.nio.file.Files.move(scratch, target,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: java.nio.file.FileSystemException
              if java.nio.file.Files.exists(target) => // lost the race
          }
        } finally java.nio.file.Files.deleteIfExists(scratch)
      }
    }
    dir.toString
  }

  /** Stages the sfDir's events table for the file stream source —
    * layout-fingerprinted staging via [[stageParts]]. */
  private def stagedEventsDir(d: String): String =
    stageParts("graft_stream", d, "events")(n => Seq(n))

  /** Stages TWO copies of the events file into a per-sfDir directory —
    * a simulated at-least-once upstream (every event delivered twice)
    * for the q89 exactly-once dedup demo. Same fingerprint + write-once
    * discipline as [[stagedEventsDir]]. */
  private[graft] def stagedDupEventsDir(d: String): String =
    stageParts("graft_stream_dup", d, "events") { name =>
      if (name == "events.parquet")
        Seq("events_a.parquet", "events_b.parquet")
      else Seq(s"a_$name", s"b_$name")
    }

  /** Stages the sfDir's documents table for the q109 document stream —
    * same fingerprint + write-once discipline as [[stagedEventsDir]]. */
  private def stagedDocsDir(d: String): String =
    stageParts("graft_stream_docs", d, "documents")(n => Seq(n))

  /** Stages the sfDir's embeddings table for the q345 semantic-dup
    * gate stream — same write-once discipline as [[stagedDocsDir]]. */
  private def stagedEmbsDir(d: String): String =
    stageParts("graft_stream_embs", d, "embeddings")(n => Seq(n))

  /** Stages TWO copies of the embeddings table — the q89/q98
    * at-least-once-upstream pattern applied to the GATE's arrival
    * stream: every arrival is delivered twice, so the admit drain
    * (which reads this dir one file per trigger) runs ≥ 2 micro-
    * batches with batch 2 redelivering batch 1's arrivals — the
    * production geometry that makes the committer's vec_id anti-join
    * and the admit log's MULTI-VERSION retention (q383) real instead
    * of vacuous. The admitted SET is unchanged by construction (the
    * one-level admit rule is split-invariant and redelivery
    * anti-joins), so every downstream oracle is untouched. */
  private[graft] def stagedDupEmbsDir(d: String): String =
    stageParts("graft_stream_embs_dup", d, "embeddings") { name =>
      if (name == "embeddings.parquet")
        Seq("embeddings_a.parquet", "embeddings_b.parquet")
      else Seq(s"a_$name", s"b_$name")
    }

  /** Stages the sfDir's orders table for the q330 enrichment stream —
    * same fingerprint + write-once discipline as [[stagedEventsDir]]. */
  private def stagedOrdersDir(d: String): String =
    stageParts("graft_stream_orders", d, "orders")(n => Seq(n))

  /** The q285/q298 CDC image stream: synthesized upsert/delete ops
    * folded into last-writer-wins per-key state; each batch emits the
    * key's CURRENT image stamped with its monotone op count. LWW is by
    * EVENT TIME (ts, event_id), not arrival order — an op older than
    * the stored image counts but never overwrites, so late/replayed
    * CDC records stay harmless. */
  private def cdcImages(iso: SparkSession, d: String): DataFrame = {
    import iso.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    eventStream(iso, d)
      .select(col("user_id"), col("event_id"),
              unix_micros(col("ts")).as("tus"),
              when(col("event_type") === "error", "D")
                .otherwise("U").as("op"),
              round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long, String, Long)],
         state: GroupState[(Long, Long, String, Long, Long)]) =>
          // state = (lastTus, lastEid, lastOp, value, nOps)
          var st = state.getOption.getOrElse((Long.MinValue,
            Long.MinValue, "", 0L, 0L))
          for (e <- it.toSeq.sortBy(e => (e._3, e._2))) {
            val newer = e._3 > st._1 ||
              (e._3 == st._1 && e._2 > st._2)
            st = if (newer) (e._3, e._2, e._4, e._5, st._5 + 1)
                 else (st._1, st._2, st._3, st._4, st._5 + 1)
          }
          state.update(st)
          Iterator((uid, st._3, st._4, st._5))
      }
      .toDF("user_id", "op", "cents", "n_ops")
  }

  /** Number of hash buckets the q298 snapshot table is laid out in —
    * the unit of rewrite: a micro-batch rewrites ONLY the buckets
    * holding changed keys and the new manifest re-references the
    * untouched buckets' files (manifests sharing files is exactly the
    * q167 property that makes vacuum union kept manifests). */
  private val CdcSnapBuckets = 8

  /** Applies one CDC micro-batch to the snapshot-log table at `root`
    * as version `batchId + 1` (q298, the r12 verdict's #7 — streaming
    * upserts committing through the SAME scratch+rename manifest
    * protocol as q167's batch maintenance):
    *
    *  - IDEMPOTENT by version: a replayed batch (restart from
    *    checkpoint, double-fire) finds `v` committed and returns —
    *    the q164 batchId rename-commit discipline at manifest level;
    *  - the batch's images partition into [[CdcSnapBuckets]] key
    *    buckets; only CHANGED buckets rewrite (prior bucket file
    *    anti-joined on the batch's keys + the batch's live images),
    *    unchanged buckets' files carry over by reference;
    *  - files-then-manifest: a crash between addFiles and
    *    commitVersion leaves orphans for vacuum, never a torn
    *    snapshot; the replay overwrites them with identical bytes.
    *
    * At 100 TB buckets become table partitions, the per-bucket merge
    * one dynamic-partition-overwrite job, and the manifest the
    * transaction log — per-trigger cost is O(changed partitions),
    * never a table rewrite. */
  private[graft] def applyCdcBatch(s: SparkSession,
                                   root: java.nio.file.Path,
                                   batchId: Long, upd: DataFrame): Unit = {
    val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
    val v = batchId.toInt + 1
    if (SnapshotLog.versions(root).contains(v)) {
      // replayed batch (restart from checkpoint / double-fire): the
      // version is already committed, but the batch must STILL be
      // consumed in full — Spark 4's state-store commit validation
      // requires foreachBatch to process every stateful partition,
      // and a bare early return reads as a swallowed error
      upd.write.format("noop").mode("overwrite").save()
      return
    }
    require(SnapshotLog.latest(root) == v - 1,
      s"CDC snapshot log at ${SnapshotLog.latest(root)} cannot accept v$v")
    // persist: the changed-bucket probe and each bucket merge re-read
    // the batch; without the pin every action would re-run the
    // stateful operator upstream
    val img = upd.withColumn("bkt",
      pmod(col("user_id"), lit(CdcSnapBuckets)).cast("int")).persist()
    try {
      val changed = img.select("bkt").distinct()
        .collect().map(_.getInt(0)).toSet
      val prevFiles: Seq[String] =
        if (v == 1) Seq.empty else SnapshotLog.files(root, v - 1)
      def bucketOf(name: String) = name.drop(1).takeWhile(_ != '-').toInt
      val keep = prevFiles.filterNot(f => changed.contains(bucketOf(f)))
      val added = changed.toSeq.sorted.flatMap { b =>
        val prior = prevFiles.filter(f => bucketOf(f) == b)
        val cur =
          if (prior.isEmpty) {
            import s.implicits._
            Seq.empty[(Long, Long, Long)].toDF("user_id", "cents", "n_ops")
          } else s.read.parquet(prior.map(root.resolve(_).toString): _*)
        val bu = img.where(col("bkt") === b)
        val merged = cur
          .join(bu.select("user_id"), Seq("user_id"), "left_anti")
          .unionByName(bu.where(col("op") === "U")
            .select("user_id", "cents", "n_ops"))
        SnapshotLog.addFiles(s, root, s"b$b-v$v", merged.coalesce(1))
      }
      SnapshotLog.commitVersion(root, v, keep ++ added)
    } finally img.unpersist()
  }

  /** Builds (or reuses) the q298 CDC snapshot-log table for `d`'s
    * event stream: drains [[cdcImages]] through a foreachBatch
    * [[applyCdcBatch]] committer. The root rides the staged dir's
    * layout fingerprint, and per-batch commits are version-idempotent,
    * so re-drains (fresh checkpoints included) against an
    * already-built log are no-ops. */
  private[graft] def cdcSnapshotRoot(s: SparkSession, d: String)
      : java.nio.file.Path = {
    val root = java.nio.file.Paths.get(stagedEventsDir(d) + "_cdcsnap")
    java.nio.file.Files.createDirectories(root)
    val iso = s.newSession()
    iso.conf.set("spark.sql.shuffle.partitions", "8")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdcsnap_ck")
    val query = cdcImages(iso, d).writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyCdcBatch(b.sparkSession, root, id, b)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try query.awaitTermination()
    finally {
      // single-use checkpoint: once the AvailableNow drain has
      // committed the log, nothing resumes from it — delete with the
      // drain instead of leaking one dir per corpus per JVM (r18
      // verdict #5's TempSweep adoption sweep: this was the last
      // unswept one-shot scratch in src/main)
      if (query.isActive) query.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(ckpt).iterator.asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    root
  }

  /** Number of cid hash buckets the q371 admitted log is laid out in —
    * the unit of per-trigger rewrite, q298's discipline: a micro-batch
    * rewrites only the buckets holding newly-admitted cells and the
    * new manifest re-references the untouched buckets' files. */
  private val GateAdmBuckets = 8

  /** One monitor per admitted-log root (q371): a second in-JVM caller
    * must not race the drain against the same log. */
  private val gateAdmitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Applies one online-gate micro-batch to the admitted log at `root`
    * as version `batchId + 1` (q371 — the r16 verdict's #2, closing
    * the loop q356 left open: accepted arrivals JOIN the member index
    * per trigger instead of the gate probing a frozen artifact until
    * the next nightly rebuild):
    *
    *  - the batch's arrivals (already assigned: vec_id, xi, cid, nv)
    *    probe the STANDING corpus members (the semsqidx artifact,
    *    capped — the same stream-static probe q356 runs); an arrival
    *    with NO standing match is ADMITTED. Admission is decided
    *    against the corpus snapshot ONLY — the declared one-level
    *    rule that keeps the admitted set independent of the batch
    *    split (an admit-vs-admit dependence would make acceptance
    *    recursive and split-sensitive; catching dups AMONG recent
    *    admits is the report's n_dup_recent column and the nightly
    *    batch pass's job);
    *  - admitted rows land cid-bucketed: only CHANGED buckets rewrite
    *    (prior bucket files anti-joined on vec_id + the batch's
    *    admits), unchanged buckets carry over by reference —
    *    [[applyCdcBatch]]'s idempotent bucket-merge verbatim;
    *  - IDEMPOTENT by version: a replayed batch (restart from
    *    checkpoint, double-fire) finds `v` committed, consumes, and
    *    returns; files-then-manifest means a crash between addFiles
    *    and commitVersion leaves orphans, never a torn log.
    *
    * At 100 TB the admitted log is the gate's hot member partition
    * set; per-trigger cost is O(batch × matched buckets + changed
    * buckets), never a corpus rescan, and the nightly rebuild folds
    * the log back into the standing artifact (q357's promote cycle).
    *
    * Since r18 the standing members come from the deployment-PINNED
    * version `pinnedV` of the gate-model log at `modelRoot` (the r17
    * verdict's #2/#3: admission judges against the same versioned
    * two-level model the gate serves — one artifact, one maintenance
    * loop). `pinnedV` is resolved ONCE at drain start from the pin
    * FILE ([[gateModelPin]]) and passed in, so a re-pin landing
    * mid-drain can never shift admit decisions under a running
    * drain — the config read has the same once-per-deployment-start
    * semantics the version read always had. */
  private[graft] def applyGateBatch(s: SparkSession,
                                    modelRoot: java.nio.file.Path,
                                    pinnedV: Int,
                                    root: java.nio.file.Path,
                                    batchId: Long, batch: DataFrame): Unit = {
    val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
    val v = batchId.toInt + 1
    if (SnapshotLog.versions(root).contains(v)) {
      batch.write.format("noop").mode("overwrite").save()
      return
    }
    require(SnapshotLog.latest(root) == v - 1,
      s"admitted log at ${SnapshotLog.latest(root)} cannot accept v$v")
    // at-least-once upstreams redeliver WITHIN a batch too (a trigger
    // that picks up both staged copies of an arrival): the cross-batch
    // anti-join below can't see those, so dedupe the batch first —
    // duplicates are exact copies, so the drop is deterministic. The
    // r18 three-volume sweep caught the missing dedup as inflated log
    // rows (164k vs 100k arrivals at 100×) that sf0.01's single-file
    // staging could never produce — the reason the drain geometry and
    // the sweep protocol both exist.
    val batch1 = batch.dropDuplicates("vec_id")
    val simx = graft.operators.SimilarityExtOps
    val members = simx.cappedMemberSide(
        SnapshotLog.read(s, modelRoot, pinnedV)
          .where(col("kind") === "m")
          .select(col("cid"), col("id").as("vec_id"), col("xi"),
                  col("nv")),
        simx.SemDedupClusterCap)
      .select(col("cid"), col("xa"), col("na"))
    val matched = simx.gateDupPairs(
        batch1.select(col("cid"), col("vec_id").as("b"),
                     col("xi").as("xb"), col("nv").as("nb")),
        members)
      .select(col("b").as("vec_id")).distinct()
    val adm = batch1.join(matched, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cid"), col("nv"), col("xi"))
      .withColumn("bkt",
        pmod(col("cid"), lit(GateAdmBuckets)).cast("int")).persist()
    try {
      val changed = adm.select("bkt").distinct()
        .collect().map(_.getInt(0)).toSet
      val prevFiles: Seq[String] =
        if (v == 1) Seq.empty else SnapshotLog.files(root, v - 1)
      def bucketOf(name: String) = name.drop(1).takeWhile(_ != '-').toInt
      val keep = prevFiles.filterNot(f => changed.contains(bucketOf(f)))
      val added = changed.toSeq.sorted.flatMap { b =>
        val prior = prevFiles.filter(f => bucketOf(f) == b)
        val cur =
          if (prior.isEmpty)
            s.createDataFrame(
              s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType.fromDDL(
                "vec_id BIGINT, cid BIGINT, nv BIGINT, xi ARRAY<BIGINT>"))
          else s.read.parquet(prior.map(root.resolve(_).toString): _*)
        val bu = adm.where(col("bkt") === b)
          .select("vec_id", "cid", "nv", "xi")
        // anti-join on vec_id: an at-least-once upstream re-delivering
        // an already-admitted arrival in a LATER batch must not
        // double-insert it
        val merged = cur
          .join(bu.select("vec_id"), Seq("vec_id"), "left_anti")
          .unionByName(bu)
        SnapshotLog.addFiles(s, root, s"b$b-v$v", merged.coalesce(1))
      }
      SnapshotLog.commitVersion(root, v, keep ++ added)
    } finally adm.unpersist()
  }

  /** Bumped on ANY change to the admit/bucket rule or the log layout:
    * folds into [[gateAdmitRoot]]'s root key (r17 ADVICE — the admit
    * log had no builder version, so a rule change across JVM runs
    * could silently serve a log built by the old rule). v2 = the r18
    * re-key of the admit path to the TWO-LEVEL model; v3–v5 = the
    * multi-batch at-least-once drain geometry (same admitted set,
    * ≥ 2 log versions; v4 sizes the trigger to ONE DELIVERY PER
    * BATCH — the first cut triggered per FILE and a 100-part corpus
    * paid 200 micro-batches ≈ 443 s of per-trigger probe/commit
    * overhead at 100×, vs ~2× the single-batch cost for two; v5 adds
    * the intra-batch vec_id dedup the mixed-copy triggers need). */
  private val GateAdmitBuilderVersion = 5

  /** The streaming two-level assignment head shared by q345's gate
    * and [[gateAdmitRoot]]'s committer (the r17 verdict's #2 — ONE
    * assigner for the whole gate family): odd arrivals from the
    * staged embeddings dir pay one √k-way coarse argmin against the
    * FROZEN coarse Literal, then a ccid equi-join against the model's
    * replicated fine groups picks the fine cell. The fine-group side
    * rides the family's DECLARED size switch
    * ([[graft.operators.SimilarityExtOps.TwoLevelBroadcastCeilingBytes]]):
    * entries priced at build time from the model's 'f'-row count —
    * broadcast under the ceiling, ccid-co-bucketed shuffled hash past
    * it (the arrival side hash-partitions on ccid; the model side is
    * already cid-bucketed at rest). Output: (vec_id, xi, cid, nv). */
  private def twoLevelArrivalHead(iso: SparkSession, d: String,
                                  model: DataFrame, coarseLit: Column,
                                  fineEntries: Long,
                                  srcDir: Option[String] = None,
                                  maxFilesPerTrigger: Option[Int] = None,
                                  fineAtRest: Option[DataFrame] = None)
      : DataFrame = {
    val simx = graft.operators.SimilarityExtOps
    val gf = org.apache.spark.sql.graft.GraftFunctions
    val rawSchema = iso.read.parquet(s"$d/embeddings.parquet").schema
    // the model side: the ccid-bucketed AT-REST routing table when the
    // served version is the nightly build (r19 — past the ceiling the
    // static side then contributes NO exchange), else packed per plan
    val fineGroups = fineAtRest.getOrElse(
      model.where(col("kind") === "f")
        .select(col("cid").as("ccid"), col("id").as("fcid"),
                col("xi").as("fci"))
        .groupBy("ccid")
        .agg(collect_list(struct(col("fcid").as("cid"),
                                 col("fci").as("ci"))).as("fc")))
    val fineSide =
      if (fineEntries * simx.TwoLevelFineEntryBytes <=
            simx.TwoLevelBroadcastCeilingBytes) broadcast(fineGroups)
      else fineGroups.hint("shuffle_hash")
    val reader0 = iso.readStream.schema(rawSchema)
    val reader = maxFilesPerTrigger
      .fold(reader0)(n => reader0.option("maxFilesPerTrigger", n))
    reader.parquet(srcDir.getOrElse(stagedEmbsDir(d)))
      .where(col("vec_id") % 2 === 1)
      .select(col("vec_id"), expr(
        "transform(cast(embedding as array<double>), " +
          "x -> CAST(round(x * 1000000) AS BIGINT))").as("xi"))
      .select(col("vec_id"), col("xi"),
        gf.argminCentroidLong(col("xi"), coarseLit).as("ccid"),
        gf.dotProductLong(col("xi"), col("xi")).as("nv"))
      .join(fineSide, Seq("ccid"))
      .select(col("vec_id"), col("xi"),
        gf.argminCentroidLong(col("xi"), col("fc")).as("cid"),
        col("nv"))
  }

  /** Packs a model's coarse rows ('o') into the ONE frozen Literal
    * the streaming plans re-analyze per micro-batch (kc entries —
    * ~500 at the 10⁹ census point, vs the flat model's 244k). */
  private def coarseLiteral(model: DataFrame): Column = {
    val rows = model.where(col("kind") === "o")
      .select(col("id"), col("xi")).collect()
    org.apache.spark.sql.graft.GraftFunctions.centroidLitLong(
      rows.map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
        .sortBy(_._1))
  }

  /** Builds (or reuses) the q371 admitted log for `d`'s embedding
    * stream: odd arrivals assign through the PINNED gate model's
    * two-level router ([[twoLevelArrivalHead]] — the r17 verdict's
    * #2: admit and serve share ONE artifact, the version
    * [[GateProdDeployment]]'s pin file holds) and drain through a
    * foreachBatch [[applyGateBatch]] committer. */
  private[graft] def gateAdmitRoot(s: SparkSession, d: String)
      : java.nio.file.Path = {
    val modelRoot = gateModelRoot(s, d, upTo = 1)
    val pinned = gateModelPin(modelRoot)
    val root = java.nio.file.Paths.get(
      stagedEmbsDir(d) + s"_gateadm_b$GateAdmitBuilderVersion")
    gateAdmitDrainInto(s, d, modelRoot, pinned, root)
    root
  }

  /** The DAY-2 admitted log (q385's cycle 2): the same at-least-once
    * intake re-delivered on day 2 — a static corpus's steady state is
    * pure redelivery (ongoing dup submissions), the honest day-2
    * stream the fixed testdata can stage — drained against the
    * version the CYCLE deployment's pin file holds, which
    * [[gateCycleRepin]] has flipped to the intake rebuild: the
    * re-pin is exercised as DATA and this drain's model read is the
    * load-bearing consumer of the flip. Day-1 admits are members of
    * the pinned rebuild now, so their redelivery self-matches in the
    * member probe and day-2 intake drains toward ZERO on a static
    * corpus — the fixpoint q385 certifies. Root keyed by the pinned
    * version it drained against + the family builder version. */
  private[graft] def gateAdmitDay2Root(s: SparkSession, d: String)
      : java.nio.file.Path = {
    val modelRoot = gateCycleRepin(s, d)
    val pinned = gateModelPin(modelRoot, GateCycleDeployment)
    val root = java.nio.file.Paths.get(
      stagedEmbsDir(d) + s"_gateadm_c${pinned}_b$GateAdmitBuilderVersion")
    gateAdmitDrainInto(s, d, modelRoot, pinned, root)
    root
  }

  /** The shared admit-drain body ([[gateAdmitRoot]] day 1 /
    * [[gateAdmitDay2Root]] day 2 — one drain, the deployments differ
    * only in which pinned version they judge against and which root
    * they publish): the log BUILDS IN A SCRATCH DIR and
    * atomic-renames into `root` after the drain completes (r17
    * ADVICE: an in-place build crashed mid multi-batch drain left a
    * partial log a later drain with a different batch split treated
    * as committed) — per-batch commits stay version-idempotent inside
    * one drain, and a published root is always a COMPLETE drain. The
    * single-use streaming checkpoint deletes with the scratch.
    *
    * Since r18 the drain runs the PRODUCTION geometry: the
    * at-least-once dup-staged source ([[stagedDupEmbsDir]]) one
    * DELIVERY per trigger — ≥ 2 micro-batches, batch 2 redelivering
    * batch 1's arrivals — so the committed log carries ≥ 2 VERSIONS
    * (retention q383 is non-vacuous) and the committer's vec_id
    * anti-join runs against real redelivery on every build, not only
    * in the spec. The admitted SET is identical by construction
    * (split-invariant admit rule + idempotent redelivery), so
    * downstream oracles are untouched. */
  private def gateAdmitDrainInto(s: SparkSession, d: String,
                                 modelRoot: java.nio.file.Path,
                                 pinnedV: Int,
                                 root: java.nio.file.Path): Unit = {
    val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
    gateAdmitLocks.computeIfAbsent(root.toString, _ => new Object)
      .synchronized {
        if (!java.nio.file.Files.exists(root)) {
          val scratchRoot = java.nio.file.Files
            .createTempDirectory("graft_gateadm_scratch")
          val scratch = scratchRoot.resolve("log")
          try {
            java.nio.file.Files.createDirectories(scratch)
            val model = SnapshotLog.read(s, modelRoot, pinnedV)
            val cLit = coarseLiteral(model)
            val fineEntries =
              model.where(col("kind") === "f").count()
            val iso = s.newSession()
            iso.conf.set("spark.sql.shuffle.partitions", "8")
            val isoModel = SnapshotLog.read(iso, modelRoot, pinnedV)
            // one TRIGGER per delivery, not per file: the dup-staged
            // dir holds 2 copies × P source parts, and the per-batch
            // cost (member probe + bucket merges + manifest commit)
            // is paid per trigger — cap files/trigger at P so the
            // drain is ~2 batches at any layout (measured: per-FILE
            // triggering cost 443 s at the 100-part 100× corpus)
            val dupDir = stagedDupEmbsDir(d)
            val partsPerCopy = {
              import scala.jdk.CollectionConverters._
              scala.util.Using.resource(
                java.nio.file.Files.list(
                  java.nio.file.Paths.get(dupDir))) { st =>
                st.iterator.asScala.count(
                  _.getFileName.toString.endsWith(".parquet"))
              } / 2
            }
            val query =
              twoLevelArrivalHead(iso, d, isoModel, cLit, fineEntries,
                srcDir = Some(dupDir),
                maxFilesPerTrigger = Some(math.max(1, partsPerCopy)),
                fineAtRest = modelFineSide(iso, d, pinnedV))
                .writeStream
                .option("checkpointLocation",
                        scratchRoot.resolve("ck").toString)
                .foreachBatch { (b: DataFrame, id: Long) =>
                  applyGateBatch(b.sparkSession, modelRoot, pinnedV,
                                 scratch, id, b)
                }
                .trigger(Trigger.AvailableNow())
                .start()
            try query.awaitTermination()
            finally if (query.isActive) query.stop()
            try java.nio.file.Files.move(scratch, root,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            catch {
              case _: java.nio.file.FileSystemException
                if java.nio.file.Files.exists(root) => // lost the race
            }
          } finally {
            import scala.jdk.CollectionConverters._
            if (java.nio.file.Files.exists(scratchRoot))
              java.nio.file.Files.walk(scratchRoot).iterator.asScala
                .toSeq.sortBy(-_.getNameCount)
                .foreach(p => java.nio.file.Files.deleteIfExists(p))
          }
        }
      }
  }

  /** The gate-model tier each committed model version carries —
    * the log's lineage contract (q377), GraphVersionTiers' shape. */
  private[graft] val GateModelTiers =
    Map(1 -> "nightly_build", 2 -> "intake_rebuild")

  /** The deployment whose pin every PRODUCTION gate consumer reads —
    * q345's serving gate, [[gateAdmitRoot]]'s drain, the committer's
    * member probe, q380's config row, q384's policy. */
  private[graft] val GateProdDeployment = "gate_prod"

  /** The version the prod deployment's pin file is INITIALIZED to at
    * model-log publish (the nightly two-level build; content ≡ the
    * semtwoidx artifact, which is how the r18 pinned re-key kept
    * every oracle green). Only the publish step and q380's oracle
    * restate this constant — every consumer reads the pin FILE. */
  private[graft] val GateProdInitialPin = 1

  /** The deployment the steady-state promote cycle advances (q385):
    * its pin flips v1 → v2 as DATA, leaving `gate_prod` untouched so
    * every other declared query keeps serving v1 regardless of
    * whether the cycle ran first (order-independence). */
  private[graft] val GateCycleDeployment = "gate_cycle"

  /** Reads the model version `deployment` is pinned to at `root` —
    * the r18 verdict's #1 for r19: the pin is a one-line CONFIG FILE
    * committed next to the log's manifests (`_pins/<deployment>`),
    * not a compile-time constant, so a deployment re-pins with a
    * one-file write and NO recompilation (q380's router-config
    * discipline applied to the pin itself). The prod pin is written
    * at publish time inside the scratch dir, so a published root
    * always carries it; scratch-copy consumers (q381/q383's grace
    * copies) inherit the pin because the copy walks every regular
    * file. A missing pin file is a CONFIG error, never a silent
    * default — serving an unpinned model is exactly the hazard the
    * pin exists to prevent. */
  private[graft] def gateModelPin(root: java.nio.file.Path,
                                  deployment: String = GateProdDeployment)
      : Int = {
    val f = root.resolve("_pins").resolve(deployment)
    require(java.nio.file.Files.exists(f),
      s"deployment '$deployment' has no pin at $root — a gate " +
        "deployment must pin a model version before serving")
    new String(java.nio.file.Files.readAllBytes(f), "UTF-8").trim.toInt
  }

  /** Atomically (re-)pins `deployment` to version `v` at `root`: the
    * RE-PIN step is a tmp-write + ATOMIC_MOVE of a one-line file —
    * readers observe the old pin or the new pin, never a torn one.
    * Last-write-wins is correct here: the pin's content is
    * deterministic per (deployment, promote step). */
  private[graft] def setGateModelPin(root: java.nio.file.Path,
                                     deployment: String, v: Int): Unit = {
    val dir = root.resolve("_pins")
    java.nio.file.Files.createDirectories(dir)
    val tmp = java.nio.file.Files.createTempFile(dir, ".pin", ".tmp")
    java.nio.file.Files.write(tmp, v.toString.getBytes("UTF-8"))
    // ATOMIC_MOVE alone: POSIX rename replaces an existing target
    // atomically (the SnapshotLog manifest commit's exact idiom)
    java.nio.file.Files.move(tmp, dir.resolve(deployment),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Bumped on ANY change to the gate-model log build: folds into
    * [[gateModelRoot]]'s tmpdir key (the graphVersionRoot / packLog
    * discipline — a code change must never serve a stale committed
    * model across JVM runs). v2 = the r18 re-key of BOTH versions to
    * the two-level model (kinds m/c/o/f); v3 = the r19 pin store
    * (`_pins/` joins the published layout). */
  private val GateModelBuilderVersion = 3

  /** In-JVM monitors for [[gateModelRoot]]. */
  private val gateModelLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** The INTAKE-REBUILD model (v2 of the gate-model log; q375's
    * census reads its rows back): the rebuilt population P = the
    * standing even corpus ∪ the admitted log's arrivals, re-celled at
    * the family's hybrid rule k' = max(⌈√|P|⌉, ⌈|P|/cap⌉) with the
    * mixed-parity dense-id cut (cells = ids ≤ 2k' PRESENT in P —
    * admitted odds can now BE cells: yesterday's arrivals are
    * tomorrow's model), routed and assigned through the SAME
    * two-level path the standing model was built with
    * ([[graft.operators.SimilarityExtOps.twoLevelAssign]] /
    * twoLevelRouter — ONE assigner for the family, the r17 verdict's
    * #2). Returns the full 4-kind model frame (m/c/o/f): 'm' row id
    * parity IS the intake provenance. */
  private def gateRebuildModel(s: SparkSession, d: String,
                               admLog: DataFrame): DataFrame = {
    val simx = graft.operators.SimilarityExtOps
    val cap = simx.SemDedupClusterCap
    val pp = simx.latticeFrame(s, d, Long.MaxValue)
      .where(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("xi"))
      .unionByName(admLog.select(col("vec_id"), col("xi")))
    val kDf = pp.agg(greatest(
      ceil(sqrt(count(lit(1)))).cast("long"),
      expr(s"(count(1) + ${cap - 1}) DIV $cap").cast("long")).as("k"))
    val cents = pp.crossJoin(broadcast(kDf))
      .where(col("vec_id") <= lit(2) * col("k"))
      .select(col("vec_id").as("cid"), col("xi").as("ci"))
    val assigned = simx.twoLevelAssign(pp, cents)
    val (coarse, fa) = simx.twoLevelRouter(cents)
    assigned.select(lit("m").as("kind"), col("vec_id").as("id"),
        col("cid"), col("nv"), col("xi"))
      .unionByName(cents.select(lit("c").as("kind"),
        col("cid").as("id"), col("cid"), lit(0L).as("nv"),
        col("ci").as("xi")))
      .unionByName(coarse.select(lit("o").as("kind"),
        col("ccid").as("id"), col("ccid").as("cid"), lit(0L).as("nv"),
        col("cci").as("xi")))
      .unionByName(fa.select(lit("f").as("kind"), col("cid").as("id"),
        col("ccid").as("cid"), lit(0L).as("nv"), col("ci").as("xi")))
  }

  /** The GATE-MODEL VERSION LOG (q377; re-keyed r18 to the TWO-LEVEL
    * model — the r17 verdict's #2/#3): v1 = the NIGHTLY BUILD (the
    * standing two-level model's m/c/o/f rows, re-committed from the
    * semtwoidx artifact — the version deployments PIN,
    * the prod pin file holds), v2 = the INTAKE REBUILD
    * ([[gateRebuildModel]] over the admitted log). Committed under
    * SnapshotLog's files-then-manifest protocol into a
    * corpus-fingerprint-keyed, builder-version-tagged log. TWO
    * PHASES, because v1 is what the admit drain itself pins: phase 1
    * builds a v1-only log in a scratch dir and atomic-renames it into
    * place (a published root is always a complete v1); phase 2
    * (`upTo = 2`) drains the admitted log — WITHOUT holding the model
    * lock, the admit-before-model lock order every caller uses — and
    * appends v2 via the standard files-then-manifest, version-
    * idempotent commit (a crash between addFiles and commitVersion
    * leaves orphans and v1 serving; the replay lands identical
    * bytes). Retention is q381's keep-K on a grace copy. */
  private[graft] def gateModelRoot(s: SparkSession, d: String,
                                   upTo: Int = 2): java.nio.file.Path = {
    val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
    val simx = graft.operators.SimilarityExtOps
    val key = d.replaceAll("[^a-zA-Z0-9]", "_") + "_" +
      graft.BucketedCache.corpusFingerprint(d) +
      s"_b$GateModelBuilderVersion"
    val dir = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_modellog_$key")
    val lock = gateModelLocks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      if (!java.nio.file.Files.exists(dir)) {
        val scratchRoot = java.nio.file.Files
          .createTempDirectory("graft_modellog_scratch")
        val scratch = scratchRoot.resolve("log")
        try {
          java.nio.file.Files.createDirectories(scratch)
          val idxT = simx.semDedupTwoIndexTable(s, d)
          val v1 = SnapshotLog.addFiles(s, scratch, "m1",
            s.table(idxT).select("kind", "id", "cid", "nv", "xi"))
          SnapshotLog.commitVersion(scratch, 1, v1)
          // the prod deployment's pin is part of the published layout:
          // a root either doesn't exist or carries a readable pin —
          // consumers never observe a log without its config
          setGateModelPin(scratch, GateProdDeployment, GateProdInitialPin)
          try java.nio.file.Files.move(scratch, dir,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: java.nio.file.FileSystemException
              if java.nio.file.Files.exists(dir) => // lost the race
          }
        } finally {
          import scala.jdk.CollectionConverters._
          if (java.nio.file.Files.exists(scratchRoot))
            java.nio.file.Files.walk(scratchRoot).iterator.asScala.toSeq
              .sortBy(-_.getNameCount)
              .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
    }
    if (upTo >= 2 && SnapshotLog.latest(dir) < 2) {
      // the admit drain pins v1 (published above) and takes the admit
      // lock; only then does the v2 commit re-enter the model lock —
      // admit-lock-before-model-lock everywhere, so the two roots can
      // never deadlock
      val admRoot = gateAdmitRoot(s, d)
      lock.synchronized {
        if (SnapshotLog.latest(dir) < 2) {
          val admLog = SnapshotLog.read(s, admRoot,
            SnapshotLog.latest(admRoot))
          val v2 = SnapshotLog.addFiles(s, dir, "m2",
            gateRebuildModel(s, d, admLog))
          SnapshotLog.commitVersion(dir, 2, v2)
        }
      }
    }
    dir
  }

  /** The RE-PIN step of the steady-state promote cycle (q385 — the
    * r18 verdict's #1): advances the [[GateCycleDeployment]]'s pin to
    * the committed intake rebuild (v2) in the LIVE pin store — a
    * one-file atomic write, NO recompilation; [[gateAdmitDay2Root]]'s
    * model read is the load-bearing consumer of the flip. The prod
    * deployment's pin is untouched, so every other declared query
    * keeps serving v1 whether or not the cycle ran first
    * (order-independence — the same reason the cycle's rebuild lands
    * in its OWN log, [[gateCycleModelRoot]]). Idempotent: the pin's
    * content is deterministic. Returns the model root. */
  private[graft] def gateCycleRepin(s: SparkSession, d: String)
      : java.nio.file.Path = {
    val root = gateModelRoot(s, d) // v2 must be committed before a pin can take it
    setGateModelPin(root, GateCycleDeployment, 2)
    root
  }

  /** Reads the LATEST version of an admitted log, tolerating an EMPTY
    * one (a drain whose every arrival was rejected commits manifests
    * with zero files — the day-2 steady state): zero files would make
    * a bare parquet read throw, so the empty case returns an empty
    * frame with the log's declared schema. */
  private[graft] def admitLogLatest(s: SparkSession,
                                    root: java.nio.file.Path): DataFrame = {
    val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
    val fs = SnapshotLog.files(root, SnapshotLog.latest(root))
    if (fs.isEmpty)
      s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "vec_id BIGINT, cid BIGINT, nv BIGINT, xi ARRAY<BIGINT>"))
    else SnapshotLog.read(s, root, SnapshotLog.latest(root))
  }

  /** Bumped on ANY change to the cycle rebuild's rule or layout. */
  private val GateCycleBuilderVersion = 1

  /** The CYCLE MODEL LOG (q385): v3 = the SECOND intake rebuild —
    * standing evens ∪ day-1 admits ∪ day-2 admits, re-celled through
    * the family's ONE assigner ([[gateRebuildModel]], exactly v2's
    * path) — committed as version 3 under the files-then-manifest
    * protocol into its own corpus-fingerprint-keyed root. Its OWN
    * root, not an append to the live log: a declared query must stay
    * order-independent, and landing v3 in the live log would change
    * q377's census / q381's retention depending on whether the cycle
    * ran first. Production lands v3 in the live log as the next
    * nightly; this log models that landing at test scale (the q381
    * grace-copy discipline). On a static corpus day-2 admits drain to
    * zero, so v3's content equals v2's — the fixpoint — but the build
    * takes no shortcut: the rebuild runs in full from the union
    * population, and q385's oracle restates it from first
    * principles. */
  private[graft] def gateCycleModelRoot(s: SparkSession, d: String)
      : java.nio.file.Path = {
    val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
    val key = d.replaceAll("[^a-zA-Z0-9]", "_") + "_" +
      graft.BucketedCache.corpusFingerprint(d) +
      s"_b$GateModelBuilderVersion-a$GateAdmitBuilderVersion" +
      s"-c$GateCycleBuilderVersion"
    val dir = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_cyclelog_$key")
    val lock = gateModelLocks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      if (!java.nio.file.Files.exists(dir)) {
        val adm1 = admitLogLatest(s, gateAdmitRoot(s, d))
        val adm2 = admitLogLatest(s, gateAdmitDay2Root(s, d))
        val scratchRoot = java.nio.file.Files
          .createTempDirectory("graft_cyclelog_scratch")
        val scratch = scratchRoot.resolve("log")
        try {
          java.nio.file.Files.createDirectories(scratch)
          val v3 = SnapshotLog.addFiles(s, scratch, "m3",
            gateRebuildModel(s, d, adm1.unionByName(adm2)))
          SnapshotLog.commitVersion(scratch, 3, v3)
          try java.nio.file.Files.move(scratch, dir,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: java.nio.file.FileSystemException
              if java.nio.file.Files.exists(dir) => // lost the race
          }
        } finally {
          import scala.jdk.CollectionConverters._
          if (java.nio.file.Files.exists(scratchRoot))
            java.nio.file.Files.walk(scratchRoot).iterator.asScala.toSeq
              .sortBy(-_.getNameCount)
              .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
    }
    dir
  }

  /** The model's packed fine-group serving side: the ccid-bucketed
    * AT-REST routing table ([[graft.operators.SimilarityExtOps
    * .semDedupTwoFineTable]]) when the version served is the NIGHTLY
    * build — pinnedV == [[GateProdInitialPin]], whose content is the
    * semtwoidx artifact by construction — else packed from the model
    * frame per plan (a mid-cycle rebuild serves its own packing until
    * its nightly landing commits the layout). */
  private def modelFineSide(s: SparkSession, d: String,
                            pinnedV: Int): Option[DataFrame] =
    if (pinnedV == GateProdInitialPin)
      Some(s.table(
        graft.operators.SimilarityExtOps.semDedupTwoFineTable(s, d)))
    else None

  /** The BATCH restatement of the gate's arrival assignment against a
    * committed model version (q371's report, q382's diff, q384's
    * policy gate — one definition): odd arrivals coarse-argmin against
    * the model's packed 'o' rows, then the fine argmin within the
    * routed group, the fine side through the family's declared size
    * switch — reading the ccid-bucketed AT-REST table when
    * `fineAtRest` is given (r19: past the ceiling the model side then
    * contributes no exchange; PlanShapeSpec asserts it). Returns
    * (b, cid, xb, nb). */
  private[graft] def modelArrivals(s: SparkSession, d: String,
                                   model: DataFrame,
                                   fineAtRest: Option[DataFrame] = None,
                                   fineBroadcastCeiling: Long =
                                     graft.operators.SimilarityExtOps
                                       .TwoLevelBroadcastCeilingBytes)
      : DataFrame = {
    val simx = graft.operators.SimilarityExtOps
    val gf = org.apache.spark.sql.graft.GraftFunctions
    val packedCoarse = model.where(col("kind") === "o")
      .select(col("id").as("cid"), col("xi").as("ci"))
      .agg(collect_list(struct(col("cid"), col("ci"))).as("cc"))
    val fineGroups = fineAtRest.getOrElse(
      model.where(col("kind") === "f")
        .select(col("cid").as("ccid"), col("id").as("fcid"),
                col("xi").as("fci"))
        .groupBy("ccid")
        .agg(collect_list(struct(col("fcid").as("cid"),
                                 col("fci").as("ci"))).as("fc")))
    val fineSide =
      if (model.where(col("kind") === "f").count() *
            simx.TwoLevelFineEntryBytes <= fineBroadcastCeiling)
        broadcast(fineGroups)
      else fineGroups.hint("shuffle_hash")
    simx.latticeFrame(s, d, Long.MaxValue)
      .where(col("vec_id") % 2 === 1)
      .crossJoin(broadcast(packedCoarse))
      .select(col("vec_id"), col("xi"),
        gf.argminCentroidLong(col("xi"), col("cc")).as("ccid"))
      .join(fineSide, Seq("ccid"))
      .select(col("vec_id").as("b"),
        gf.argminCentroidLong(col("xi"), col("fc")).as("cid"),
        col("xi").as("xb"),
        gf.dotProductLong(col("xi"), col("xi")).as("nb"))
  }

  /** [[modelArrivals]] through TWO committed model versions in ONE
    * corpus scan (r18 verdict #4 — q382 paid two full corpus
    * assignments, decisions(1) + decisions(2), and the sweep priced
    * the diff at 9.36 s @100×; the arrival lattice is the dominant
    * input and both coarse Literals are tiny, so one scan computes
    * both routes): each arrival coarse-argmins against BOTH models'
    * packed 'o' rows, then each fine argmin rides its own ccid
    * equi-join — two joins, one scan, each fine side independently
    * through the family's declared size switch (and through the
    * at-rest table via `fineAtRest1` when side 1 serves the nightly
    * build). Returns (b, xb, nb, cid1, cid2). */
  private def modelArrivalsBoth(s: SparkSession, d: String,
                                m1: DataFrame, m2: DataFrame,
                                fineAtRest1: Option[DataFrame] = None)
      : DataFrame = {
    val simx = graft.operators.SimilarityExtOps
    val gf = org.apache.spark.sql.graft.GraftFunctions
    def packedCoarse(m: DataFrame) = m.where(col("kind") === "o")
      .select(col("id").as("cid"), col("xi").as("ci"))
      .agg(collect_list(struct(col("cid"), col("ci"))).as("cc"))
    def fineSide(m: DataFrame, ccidName: String, cidName: String,
                 atRest: Option[DataFrame]): DataFrame = {
      val fineGroups = atRest
        .map(_.select(col("ccid").as(ccidName), col("fc").as(cidName)))
        .getOrElse(m.where(col("kind") === "f")
          .select(col("cid").as(ccidName), col("id").as("fcid"),
                  col("xi").as("fci"))
          .groupBy(ccidName)
          .agg(collect_list(struct(col("fcid").as("cid"),
                                   col("fci").as("ci"))).as(cidName)))
      if (m.where(col("kind") === "f").count() *
            simx.TwoLevelFineEntryBytes <=
            simx.TwoLevelBroadcastCeilingBytes) broadcast(fineGroups)
      else fineGroups.hint("shuffle_hash")
    }
    simx.latticeFrame(s, d, Long.MaxValue)
      .where(col("vec_id") % 2 === 1)
      .crossJoin(broadcast(packedCoarse(m1).select(col("cc").as("cc1"))))
      .crossJoin(broadcast(packedCoarse(m2).select(col("cc").as("cc2"))))
      .select(col("vec_id"), col("xi"),
        gf.argminCentroidLong(col("xi"), col("cc1")).as("ccid1"),
        gf.argminCentroidLong(col("xi"), col("cc2")).as("ccid2"))
      .join(fineSide(m1, "ccid1", "fc1", fineAtRest1), Seq("ccid1"))
      .join(fineSide(m2, "ccid2", "fc2", None), Seq("ccid2"))
      .select(col("vec_id").as("b"), col("xi").as("xb"),
        gf.dotProductLong(col("xi"), col("xi")).as("nb"),
        gf.argminCentroidLong(col("xi"), col("fc1")).as("cid1"),
        gf.argminCentroidLong(col("xi"), col("fc2")).as("cid2"))
  }

  /** A model version's capped member-probe side (cid, xa, na[, a]) —
    * the same projection every gate consumer runs. */
  private def modelMembers(model: DataFrame): DataFrame = {
    val simx = graft.operators.SimilarityExtOps
    simx.cappedMemberSide(
      model.where(col("kind") === "m")
        .select(col("cid"), col("id").as("vec_id"), col("xi"),
                col("nv")),
      simx.SemDedupClusterCap)
  }

  /** q377's per-version census over a gate-model log at `root` —
    * factored so GateModelSpec can run the report over a scratch copy
    * carrying a hand-committed unknown version (the tolerance the
    * getOrElse exists for). */
  private[graft] def modelLogReport(s: SparkSession,
                                    root: java.nio.file.Path): DataFrame = {
    val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
    SnapshotLog.versions(root).map { v =>
      SnapshotLog.read(s, root, v)
        .agg(sum(when(col("kind") === "c", 1L).otherwise(0L))
               .as("cells"),
             sum(when(col("kind") === "m", 1L).otherwise(0L))
               .as("members"),
             sum(when(col("kind") === "m" && col("id") % 2 === 1, 1L)
                   .otherwise(0L)).as("admitted"))
        .select(lit(v.toLong).as("version"),
                lit(GateModelTiers.getOrElse(v, s"unknown_v$v"))
                  .as("tier"),
                col("cells"), col("members"), col("admitted"))
    }.reduce(_ unionAll _).orderBy("version")
  }

  /** Per-kind MULTISET delta between two committed model versions —
    * the PROMOTE-PUSH primitive (added r19): a serving layer holding
    * `prev` applies (removed, added) instead of reloading the full
    * next model, so the nightly push ships O(day churn) rows, not
    * O(model) — at the 10⁹-vector census point (side ≈ 1.18 GB,
    * ProbeRouterBuild) that is the difference between re-shipping a
    * gigabyte per promote and shipping the day's admits. Exact
    * multiset semantics (never a hash fingerprint, the house rule):
    * both sides fold to per-row counts on the FULL 5-column row —
    * kind, id, cid, nv, xi — one hash aggregate each and one full
    * join, so the delta costs two model scans, never a corpus pass.
    * added = Σ max(next−prev, 0), removed = Σ max(prev−next, 0) per
    * row; carried = rows_prev − removed (= the multiset
    * intersection, so rows_next = carried + added holds by
    * construction — the apply-the-delta identity a push consumer
    * relies on). */
  private[graft] def modelChurnByKind(prev: DataFrame,
                                      next: DataFrame): DataFrame = {
    val key = Seq("kind", "id", "cid", "nv", "xi")
    def counted(df: DataFrame, as: String) =
      df.select(key.map(col): _*).groupBy(key.map(col): _*)
        .agg(count(lit(1)).as(as))
    counted(prev, "pc").join(counted(next, "nc"), key, "full")
      .groupBy("kind")
      .agg(sum(coalesce(col("pc"), lit(0L))).as("rows_prev"),
           sum(coalesce(col("nc"), lit(0L))).as("rows_next"),
           sum(greatest(coalesce(col("nc"), lit(0L)) -
                        coalesce(col("pc"), lit(0L)), lit(0L)))
             .as("added"),
           sum(greatest(coalesce(col("pc"), lit(0L)) -
                        coalesce(col("nc"), lit(0L)), lit(0L)))
             .as("removed"))
      .select(col("kind"), col("rows_prev"), col("rows_next"),
              (col("rows_prev") - col("removed")).as("carried"),
              col("added"), col("removed"))
  }

  /** One committed log's INTEGRITY row (q388's per-log fsck, factored
    * so GateModelSpec can run it over a deliberately broken scratch
    * copy): walks the manifest chain and the data dir, never the row
    * data — cost is O(files), independent of volume.
    *   - contiguous: the main version chain has no gap (a missing
    *     manifest between min and max means a reader's time travel
    *     silently skips a version)
    *   - manifests_complete: every file every MAIN manifest lists
    *     exists on disk (a vacuum bug or stray delete = partial read)
    *   - no_orphans: every data file in the dir is referenced by some
    *     manifest, main or branch (orphans = a crashed writer's
    *     garbage, space that retention will never reclaim)
    *   - pins_total / valid_pins: every pin file DISCOVERED under
    *     `_pins/` (never a caller-declared list — a stray deployment's
    *     pin must be audited, not skipped) vs how many of them name a
    *     COMMITTED version (a pin outside the chain means a
    *     deployment serving nothing; the healthy invariant is
    *     pins_total == valid_pins)
    * Returns (contiguous, manifests_complete, no_orphans, pins_total,
    * valid_pins). */
  private[graft] def fsckLogRow(root: java.nio.file.Path)
      : (Long, Long, Long, Long, Long) = {
    val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
    import scala.jdk.CollectionConverters._
    val vs = SnapshotLog.versions(root)
    val contiguous =
      if (vs.nonEmpty && vs == (vs.head to vs.last)) 1L else 0L
    val complete = if (vs.forall(v => SnapshotLog.files(root, v)
          .forall(n => java.nio.file.Files.exists(root.resolve(n)))))
      1L else 0L
    val referenced = SnapshotLog.referencedFiles(root)
    val orphans =
      scala.util.Using.resource(java.nio.file.Files.list(root)) { st =>
        st.iterator.asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(_.getFileName.toString)
          .count(n => n.endsWith(".parquet") && !referenced.contains(n))
      }
    val pinDir = root.resolve("_pins")
    val deployments =
      if (!java.nio.file.Files.exists(pinDir)) Seq.empty[String]
      else scala.util.Using.resource(
          java.nio.file.Files.list(pinDir)) { st =>
        st.iterator.asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(_.getFileName.toString)
          .filterNot(_.endsWith(".tmp")).toSeq
      }
    val validPins = deployments.count { dep =>
      scala.util.Try(gateModelPin(root, dep)).toOption
        .exists(vs.contains)
    }
    (contiguous, complete, if (orphans == 0) 1L else 0L,
     deployments.size.toLong, validPins.toLong)
  }

  /** File-source event stream with µs event time (ns parquet → µs). */
  private def eventStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = s.read.parquet(s"$d/events.parquet").schema
    s.readStream.schema(rawSchema).parquet(stagedEventsDir(d))
      .withColumn("ts", Tables.tsNorm(rawSchema("ts").dataType))
  }

  /** Builds the stream with `build` and runs it to completion into a
    * memory sink, returning the sink table. AvailableNow processes the
    * staged file then stops.
    *
    * State partitioning: a streaming query pins its state-store layout
    * to `spark.sql.shuffle.partitions` AT START, and every micro-batch
    * pays a per-partition state checkpoint cost regardless of volume.
    * These demos hold thousands of keys, not billions, so 8 partitions
    * is plenty. The override lives in an isolated child session
    * (`newSession` — shared SparkContext and cache, own SQL conf), so a
    * batch or stream query planning concurrently in the caller's
    * session can never observe the reduced value. (A production job
    * sizes this to keys/executors once — it cannot change across
    * restarts.) */
  private def runToMemory(s: SparkSession, build: SparkSession => DataFrame,
                          qname: String, mode: String,
                          fullParallelism: Boolean = false): DataFrame = {
    val iso = s.newSession()
    val prev = scala.util.Try(
      s.conf.get("spark.sql.shuffle.partitions").toInt).getOrElse(32)
    // STATELESS streams (q345's gate) keep the caller's parallelism:
    // the 8-partition override exists to bound per-batch state-store
    // checkpoint cost, and a stateless query has no state store — the
    // r14 100× sweep measured the gate 4× slower under the reduced
    // setting (8 vs 32 join partitions), for zero state benefit.
    iso.conf.set("spark.sql.shuffle.partitions",
                 (if (fullParallelism) prev else math.min(8, prev)).toString)
    val query = build(iso).writeStream
      .format("memory").queryName(qname)
      .outputMode(mode).trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    iso.table(qname)
  }

  /** Runs the stream into a CHECKPOINTED PARQUET sink (fresh per-call
    * sink+checkpoint dirs) and returns the sink read back as a batch
    * frame. This is the production exactly-once path the memory-sink
    * harness ([[runToMemory]]) only simulates: the file source's offset
    * log, the state store, and the file sink's transaction log all live
    * under the checkpoint, so a restarted query resumes from committed
    * offsets, recovers its state, and can never double-commit a batch
    * (StreamingSpec restarts THIS query shape from its checkpoint
    * mid-input and asserts the sink stays exactly-once). Same isolated
    * child-session discipline as runToMemory. */
  private def runToParquet(s: SparkSession,
                           build: SparkSession => DataFrame,
                           sinkName: String,
                           fullParallelism: Boolean = false): DataFrame = {
    val iso = s.newSession()
    val prev = scala.util.Try(
      s.conf.get("spark.sql.shuffle.partitions").toInt).getOrElse(32)
    // same rule as runToMemory: the 8-partition override bounds
    // per-batch STATE-STORE checkpoint cost, so stateless streams
    // (q345's gate) keep the caller's parallelism instead
    iso.conf.set("spark.sql.shuffle.partitions",
                 (if (fullParallelism) prev else math.min(8, prev)).toString)
    val root = java.nio.file.Files.createTempDirectory(s"graft_fsink_$sinkName")
    // per-invocation dirs keep each run's sink independent (the bench
    // must time a full drain, not a no-op checkpoint resume), but they
    // must not ACCUMULATE: the shared tag-keyed sweeper deletes the
    // PREVIOUS pass's sink as soon as this one registers (the harness
    // consumes a pass's result before re-invoking) and sweeps the last
    // one at JVM exit (r10 + r17 ADVICE)
    graft.TempSweep.replaceAtExit(s"fsink_$sinkName", root)
    val query = build(iso).writeStream
      .format("parquet")
      .option("path", root.resolve("out").toString)
      .option("checkpointLocation", root.resolve("cp").toString)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start()
    // a failed drain must not leak a running query into later runs
    try query.awaitTermination()
    finally if (query.isActive) query.stop()
    iso.read.parquet(root.resolve("out").toString)
  }

  /** One monitor per sketch-artifact root (q164): a second in-JVM
    * caller must not attach a second streaming query to the same
    * checkpoint. */
  private val sketchLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Idempotent per-batch commit of a daily-HLL partial (q164): the
    * batch's (day, type) sketches land under `art/batch=<id>` via
    * scratch-write + atomic rename, so a foreachBatch RETRY of the same
    * batchId (Spark's contract is at-least-once invocation) finds the
    * committed dir — or loses the rename race to its twin — and never
    * double-appends. This is the standard idempotent-foreachBatch
    * pattern: the batchId IS the transaction id, the rename IS the
    * commit. Package-visible so StreamingSpec can drive a double-commit
    * directly. */
  private[graft] def commitSketchPartial(art: java.nio.file.Path, id: Long,
                                         partial: DataFrame): Unit = {
    val target = art.resolve(s"batch=$id")
    if (!java.nio.file.Files.exists(target)) {
      val scratch = java.nio.file.Files.createTempDirectory(
        art.getParent, ".commit")
      try {
        partial.write.mode("overwrite")
          .parquet(scratch.resolve("data").toString)
        try java.nio.file.Files.move(scratch.resolve("data"), target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileSystemException
            if java.nio.file.Files.exists(target) => // lost to a twin
        }
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(scratch).iterator.asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  /** Runs (or resumes) the q164 maintenance stream: events from `inDir`
    * drain micro-batch by micro-batch into per-batch (day, event_type)
    * HLL partials under `root/art`, exactly-once via the checkpointed
    * offset log (which batches ran) plus [[commitSketchPartial]]'s
    * idempotent rename (each ran batch lands at most once). */
  private[graft] def maintainSketchArtifact(s: SparkSession, inDir: String,
      root: java.nio.file.Path): Unit =
    sketchLocks.computeIfAbsent(root.toString, _ => new Object).synchronized {
      val iso = s.newSession()
      iso.conf.set("spark.sql.shuffle.partitions", "8")
      iso.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = iso.read.parquet(inDir).schema
      val art = root.resolve("art")
      java.nio.file.Files.createDirectories(art)
      val query = iso.readStream.schema(schema).parquet(inDir)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          commitSketchPartial(art, id, batch
            .withColumn("day", to_date(Tables.tsNorm(schema("ts").dataType)))
            .groupBy("day", "event_type")
            .agg(hll_sketch_agg(col("user_id")).as("sk")))
        }
        .option("checkpointLocation", root.resolve("cp").toString)
        .trigger(Trigger.AvailableNow()).start()
      try query.awaitTermination()
      finally if (query.isActive) query.stop()
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_demo" -> { (s, d) =>
      runToMemory(s, iso => eventStream(iso, d)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("hour_start"), col("event_type"),
                col("cnt")),
        "graft_stream_demo", "complete")
        .orderBy("hour_start", "event_type")
    },

    // q38's gap-based sessionization as a STREAMING stateful aggregation:
    // session_window merges/extends per-user session state as events
    // arrive. Complete output mode keeps every session in the store, so
    // when AvailableNow drains the staged file the sink holds exactly
    // the batch result — bit-parity with q38's oracle. (In production
    // this runs in append mode with a watermark: closed sessions emit
    // and their state is dropped once the watermark passes session end;
    // complete mode here is what makes the one-shot result exact, since
    // sessions containing the stream's final events are never past any
    // watermark. StreamingSpec exercises the watermarked append path.)
    "q80_stream_sessionize" -> { (s, d) =>
      // the aggregation IS q38's (one shared definition — bit-parity by
      // construction), run over the stream instead of the batch table
      runToMemory(s,
        iso => graft.operators.TimeWindowOps.sessionize(eventStream(iso, d)),
        "graft_stream_sess", "complete")
        .orderBy("user_id", "sess_start")
    },

    // Streaming exactly-once dedup (added r6): the staged input holds
    // EVERY event twice (an at-least-once upstream — retried producer,
    // replayed log segment), and stateful dropDuplicates on the event
    // key restores exactly-once downstream: the first arrival emits
    // (append mode), every replay hits the state store and is dropped,
    // ACROSS micro-batches. The per-type counts over the sink must
    // therefore equal the batch aggregate over the ORIGINAL events —
    // which is exactly what the oracle asserts. In production the state
    // is bounded with dropDuplicatesWithinWatermark (a key older than
    // the watermark can no longer be replayed); unbounded here because
    // the drained file is finite.
    "q89_stream_dedup" -> { (s, d) =>
      runToMemory(s, iso => {
        iso.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val rawSchema = iso.read.parquet(s"$d/events.parquet").schema
        iso.readStream.schema(rawSchema).parquet(stagedDupEventsDir(d))
          .dropDuplicates("event_id")
      }, "graft_stream_dedup", "append")
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
             countDistinct(col("user_id")).as("users"))
        .orderBy("event_type")
    },

    // Watermark-BOUNDED exactly-once dedup (added r7) — the production
    // form of q89, which q89's scaladoc names but r6 left undeclared:
    // dropDuplicatesWithinWatermark keeps a key's dedup state only
    // until the watermark passes its event time + delay, so state is
    // O(keys inside the watermark horizon) instead of O(all keys ever
    // seen) — the difference between a dedup that runs forever on an
    // unbounded stream and one that OOMs. The correctness contract is
    // explicit: the configured delay must cover the upstream REPLAY
    // HORIZON (how stale a retry/replayed segment can be). Here the
    // at-least-once staged input replays within the drained file and
    // the 35-day delay covers the events table's 30-day span, so no
    // replay ever outlives its state and the result equals q89's
    // exactly-once aggregate — the same oracle. StreamingSpec
    // separately demonstrates the bounded-state semantics with a short
    // delay: an in-horizon replay dedups, an expired key re-emits.
    "q98_stream_dedup_watermark" -> { (s, d) =>
      runToMemory(s, iso => {
        iso.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val rawSchema = iso.read.parquet(s"$d/events.parquet").schema
        iso.readStream.schema(rawSchema).parquet(stagedDupEventsDir(d))
          .withColumn("ts", Tables.tsNorm(rawSchema("ts").dataType))
          .withWatermark("ts", "35 days")
          .dropDuplicatesWithinWatermark("event_id")
      }, "graft_stream_dedup_wm", "append")
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
             countDistinct(col("user_id")).as("users"))
        .orderBy("event_type")
    },

    // Streaming point-in-time dimension enrichment (added r13) — THE
    // most common production streaming job, closing the streaming ↔
    // SCD2 gap: an order stream enriched against the VERSIONED
    // customer-segment dimension (q174's SCD2 intervals, one shared
    // [[graft.operators.AdvancedOps.segmentDim]] definition) by
    // event-time validity — each order picks the dimension version
    // that was current AT ORDER TIME, not today's (today's-segment
    // enrichment silently rewrites history, the classic SCD mistake).
    // Shape: a STREAM-STATIC inner join, which Spark runs STATELESS
    // (no watermark, no state store — the dimension is the state,
    // q109's index discipline): per micro-batch cost is batch ×
    // matched dim rows; the non-equi validity predicate rides the
    // custkey equi-join. The rollup runs INSIDE the stream (complete-
    // mode aggregation — the sink holds the ≤|segments|×2-row rollup,
    // never per-order rows: the first cut sank enriched ROWS to the
    // memory sink and OOM'd the driver at 100× volume, 15M orders of
    // driver heap — the sink must scale with the ANSWER, not the
    // stream). Declared result ≡ q174's batch rollup (shared dim text
    // in the oracle) under ANY micro-batch split, because enrichment
    // is row-local and counts are additive; StreamingSpec proves the
    // split claim on a 3-file one-per-trigger drain.
    // Streaming SemDeDup gate at the TWO-LEVEL router (added r14 on
    // the 16-cell model; RE-KEYED r17, the r16 verdict's #3 — "no
    // shipped query carries the known-truncating 16-cell model"): the
    // online dedup gate a training-data intake runs in front of the
    // corpus, at the geometry a 10⁹-vector deployment actually
    // serves. Where q356 is the flat √n-cell gate (one k-way argmin
    // per arrival — k = √n literals in the plan), this gate runs
    // q369's PRODUCTION assigner: the ⌈√k⌉ coarse centroids COLLECT
    // ONCE and freeze as ONE Literal (centroidLitLong — kc entries,
    // strictly smaller than q356's k-entry model), each arrival pays
    // one √k-way coarse argmin, then a broadcast equi-join on its
    // coarse id against the artifact's replicated fine-cell groups
    // ('f' rows) picks the fine cell — per-arrival cost (1+R)·√k vs
    // k, the difference between a 244k-literal model and a ~500-entry
    // one at the census point where the cap binds. Members ('m') were
    // assigned through the SAME two-level path at build time
    // ([[graft.operators.SimilarityExtOps.semDedupTwoIndexTable]]),
    // so an arrival and a member at the same point route identically
    // by construction; the member probe stays the stream-static
    // cid-bucketed equi join, the dup line q311/q339's exact-lattice
    // cosine verbatim, stateless ⇒ append-mode exactly-once. Oracle:
    // the full two-level rule restated (coarse cut, top-R routing,
    // coarse-then-fine argmin) — at oracle SFs R ≥ kc makes it
    // coincide with the flat √n assignment (q370's declared
    // degeneracy), but the oracle text carries the real rule so the
    // contract holds at any volume. q370 attests the router's
    // agreement/recall vs flat; SweepR17 prices this gate against
    // q356's same-drain flat line.
    // r18 (the r17 verdict's #1/#3): the model is read from the
    // PINNED version of the gate-model log (v1 ≡ the semtwoidx
    // artifact, so the pin is oracle-invisible by construction), and
    // the fine-group side rides the family's DECLARED size switch
    // through [[twoLevelArrivalHead]] — broadcast under the 128 MB
    // ceiling, ccid-co-bucketed shuffled hash past it (the
    // 10⁹-vector geometry this family markets, where the side prices
    // at 1.18 GB).
    "q345_stream_semdedup" -> { (s, d) =>
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      // the gate serves a PINNED model version (r18, the r17
      // verdict's #3; the pin itself is DATA since r19 — a one-line
      // file read once at deployment start, gateModelPin): a rebuild
      // landing v2 behind this deployment changes NOTHING it serves
      // until the deployment's pin file flips (GateModelSpec drives
      // the v1-read-under-v2 claim directly)
      val modelRoot = gateModelRoot(s, d, upTo = 1)
      val pinned = gateModelPin(modelRoot)
      val model = SnapshotLog.read(s, modelRoot, pinned)
      val coarseLit = coarseLiteral(model)
      val fineEntries = model.where(col("kind") === "f").count()
      runToParquet(s, iso => {
        val simx = graft.operators.SimilarityExtOps
        val isoModel = SnapshotLog.read(iso, modelRoot, pinned)
        // member side capped per cluster (the Σ cluster-occupancy
        // guard at volume — a measured no-op at this geometry, like
        // q356); the probe rides the shared gate predicate
        val members = simx.cappedMemberSide(
            isoModel.where(col("kind") === "m")
              .select(col("cid"), col("id").as("vec_id"), col("xi"),
                      col("nv")),
            simx.SemDedupClusterCap)
          .select(col("cid"), col("xa"), col("na"))
        val arrivals =
          twoLevelArrivalHead(iso, d, isoModel, coarseLit, fineEntries,
            fineAtRest = modelFineSide(iso, d, pinned))
            .select(col("vec_id").as("b"), col("xi").as("xb"),
                    col("cid"), col("nv").as("nb"))
        simx.gateDupPairs(arrivals, members)
          .select(col("b").as("vec_id"), col("cid"))
      // r15 (the r14 verdict's #4): the gate drains through the
      // CHECKPOINTED PARQUET sink, not the memory sink — the hit
      // stream is fact-scaled (2.4M rows at the 100× sweep) and the
      // memory sink serializes every row onto the driver; the file
      // sink writes executor-parallel (and is the production
      // exactly-once path anyway). Read side folds hits per arrival.
      }, "graft_stream_semdedup", fullParallelism = true)
        .groupBy("vec_id", "cid")
        .agg(count(lit(1)).as("n_dup_old"))
        .orderBy("vec_id", "cid")
    },

    // Streaming SemDeDup gate at the flat √n-cell geometry (added
    // r16, then the r15 verdict's #1; since r17/r18 this is the
    // declared FLAT COMPARISON TIER, not a production geometry —
    // q345's two-level router is the one production gate, and this
    // query exists to price what the router replaces: at 100× its
    // model is k = 317 plan literals vs the router's kc = 18, and at
    // the 10⁹ census point 244k vs ~500. It deliberately reads the
    // live semsqidx artifact rather than the pinned gate-model log —
    // the pin belongs to the production family; the contrast tier
    // measures the flat SHAPE, one tier per purpose, the way the
    // 16-cell tier was retired when it stopped having one.) — q345's
    // online gate with the model re-keyed to cells = ⌈√|even|⌉
    // (q355's certified census geometry: sampled even-id cells,
    // single argmin assignment).
    // This was the geometry the r15 MEASUREMENTS picked: at 100× the
    // 16-cell gate floors at 0.56 ms/arrival with every ~6.2k-member
    // cluster truncated by the 4096 cap (dropped members invisible to
    // the gate), while √n cells cut the arrival×member rectangle 17.5×
    // AND find 2.7× more duplicates because no cell hits the cap
    // (BASELINE's SweepR15 cells table; the r16 sweep re-measures the
    // END-TO-END stream at both geometries). Deployment shape is
    // q345's verbatim — centroids COLLECT ONCE and freeze into the
    // streaming plan, the member probe is a stream-static equi join on
    // cid against the 32-bucket artifact, stateless ⇒ append-mode
    // exactly-once — with one scale fix: k ≈ √n centroids freeze as a
    // SINGLE Literal node (GraftFunctions.centroidLitLong), not a k·d-
    // leaf array(struct(lit…)) tree, because a streaming plan is
    // re-analyzed every micro-batch and at 10⁹ vectors the tree form
    // is ~2M expression nodes per batch. The member-side cap stays as
    // the volume guard but is a measured NO-OP at this geometry at
    // every oracle-checked SF (spec-asserted: max cell occupancy ≪
    // cap) — which is the point of √n cells: the cap never truncates,
    // so the gate's recall is the model's, not the guard's. Oracle:
    // q355's shared text shape, folded per (arrival, cid).
    "q356_stream_semdedup_sqrt" -> { (s, d) =>
      val idxT =
        graft.operators.SimilarityExtOps.semDedupSqrtIndexTable(s, d)
      val centRows = s.table(idxT).where(col("kind") === "c")
        .select(col("cid"), col("xi")).collect()
      val centsLit = org.apache.spark.sql.graft.GraftFunctions
        .centroidLitLong(centRows.map(r =>
          (r.getLong(0), r.getSeq[Long](1))).toSeq.sortBy(_._1))
      runToParquet(s, iso => {
        val simx = graft.operators.SimilarityExtOps
        val rawSchema = iso.read.parquet(s"$d/embeddings.parquet").schema
        val members = simx.cappedMemberSide(
            iso.table(idxT).where(col("kind") === "m")
              .select(col("cid"), col("id").as("vec_id"), col("xi"),
                      col("nv")),
            simx.SemDedupClusterCap)
          .select(col("cid"), col("xa"), col("na"))
        val arrivals = iso.readStream.schema(rawSchema)
          .parquet(stagedEmbsDir(d))
          .where(col("vec_id") % 2 === 1)
          .select(col("vec_id"), expr(
            "transform(cast(embedding as array<double>), " +
              "x -> CAST(round(x * 1000000) AS BIGINT))").as("xi"))
          .select(col("vec_id").as("b"), col("xi").as("xb"),
            org.apache.spark.sql.graft.GraftFunctions
              .argminCentroidLong(col("xi"), centsLit).as("cid"),
            org.apache.spark.sql.graft.GraftFunctions
              .dotProductLong(col("xi"), col("xi")).as("nb"))
        simx.gateDupPairs(arrivals, members)
          .select(col("b").as("vec_id"), col("cid"))
      }, "graft_stream_semdedup_sqrt", fullParallelism = true)
        .groupBy("vec_id", "cid")
        .agg(count(lit(1)).as("n_dup_old"))
        .orderBy("vec_id", "cid")
    },

    // STREAM-MAINTAINED member index for the online gate (added r17,
    // the r16 verdict's #2 — q356 probes a FROZEN member artifact, so
    // accepted arrivals were invisible to the gate until the next
    // nightly rebuild; this closes the loop): arrivals drain through
    // a foreachBatch committer ([[applyGateBatch]]) that ADMITS every
    // arrival with no standing-corpus match and appends it to a
    // cid-bucketed SnapshotLog per trigger — q298's idempotent
    // bucket-merge commits applied to the gate's member index (only
    // changed cid buckets rewrite; a replayed batch finds its version
    // committed; files-then-manifest means a crash can never tear the
    // log). Admission is decided against the CORPUS SNAPSHOT only —
    // the declared one-level rule that keeps the admitted set
    // identical under ANY batch split (admit-vs-admit acceptance
    // would be recursive and split-sensitive; dups AMONG recent
    // admits surface in n_dup_recent and belong to the nightly batch
    // pass). The declared result is the gate's intake report read
    // BACK THROUGH THE LOG: per arrival its cell, standing-corpus dup
    // count, dup count against EARLIER-ID admitted arrivals (the
    // probe a frozen-index gate cannot run), and the admitted flag —
    // taken from the committed log itself, not recomputed, so a
    // missed or doubled commit breaks the oracle. StreamingSpec
    // drives the split/replay/double-fire claims on the committer
    // directly.
    "q371_stream_gate_admit" -> { (s, d) =>
      val simx = graft.operators.SimilarityExtOps
      val gf = org.apache.spark.sql.graft.GraftFunctions
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      // ONE artifact for the whole family (r18, the r17 verdict's
      // #2/#3): the report recomputes the admit decisions against the
      // PINNED two-level model — the same versioned artifact the
      // committer judged against and q345 serves from
      val modelRoot = gateModelRoot(s, d, upTo = 1)
      val pin = gateModelPin(modelRoot)
      val model = SnapshotLog.read(s, modelRoot, pin)
      val root = gateAdmitRoot(s, d)
      val admLog = SnapshotLog.read(s, root, SnapshotLog.latest(root))
      val (arr, ah) = org.apache.spark.sql.graft.InternalPin.pin(
        modelArrivals(s, d, model, modelFineSide(s, d, pin)))
      ah.count(); graft.PinScope.retain(ah)
      val members = modelMembers(model)
        .select(col("cid"), col("xa"), col("na"))
      val corp = simx.gateDupPairs(arr, members)
        .groupBy("b").agg(count(lit(1)).as("n_dup_corpus"))
      val rec = simx.gateDupPairs(arr,
          admLog.select(col("cid"), col("vec_id").as("a"),
                        col("nv").as("na"), col("xi").as("xa")))
        .where(col("a") < col("b"))
        .groupBy("b").agg(count(lit(1)).as("n_dup_recent"))
      arr.select(col("b"), col("cid"))
        .join(corp, Seq("b"), "left")
        .join(rec, Seq("b"), "left")
        .join(admLog.select(col("vec_id").as("b"), lit(1L).as("adm")),
              Seq("b"), "left")
        .select(col("b").as("vec_id"), col("cid"),
                coalesce(col("n_dup_corpus"), lit(0L)).as("n_dup_corpus"),
                coalesce(col("n_dup_recent"), lit(0L)).as("n_dup_recent"),
                coalesce(col("adm"), lit(0L)).as("admitted"))
        .orderBy("vec_id")
    },

    // NIGHTLY REBUILD folding the admitted log back into the standing
    // model (added r17; RE-KEYED r18 to the two-level family — the
    // r17 verdict's #2: the rebuild now BUILDS tomorrow's two-level
    // model and the census reads the COMMITTED version back): the
    // rebuilt population P = the standing even corpus ∪ the gate's
    // committed admits, re-celled at the family's hybrid rule k' =
    // max(⌈√|P|⌉, ⌈|P|/cap⌉) with the mixed-parity dense-id cut
    // (cells = ids ≤ 2k' PRESENT in P; admitted odds can now BE cells
    // — yesterday's arrivals are tomorrow's model), routed and
    // assigned through the SAME two-level path the standing model was
    // built with ([[gateRebuildModel]] → twoLevelAssign — one
    // assigner for the whole family). The result lands as VERSION 2
    // of the gate-model log ([[gateModelRoot]]); this census reads
    // the committed v2 'm' rows back and reports each cell's member
    // count split by PROVENANCE (standing evens vs admitted odds) —
    // the number a serving team reads before re-pinning, so a missed
    // or doubled model commit breaks the oracle. Oracle restates the
    // two-level admit rule + the union re-cell + the two-level
    // re-assignment.
    "q375_gate_rebuild" -> { (s, d) =>
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      val root = gateModelRoot(s, d)
      val v2 = SnapshotLog.read(s, root, 2)
      val g = v2.where(col("kind") === "m").groupBy("cid")
        .agg(count(lit(1)).as("members"),
             sum(when(col("id") % 2 === 0, 1L).otherwise(0L))
               .as("standing"),
             sum(when(col("id") % 2 === 1, 1L).otherwise(0L))
               .as("admitted"))
      v2.where(col("kind") === "c").select(col("id").as("cid"))
        .join(g, Seq("cid"), "left")
        .select(col("cid"),
                coalesce(col("members"), lit(0L)).as("members"),
                coalesce(col("standing"), lit(0L)).as("standing"),
                coalesce(col("admitted"), lit(0L)).as("admitted"))
        .orderBy("cid")
    },

    // Gate-model PROMOTION report (added r17, §13.1 #1; re-keyed r18
    // with the log — q375 certifies the rebuild census but the
    // rebuilt model landed nowhere): the query a serving team runs
    // after the model job — which gate-model versions are COMMITTED
    // and what does each hold? Running it ensures the promotion
    // itself: v1 = the nightly build (the standing TWO-LEVEL model's
    // m/c/o/f rows re-committed from its artifact — the version
    // deployments pin), v2 = the intake rebuild (standing ∪ the
    // admitted log through [[gateRebuildModel]]'s two-level re-cell),
    // each under SnapshotLog's files-then-manifest protocol in a
    // corpus-fingerprint-keyed log ([[gateModelRoot]]). Report per
    // version: tier, cell count, member count, and how many members
    // are ADMITTED arrivals (id parity = provenance) — version
    // numbers are data a gate deployment pins (q345/q371 pin v1,
    // the pin FILE, gateModelPin). Tier lookups tolerate unknown versions
    // (the r16 ADVICE rule; GateModelSpec drives a hand-committed v3
    // through this report).
    "q377_model_promote" -> { (s, d) =>
      modelLogReport(s, gateModelRoot(s, d))
    },

    // Gate-model RETENTION with deployment-pin protection (added r18,
    // the r17 verdict's #3's open half — q377's log only ever grows):
    // q366's keep-K vacuum applied to the MODEL log, with q378's
    // wrinkle: a gate deployment PINS its model version as a BRANCH
    // (`gate_prod`, committed from v1's file list — zero data
    // movement, the pin a deployment that cannot re-certify overnight
    // actually takes), and retention must never collect a pinned
    // version's files. On a scratch copy of the live log: pin v1 as
    // the branch, vacuum keep = 1 — v1's MAIN manifest drops (status
    // `branch_only`) but its data files SURVIVE the GC because branch
    // manifests pin their files (SnapshotLog.vacuum's union rule),
    // and the report re-reads v1's model COMPLETE through the branch
    // (cells + members must equal the live v1's) while v2 serves from
    // the kept main manifest. Live log untouched; the copy deletes at
    // JVM exit through the shared tag-keyed sweeper. Oracle restates
    // both models — the GC must be invisible to both readers.
    "q381_modellog_vacuum" -> { (s, d) =>
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      val live = gateModelRoot(s, d)
      val copy = java.nio.file.Files
        .createTempDirectory("graft_modellog_vac")
      graft.TempSweep.replaceAtExit("modellog_vac", copy)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(live).iterator.asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .foreach { p =>
          val rel = live.relativize(p)
          val dst = copy.resolve(rel.toString)
          java.nio.file.Files.createDirectories(dst.getParent)
          java.nio.file.Files.copy(p, dst)
        }
      // the branch pins whatever version the COPY's own pin file
      // holds — the grace copy carries its config (walk copies every
      // regular file, `_pins/gate_prod` included)
      SnapshotLog.branchCommit(copy, "gate_prod",
        SnapshotLog.files(copy, gateModelPin(copy)))
      val (_, dropped) = SnapshotLog.vacuum(copy, keep = 1)
      val st1 = if (dropped.contains(1)) "branch_only" else "kept"
      def census(df: DataFrame, v: Int, st: String): DataFrame = df
        .agg(sum(when(col("kind") === "c", 1L).otherwise(0L))
               .as("cells"),
             sum(when(col("kind") === "m", 1L).otherwise(0L))
               .as("members"))
        .select(lit(v.toLong).as("version"),
                lit(GateModelTiers.getOrElse(v, s"unknown_v$v"))
                  .as("tier"),
                lit(st).as("status"), col("cells"), col("members"))
      census(SnapshotLog.branchRead(s, copy, "gate_prod", 1), 1, st1)
        .unionAll(census(SnapshotLog.read(s, copy, 2), 2, "kept"))
        .orderBy("version")
    },

    // RE-PIN decision diff (added r18 — the number a serving team
    // reads BEFORE re-pinning from v1 to v2, closing the loop the pin
    // opened: q377 lands versions, q345/q371 pin v1, and THIS is the
    // promotion gate): the SAME odd arrival stream runs through BOTH
    // committed model versions — each arrival assigns through THAT
    // model's two-level router and probes THAT model's capped members
    // (self-pairs excluded: an admitted arrival is a v2 MEMBER and
    // must never flag itself) — and the report is one row: arrivals,
    // dup decisions under each version, the overlap, the flips in
    // each direction, and decision-agreement ppm. new_dups are
    // overwhelmingly dups among yesterday's admits (q371's
    // n_dup_recent made consequential — the reason to re-pin);
    // lost_dups are borderline pairs whose cells moved under the
    // re-cell (the price, q376's band story). Both passes are
    // artifact probes of the committed log + ONE shared corpus
    // assignment (r18 verdict #4: the diff's two versions route off
    // a single arrival scan through [[modelArrivalsBoth]] — both
    // coarse Literals are tiny, so paying the lattice read twice was
    // pure waste); each fine side rides the declared size switch.
    "q382_repin_diff" -> { (s, d) =>
      val simx = graft.operators.SimilarityExtOps
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      val root = gateModelRoot(s, d)
      val (m1, m2) = (SnapshotLog.read(s, root, 1),
                      SnapshotLog.read(s, root, 2))
      val (arr, ah) = org.apache.spark.sql.graft.InternalPin.pin(
        modelArrivalsBoth(s, d, m1, m2,
          fineAtRest1 = modelFineSide(s, d, GateProdInitialPin)))
      ah.count(); graft.PinScope.retain(ah)
      def decisions(v: Int): DataFrame = {
        val model = if (v == 1) m1 else m2
        simx.gateDupPairs(
            arr.select(col(s"cid$v").as("cid"), col("b"), col("xb"),
                       col("nb")),
            modelMembers(model))
          .where(col("a") =!= col("b"))
          .select(col("b")).distinct()
      }
      val (d1, h1) =
        org.apache.spark.sql.graft.InternalPin.pin(decisions(1))
      h1.count(); graft.PinScope.retain(h1)
      val (d2, h2) =
        org.apache.spark.sql.graft.InternalPin.pin(decisions(2))
      h2.count(); graft.PinScope.retain(h2)
      simx.latticeFrame(s, d, Long.MaxValue)
        .where(col("vec_id") % 2 === 1)
        .agg(count(lit(1)).as("arrivals"))
        .crossJoin(d1.agg(count(lit(1)).as("dup_v1")))
        .crossJoin(d2.agg(count(lit(1)).as("dup_v2")))
        .crossJoin(d1.join(d2, Seq("b"), "left_semi")
          .agg(count(lit(1)).as("both_dup")))
        .select(col("arrivals"), col("dup_v1"), col("dup_v2"),
                col("both_dup"),
                (col("dup_v2") - col("both_dup")).as("new_dups"),
                (col("dup_v1") - col("both_dup")).as("lost_dups"),
                expr("CASE WHEN arrivals = 0 THEN 1000000 ELSE " +
                     "(1000000 * (arrivals - (dup_v1 - both_dup) - " +
                     "(dup_v2 - both_dup))) DIV arrivals END")
                  .as("agree_ppm"))
    },

    // STRENGTH-BANDED admit policy (added r18 — §14.1 #4 promoted the
    // same session it was recorded: q376/q380 MEASURED that the
    // two-level router's losses concentrate in the borderline band
    // (cos 0.4–0.5 reads 914,285 ppm recall at sf0.1 while band ≥ 2
    // reads 10⁶); this turns that data into POLICY): the gate's
    // binary admit line splits into three decisions by the strongest
    // qualifying pair's cross-multiplied strength band —
    // `reject` at band ≥ 2 (cos² ≥ 0.25: strong dups, where the
    // router provably loses nothing), `admit_flagged` at band 1
    // (the borderline band: admitted so the corpus never loses a
    // possibly-novel document to a weak match, FLAGGED so the nightly
    // batch pass re-judges it with the flat truth — exactly the
    // population q382's lost_dups measured), `admit` on no qualifying
    // pair. Per-arrival report: cell, strongest band (0 = clean),
    // decision. Same artifact probes + one corpus assignment as the
    // family; the band lines are q376's integer cross-multiplication
    // (never a division).
    "q384_banded_admit" -> { (s, d) =>
      val simx = graft.operators.SimilarityExtOps
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      val modelRoot = gateModelRoot(s, d, upTo = 1)
      val pin = gateModelPin(modelRoot)
      val model = SnapshotLog.read(s, modelRoot, pin)
      val (arr, ah) = org.apache.spark.sql.graft.InternalPin.pin(
        modelArrivals(s, d, model, modelFineSide(s, d, pin)))
      ah.count(); graft.PinScope.retain(ah)
      val bands = simx.gateDupPairs(arr,
          modelMembers(model).select(col("cid"), col("xa"), col("na")))
        .groupBy("b").agg(max(simx.strengthBand).as("strongest_band"))
      arr.select(col("b"), col("cid"))
        .join(bands, Seq("b"), "left")
        .select(col("b").as("vec_id"), col("cid"),
                coalesce(col("strongest_band"), lit(0L))
                  .as("strongest_band"),
                when(coalesce(col("strongest_band"), lit(0L)) >= 2,
                     "reject")
                  .when(coalesce(col("strongest_band"), lit(0L)) === 1,
                        "admit_flagged")
                  .otherwise("admit").as("decision"))
        .orderBy("vec_id")
    },

    // STEADY-STATE PROMOTE CYCLE (added r19 — the r18 verdict's #1,
    // §14.1 #2: the gate family's convergence story, run instead of
    // argued): the operational loop a serving team runs nightly,
    // declared end-to-end as TWO cycles. Cycle 1 is the r18 story —
    // day-1 arrivals drain against the prod pin (v1), the intake
    // rebuild lands v2, and the q382 decision diff is the promotion
    // evidence. Cycle 2 CLOSES the loop: the cycle deployment RE-PINS
    // to v2 with a one-file atomic write ([[gateCycleRepin]] — the
    // pin is DATA since r19; no recompilation, and the day-2 drain's
    // model read is the flip's load-bearing consumer), day-2 intake
    // (the same at-least-once stream re-delivered — a static corpus's
    // steady state) drains against v2, the second rebuild lands v3 in
    // the cycle log, and the SAME diff runs v2 vs v3. The report is
    // one row per cycle — pin version, intake volume, admits taken
    // from the COMMITTED logs (never recomputed, q371's discipline),
    // and the decision flips — and the query REQUIRES the second
    // diff's flip count not to exceed the first's: on a static corpus
    // day-2 admits drain to zero, the rebuild is a FIXED POINT
    // (deterministic re-cell of an identical population), and the
    // second diff reads 0/0/10⁶ — the borderline-band floor reached.
    // Cost: two single-scan diffs ([[modelArrivalsBoth]]) + three
    // one-time artifacts (day-2 log, cycle log; day-1 family shared).
    // Driver-side reads are 1-row aggregates and log counts only.
    "q385_promote_cycle" -> { (s, d) =>
      val simx = graft.operators.SimilarityExtOps
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      val root = gateModelRoot(s, d)
      val admits1 = admitLogLatest(s, gateAdmitRoot(s, d)).count()
      val admits2 = admitLogLatest(s, gateAdmitDay2Root(s, d)).count()
      val cyc = gateCycleModelRoot(s, d)
      val pin1 = gateModelPin(root).toLong
      val pin2 = gateModelPin(root, GateCycleDeployment).toLong
      val m1 = SnapshotLog.read(s, root, 1)
      val m2 = SnapshotLog.read(s, root, 2)
      val m3 = SnapshotLog.read(s, cyc, 3)
      val arrivals = simx.latticeFrame(s, d, Long.MaxValue)
        .where(col("vec_id") % 2 === 1).count()
      // the q382 diff body against an arbitrary (prev, next) pair:
      // one corpus scan routes through both models, each side probes
      // its own capped members, self-pairs excluded (an admitted
      // arrival is a member of BOTH rebuilds)
      def diffCounts(mPrev: DataFrame, mNext: DataFrame,
                     atRestPrev: Option[DataFrame])
          : (Long, Long, Long) = {
        val (arr, ah) = org.apache.spark.sql.graft.InternalPin.pin(
          modelArrivalsBoth(s, d, mPrev, mNext, fineAtRest1 = atRestPrev))
        ah.count(); graft.PinScope.retain(ah)
        def dec(i: Int, m: DataFrame): DataFrame = simx.gateDupPairs(
            arr.select(col(s"cid$i").as("cid"), col("b"), col("xb"),
                       col("nb")),
            modelMembers(m))
          .where(col("a") =!= col("b")).select(col("b")).distinct()
        val (dp, hp) = org.apache.spark.sql.graft.InternalPin.pin(dec(1, mPrev))
        hp.count(); graft.PinScope.retain(hp)
        val (dn, hn) = org.apache.spark.sql.graft.InternalPin.pin(dec(2, mNext))
        hn.count(); graft.PinScope.retain(hn)
        val r = dp.agg(count(lit(1)).as("p"))
          .crossJoin(dn.agg(count(lit(1)).as("n")))
          .crossJoin(dp.join(dn, Seq("b"), "left_semi")
            .agg(count(lit(1)).as("both")))
          .collect()(0)
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val (p1, n1, b1) = diffCounts(m1, m2,
        modelFineSide(s, d, GateProdInitialPin))
      val (p2, n2, b2) = diffCounts(m2, m3, None)
      val flips1 = (n1 - b1) + (p1 - b1)
      val flips2 = (n2 - b2) + (p2 - b2)
      require(flips2 <= flips1,
        s"promote cycle DIVERGED: cycle-2 decision flips $flips2 > " +
          s"cycle-1's $flips1 — the rebuild is not converging toward " +
          "the borderline-band floor")
      def row(cycle: Long, pinV: Long, admitted: Long,
              p: Long, n: Long, b: Long): DataFrame = {
        val agree = if (arrivals == 0) 1000000L
          else (1000000L * (arrivals - (n - b) - (p - b))) / arrivals
        s.range(1).select(lit(cycle).as("cycle"),
          lit(pinV).as("pin_version"), lit(arrivals).as("arrivals"),
          lit(admitted).as("admitted"), lit(p).as("dup_prev"),
          lit(n).as("dup_next"), lit(n - b).as("new_dups"),
          lit(p - b).as("lost_dups"), lit(agree).as("agree_ppm"))
      }
      row(1L, pin1, admits1, p1, n1, b1)
        .unionByName(row(2L, pin2, admits2, p2, n2, b2))
        .orderBy("cycle")
    },

    // FLAGGED-BAND CONSUMER (added r19 — the r18 verdict's #3: q384's
    // `admit_flagged` rows routed to "the nightly flat-truth pass" in
    // prose only; this DECLARES that pass): the borderline band
    // (band 1 — cos² 0.16–0.25, where q376 measured the router's
    // losses concentrating) is re-judged by the FLAT gate at the
    // family's production geometry — the full even corpus
    // flat-assigned and capped (the nightly truth tier, q300's
    // full-rescan discipline: the ONE place the k-way linear argmin
    // is paid, and only nightly), each flagged arrival flat-assigned
    // against the same cells (a tiny broadcast argmin — the flagged
    // set is the borderline band, never the corpus) and probed with
    // the shared dup predicate. Verdicts: a flagged arrival the flat
    // truth ALSO finds a qualifying pair for is a RETIRED dup; one it
    // clears is a CONFIRMED admit, FOLDED BACK into the admit log's
    // next version on a grace copy (order-independence, q383's
    // discipline) — and the keep-1 vacuum then proves retention
    // covers the fold-back version: the post-GC latest must read back
    // the folded set COMPLETE, which is what admits_after reports. At
    // oracle SFs R ≥ kc makes the router exact (q370's declared
    // degeneracy), so every band-1 catch re-confirms as a dup —
    // retired = flagged, confirmed = 0 — while the oracle text
    // carries the real flat rule for the census-point geometry where
    // the bands genuinely disagree.
    "q386_flagged_rejudge" -> { (s, d) =>
      val simx = graft.operators.SimilarityExtOps
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      val modelRoot = gateModelRoot(s, d, upTo = 1)
      val pin = gateModelPin(modelRoot)
      val model = SnapshotLog.read(s, modelRoot, pin)
      val (arr, ah) = org.apache.spark.sql.graft.InternalPin.pin(
        modelArrivals(s, d, model, modelFineSide(s, d, pin)))
      ah.count(); graft.PinScope.retain(ah)
      // the borderline band under the pinned router — q384's rule
      val bands = simx.gateDupPairs(arr,
          modelMembers(model).select(col("cid"), col("xa"), col("na")))
        .groupBy("b").agg(max(simx.strengthBand).as("sb"))
      val (flagged, fh) = org.apache.spark.sql.graft.InternalPin.pin(
        arr.join(bands, Seq("b")).where(col("sb") === 1)
          .select(col("b"), col("xb"), col("nb"), col("cid")))
      fh.count(); graft.PinScope.retain(fh)
      // the FLAT truth: members flat-assigned at the production
      // geometry (hybrid k, cap 4096), flagged arrivals flat-assigned
      // against the same cells, shared dup predicate
      val em = simx.latticeFrame(s, d, Long.MaxValue)
      val kAgg = greatest(
        ceil(sqrt(count(lit(1)))).cast("long"),
        expr(s"(count(1) + ${simx.SemDedupClusterCap - 1}) DIV " +
             s"${simx.SemDedupClusterCap}").cast("long"))
      val (cents, asgEven0) = simx.hybridCellAssign(
        em.where(col("vec_id") % 2 === 0), kAgg, twoLevel = false)
      val (asgEven, eh) =
        org.apache.spark.sql.graft.InternalPin.pin(asgEven0)
      eh.count(); graft.PinScope.retain(eh)
      val memF = simx.cappedMemberSide(asgEven, simx.SemDedupClusterCap)
        .select(col("cid"), col("xa"), col("na"))
      val gf = org.apache.spark.sql.graft.GraftFunctions
      val packed = cents
        .agg(collect_list(struct(col("cid"), col("ci"))).as("cents"))
      val flaggedFlat = flagged.crossJoin(broadcast(packed))
        .select(gf.argminCentroidLong(col("xb"), col("cents"))
                  .as("cid"),
                col("b"), col("xb"), col("nb"))
      val (retiredDf, rh) = org.apache.spark.sql.graft.InternalPin.pin(
        simx.gateDupPairs(flaggedFlat, memF).select(col("b")).distinct())
      rh.count(); graft.PinScope.retain(rh)
      val cnt = flagged.agg(count(lit(1)).as("flagged"))
        .crossJoin(retiredDf.agg(count(lit(1)).as("retired")))
        .collect()(0)
      val (nFlagged, nRetired) = (cnt.getLong(0), cnt.getLong(1))
      val nConfirmed = nFlagged - nRetired
      // FOLD BACK on a grace copy of the admit log: confirmed admits
      // join the log's next version (same row shape the drain
      // commits), then keep-1 retention must keep the folded set
      val live = gateAdmitRoot(s, d)
      val copy = java.nio.file.Files
        .createTempDirectory("graft_flagfold")
      graft.TempSweep.replaceAtExit("flagfold", copy)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(live).iterator.asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .foreach { p =>
          val rel = live.relativize(p)
          val dst = copy.resolve(rel.toString)
          java.nio.file.Files.createDirectories(dst.getParent)
          java.nio.file.Files.copy(p, dst)
        }
      val v = SnapshotLog.latest(copy)
      val confRows = flagged
        .join(retiredDf, Seq("b"), "left_anti")
        .select(col("b").as("vec_id"), col("cid"),
                col("nb").as("nv"), col("xb").as("xi"))
      val added = SnapshotLog.addFiles(s, copy, "fold", confRows)
      SnapshotLog.commitVersion(copy, v + 1,
        SnapshotLog.files(copy, v) ++ added)
      val (_, dropped) = SnapshotLog.vacuum(copy, keep = 1)
      require(dropped.nonEmpty && SnapshotLog.latest(copy) == v + 1,
        s"fold-back version v${v + 1} did not survive retention " +
          s"(dropped $dropped)")
      val admitsAfter = admitLogLatest(s, copy).count()
      s.range(1).select(lit(nFlagged).as("flagged"),
        lit(nConfirmed).as("confirmed"), lit(nRetired).as("retired"),
        lit(admitsAfter).as("admits_after"))
    },

    // PROMOTE-PUSH CHURN (added r19 — the round's own lever, the
    // number q385's fixpoint story was missing at the STATE level):
    // the q382/q385 diffs certify DECISION stability across a
    // promote; this certifies what the promote costs to SHIP. Per
    // kind and per promote hop, the exact multiset delta between the
    // committed model versions — v1→v2 (the intake re-cell: the big
    // hop, members re-assigned, admits join) and v2→v3 (the cycle
    // log's steady-state hop: at sf0.01 the delta is 5 added / 0
    // removed rows against a 971-row model — day-2's readmitted
    // borderline arrivals and NOTHING else, the state-level floor
    // matching q385's 0-flip decision floor). The operational point:
    // a serving layer applies (removed, added) instead of reloading —
    // at the census point the nightly push ships the day's churn, not
    // a 1.18 GB side. rows_next = carried + added by construction
    // (the apply identity); both hops read COMMITTED versions only,
    // never recompute a model ([[modelChurnByKind]], two model scans
    // per hop, no corpus pass).
    "q387_model_churn" -> { (s, d) =>
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      val root = gateModelRoot(s, d)
      val cyc = gateCycleModelRoot(s, d)
      val cols = Seq("kind", "id", "cid", "nv", "xi")
      val m1 = SnapshotLog.read(s, root, 1).select(cols.map(col): _*)
      val m2 = SnapshotLog.read(s, root, 2).select(cols.map(col): _*)
      val m3 = SnapshotLog.read(s, cyc, 3).select(cols.map(col): _*)
      def hop(from: Long, to: Long, p: DataFrame, n: DataFrame) =
        modelChurnByKind(p, n)
          .select(lit(from).as("from_version"), lit(to).as("to_version"),
                  col("kind"), col("rows_prev"), col("rows_next"),
                  col("carried"), col("added"), col("removed"))
      hop(1L, 2L, m1, m2).unionByName(hop(2L, 3L, m2, m3))
        .orderBy("from_version", "kind")
    },

    // GATE-FAMILY FSCK (added r19 — the operational capstone: the
    // integrity audit an on-call runs over the family's FOUR
    // committed logs before trusting any of the serving/promote
    // queries above). Engine side is a real filesystem audit
    // ([[fsckLogRow]], O(files) — never reads row data): main-chain
    // contiguity, every manifest-listed file present, zero orphan
    // data files (main AND branch manifests count as references,
    // [[graft.sources.PartitionedOps.SnapshotLog.referencedFiles]]),
    // and every pin DISCOVERED under `_pins/` naming a committed
    // version (the model log carries the prod and cycle deployments'
    // pins — the pin is DATA since r19, so a bad pin is a config
    // corruption this audit must catch, and discovery means a STRAY
    // deployment's pin is audited too, never skipped because the
    // caller didn't expect it). Content check: the LATEST version of each
    // log read back and counted — the oracle restates all four
    // censuses from first principles off the one shared CTE chain, so
    // a log serving wrong CONTENT fails here even with perfect
    // manifests. Version NUMBERS stay out of the report row — the
    // admit chain's length is staging-geometry-dependent (the r18
    // ADVICE lesson); the booleans and censuses are not.
    "q388_gate_fsck" -> { (s, d) =>
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      // force the full family build chain first: the cycle log's
      // build runs the day-2 drain, which re-pins the cycle
      // deployment on the model log — the pin q388 then audits
      val modelRoot = gateModelRoot(s, d)
      val cycRoot = gateCycleModelRoot(s, d)
      val logs = Seq(
        ("admit", gateAdmitRoot(s, d)),
        ("admit_day2", gateAdmitDay2Root(s, d)),
        ("cycle_model", cycRoot),
        ("model", modelRoot))
      logs.map { case (name, root) =>
        val (contiguous, complete, noOrphans, pinsTotal, validPins) =
          fsckLogRow(root)
        val latestRows =
          SnapshotLog.read(s, root, SnapshotLog.latest(root)).count()
        s.range(1).select(lit(name).as("log"),
          lit(latestRows).as("latest_rows"),
          lit(contiguous).as("contiguous"),
          lit(complete).as("manifests_complete"),
          lit(noOrphans).as("no_orphans"),
          lit(pinsTotal).as("pins_total"),
          lit(validPins).as("valid_pins"))
      }.reduce(_ unionByName _).orderBy("log")
    },

    // CACHE-ARTIFACT FSCK (added r19 — the audit's third tier, after
    // q388's gate logs and q389's engine logs: the fingerprint-keyed
    // BucketedCache artifacts that back serving joins and index
    // probes). Per artifact: the `_SUCCESS` commit record (a torn
    // publish = the rename-commit protocol's one observable failure),
    // every data file carrying a Spark bucket-id suffix inside the
    // declared bucket count (a file landed WITHOUT bucketing would
    // silently un-co-locate the joins the layout exists for), and the
    // row census read back — freshness is carried by CONSTRUCTION:
    // the table name embeds the corpus fingerprint, so the audited
    // path IS the current corpus's build ([[graft.BucketedCache
    // .fsckArtifact]], O(files)). Audited set: the q59 co-located
    // join pair (8 buckets on the join keys), the two search-index
    // artifacts (BM25 + positional postings, 8 buckets on term — the
    // planning-time bucket pruning q187/q358 rely on), the persisted
    // router certification (1 bucket — the write-once measurement
    // q370/q376/q380 serve from), and the gate family's two at-rest
    // serving artifacts (32 buckets on cid/ccid — the serving-join
    // distribution the r19 layout work committed). The oracle
    // restates all seven censuses: base-table counts, the
    // token-occurrence / distinct-(term,doc) arithmetic over
    // documents, the cert table's 1 + distinct-band algebra (off an
    // `rc`-prefixed copy of the cert chain — the prefix
    // parameterization exists for exactly this composition), and the
    // two-level model's algebra (members + cells + coarse + routing
    // rows; fine groups = distinct routed ccids).
    "q390_cache_fsck" -> { (s, d) =>
      val simx = graft.operators.SimilarityExtOps
      val (liT, orT) = graft.operators.AdvancedOps.bucketedTables(s, d)
      val arts = Seq(
        ("li_bucketed", liT, 8),
        ("or_bucketed", orT, 8),
        ("pospost", simx.posPostingsTable(s, d), 8),
        ("postings", simx.bm25PostingsTable(s, d), 8),
        ("routercert", simx.routerCertTable(s, d), 1),
        ("semtwofine", simx.semDedupTwoFineTable(s, d), 32),
        ("semtwoidx", simx.semDedupTwoIndexTable(s, d), 32))
      arts.map { case (name, tbl, buckets) =>
        val (committed, bucketedOk) =
          graft.BucketedCache.fsckArtifact(tbl, buckets)
        val rows = s.table(tbl).count()
        s.range(1).select(lit(name).as("artifact"),
          lit(rows).as("n_rows"),
          lit(committed).as("committed"),
          lit(bucketedOk).as("bucketed_ok"),
          lit(buckets.toLong).as("buckets_declared"))
      }.reduce(_ unionByName _).orderBy("artifact")
    },

    // ADMIT-LOG retention (added r18 — the fourth and last of the
    // gate family's logs to gain a retire step, after graph q366,
    // pack q378 and model q381): the admit drain now runs the
    // production multi-batch at-least-once geometry (one file per
    // trigger over the dup-staged source), so the committed log
    // carries ≥ 2 versions whose bucket files the later batches
    // SUPERSEDED (batch 2 redelivers batch 1's arrivals; the vec_id
    // anti-join keeps content identical while rewriting the touched
    // buckets — new files, shared nothing backwards). Once the
    // nightly rebuild has folded the admits into model v2, those
    // superseded manifests are pure history: keep-1 vacuum on a
    // scratch copy drops them and collects every bucket file only
    // they referenced, and the LATEST version must read back COMPLETE
    // — which is exactly what the oracle checks, because the report's
    // admits/bucket census comes from the post-GC readback and must
    // equal the recomputed admitted set. The query REQUIRES the
    // vacuum to be non-vacuous (≥ 1 version dropped, ≥ 1 file
    // collected) so a regression to a single-batch drain fails loudly
    // instead of certifying nothing. Live log untouched; copy deletes
    // through the shared tag-keyed sweeper.
    "q383_admitlog_vacuum" -> { (s, d) =>
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      val live = gateAdmitRoot(s, d)
      val copy = java.nio.file.Files
        .createTempDirectory("graft_admitlog_vac")
      graft.TempSweep.replaceAtExit("admitlog_vac", copy)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(live).iterator.asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .foreach { p =>
          val rel = live.relativize(p)
          val dst = copy.resolve(rel.toString)
          java.nio.file.Files.createDirectories(dst.getParent)
          java.nio.file.Files.copy(p, dst)
        }
      val vsBefore = SnapshotLog.versions(copy)
      val (dead, dropped) = SnapshotLog.vacuum(copy, keep = 1)
      require(dropped.nonEmpty && dead.nonEmpty,
        s"admit-log vacuum was vacuous (versions $vsBefore, dead " +
          s"${dead.size}) — the multi-batch dup drain should leave " +
          "superseded bucket files for retention to collect")
      SnapshotLog.read(s, copy, SnapshotLog.latest(copy))
        .agg(count(lit(1)).as("admits"),
             countDistinct(pmod(col("cid"), lit(GateAdmBuckets.toLong)))
               .as("admit_buckets"))
        .select(col("admits"), col("admit_buckets"),
                lit(1L).as("dropped_any"), lit(1L).as("collected_any"))
    },

    "q330_stream_pit_enrich" -> { (s, d) =>
      runToMemory(s, iso => {
        val rawSchema = iso.read.parquet(s"$d/orders.parquet").schema
        val dim = graft.operators.AdvancedOps.segmentDim(iso, d)
        val o = iso.readStream.schema(rawSchema)
          .parquet(stagedOrdersDir(d))
        o.join(dim, o("o_custkey") === dim("sk") &&
            (dim("valid_from").isNull ||
             dim("valid_from") <= o("o_orderdate")) &&
            (dim("valid_to").isNull ||
             o("o_orderdate") < dim("valid_to")))
          .select(dim("segment").as("seg_at_order"),
                  dim("version").as("dim_version"))
          .groupBy("seg_at_order", "dim_version")
          .agg(count(lit(1)).as("orders"))
      }, "graft_stream_pit", "complete")
        .orderBy("seg_at_order", "dim_version")
    },

    // Streaming dedup against the PERSISTED band index (added r9) —
    // the online form of q76, i.e. the dedup SERVICE a pipeline runs
    // as new documents arrive: each micro-batch of new docs (odd
    // doc_ids, the q76 batch convention) is banded by the codegen'd
    // per-row MinHashBandKeys kernel (a projection, because a
    // streaming groupBy-per-doc would be a stateful aggregation; zero
    // shuffle) and probed against the bucketed graft_bandidx via a
    // STREAM-STATIC inner join, which is STATELESS: no watermark, no
    // state store — the index is the state, persisted once and only
    // ever read. Emitted matches are (new doc, indexed doc) shared-band
    // rows; the sink rollup counts bands per pair. At 100 TB this runs
    // continuously against the corpus index with per-batch cost
    // O(batch × matched buckets). Oracle: the full minhash self-join
    // restricted to (even, odd) pairs — exactly the pairs a new-doc
    // stream against the even-corpus index can produce.
    "q109_stream_dedup_index" -> { (s, d) =>
      val idxT = graft.operators.DedupExtOps.bandIndexTable(s, d)
      runToMemory(s, iso => {
        val rawSchema = iso.read.parquet(s"$d/documents.parquet").schema
        val newDocs = iso.readStream.schema(rawSchema)
          .parquet(stagedDocsDir(d))
          .where(col("doc_id") % 2 === 1)
          .select(col("doc_id").as("new_id"),
                  explode(org.apache.spark.sql.graft.GraftFunctions
                    .minhashBandKeys(split(col("text"), " "), 8, 4))
                    .as("bk"))
        newDocs.join(iso.table(idxT), Seq("bk"))
          .select(least(col("new_id"), col("doc_id")).as("id_a"),
                  greatest(col("new_id"), col("doc_id")).as("id_b"))
      }, "graft_stream_dedup_idx", "append")
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("n_bands"))
        .orderBy("id_a", "id_b")
    },

    // Exactly-once FILE sink (added r10 — the r9 verdict's #4): q89's
    // at-least-once dedup drained into a CHECKPOINTED PARQUET sink
    // instead of the memory harness — the production form of the
    // "exactly-once" claim, since only the file sink has a transaction
    // log that survives restarts (a memory sink cannot recover from a
    // checkpoint at all). The staged input still delivers every event
    // twice; stateful dropDuplicates emits first arrivals into the
    // sink, the sink's commit log records each micro-batch exactly
    // once, and the declared result is the per-type rollup over the
    // sink READ BACK AS A BATCH TABLE — which must equal the batch
    // aggregate over the original events (q89's oracle, shared).
    // StreamingSpec additionally restarts this exact shape from its
    // checkpoint mid-input (replay files arriving AFTER a stop) and
    // asserts the sink stays exactly-once and a no-new-input restart
    // emits nothing.
    "q122_stream_file_sink" -> { (s, d) =>
      runToParquet(s, iso => {
        iso.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val rawSchema = iso.read.parquet(s"$d/events.parquet").schema
        iso.readStream.schema(rawSchema).parquet(stagedDupEventsDir(d))
          .dropDuplicates("event_id")
      }, "dedup")
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
             countDistinct(col("user_id")).as("users"))
        .orderBy("event_type")
    },

    // ◐ STREAMING maintenance of the mergeable-sketch artifact (added
    // r11 — the r10 verdict's #5, closing the q122 ↔ q110 gap): the
    // daily-HLL cardinality artifact is not rebuilt by a batch job
    // (q110's shape) but MAINTAINED BY THE STREAM — each micro-batch
    // of events folds into per-(day, type) HLL partials committed
    // exactly-once (offset log says WHICH batches ran; the
    // batchId-keyed atomic rename says each ran batch lands ONCE —
    // foreachBatch alone is only at-least-once), and the artifact is a
    // LOG of mergeable partials, so maintenance never read-modify-
    // writes the existing artifact: compaction is optional and lazy,
    // exactly because sketch union is associative (the same property
    // q110 exploits across days, reused here across batches). The
    // declared result is q110's rollup — per-type distinct-user
    // estimate over ANY day range — read from the stream-maintained
    // artifact with zero fact rescans. StreamingSpec kills/restarts
    // the maintenance mid-input and double-fires a batch commit to
    // prove no double-merge. ◐ like q110: a DataSketches image is not
    // DuckDB-replayable; the estimate is tolerance-tested against the
    // exact distinct count. At 100 TB this replaces the nightly
    // sketch-build scan with O(batch) incremental work — the artifact
    // is always current, and a restart resumes from committed offsets.
    "q164_stream_sketch_union" -> { (s, d) =>
      // the artifact root rides the staged dir's LAYOUT FINGERPRINT
      // (r13, with the stageParts refactor): the checkpoint's offset
      // log hard-references source file paths, so a rebuilt source
      // (new fingerprint → new staged path) must get a FRESH
      // artifact+checkpoint rather than a resume against paths that
      // no longer exist; an unchanged source keeps its stable root
      // and resumes from committed offsets as before
      val staged = stagedEventsDir(d)
      val root = java.nio.file.Paths.get(staged + "_sketch")
      maintainSketchArtifact(s, staged, root)
      s.read.parquet(root.resolve("art").toString)
        .groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
               .as("est_users"),
             countDistinct(col("day")).as("days"))
        .orderBy("event_type")
    },

    "q78_stream_stream_join" -> { (s, d) =>
      // the per-signup count is a plain batch aggregate over the sink:
      // the stateful stream-stream part is the join itself
      runToMemory(s, iso => {
        // both sides derive from ONE source stream (a stream self-join):
        // one file listing + one scan per micro-batch instead of two
        val ev = eventStream(iso, d)
        val clicks = ev
          .where(col("event_type") === "click")
          .select(col("user_id").as("cu"), col("ts").as("cts"))
          .withWatermark("cts", "1 hour")
        val signups = ev
          .where(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("user_id").as("su"),
                  col("ts").as("sts"))
          .withWatermark("sts", "1 hour")
        // Inner join with an event-time range condition: Spark derives a
        // state watermark from it — a buffered click is dropped once no
        // future signup can reach back to it (cts < sts is impossible
        // after watermark passes cts) and vice versa, so state stays
        // bounded. Matches emit as they occur (append mode).
        clicks.join(signups,
          col("cu") === col("su") &&
            col("cts") >= col("sts") &&
            col("cts") < col("sts") + expr("INTERVAL 1 HOUR"))
      }, "graft_stream_join", "append")
        .groupBy("signup_id")
        .agg(count(lit(1)).as("clicks"))
        .orderBy("signup_id")
    },

    // Stateful exactly-once alerting (added r12) — the first
    // `flatMapGroupsWithState` operator in the suite (q72 is its batch
    // analog; q80/q38 use the built-in session aggregation): per user,
    // a value spike (> 180.00) raises AT MOST ONE alert per event-time
    // hour, across micro-batches and replays — the suppression set
    // lives in the state store, so a second spike in an already-alerted
    // hour (same batch, later batch, or an upstream replay) emits
    // nothing. The emitted episode index (this user's nth alerted hour)
    // is custom state no built-in dedup provides. Within a batch the
    // buffered group sorts by (event time, event_id) — deterministic
    // fold; across batches the file source drains in ts order, and the
    // StreamingSpec drives a two-batch split + duplicate replay to pin
    // the exactly-once contract. State is O(alerted hours per user);
    // production bounds it with a timeout evicting hours behind the
    // watermark (documented; unbounded here over the finite drain).
    // Streaming CDC apply (added r12) — the STREAMING leg of the
    // lakehouse change family (q117 classifies, q119 batch-applies,
    // q123 builds history): a keyed upsert/delete stream folds into
    // last-writer-wins table state as it arrives. CDC ops synthesize
    // deterministically from events (error ⇒ DELETE, anything else ⇒
    // UPSERT of the cents value), keyed by user; within a batch a
    // group folds in (event time, event_id) order, across batches the
    // state store carries (last ts/id, last op, value, op count). Each
    // batch emits the key's CURRENT image stamped with its monotone op
    // count, so the final table = argmax(op count) per key — correct
    // under ANY batch split (StreamingSpec drives a two-batch split to
    // equality with the one-batch drain). State is O(live keys) — it
    // IS the table, the irreducible CDC floor; production compacts it
    // to the lakehouse target per trigger (q122's checkpointed sink).
    // Oracle = the batch reduction: per key the latest op wins, DELETE
    // keys absent.
    "q285_stream_cdc_apply" -> { (s, d) =>
      val sunk = runToMemory(s, iso => cdcImages(iso, d),
                             "graft_stream_cdc", "update")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("n_ops").desc)
      sunk.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1 && col("op") === "U")
        .select(col("user_id"),
                round(col("cents").cast("double") / 100.0, 6)
                  .as("last_value"),
                col("n_ops"))
        .orderBy("user_id")
    },

    // Streaming CDC → snapshot-log commits (added r13 — the r12
    // verdict's #7, closing the last streaming↔lakehouse gap): the
    // SAME LWW image stream q285 reduces in memory here COMMITS each
    // micro-batch as a versioned manifest through q167's
    // scratch+rename SnapshotLog — upserts/deletes land as bucket
    // rewrites, unchanged buckets carry over BY REFERENCE in the new
    // manifest, versions are batchId-idempotent (a replayed batch
    // re-adds identical bytes and skips the commit — the q164
    // discipline at manifest level), and every intermediate version
    // stays time-travel-readable until vacuum. The declared query
    // reads the LATEST snapshot, which must equal q285's batch
    // reduction under ANY batch split — shared oracle; the
    // kill/restart + time-travel + double-fire contracts live in
    // StreamingSpec.
    "q298_stream_cdc_snapshot" -> { (s, d) =>
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      val root = cdcSnapshotRoot(s, d)
      SnapshotLog.read(s, root, SnapshotLog.latest(root))
        .select(col("user_id"),
                round(col("cents").cast("double") / 100.0, 6)
                  .as("last_value"),
                col("n_ops"))
        .orderBy("user_id")
    },

    // Streaming top-k heavy hitters (added r13) — q88's SpaceSaving
    // sketch moved INTO the state store: the "what are the hottest
    // keys right now" monitor every event pipeline runs. Distributed
    // the way a real streaming top-k must be: the stream shards into
    // 8 LANES (pmod of event_id) and each lane maintains its OWN
    // capacity-128 SpaceSaving sketch in flatMapGroupsWithState —
    // lane-parallel state, no single-reducer funnel — and the read
    // side merges lane sketches by summing counts. Capacity ≥ the
    // 100-value props.k vocab makes every lane sketch provably exact
    // (q88's declared discipline — sub-capacity error bounds are
    // property-tested on SpaceSavingAgg), so the merged top-10 is
    // exactly the batch answer and the query stays oracled. Each
    // batch emits the lane's full sketch stamped with an update
    // sequence; the read keeps each lane's LAST emission (the q267
    // drain-order-invariance lesson) before merging. At production
    // scale the lane count is the state-parallelism knob and capacity
    // bounds state bytes per lane — constant-memory monitoring at any
    // stream rate.
    "q317_stream_topk" -> { (s, d) =>
      runToMemory(s, iso => {
        import iso.implicits._
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
        eventStream(iso, d)
          .select(pmod(col("event_id"), lit(8)).cast("int").as("lane"),
                  get_json_object(col("props"), "$.k").as("tok"))
          // r13 ADVICE: an event without props.k would form a NULL
          // token group, and Spark's NULLS-FIRST ascending tie order
          // diverges from DuckDB's NULLS-LAST at the top-10 boundary
          // — tokenless events are out of the monitor's scope by
          // declared semantics, filtered identically in both engines
          .where(col("tok").isNotNull)
          .as[(Int, String)]
          .groupByKey(_._1)
          .flatMapGroupsWithState(
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            (lane: Int, it: Iterator[(Int, String)],
             state: GroupState[(Int, Map[String, Long])]) =>
              var (upd, m) =
                state.getOption.getOrElse((0, Map.empty[String, Long]))
              for ((_, tok) <- it) {
                if (m.contains(tok) || m.size < 128)
                  m = m.updated(tok, m.getOrElse(tok, 0L) + 1L)
                else {
                  // SpaceSaving eviction: the min-count entry (key
                  // tie-break) hands its count+1 to the newcomer —
                  // the classic overestimate bound; never reached
                  // here (capacity ≥ vocab), declared for the shape
                  val (mk, mv) = m.minBy { case (k0, v) => (v, k0) }
                  m = (m - mk).updated(tok, mv + 1L)
                }
              }
              upd += 1
              state.update((upd, m))
              m.iterator.map { case (t, c) => (lane, upd, t, c) }
          }
          .toDF("lane", "upd", "token", "cnt")
      }, "graft_stream_topk", "append")
        .withColumn("mx", max("upd").over(
          org.apache.spark.sql.expressions.Window.partitionBy("lane")))
        .where(col("upd") === col("mx"))
        .groupBy("token").agg(sum("cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(10)
    },

    "q267_stream_alert" -> { (s, d) =>
      runToMemory(s, iso => {
        import iso.implicits._
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
        eventStream(iso, d)
          .select(col("user_id"), col("event_id"),
                  unix_micros(col("ts")).as("tus"),
                  round(col("value") * 100).cast("long").as("cents"))
          .where(col("cents") > 18000)
          .as[(Long, Long, Long, Long)]
          .groupByKey(_._1)
          .flatMapGroupsWithState(
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            (uid: Long, it: Iterator[(Long, Long, Long, Long)],
             state: GroupState[Set[Long]]) =>
              var seen = state.getOption.getOrElse(Set.empty[Long])
              val out =
                scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
              for (e <- it.toSeq.sortBy(e => (e._3, e._2))) {
                val hour = e._3 / 3600000000L
                if (!seen.contains(hour)) {
                  seen += hour
                  out += ((uid, hour, seen.size))
                }
              }
              state.update(seen)
              out.iterator
          }
          .toDF("user_id", "hour_idx", "episode_idx")
      }, "graft_stream_alert", "append")
        // episode_idx is re-ranked HERE, over the sink, not taken from
        // the state-insertion order: the in-flight seen.size index is
        // correct only while the file source drains parts in global
        // event-time order (single AvailableNow batch). If parts drain
        // across micro-batches out of ts order, a user's EARLIER hour
        // can arrive in a LATER batch and invert the in-flight indices
        // (r12 ADVICE). The alerted-hour SET is arrival-order-invariant
        // (set membership), so ranking it by hour at read time restores
        // the declared semantics under any drain schedule — the same
        // batch-reduction move q285 makes with its argmax over n_ops.
        .select(col("user_id"),
                timestamp_micros(col("hour_idx") * 3600000000L)
                  .as("alert_hour"),
                row_number().over(
                  org.apache.spark.sql.expressions.Window
                    .partitionBy("user_id").orderBy("hour_idx"))
                  .as("episode_idx"))
        .orderBy("user_id", "alert_hour")
    }
  )

  /** The TWO-LEVEL gate rule's shared DuckDB CTE chain (e → … → arr):
    * hybrid k over the even half, kc = ⌈√|c|⌉ coarse cells, top-R
    * fine→coarse routing, coarse-then-fine argmin for every vector,
    * member cap, odd arrivals projected. ONE text for q345's gate,
    * q371's admit report, q375's rebuild and q377's promotion — the
    * r17 one-definition discipline applied to the oracle side too: a
    * rule change edits this string once, and the family's oracles
    * move together. */
  private lazy val twoLevelGateCtes: String = {
    val simx = graft.operators.SimilarityExtOps
    s"""WITH e AS MATERIALIZED (SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
       |      AS xi
       |  FROM embeddings WHERE vec_id <> 0),
       |kv AS (SELECT greatest(
       |         CAST(ceil(sqrt(count(*))) AS BIGINT),
       |         CAST((count(*) + ${simx.SemDedupClusterCap - 1}) //
       |              ${simx.SemDedupClusterCap} AS BIGINT)) AS k
       |       FROM e WHERE vec_id % 2 = 0),
       |c AS MATERIALIZED (SELECT vec_id AS cid, xi AS ci FROM e, kv
       |      WHERE vec_id % 2 = 0 AND vec_id <= 2 * k),
       |kcv AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS kc
       |        FROM c),
       |cc AS MATERIALIZED (SELECT cid AS ccid, ci AS cci
       |      FROM c, kcv WHERE cid <= 2 * kc),
       |fa AS MATERIALIZED (SELECT cid, ccid FROM (
       |    SELECT c.cid, cc.ccid,
       |      row_number() OVER (PARTITION BY c.cid ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (c.ci[j] - cc.cci[j]) * (c.ci[j] - cc.cci[j])))
       |          AS BIGINT), cc.ccid) AS rn
       |    FROM c, cc) WHERE rn <= ${simx.TwoLevelRep}),
       |ac AS MATERIALIZED (SELECT vec_id, ccid FROM (
       |    SELECT e.vec_id, cc.ccid,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (e.xi[j] - cc.cci[j]) * (e.xi[j] - cc.cci[j])))
       |          AS BIGINT), cc.ccid) AS rn
       |    FROM e, cc) WHERE rn = 1),
       |asg AS MATERIALIZED (SELECT vec_id, cid FROM (
       |    SELECT a.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (e.xi[j] - c.ci[j]) * (e.xi[j] - c.ci[j])))
       |          AS BIGINT), c.cid) AS rn
       |    FROM ac a JOIN e ON a.vec_id = e.vec_id
       |         JOIN fa ON fa.ccid = a.ccid
       |         JOIN c ON c.cid = fa.cid) WHERE rn = 1),
       |nv AS (SELECT vec_id,
       |    CAST(list_sum(list_transform(range(1, 65),
       |      j -> xi[j] * xi[j])) AS BIGINT) AS nv
       |  FROM e),
       |mem AS MATERIALIZED (SELECT cid, vec_id, xi, nv FROM (
       |    SELECT a.cid, a.vec_id, e.xi, n.nv,
       |      row_number() OVER (PARTITION BY a.cid
       |                         ORDER BY a.vec_id) AS mrk
       |    FROM asg a JOIN e ON a.vec_id = e.vec_id
       |         JOIN nv n ON a.vec_id = n.vec_id
       |    WHERE a.vec_id % 2 = 0)
       |  WHERE mrk <= ${simx.SemDedupClusterCap}),
       |arr AS MATERIALIZED (SELECT a.cid, a.vec_id AS b, e.xi AS xb,
       |    n.nv AS nb
       |  FROM asg a JOIN e ON a.vec_id = e.vec_id
       |       JOIN nv n ON a.vec_id = n.vec_id
       |  WHERE a.vec_id % 2 = 1)""".stripMargin
  }

  /** The REBUILD population's shared CTE tail (q375/q377/q381): the
    * two-level admit rule's corpus-dup set, the union population P =
    * standing evens ∪ admitted arrivals, and the rebuild's hybrid
    * cell budget k2 over P. Appends to [[twoLevelGateCtes]]. */
  private lazy val gateRebuildCtes: String = {
    val simx = graft.operators.SimilarityExtOps
    s"""corp AS MATERIALIZED (SELECT DISTINCT b FROM (
       |    SELECT r.b,
       |      CAST(list_sum(list_transform(range(1, 65),
       |        j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
       |      m.nv AS na, r.nb
       |    FROM arr r JOIN mem m ON r.cid = m.cid)
       |  WHERE dot > 0 AND
       |    CAST(dot AS HUGEINT) * dot * 10000 >=
       |      CAST(na AS HUGEINT) * nb * 1600),
       |pp AS MATERIALIZED (
       |  SELECT vec_id, xi FROM e WHERE vec_id % 2 = 0
       |  UNION ALL
       |  SELECT a.b AS vec_id, a.xb AS xi FROM arr a
       |  WHERE a.b NOT IN (SELECT b FROM corp)),
       |k2 AS (SELECT greatest(
       |         CAST(ceil(sqrt(count(*))) AS BIGINT),
       |         CAST((count(*) + ${simx.SemDedupClusterCap - 1}) //
       |              ${simx.SemDedupClusterCap} AS BIGINT)) AS k2
       |       FROM pp),
       |c2 AS MATERIALIZED (SELECT vec_id AS cid, xi AS ci FROM pp, k2
       |      WHERE vec_id <= 2 * k2)""".stripMargin
  }

  /** The rebuild's TWO-LEVEL re-assignment CTE tail (q375/q382): kc2
    * coarse cells over the rebuild's cell table, top-R routing,
    * coarse-then-fine argmin for every member of P. Appends to
    * [[gateRebuildCtes]]. */
  private lazy val gateRebuildAssignCtes: String = {
    val simx = graft.operators.SimilarityExtOps
    s"""kc2 AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS kc
       |        FROM c2),
       |cc2 AS MATERIALIZED (SELECT cid AS ccid, ci AS cci
       |      FROM c2, kc2 WHERE cid <= 2 * kc),
       |fa2 AS MATERIALIZED (SELECT cid, ccid FROM (
       |    SELECT c2.cid, cc2.ccid,
       |      row_number() OVER (PARTITION BY c2.cid ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (c2.ci[j] - cc2.cci[j]) *
       |               (c2.ci[j] - cc2.cci[j])))
       |          AS BIGINT), cc2.ccid) AS rn
       |    FROM c2, cc2) WHERE rn <= ${simx.TwoLevelRep}),
       |ac2 AS MATERIALIZED (SELECT vec_id, ccid FROM (
       |    SELECT pp.vec_id, cc2.ccid,
       |      row_number() OVER (PARTITION BY pp.vec_id ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (pp.xi[j] - cc2.cci[j]) *
       |               (pp.xi[j] - cc2.cci[j])))
       |          AS BIGINT), cc2.ccid) AS rn
       |    FROM pp, cc2) WHERE rn = 1),
       |asg2 AS (SELECT vec_id, cid FROM (
       |    SELECT a.vec_id, c2.cid,
       |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (pp.xi[j] - c2.ci[j]) * (pp.xi[j] - c2.ci[j])))
       |          AS BIGINT), c2.cid) AS rn
       |    FROM ac2 a JOIN pp ON a.vec_id = pp.vec_id
       |         JOIN fa2 ON fa2.ccid = a.ccid
       |         JOIN c2 ON c2.cid = fa2.cid) WHERE rn = 1)""".stripMargin
  }

  /** The v2 SERVING-DECISION CTE tail (q382/q385, appends to
    * [[gateRebuildAssignCtes]]): arrivals routed through the REBUILT
    * model's two-level router (ac2b/asg2b), v2's capped member side
    * (mem2), and the self-excluded v2 dup-decision set (d2v) — the
    * diff's "next model" side, one text for both consumers. */
  private lazy val gateV2DecisionCtes: String = {
    val simx = graft.operators.SimilarityExtOps
    s"""ac2b AS MATERIALIZED (SELECT b, ccid FROM (
       |    SELECT a.b, cc2.ccid,
       |      row_number() OVER (PARTITION BY a.b ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (a.xb[j] - cc2.cci[j]) *
       |               (a.xb[j] - cc2.cci[j])))
       |          AS BIGINT), cc2.ccid) AS rn
       |    FROM arr a, cc2) WHERE rn = 1),
       |asg2b AS MATERIALIZED (SELECT b, cid FROM (
       |    SELECT a.b, c2.cid,
       |      row_number() OVER (PARTITION BY a.b ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (r.xb[j] - c2.ci[j]) * (r.xb[j] - c2.ci[j])))
       |          AS BIGINT), c2.cid) AS rn
       |    FROM ac2b a JOIN arr r ON a.b = r.b
       |         JOIN fa2 ON fa2.ccid = a.ccid
       |         JOIN c2 ON c2.cid = fa2.cid) WHERE rn = 1),
       |mem2 AS MATERIALIZED (SELECT cid, vec_id, xi, nv FROM (
       |    SELECT a.cid, a.vec_id, pp.xi, n.nv,
       |      row_number() OVER (PARTITION BY a.cid
       |                         ORDER BY a.vec_id) AS mrk
       |    FROM asg2 a JOIN pp ON a.vec_id = pp.vec_id
       |         JOIN nv n ON a.vec_id = n.vec_id)
       |  WHERE mrk <= ${simx.SemDedupClusterCap}),
       |d2v AS MATERIALIZED (SELECT DISTINCT b FROM (
       |    SELECT r.b,
       |      CAST(list_sum(list_transform(range(1, 65),
       |        j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
       |      m.nv AS na, r.nb
       |    FROM arr r JOIN asg2b g ON r.b = g.b
       |         JOIN mem2 m ON g.cid = m.cid AND m.vec_id <> r.b)
       |  WHERE dot > 0 AND
       |    CAST(dot AS HUGEINT) * dot * 10000 >=
       |      CAST(na AS HUGEINT) * nb * 1600)""".stripMargin
  }

  /** The DAY-2 + v3 CTE tail (q385 only, appends to
    * [[gateV2DecisionCtes]]): the day-2 ADMIT decision (d2full — the
    * drain's rule, NO self-exclusion: an admitted day-1 arrival is a
    * v2 member now and its redelivery self-matches), the day-2 admit
    * set, the union population pp3, the v3 re-cell/route/assign chain
    * (the rebuild CTEs' text one generation on), v3's capped members,
    * arrivals routed under v3, and the self-excluded v3 decision set
    * (d3v) — cycle 2's diff sides. */
  private lazy val gateCycleCtes: String = {
    val simx = graft.operators.SimilarityExtOps
    s"""d2full AS MATERIALIZED (SELECT DISTINCT b FROM (
       |    SELECT r.b,
       |      CAST(list_sum(list_transform(range(1, 65),
       |        j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
       |      m.nv AS na, r.nb
       |    FROM arr r JOIN asg2b g ON r.b = g.b
       |         JOIN mem2 m ON g.cid = m.cid)
       |  WHERE dot > 0 AND
       |    CAST(dot AS HUGEINT) * dot * 10000 >=
       |      CAST(na AS HUGEINT) * nb * 1600),
       |adm2 AS MATERIALIZED (SELECT a.b AS vec_id, a.xb AS xi
       |  FROM arr a WHERE a.b NOT IN (SELECT b FROM d2full)),
       |pp3 AS MATERIALIZED (
       |  SELECT vec_id, xi FROM pp
       |  UNION ALL
       |  SELECT vec_id, xi FROM adm2),
       |k3 AS (SELECT greatest(
       |         CAST(ceil(sqrt(count(*))) AS BIGINT),
       |         CAST((count(*) + ${simx.SemDedupClusterCap - 1}) //
       |              ${simx.SemDedupClusterCap} AS BIGINT)) AS k3
       |       FROM pp3),
       |c3 AS MATERIALIZED (SELECT vec_id AS cid, xi AS ci FROM pp3, k3
       |      WHERE vec_id <= 2 * k3),
       |kc3 AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS kc
       |        FROM c3),
       |cc3 AS MATERIALIZED (SELECT cid AS ccid, ci AS cci
       |      FROM c3, kc3 WHERE cid <= 2 * kc),
       |fa3 AS MATERIALIZED (SELECT cid, ccid FROM (
       |    SELECT c3.cid, cc3.ccid,
       |      row_number() OVER (PARTITION BY c3.cid ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (c3.ci[j] - cc3.cci[j]) *
       |               (c3.ci[j] - cc3.cci[j])))
       |          AS BIGINT), cc3.ccid) AS rn
       |    FROM c3, cc3) WHERE rn <= ${simx.TwoLevelRep}),
       |ac3 AS MATERIALIZED (SELECT vec_id, ccid FROM (
       |    SELECT pp3.vec_id, cc3.ccid,
       |      row_number() OVER (PARTITION BY pp3.vec_id ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (pp3.xi[j] - cc3.cci[j]) *
       |               (pp3.xi[j] - cc3.cci[j])))
       |          AS BIGINT), cc3.ccid) AS rn
       |    FROM pp3, cc3) WHERE rn = 1),
       |asg3 AS (SELECT vec_id, cid FROM (
       |    SELECT a.vec_id, c3.cid,
       |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (pp3.xi[j] - c3.ci[j]) * (pp3.xi[j] - c3.ci[j])))
       |          AS BIGINT), c3.cid) AS rn
       |    FROM ac3 a JOIN pp3 ON a.vec_id = pp3.vec_id
       |         JOIN fa3 ON fa3.ccid = a.ccid
       |         JOIN c3 ON c3.cid = fa3.cid) WHERE rn = 1),
       |mem3 AS MATERIALIZED (SELECT cid, vec_id, xi, nv FROM (
       |    SELECT a.cid, a.vec_id, pp3.xi, n.nv,
       |      row_number() OVER (PARTITION BY a.cid
       |                         ORDER BY a.vec_id) AS mrk
       |    FROM asg3 a JOIN pp3 ON a.vec_id = pp3.vec_id
       |         JOIN nv n ON a.vec_id = n.vec_id)
       |  WHERE mrk <= ${simx.SemDedupClusterCap}),
       |ac3b AS MATERIALIZED (SELECT b, ccid FROM (
       |    SELECT a.b, cc3.ccid,
       |      row_number() OVER (PARTITION BY a.b ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (a.xb[j] - cc3.cci[j]) *
       |               (a.xb[j] - cc3.cci[j])))
       |          AS BIGINT), cc3.ccid) AS rn
       |    FROM arr a, cc3) WHERE rn = 1),
       |asg3b AS MATERIALIZED (SELECT b, cid FROM (
       |    SELECT a.b, c3.cid,
       |      row_number() OVER (PARTITION BY a.b ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (r.xb[j] - c3.ci[j]) * (r.xb[j] - c3.ci[j])))
       |          AS BIGINT), c3.cid) AS rn
       |    FROM ac3b a JOIN arr r ON a.b = r.b
       |         JOIN fa3 ON fa3.ccid = a.ccid
       |         JOIN c3 ON c3.cid = fa3.cid) WHERE rn = 1),
       |d3v AS MATERIALIZED (SELECT DISTINCT b FROM (
       |    SELECT r.b,
       |      CAST(list_sum(list_transform(range(1, 65),
       |        j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
       |      m.nv AS na, r.nb
       |    FROM arr r JOIN asg3b g ON r.b = g.b
       |         JOIN mem3 m ON g.cid = m.cid AND m.vec_id <> r.b)
       |  WHERE dot > 0 AND
       |    CAST(dot AS HUGEINT) * dot * 10000 >=
       |      CAST(na AS HUGEINT) * nb * 1600)""".stripMargin
  }

  /** All three committed model versions' FULL 5-column row sets
    * restated (q387/q388, appends to [[gateCycleCtes]]): mv1 = the
    * nightly build (even members under asg + the v1 cell/router
    * rows), mv2 = the intake rebuild (asg2 over pp + the v2 chain),
    * mv3 = the cycle rebuild (asg3 over pp3 + the v3 chain) — each
    * exactly the (kind, id, cid, nv, xi) frame the engine commits
    * ([[gateRebuildModel]]'s shape), so a multiset delta over these
    * certifies the committed bytes row for row, not a census. */
  private lazy val gateModelRowsCtes: String =
    s"""mv1 AS MATERIALIZED (
       |  SELECT 'm' AS kind, a.vec_id AS id, a.cid, n.nv, e.xi
       |    FROM asg a JOIN e ON a.vec_id = e.vec_id
       |         JOIN nv n ON a.vec_id = n.vec_id
       |    WHERE a.vec_id % 2 = 0
       |  UNION ALL
       |  SELECT 'c', cid, cid, CAST(0 AS BIGINT), ci FROM c
       |  UNION ALL
       |  SELECT 'o', ccid, ccid, CAST(0 AS BIGINT), cci FROM cc
       |  UNION ALL
       |  SELECT 'f', fa.cid, fa.ccid, CAST(0 AS BIGINT), c.ci
       |    FROM fa JOIN c ON c.cid = fa.cid),
       |mv2 AS MATERIALIZED (
       |  SELECT 'm' AS kind, a.vec_id AS id, a.cid, n.nv, pp.xi
       |    FROM asg2 a JOIN pp ON a.vec_id = pp.vec_id
       |         JOIN nv n ON a.vec_id = n.vec_id
       |  UNION ALL
       |  SELECT 'c', cid, cid, CAST(0 AS BIGINT), ci FROM c2
       |  UNION ALL
       |  SELECT 'o', ccid, ccid, CAST(0 AS BIGINT), cci FROM cc2
       |  UNION ALL
       |  SELECT 'f', fa2.cid, fa2.ccid, CAST(0 AS BIGINT), c2.ci
       |    FROM fa2 JOIN c2 ON c2.cid = fa2.cid),
       |mv3 AS MATERIALIZED (
       |  SELECT 'm' AS kind, a.vec_id AS id, a.cid, n.nv, pp3.xi
       |    FROM asg3 a JOIN pp3 ON a.vec_id = pp3.vec_id
       |         JOIN nv n ON a.vec_id = n.vec_id
       |  UNION ALL
       |  SELECT 'c', cid, cid, CAST(0 AS BIGINT), ci FROM c3
       |  UNION ALL
       |  SELECT 'o', ccid, ccid, CAST(0 AS BIGINT), cci FROM cc3
       |  UNION ALL
       |  SELECT 'f', fa3.cid, fa3.ccid, CAST(0 AS BIGINT), c3.ci
       |    FROM fa3 JOIN c3 ON c3.cid = fa3.cid)""".stripMargin

  def oracles: Map[String, String] = Map(
    "stream_demo" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type, count(*) AS cnt
        |FROM events GROUP BY hour_start, event_type
        |ORDER BY hour_start, event_type""".stripMargin,

    // q38's oracle, shared by reference: the streaming sessionization
    // must reproduce the batch session windows bit-for-bit
    "q80_stream_sessionize" ->
      graft.operators.TimeWindowOps.oracles("q38_win_session"),

    // the doubled at-least-once input must collapse back to the plain
    // batch aggregate over the ORIGINAL events table
    "q89_stream_dedup" ->
      """SELECT event_type, count(*) AS cnt,
        |  count(DISTINCT user_id) AS users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the bounded-state variant shares q89's oracle: the watermark delay
    // covers the replay horizon, so the result is identical
    "q98_stream_dedup_watermark" ->
      """SELECT event_type, count(*) AS cnt,
        |  count(DISTINCT user_id) AS users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the full minhash self-join restricted to opposite-parity pairs —
    // exactly what a new-doc (odd) stream probing the even-corpus index
    // can produce; the persisted index and the stream machinery must
    // both be invisible to semantics
    // q174's dim text verbatim, rolled up — the stream must be
    // invisible: enrichment is row-local, so any micro-batch split
    // yields the batch answer
    "q330_stream_pit_enrich" ->
      """WITH dim AS (
        |  SELECT c_custkey AS sk, c_mktsegment AS segment,
        |    CAST(NULL AS TIMESTAMP) AS valid_from,
        |    TIMESTAMP '1995-06-01' + (c_custkey % 700) * INTERVAL 1 DAY
        |      AS valid_to,
        |    0 AS version
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey,
        |    CASE c_mktsegment
        |      WHEN 'AUTOMOBILE' THEN 'BUILDING'
        |      WHEN 'BUILDING'   THEN 'FURNITURE'
        |      WHEN 'FURNITURE'  THEN 'HOUSEHOLD'
        |      WHEN 'HOUSEHOLD'  THEN 'MACHINERY'
        |      ELSE 'AUTOMOBILE' END,
        |    TIMESTAMP '1995-06-01' + (c_custkey % 700) * INTERVAL 1 DAY,
        |    CAST(NULL AS TIMESTAMP), 1
        |  FROM customer)
        |SELECT d.segment AS seg_at_order, d.version AS dim_version,
        |  count(*) AS orders
        |FROM orders o JOIN dim d ON o.o_custkey = d.sk
        |  AND (d.valid_from IS NULL OR d.valid_from <= o.o_orderdate)
        |  AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q109_stream_dedup_index" ->
      s"""${graft.operators.DedupExtOps.minhashCte}
         |SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_bands
         |FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
         |WHERE (x.doc_id % 2) <> (y.doc_id % 2)
         |GROUP BY id_a, id_b ORDER BY id_a, id_b""".stripMargin,

    // shares q89's oracle: the checkpointed file sink must hold the
    // same exactly-once rows the memory sink did
    "q122_stream_file_sink" ->
      """SELECT event_type, count(*) AS cnt,
        |  count(DISTINCT user_id) AS users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // identical to q75's oracle: the streaming join must reproduce the
    // batch interval join bit-for-bit
    "q78_stream_stream_join" ->
      """SELECT s.event_id AS signup_id, count(*) AS clicks
        |FROM events s JOIN events c
        |  ON s.event_type = 'signup' AND c.event_type = 'click'
        | AND c.user_id = s.user_id
        | AND epoch_us(c.ts) >= epoch_us(s.ts)
        | AND epoch_us(c.ts) < epoch_us(s.ts) + 3600000000
        |GROUP BY signup_id ORDER BY signup_id""".stripMargin,

    // the stateful suppression must reduce to: one alert per (user,
    // spike hour), episode index = rank of that hour in the user's
    // ascending alerted-hour sequence
    // the batch reduction of last-writer-wins CDC: latest op per key
    // wins, DELETE keys absent from the final table
    "q285_stream_cdc_apply" ->
      """WITH c AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_ops
        |  FROM c)
        |SELECT user_id,
        |  round(CAST(cents AS DOUBLE) / 100.0, 6) AS last_value,
        |  n_ops
        |FROM r WHERE rn = 1 AND op = 'U' ORDER BY user_id""".stripMargin,

    // the latest snapshot IS q285's final table — same batch reduction
    "q298_stream_cdc_snapshot" ->
      """WITH c AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_ops
        |  FROM c)
        |SELECT user_id,
        |  round(CAST(cents AS DOUBLE) / 100.0, 6) AS last_value,
        |  n_ops
        |FROM r WHERE rn = 1 AND op = 'U' ORDER BY user_id""".stripMargin,

    // exact because every lane sketch's capacity exceeds the vocab —
    // the merged counts are the true counts, so the stream must
    // reproduce the plain batch top-10 (ties broken by token)
    // r17 re-key: the FULL two-level rule restated — hybrid k over
    // the even half, kc = ⌈√k⌉ coarse cells, the top-R fine→coarse
    // routing, coarse-then-fine argmin for members (even) and
    // arrivals (odd), member cap, exact-lattice dup line folded per
    // (arrival, cid). At oracle SFs R ≥ kc makes the assignment
    // coincide with flat √n (q370's declared degeneracy) but the
    // text carries the real rule so the contract holds at any volume.
    // Since r18 the chain is the family's ONE shared text
    // ([[twoLevelGateCtes]]) and the served model is the PINNED log
    // version — whose v1 content is exactly this rule, so the pin is
    // invisible to the oracle by construction.
    "q345_stream_semdedup" -> {
      s"""$twoLevelGateCtes,
         |pr AS (SELECT r.b, m.cid,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
         |    m.nv AS na, r.nb
         |  FROM arr r JOIN mem m ON r.cid = m.cid)
         |SELECT b AS vec_id, cid, count(*) AS n_dup_old
         |FROM pr
         |WHERE dot > 0 AND
         |  CAST(dot AS HUGEINT) * dot * 10000 >=
         |    CAST(na AS HUGEINT) * nb * 1600
         |GROUP BY 1, 2 ORDER BY vec_id, cid""".stripMargin
    },

    // q355's certified √n-cell census text, folded per (arrival, cid)
    // — sampled even-id cells (vec_id <= 2k, k = ceil(sqrt(|even|))),
    // single argmin assignment for both halves, member side capped at
    // the stream's SemDedupClusterCap (a measured no-op at this
    // geometry — the spec asserts it), exact-lattice dup line.
    "q356_stream_semdedup_sqrt" -> {
      val simx = graft.operators.SimilarityExtOps
      s"""WITH e AS MATERIALIZED (SELECT vec_id,
         |    list_transform(embedding,
         |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
         |      AS xi
         |  FROM embeddings WHERE vec_id <> 0),
         |kv AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS k
         |       FROM e WHERE vec_id % 2 = 0),
         |c AS (SELECT vec_id AS cid, xi AS ci FROM e, kv
         |      WHERE vec_id % 2 = 0 AND vec_id <= 2 * k),
         |d0 AS (SELECT e.vec_id, c.cid,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      j -> (e.xi[j] - c.ci[j]) * (e.xi[j] - c.ci[j])))
         |      AS BIGINT) AS dist
         |  FROM e, c),
         |asg AS MATERIALIZED (SELECT vec_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY dist, cid) AS rn
         |    FROM d0) WHERE rn = 1),
         |nv AS (SELECT vec_id,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      j -> xi[j] * xi[j])) AS BIGINT) AS nv
         |  FROM e),
         |mem AS MATERIALIZED (SELECT cid, vec_id, xi, nv FROM (
         |    SELECT a.cid, a.vec_id, e.xi, n.nv,
         |      row_number() OVER (PARTITION BY a.cid
         |                         ORDER BY a.vec_id) AS mrk
         |    FROM asg a JOIN e ON a.vec_id = e.vec_id
         |         JOIN nv n ON a.vec_id = n.vec_id
         |    WHERE a.vec_id % 2 = 0)
         |  WHERE mrk <= ${simx.SemDedupClusterCap}),
         |arr AS (SELECT a.cid, a.vec_id AS b, e.xi AS xb, n.nv AS nb
         |  FROM asg a JOIN e ON a.vec_id = e.vec_id
         |       JOIN nv n ON a.vec_id = n.vec_id
         |  WHERE a.vec_id % 2 = 1),
         |pr AS (SELECT r.b, m.cid,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
         |    m.nv AS na, r.nb
         |  FROM arr r JOIN mem m ON r.cid = m.cid)
         |SELECT b AS vec_id, cid, count(*) AS n_dup_old
         |FROM pr
         |WHERE dot > 0 AND
         |  CAST(dot AS HUGEINT) * dot * 10000 >=
         |    CAST(na AS HUGEINT) * nb * 1600
         |GROUP BY 1, 2 ORDER BY vec_id, cid""".stripMargin
    },

    // the TWO-LEVEL assignment text (shared chain) + the one-level
    // admit rule restated: admitted = odd arrivals with no
    // standing-corpus dup; the recent probe pairs each arrival with
    // EARLIER-ID admitted arrivals of its cell through the identical
    // dup line — the committed log must reproduce exactly this set or
    // the admitted column and n_dup_recent diverge
    "q371_stream_gate_admit" -> {
      s"""$twoLevelGateCtes,
         |corp AS MATERIALIZED (SELECT b, count(*) AS n FROM (
         |    SELECT r.b,
         |      CAST(list_sum(list_transform(range(1, 65),
         |        j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
         |      m.nv AS na, r.nb
         |    FROM arr r JOIN mem m ON r.cid = m.cid)
         |  WHERE dot > 0 AND
         |    CAST(dot AS HUGEINT) * dot * 10000 >=
         |      CAST(na AS HUGEINT) * nb * 1600
         |  GROUP BY b),
         |adm AS MATERIALIZED (SELECT a.cid, a.b, a.xb, a.nb
         |  FROM arr a LEFT JOIN corp ON a.b = corp.b
         |  WHERE corp.b IS NULL),
         |rec AS (SELECT b, count(*) AS n FROM (
         |    SELECT r.b,
         |      CAST(list_sum(list_transform(range(1, 65),
         |        j -> a.xb[j] * r.xb[j])) AS BIGINT) AS dot,
         |      a.nb AS na, r.nb
         |    FROM arr r JOIN adm a ON a.cid = r.cid AND a.b < r.b)
         |  WHERE dot > 0 AND
         |    CAST(dot AS HUGEINT) * dot * 10000 >=
         |      CAST(na AS HUGEINT) * nb * 1600
         |  GROUP BY b)
         |SELECT r.b AS vec_id, r.cid,
         |  CAST(coalesce(corp.n, 0) AS BIGINT) AS n_dup_corpus,
         |  CAST(coalesce(rec.n, 0) AS BIGINT) AS n_dup_recent,
         |  CAST(CASE WHEN corp.b IS NULL THEN 1 ELSE 0 END AS BIGINT)
         |    AS admitted
         |FROM arr r LEFT JOIN corp ON r.b = corp.b
         |LEFT JOIN rec ON r.b = rec.b
         |ORDER BY vec_id""".stripMargin
    },

    // the two-level admit rule restated (shared chain), then the
    // union population re-cells at the hybrid k2 with the
    // mixed-parity id cut and the SAME two-level routing one level
    // down (kc2/cc2/fa2/ac2/asg2) — the census the nightly promote
    // gates on, recomputed from first principles against the
    // committed v2 model the query reads back
    "q375_gate_rebuild" -> {
      s"""$twoLevelGateCtes,
         |$gateRebuildCtes,
         |$gateRebuildAssignCtes
         |SELECT c2.cid,
         |  CAST(coalesce(g.members, 0) AS BIGINT) AS members,
         |  CAST(coalesce(g.standing, 0) AS BIGINT) AS standing,
         |  CAST(coalesce(g.admitted, 0) AS BIGINT) AS admitted
         |FROM c2 LEFT JOIN (
         |  SELECT cid, count(*) AS members,
         |    sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS standing,
         |    sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS admitted
         |  FROM asg2 GROUP BY cid) g ON c2.cid = g.cid
         |ORDER BY c2.cid""".stripMargin
    },

    // the two committed models restated from the shared chain: v1 =
    // the nightly TWO-LEVEL build (cells = the hybrid-k cut over the
    // even half, members = the whole even half, zero admits), v2 =
    // the union re-cell at the hybrid k2 (cells/members/odd-members
    // from the rebuild CTEs) — the promotion must be invisible
    // against recomputing both models
    "q377_model_promote" -> {
      s"""$twoLevelGateCtes,
         |$gateRebuildCtes
         |SELECT CAST(1 AS BIGINT) AS version,
         |  'nightly_build' AS tier,
         |  (SELECT count(*) FROM c) AS cells,
         |  (SELECT count(*) FROM e WHERE vec_id % 2 = 0) AS members,
         |  CAST(0 AS BIGINT) AS admitted
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), 'intake_rebuild',
         |  (SELECT count(*) FROM c2),
         |  (SELECT count(*) FROM pp),
         |  (SELECT count(*) FROM pp WHERE vec_id % 2 = 1)
         |ORDER BY version""".stripMargin
    },

    // both versions' decision sets restated: v1 decisions ARE the
    // shared chain's corp set; v2 decisions re-assign every arrival
    // through the REBUILT router (ac2b/asg2b) and probe the rebuilt
    // capped members (mem2, self-pairs excluded) — the flips and the
    // agreement ppm must match the committed models' readback exactly
    "q382_repin_diff" -> {
      s"""$twoLevelGateCtes,
         |$gateRebuildCtes,
         |$gateRebuildAssignCtes,
         |$gateV2DecisionCtes
         |SELECT CAST((SELECT count(*) FROM arr) AS BIGINT) AS arrivals,
         |  CAST((SELECT count(*) FROM corp) AS BIGINT) AS dup_v1,
         |  CAST((SELECT count(*) FROM d2v) AS BIGINT) AS dup_v2,
         |  CAST((SELECT count(*) FROM corp
         |        WHERE b IN (SELECT b FROM d2v)) AS BIGINT) AS both_dup,
         |  CAST((SELECT count(*) FROM d2v
         |        WHERE b NOT IN (SELECT b FROM corp)) AS BIGINT)
         |    AS new_dups,
         |  CAST((SELECT count(*) FROM corp
         |        WHERE b NOT IN (SELECT b FROM d2v)) AS BIGINT)
         |    AS lost_dups,
         |  CAST(CASE WHEN (SELECT count(*) FROM arr) = 0 THEN 1000000
         |       ELSE (1000000 * ((SELECT count(*) FROM arr)
         |             - (SELECT count(*) FROM d2v
         |                WHERE b NOT IN (SELECT b FROM corp))
         |             - (SELECT count(*) FROM corp
         |                WHERE b NOT IN (SELECT b FROM d2v))))
         |            // (SELECT count(*) FROM arr) END AS BIGINT)
         |    AS agree_ppm""".stripMargin
    },

    // both cycles restated from first principles off the ONE shared
    // chain: cycle 1 = the q382 diff (corp vs d2v) with day-1 admits
    // = arrivals minus corpus dups; cycle 2 = the day-2 admit rule
    // (NO self-exclusion — day-1 admits are v2 members and
    // self-match), the v3 re-cell over the union population, and the
    // v2-vs-v3 diff (d2v vs d3v) — the fixpoint emerges from the
    // recomputation, never from a shortcut
    "q385_promote_cycle" -> {
      s"""$twoLevelGateCtes,
         |$gateRebuildCtes,
         |$gateRebuildAssignCtes,
         |$gateV2DecisionCtes,
         |$gateCycleCtes
         |SELECT * FROM (
         |SELECT CAST(1 AS BIGINT) AS cycle,
         |  CAST(1 AS BIGINT) AS pin_version,
         |  CAST((SELECT count(*) FROM arr) AS BIGINT) AS arrivals,
         |  CAST((SELECT count(*) FROM arr) -
         |       (SELECT count(*) FROM corp) AS BIGINT) AS admitted,
         |  CAST((SELECT count(*) FROM corp) AS BIGINT) AS dup_prev,
         |  CAST((SELECT count(*) FROM d2v) AS BIGINT) AS dup_next,
         |  CAST((SELECT count(*) FROM d2v
         |        WHERE b NOT IN (SELECT b FROM corp)) AS BIGINT)
         |    AS new_dups,
         |  CAST((SELECT count(*) FROM corp
         |        WHERE b NOT IN (SELECT b FROM d2v)) AS BIGINT)
         |    AS lost_dups,
         |  CAST(CASE WHEN (SELECT count(*) FROM arr) = 0 THEN 1000000
         |       ELSE (1000000 * ((SELECT count(*) FROM arr)
         |             - (SELECT count(*) FROM d2v
         |                WHERE b NOT IN (SELECT b FROM corp))
         |             - (SELECT count(*) FROM corp
         |                WHERE b NOT IN (SELECT b FROM d2v))))
         |            // (SELECT count(*) FROM arr) END AS BIGINT)
         |    AS agree_ppm
         |UNION ALL
         |SELECT CAST(2 AS BIGINT),
         |  CAST(2 AS BIGINT),
         |  CAST((SELECT count(*) FROM arr) AS BIGINT),
         |  CAST((SELECT count(*) FROM adm2) AS BIGINT),
         |  CAST((SELECT count(*) FROM d2v) AS BIGINT),
         |  CAST((SELECT count(*) FROM d3v) AS BIGINT),
         |  CAST((SELECT count(*) FROM d3v
         |        WHERE b NOT IN (SELECT b FROM d2v)) AS BIGINT),
         |  CAST((SELECT count(*) FROM d2v
         |        WHERE b NOT IN (SELECT b FROM d3v)) AS BIGINT),
         |  CAST(CASE WHEN (SELECT count(*) FROM arr) = 0 THEN 1000000
         |       ELSE (1000000 * ((SELECT count(*) FROM arr)
         |             - (SELECT count(*) FROM d3v
         |                WHERE b NOT IN (SELECT b FROM d2v))
         |             - (SELECT count(*) FROM d2v
         |                WHERE b NOT IN (SELECT b FROM d3v))))
         |            // (SELECT count(*) FROM arr) END AS BIGINT)
         |) ORDER BY cycle""".stripMargin
    },

    // the borderline band (q384's band-1 rule) re-judged by the FLAT
    // gate restated in full: members flat-assigned over ALL cells
    // (asgfl/memfl — the real rule, not the R ≥ kc degeneracy),
    // flagged arrivals flat-assigned the same way, shared dup line;
    // retired = flagged the flat truth also catches, confirmed =
    // flagged it clears, admits_after = the binary drain's admits +
    // the confirmed fold-back
    "q386_flagged_rejudge" -> {
      val simx = graft.operators.SimilarityExtOps
      s"""$twoLevelGateCtes,
         |bnd AS (SELECT b,
         |    max(CASE
         |      WHEN CAST(dot AS HUGEINT) * dot * 10000 >=
         |           CAST(na AS HUGEINT) * nb * 8100 THEN 4
         |      WHEN CAST(dot AS HUGEINT) * dot * 10000 >=
         |           CAST(na AS HUGEINT) * nb * 4900 THEN 3
         |      WHEN CAST(dot AS HUGEINT) * dot * 10000 >=
         |           CAST(na AS HUGEINT) * nb * 2500 THEN 2
         |      ELSE 1 END) AS sb
         |  FROM (SELECT r.b,
         |      CAST(list_sum(list_transform(range(1, 65),
         |        j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
         |      m.nv AS na, r.nb
         |    FROM arr r JOIN mem m ON r.cid = m.cid)
         |  WHERE dot > 0 AND
         |    CAST(dot AS HUGEINT) * dot * 10000 >=
         |      CAST(na AS HUGEINT) * nb * 1600
         |  GROUP BY b),
         |flg AS MATERIALIZED (SELECT b FROM bnd WHERE sb = 1),
         |asgfl AS MATERIALIZED (SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        CAST(list_sum(list_transform(range(1, 65),
         |          j -> (e.xi[j] - c.ci[j]) * (e.xi[j] - c.ci[j])))
         |          AS BIGINT), c.cid) AS rn
         |    FROM e, c WHERE e.vec_id % 2 = 0) WHERE rn = 1),
         |memfl AS MATERIALIZED (SELECT cid, vec_id, xi, nv FROM (
         |    SELECT a.cid, a.vec_id, e.xi, n.nv,
         |      row_number() OVER (PARTITION BY a.cid
         |                         ORDER BY a.vec_id) AS mrk
         |    FROM asgfl a JOIN e ON a.vec_id = e.vec_id
         |         JOIN nv n ON a.vec_id = n.vec_id)
         |  WHERE mrk <= ${simx.SemDedupClusterCap}),
         |flgfl AS MATERIALIZED (SELECT f.b, g.cid, r.xb, r.nb FROM (
         |    SELECT a.b, c.cid,
         |      row_number() OVER (PARTITION BY a.b ORDER BY
         |        CAST(list_sum(list_transform(range(1, 65),
         |          j -> (a.xb[j] - c.ci[j]) * (a.xb[j] - c.ci[j])))
         |          AS BIGINT), c.cid) AS rn
         |    FROM arr a, c WHERE a.b IN (SELECT b FROM flg)) g
         |  JOIN flg f ON g.b = f.b AND g.rn = 1
         |  JOIN arr r ON f.b = r.b),
         |ret AS MATERIALIZED (SELECT DISTINCT b FROM (
         |    SELECT r.b,
         |      CAST(list_sum(list_transform(range(1, 65),
         |        j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
         |      m.nv AS na, r.nb
         |    FROM flgfl r JOIN memfl m ON r.cid = m.cid)
         |  WHERE dot > 0 AND
         |    CAST(dot AS HUGEINT) * dot * 10000 >=
         |      CAST(na AS HUGEINT) * nb * 1600),
         |corp AS MATERIALIZED (SELECT DISTINCT b FROM (
         |    SELECT r.b,
         |      CAST(list_sum(list_transform(range(1, 65),
         |        j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
         |      m.nv AS na, r.nb
         |    FROM arr r JOIN mem m ON r.cid = m.cid)
         |  WHERE dot > 0 AND
         |    CAST(dot AS HUGEINT) * dot * 10000 >=
         |      CAST(na AS HUGEINT) * nb * 1600)
         |SELECT CAST((SELECT count(*) FROM flg) AS BIGINT) AS flagged,
         |  CAST((SELECT count(*) FROM flg
         |        WHERE b NOT IN (SELECT b FROM ret)) AS BIGINT)
         |    AS confirmed,
         |  CAST((SELECT count(*) FROM ret) AS BIGINT) AS retired,
         |  CAST((SELECT count(*) FROM arr)
         |       - (SELECT count(*) FROM corp)
         |       + (SELECT count(*) FROM flg
         |          WHERE b NOT IN (SELECT b FROM ret)) AS BIGINT)
         |    AS admits_after""".stripMargin
    },

    // all three committed models restated ROW FOR ROW off the shared
    // chain, then each promote hop's per-kind multiset delta: per-row
    // counts on the full 5-column row, full-joined, added/removed as
    // the positive count differences — the engine's committed bytes
    // must reproduce the delta exactly, which certifies both the
    // re-cell hop (v1→v2) and the steady-state floor (v2→v3: day-2's
    // readmissions and nothing else at the oracle SFs)
    "q387_model_churn" -> {
      s"""$twoLevelGateCtes,
         |$gateRebuildCtes,
         |$gateRebuildAssignCtes,
         |$gateV2DecisionCtes,
         |$gateCycleCtes,
         |$gateModelRowsCtes,
         |ch12 AS (
         |  SELECT coalesce(p.kind, n.kind) AS kind,
         |    sum(coalesce(p.pc, 0)) AS rows_prev,
         |    sum(coalesce(n.nc, 0)) AS rows_next,
         |    sum(greatest(coalesce(n.nc, 0) - coalesce(p.pc, 0), 0))
         |      AS added,
         |    sum(greatest(coalesce(p.pc, 0) - coalesce(n.nc, 0), 0))
         |      AS removed
         |  FROM (SELECT kind, id, cid, nv, xi, count(*) AS pc
         |        FROM mv1 GROUP BY 1, 2, 3, 4, 5) p
         |  FULL JOIN (SELECT kind, id, cid, nv, xi, count(*) AS nc
         |             FROM mv2 GROUP BY 1, 2, 3, 4, 5) n
         |    ON p.kind = n.kind AND p.id = n.id AND p.cid = n.cid
         |       AND p.nv = n.nv AND p.xi = n.xi
         |  GROUP BY 1),
         |ch23 AS (
         |  SELECT coalesce(p.kind, n.kind) AS kind,
         |    sum(coalesce(p.pc, 0)) AS rows_prev,
         |    sum(coalesce(n.nc, 0)) AS rows_next,
         |    sum(greatest(coalesce(n.nc, 0) - coalesce(p.pc, 0), 0))
         |      AS added,
         |    sum(greatest(coalesce(p.pc, 0) - coalesce(n.nc, 0), 0))
         |      AS removed
         |  FROM (SELECT kind, id, cid, nv, xi, count(*) AS pc
         |        FROM mv2 GROUP BY 1, 2, 3, 4, 5) p
         |  FULL JOIN (SELECT kind, id, cid, nv, xi, count(*) AS nc
         |             FROM mv3 GROUP BY 1, 2, 3, 4, 5) n
         |    ON p.kind = n.kind AND p.id = n.id AND p.cid = n.cid
         |       AND p.nv = n.nv AND p.xi = n.xi
         |  GROUP BY 1)
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS from_version,
         |    CAST(2 AS BIGINT) AS to_version, kind,
         |    CAST(rows_prev AS BIGINT) AS rows_prev,
         |    CAST(rows_next AS BIGINT) AS rows_next,
         |    CAST(rows_prev - removed AS BIGINT) AS carried,
         |    CAST(added AS BIGINT) AS added,
         |    CAST(removed AS BIGINT) AS removed
         |  FROM ch12
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), CAST(3 AS BIGINT), kind,
         |    CAST(rows_prev AS BIGINT), CAST(rows_next AS BIGINT),
         |    CAST(rows_prev - removed AS BIGINT),
         |    CAST(added AS BIGINT), CAST(removed AS BIGINT)
         |  FROM ch23
         |) ORDER BY from_version, kind""".stripMargin
    },

    // the four logs' LATEST content restated from first principles
    // (admit = the binary-gate admitted set, day-2 = the v2 drain's
    // readmissions, model = the full v2 row set, cycle = the full v3
    // row set); the integrity booleans are the audit's contract — a
    // healthy build reads all-green, and the engine side walks the
    // real manifests/files/pins to earn them (GateModelSpec breaks a
    // copy to prove the detectors detect)
    "q388_gate_fsck" -> {
      s"""$twoLevelGateCtes,
         |$gateRebuildCtes,
         |$gateRebuildAssignCtes,
         |$gateV2DecisionCtes,
         |$gateCycleCtes,
         |$gateModelRowsCtes
         |SELECT * FROM (
         |  SELECT 'admit' AS log,
         |    CAST((SELECT count(*) FROM arr)
         |         - (SELECT count(*) FROM corp) AS BIGINT)
         |      AS latest_rows,
         |    CAST(1 AS BIGINT) AS contiguous,
         |    CAST(1 AS BIGINT) AS manifests_complete,
         |    CAST(1 AS BIGINT) AS no_orphans,
         |    CAST(0 AS BIGINT) AS pins_total,
         |    CAST(0 AS BIGINT) AS valid_pins
         |  UNION ALL
         |  SELECT 'admit_day2',
         |    CAST((SELECT count(*) FROM adm2) AS BIGINT),
         |    CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
         |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |  UNION ALL
         |  SELECT 'cycle_model',
         |    CAST((SELECT count(*) FROM mv3) AS BIGINT),
         |    CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
         |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |  UNION ALL
         |  SELECT 'model',
         |    CAST((SELECT count(*) FROM mv2) AS BIGINT),
         |    CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
         |    CAST(2 AS BIGINT), CAST(2 AS BIGINT)
         |) ORDER BY log""".stripMargin
    },

    // the four artifact censuses from first principles off the shared
    // gate chain: the co-located join pair = the base tables'
    // row counts; the at-rest model = members + cells + coarse +
    // routing rows (mv1's algebra without the rebuild chains); the
    // fine table = one row per DISTINCT routed coarse bucket
    "q390_cache_fsck" -> {
      val simx = graft.operators.SimilarityExtOps
      // the cert chain re-enters under an `rc` prefix (its CTE names
      // e/c/cc/fa collide with the gate chain's — the prefix
      // parameterization exists exactly for this composition)
      s"""$twoLevelGateCtes,
         |${simx.certSliceCtes("rc")},
         |${simx.certBandCtes("rc")}
         |SELECT * FROM (
         |  SELECT 'li_bucketed' AS artifact,
         |    CAST((SELECT count(*) FROM lineitem) AS BIGINT)
         |      AS n_rows,
         |    CAST(1 AS BIGINT) AS committed,
         |    CAST(1 AS BIGINT) AS bucketed_ok,
         |    CAST(8 AS BIGINT) AS buckets_declared
         |  UNION ALL
         |  SELECT 'or_bucketed',
         |    CAST((SELECT count(*) FROM orders) AS BIGINT),
         |    CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(8 AS BIGINT)
         |  UNION ALL
         |  SELECT 'pospost',
         |    CAST((SELECT count(*) FROM (
         |       SELECT doc_id, unnest(string_split(text, ' ')) AS t
         |       FROM documents) WHERE len(t) > 0) AS BIGINT),
         |    CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(8 AS BIGINT)
         |  UNION ALL
         |  SELECT 'postings',
         |    CAST((SELECT count(*) FROM (
         |       SELECT DISTINCT t, doc_id FROM (
         |         SELECT doc_id, unnest(string_split(text, ' ')) AS t
         |         FROM documents) WHERE len(t) > 0)) AS BIGINT),
         |    CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(8 AS BIGINT)
         |  UNION ALL
         |  SELECT 'routercert',
         |    CAST(1 + (SELECT count(DISTINCT band) FROM rcfq)
         |         AS BIGINT),
         |    CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)
         |  UNION ALL
         |  SELECT 'semtwofine',
         |    CAST((SELECT count(DISTINCT ccid) FROM fa) AS BIGINT),
         |    CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(32 AS BIGINT)
         |  UNION ALL
         |  SELECT 'semtwoidx',
         |    CAST((SELECT count(*) FROM asg WHERE vec_id % 2 = 0)
         |         + (SELECT count(*) FROM c)
         |         + (SELECT count(*) FROM cc)
         |         + (SELECT count(*) FROM fa) AS BIGINT),
         |    CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(32 AS BIGINT)
         |) ORDER BY artifact""".stripMargin
    },

    // per arrival, the strongest qualifying pair's cross-multiplied
    // band (q376's lines) and the three-way policy decision
    "q384_banded_admit" -> {
      s"""$twoLevelGateCtes,
         |bnd AS (SELECT b,
         |    max(CASE
         |      WHEN CAST(dot AS HUGEINT) * dot * 10000 >=
         |           CAST(na AS HUGEINT) * nb * 8100 THEN 4
         |      WHEN CAST(dot AS HUGEINT) * dot * 10000 >=
         |           CAST(na AS HUGEINT) * nb * 4900 THEN 3
         |      WHEN CAST(dot AS HUGEINT) * dot * 10000 >=
         |           CAST(na AS HUGEINT) * nb * 2500 THEN 2
         |      ELSE 1 END) AS strongest_band
         |  FROM (SELECT r.b,
         |      CAST(list_sum(list_transform(range(1, 65),
         |        j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
         |      m.nv AS na, r.nb
         |    FROM arr r JOIN mem m ON r.cid = m.cid)
         |  WHERE dot > 0 AND
         |    CAST(dot AS HUGEINT) * dot * 10000 >=
         |      CAST(na AS HUGEINT) * nb * 1600
         |  GROUP BY b)
         |SELECT r.b AS vec_id, r.cid,
         |  CAST(coalesce(bnd.strongest_band, 0) AS BIGINT)
         |    AS strongest_band,
         |  CASE WHEN coalesce(bnd.strongest_band, 0) >= 2 THEN 'reject'
         |       WHEN coalesce(bnd.strongest_band, 0) = 1
         |         THEN 'admit_flagged'
         |       ELSE 'admit' END AS decision
         |FROM arr r LEFT JOIN bnd ON r.b = bnd.b
         |ORDER BY vec_id""".stripMargin
    },

    // the admitted set restated (arrivals with no standing two-level
    // dup) with its cid-bucket census — the post-GC latest readback
    // must reproduce it exactly, which is the whole retention claim
    "q383_admitlog_vacuum" -> {
      s"""$twoLevelGateCtes,
         |corp AS MATERIALIZED (SELECT DISTINCT b FROM (
         |    SELECT r.b,
         |      CAST(list_sum(list_transform(range(1, 65),
         |        j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
         |      m.nv AS na, r.nb
         |    FROM arr r JOIN mem m ON r.cid = m.cid)
         |  WHERE dot > 0 AND
         |    CAST(dot AS HUGEINT) * dot * 10000 >=
         |      CAST(na AS HUGEINT) * nb * 1600),
         |adm AS (SELECT a.cid, a.b FROM arr a
         |  LEFT JOIN corp ON a.b = corp.b WHERE corp.b IS NULL)
         |SELECT CAST(count(*) AS BIGINT) AS admits,
         |  CAST(count(DISTINCT cid % $GateAdmBuckets) AS BIGINT)
         |    AS admit_buckets,
         |  CAST(1 AS BIGINT) AS dropped_any,
         |  CAST(1 AS BIGINT) AS collected_any
         |FROM adm""".stripMargin
    },

    // both models restated once more with the retention statuses the
    // copy must land on: v1 survives ONLY through its branch pin
    // (branch_only) with its census intact, v2 serves from the kept
    // main manifest — the GC must be invisible to both readers
    "q381_modellog_vacuum" -> {
      s"""$twoLevelGateCtes,
         |$gateRebuildCtes
         |SELECT CAST(1 AS BIGINT) AS version,
         |  'nightly_build' AS tier, 'branch_only' AS status,
         |  (SELECT count(*) FROM c) AS cells,
         |  (SELECT count(*) FROM e WHERE vec_id % 2 = 0) AS members
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), 'intake_rebuild', 'kept',
         |  (SELECT count(*) FROM c2),
         |  (SELECT count(*) FROM pp)
         |ORDER BY version""".stripMargin
    },

    "q317_stream_topk" ->
      """SELECT json_extract_string(props, '$.k') AS token,
        |  count(*) AS cnt
        |FROM events
        |WHERE json_extract_string(props, '$.k') IS NOT NULL
        |GROUP BY 1
        |ORDER BY cnt DESC, token LIMIT 10""".stripMargin,

    "q267_stream_alert" ->
      """WITH s AS (
        |  SELECT DISTINCT user_id,
        |    CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_idx
        |  FROM events
        |  WHERE CAST(round(value * 100) AS BIGINT) > 18000)
        |SELECT user_id,
        |  make_timestamp(hour_idx * 3600000000) AS alert_hour,
        |  CAST(row_number() OVER (PARTITION BY user_id
        |                          ORDER BY hour_idx) AS INTEGER)
        |    AS episode_idx
        |FROM s ORDER BY user_id, alert_hour""".stripMargin
  )
}
