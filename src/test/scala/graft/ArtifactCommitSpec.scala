package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** The two-writer commit contract for persisted artifacts
  * ([[BucketedCache.publish]] — the r10 verdict's #4): the in-JVM
  * monitor serializes same-process callers, so these specs race the
  * publish protocol DIRECTLY, which is exactly the situation of two
  * independent JVMs building the same artifact. The contract under
  * test: single-winner atomic rename-commit, loser accepts the
  * winner's complete copy, a commit is immutable once landed, and a
  * crashed writer's leftover never blocks the next commit. */
class ArtifactCommitSpec extends SparkSpecBase {
  import spark.implicits._

  private def read(p: java.nio.file.Path) = spark.read.parquet(p.toString)

  private def ordersBuild(wid: Int) = Tables(spark, sf, "orders")
    .select(col("o_orderkey"), lit(wid).as("writer"))

  test("two concurrent writers: one complete winner, loser accepts, no interleaving") {
    val target = Files.createTempDirectory("graft_commit_race").resolve("art")
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (1 to 2).map { wid =>
      new Thread(() => {
        try {
          gate.await()
          BucketedCache.publish(spark, target, s"graft_commitrace_w$wid",
            "o_orderkey", 4)(ordersBuild(wid))
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"a racing writer failed: ${errs.peek()}")
    assert(Files.exists(target.resolve("_SUCCESS")), "no commit landed")
    // committed content is EXACTLY one writer's build — the atomic
    // rename cannot interleave files from two scratch dirs
    val winners = read(target).select("writer").distinct()
      .as[Int].collect().toSet
    assert(winners.size == 1, s"mixed-writer artifact: $winners")
    assert(read(target).count() == Tables(spark, sf, "orders").count())
    // a LATE writer is a no-op: a landed commit is immutable (the
    // contract is first-commit-wins, not last-writer-wins)
    val before = Files.list(target).iterator.asScala
      .map(_.getFileName.toString).toSet
    BucketedCache.publish(spark, target, "graft_commitrace_w3",
      "o_orderkey", 4)(ordersBuild(3))
    val after = Files.list(target).iterator.asScala
      .map(_.getFileName.toString).toSet
    assert(after == before, "a late writer replaced a committed artifact")
    assert(read(target).select("writer").distinct().as[Int].collect().toSet
             == winners)
  }

  test("a crashed writer's leftover (no _SUCCESS) does not block the next commit") {
    val target = Files.createTempDirectory("graft_commit_crash").resolve("art")
    Files.createDirectories(target)
    Files.write(target.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))
    BucketedCache.publish(spark, target, "graft_commitcrash",
      "o_orderkey", 4)(ordersBuild(9))
    assert(Files.exists(target.resolve("_SUCCESS")), "commit did not land")
    assert(!Files.exists(target.resolve("part-junk.parquet")),
           "leftover junk survived into the committed artifact")
    assert(read(target).where(col("writer") === 9).count() ==
             Tables(spark, sf, "orders").count())
  }

  test("an in-place corpus rewrite re-keys and rebuilds the artifact (no stale reuse)") {
    // the r14 verdict's #8: BucketedCache used to key artifacts on
    // (name, sfDir) only, so a corpus mutated IN PLACE would silently
    // serve every stale index. Artifacts now carry the corpus's
    // layout fingerprint in their key — this spec mutates a scratch
    // corpus between two ensure() calls and asserts the second call
    // builds FRESH content under a FRESH key, while the first commit
    // stays readable (never deleted under a possible reader).
    val corpus = Files.createTempDirectory("graft_fp_corpus").toString
    def writeCorpus(n: Int): Unit =
      spark.range(n).select(col("id").as("k"))
        .write.mode("overwrite").parquet(s"$corpus/t.parquet")
    def build = spark.read.parquet(s"$corpus/t.parquet")
    writeCorpus(100)
    val t1 = BucketedCache.ensure(spark, corpus, "fpstale",
      "k BIGINT", "k", 2)(build)
    assert(spark.table(t1).count() == 100)
    writeCorpus(37) // the in-place mutation a stable key would miss
    val t2 = BucketedCache.ensure(spark, corpus, "fpstale",
      "k BIGINT", "k", 2)(build)
    assert(t2 != t1, "mutated corpus reused the stale artifact key")
    assert(spark.table(t2).count() == 37,
           "artifact served stale content after the corpus mutation")
    assert(spark.table(t1).count() == 100,
           "the superseded commit was deleted out from under readers")
  }

  test("graph promotion: a crash between data write and manifest serves the old version") {
    // the r15 verdict's #2 done-condition: SnapshotLog's commit order
    // is files-then-manifest, so a promotion job that dies after
    // addFiles but before commitVersion leaves the PREVIOUS version
    // as latest — readers never observe the half-promoted graph, and
    // the orphaned data files are vacuum's problem, not a reader's
    val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
    val root = Files.createTempDirectory("graft_promote_crash")
    val v1Files = SnapshotLog.addFiles(spark, root, "g1",
      spark.range(10).select(col("id").as("src"), col("id").as("dst")))
    SnapshotLog.commitVersion(root, 1, v1Files)
    assert(SnapshotLog.latest(root) == 1)
    // the "crash": v2's data files land, the manifest never does
    val orphans = SnapshotLog.addFiles(spark, root, "g2",
      spark.range(99).select(col("id").as("src"), col("id").as("dst")))
    assert(orphans.nonEmpty)
    assert(SnapshotLog.latest(root) == 1,
           "uncommitted data files changed the served version")
    assert(SnapshotLog.read(spark, root, SnapshotLog.latest(root))
             .count() == 10,
           "the old version no longer serves its own content")
    // the restarted job re-adds deterministic content and commits —
    // v2 lands exactly once and the orphans are superseded names
    val v2Files = SnapshotLog.addFiles(spark, root, "g2",
      spark.range(99).select(col("id").as("src"), col("id").as("dst")))
    assert(SnapshotLog.commitVersion(root, 2, v2Files))
    assert(SnapshotLog.latest(root) == 2)
    assert(SnapshotLog.read(spark, root, 2).count() == 99)
    assert(SnapshotLog.read(spark, root, 1).count() == 10,
           "promotion rewrote history: v1 must stay readable")
  }

  test("q366: retention drops exactly v1 on the copy; the live log keeps serving all versions") {
    val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
    // run the declared query first — it ensures the live log exists,
    // copies it, vacuums the COPY and reports the survivors
    val rows = SparkEntry.queries("q366_graph_vacuum")(spark, sf)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(rows.map(r => (r._1, r._3)) ==
             Seq((1L, "dropped"), (2L, "kept"), (3L, "kept")),
           s"retention must drop exactly v1: $rows")
    // kept edge counts equal the LIVE versions' — the GC was invisible
    val live = graft.operators.SimilarityExtOps
      .graphVersionRoot(spark, sf)
    assert(SnapshotLog.versions(live) == Seq(1, 2, 3),
           "the retention job touched the LIVE log")
    for (v <- Seq(2, 3))
      assert(rows(v - 1)._4 == SnapshotLog.read(spark, live, v).count(),
             s"kept v$v lost rows under vacuum")
    assert(SnapshotLog.read(spark, live, 1).count() > 0,
           "live v1 must keep serving its pinned readers")
  }

  test("q372: pack-log versions pin their manifests; crash window serves the old version") {
    val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
    val tx = graft.operators.TextExtOps
    // a fresh scratch root built through the same builder the query
    // uses: v1 = 2048-token manifest, v2 = 1024 re-pack
    val root = Files.createTempDirectory("graft_packlog_spec")
    tx.buildPackLog(spark, sf, root)
    assert(SnapshotLog.versions(root) == Seq(1, 2))
    val v1 = SnapshotLog.read(spark, root, 1)
    val v2 = SnapshotLog.read(spark, root, 2)
    val (n1, n2) = (v1.count(), v2.count())
    // the re-pack halves the context, so its manifest carries ~2× the
    // chunks — the versions are genuinely different data orders
    assert(n2 > n1, s"1024-token re-pack must hold more chunks ($n1 vs $n2)")
    // v1 stays byte-equal to recomputing the 2048 manifest — the
    // TIME-TRAVEL contract the declared query (and its oracle) pins
    val fresh = tx.packManifest(spark, sf, 2048L)
    assert(v1.exceptAll(fresh).count() == 0 &&
             fresh.exceptAll(v1).count() == 0,
           "pinned v1 diverged from the recomputed 2048 manifest")
    // both versions' token totals equal the corpus token count — a
    // re-pack reorders chunk boundaries, never token mass
    val tot = Tables(spark, sf, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("t"))
      .agg(sum("t")).as[Long].head()
    for ((v, n) <- Seq((v1, n1), (v2, n2)))
      assert(v.agg(sum("tokens")).as[Long].head() == tot,
             s"a version lost token mass (chunks $n)")
    // crash window: a v3 whose files land but whose manifest never
    // commits leaves v2 serving; the replayed commit lands once
    val orphans = SnapshotLog.addFiles(spark, root, "pack512",
      tx.packManifest(spark, sf, 512L))
    assert(orphans.nonEmpty && SnapshotLog.latest(root) == 2,
           "uncommitted pack files changed the served version")
    val v3Files = SnapshotLog.addFiles(spark, root, "pack512",
      tx.packManifest(spark, sf, 512L))
    assert(SnapshotLog.commitVersion(root, 3, v3Files))
    assert(!SnapshotLog.commitVersion(root, 3, v3Files),
           "a double-fired version commit must be a no-op")
    assert(SnapshotLog.read(spark, root, 1).count() == n1,
           "committing v3 rewrote v1's pinned history")
  }
}
