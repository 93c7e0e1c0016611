package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.PartitionedOps.SnapshotLog

/** The snapshot-log / retention-vacuum contract behind q167
  * ([[graft.sources.PartitionedOps.SnapshotLog]]): manifest commits are
  * atomic and versioned, superseded files stay readable until vacuumed
  * (file-level time travel), readers see ONLY their manifest's files,
  * vacuum collects exactly the files no kept manifest references
  * (union semantics — manifests share files) plus crashed-writer
  * orphans, and is idempotent. */
class SnapshotVacuumSpec extends SparkSpecBase {

  test("snapshot log: commit, isolation, shared-file vacuum, orphan GC, idempotence") {
    val root = Files.createTempDirectory("graft_snaplog").resolve("tbl")
    Files.createDirectories(root)
    val ev = Tables(spark, sf, "events").withColumn("day", to_date(col("ts")))
    val b = lit("2024-01-16").cast("date")

    // v1: fragmented early days. v2: their compaction (new files; v1's
    // stay on disk) + an appended late-days file.
    val g1 = SnapshotLog.addFiles(spark, root, "g1",
      ev.where(col("day") < b).repartition(3, pmod(col("event_id"), lit(3))))
    assert(SnapshotLog.commit(root, g1) == 1)
    val g2c = SnapshotLog.addFiles(spark, root, "g2c",
      SnapshotLog.read(spark, root, 1).coalesce(1))
    val g2n = SnapshotLog.addFiles(spark, root, "g2n",
      ev.where(col("day") >= b).coalesce(1))
    assert(SnapshotLog.commit(root, g2c ++ g2n) == 2)
    // v3 REWRITES the late-days file (a MERGE-style overwrite zeroing
    // `value`) while keeping v2's compacted early files — so g2c is
    // shared by v2+v3, g2n is v2-private, g3 is v3-private
    val g3 = SnapshotLog.addFiles(spark, root, "g3",
      ev.where(col("day") >= b).withColumn("value", col("value") * 0)
        .coalesce(1))
    assert(SnapshotLog.commit(root, g2c ++ g3) == 3)

    // time travel: every version reads its own row set; a reader sees
    // ONLY its manifest's files even though the dir holds every
    // generation (g1 is superseded but un-vacuumed at this point)
    val nEarly = ev.where(col("day") < b).count()
    val nAll = ev.count()
    assert(SnapshotLog.read(spark, root, 1).count() == nEarly)
    assert(SnapshotLog.read(spark, root, 2).count() == nAll)
    val v2Inputs = SnapshotLog.read(spark, root, 2).inputFiles.toSet
    assert(g1.forall(n => !v2Inputs.exists(_.endsWith(n))),
           "a v2 reader touched v1-only files")

    // a crashed writer: files on disk, no manifest ever committed
    val orphan = SnapshotLog.addFiles(spark, root, "orphan",
      ev.limit(5).coalesce(1))

    // vacuum(keep = 2): drops v1; collects g1 (referenced only by v1)
    // and the orphan; g2 files survive because v2 AND v3 reference
    // them — union-of-kept semantics, not latest-only
    val (deleted, dropped) = SnapshotLog.vacuum(root, keep = 2)
    assert(dropped == Seq(1))
    assert(deleted.toSet == (g1 ++ orphan).toSet,
           s"vacuum collected the wrong set: $deleted")
    assert(SnapshotLog.versions(root) == Seq(2, 3))
    assert(SnapshotLog.read(spark, root, 2).count() == nAll)
    assert(SnapshotLog.read(spark, root, 3).count() == nAll)
    // v3's append really is read (its value column was zeroed)
    assert(SnapshotLog.read(spark, root, 3)
             .agg(sum(when(col("day") >= b, col("value")))).head().getDouble(0)
             == 0.0)

    // idempotence: a second vacuum finds nothing
    val (d2, v2drop) = SnapshotLog.vacuum(root, keep = 2)
    assert(d2.isEmpty && v2drop.isEmpty)
  }

  test("branches: isolation from main, zero-copy creation, vacuum pins branch files") {
    val root = Files.createTempDirectory("graft_snapbr").resolve("tbl")
    Files.createDirectories(root)
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    def slice(k: Int) =
      o.where(pmod(col("o_orderkey"), lit(3)) === k).coalesce(1)
    val a = SnapshotLog.addFiles(spark, root, "a", slice(0))
    assert(SnapshotLog.commit(root, a) == 1)
    // branch at v1: the manifest is a FILE-LIST copy — zero new data
    assert(SnapshotLog.branchCommit(root, "dev",
             SnapshotLog.files(root, 1)) == 1)
    assert(SnapshotLog.branchFiles(root, "dev", 1) == a.sorted)
    // a branch-only commit: main's chain must not see it
    val c = SnapshotLog.addFiles(spark, root, "c", slice(1))
    SnapshotLog.branchCommit(root, "dev",
      SnapshotLog.branchFiles(root, "dev", 1) ++ c)
    assert(SnapshotLog.versions(root) == Seq(1),
           "branch commit leaked into main's version chain")
    // main moves on independently; the branch must not see main's add
    val dd = SnapshotLog.addFiles(spark, root, "d", slice(2))
    SnapshotLog.commit(root, SnapshotLog.files(root, 1) ++ dd)
    val nBase = slice(0).count(); val nC = slice(1).count()
    val nD = slice(2).count()
    assert(SnapshotLog.branchRead(spark, root, "dev", 2).count() ==
             nBase + nC)
    assert(SnapshotLog.read(spark, root, 2).count() == nBase + nD)
    // vacuum(keep = 1) drops main v1 but must NOT collect the
    // branch-only file c — branches pin their files
    val (deleted, dropped) = SnapshotLog.vacuum(root, keep = 1)
    assert(dropped == Seq(1))
    assert(deleted.isEmpty,
           s"vacuum collected branch-pinned or shared files: $deleted")
    assert(SnapshotLog.branchRead(spark, root, "dev", 2).count() ==
             nBase + nC, "branch unreadable after main vacuum")
  }
}
