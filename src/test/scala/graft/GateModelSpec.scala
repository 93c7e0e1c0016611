package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The gate-model LOG's contracts (SURVEY.md §2B q377/q381/q385/q388
  * neighborhood): deployments serve the PINNED version only, unknown
  * hand-committed versions surface as explicit rows, crash-window
  * orphans never advance the log, and q388's four fsck detectors each
  * catch the corruption they exist for — proven by breaking a scratch
  * copy one fault at a time (the declared query only ever sees healthy
  * logs, so sensitivity is test-only by necessity). */
class GateModelSpec extends SparkSpecBase {

  test("gate-model log: deployments read the PIN, v2 is invisible, unknown versions tolerated") {
    val SnapshotLog = sources.PartitionedOps.SnapshotLog
    val simx = operators.SimilarityExtOps
    // force the full log (v1 + v2), then verify the pinned read still
    // serves v1's content — the q345 deployment's claim
    val root = streaming.StreamOps.gateModelRoot(spark, sf)
    assert(SnapshotLog.latest(root) >= 2, "rebuild never landed v2")
    val pinned = SnapshotLog.read(spark, root,
      streaming.StreamOps.gateModelPin(root))
    val idxT = simx.semDedupTwoIndexTable(spark, sf)
    val live = spark.table(idxT)
      .select("kind", "id", "cid", "nv", "xi")
    assert(pinned.count() == live.count() &&
             pinned.except(live).isEmpty && live.except(pinned).isEmpty,
           "pinned v1 drifted from the nightly two-level model")
    // v2 differs from v1 (the rebuild admitted something) — the pin
    // is load-bearing, not vacuous
    val v2 = SnapshotLog.read(spark, root, 2)
    assert(v2.where(col("kind") === "m" && col("id") % 2 === 1)
             .count() > 0, "v2 holds no admitted members — vacuous pin")
    // unknown-version tolerance: a copy carrying a hand-committed v3
    // must surface as an explicit unknown-tier row, never a crash
    val copy = Files.createTempDirectory("graft_modellog_unknown")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(root).iterator.asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .foreach { p =>
        val rel = root.relativize(p)
        val dst = copy.resolve(rel.toString)
        java.nio.file.Files.createDirectories(dst.getParent)
        java.nio.file.Files.copy(p, dst)
      }
    val extra = SnapshotLog.addFiles(spark, copy, "m3",
      pinned.limit(5))
    SnapshotLog.commitVersion(copy, 3, extra)
    val report = streaming.StreamOps.modelLogReport(spark, copy)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(report(3L) == "unknown_v3",
           s"unknown version not tolerated: $report")
    // crash window on the MODEL log: orphan files never advance it
    SnapshotLog.addFiles(spark, copy, "m4", pinned.limit(1))
    assert(SnapshotLog.latest(copy) == 3,
           "orphan model files advanced the log")
  }

  test("q388 fsck: every detector detects its own corruption on a scratch copy") {
    val SnapshotLog = sources.PartitionedOps.SnapshotLog
    val live = streaming.StreamOps.gateModelRoot(spark, sf)
    // the declared q388 only ever SEES healthy logs (a green build
    // commits no corruption), so each detector's sensitivity is
    // proven here: break a scratch copy one fault at a time, assert
    // exactly the right flag drops, repair, re-assert all-green.
    // (contiguous, complete, no_orphans, pins_total, valid_pins)
    assert(streaming.StreamOps.fsckLogRow(live) == (1L, 1L, 1L, 2L, 2L),
           "live model log not fsck-clean")
    val copy = Files.createTempDirectory("graft_fsck_spec")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(live).iterator.asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .foreach { p =>
        val rel = live.relativize(p)
        val dst = copy.resolve(rel.toString)
        java.nio.file.Files.createDirectories(dst.getParent)
        java.nio.file.Files.copy(p, dst)
      }
    def fsck() = streaming.StreamOps.fsckLogRow(copy)
    assert(fsck() == (1L, 1L, 1L, 2L, 2L), "healthy copy not all-green")
    // 1. crashed writer's garbage: a stray data file no manifest
    //    references → no_orphans drops, nothing else moves
    val orphan = copy.resolve("zz_orphan.parquet")
    java.nio.file.Files.write(orphan, Array[Byte](0x50, 0x41, 0x52))
    assert(fsck() == (1L, 1L, 0L, 2L, 2L), "orphan not detected")
    java.nio.file.Files.delete(orphan)
    // 2. config corruption: a pin naming an uncommitted version →
    //    that deployment's pin stops counting as valid
    streaming.StreamOps.setGateModelPin(copy,
      streaming.StreamOps.GateProdDeployment, 99)
    assert(fsck() == (1L, 1L, 1L, 2L, 1L), "dangling pin not detected")
    streaming.StreamOps.setGateModelPin(copy,
      streaming.StreamOps.GateProdDeployment,
      streaming.StreamOps.gateModelPin(live))
    // 2b. a STRAY deployment's pin is DISCOVERED, not skipped — the
    //     reason fsck audits the _pins dir instead of a caller list;
    //     dangling (v99) so both the census and the validity move
    streaming.StreamOps.setGateModelPin(copy, "gate_canary", 99)
    assert(fsck() == (1L, 1L, 1L, 3L, 2L), "stray pin not discovered")
    java.nio.file.Files.delete(copy.resolve("_pins").resolve("gate_canary"))
    // 3. partial version: a manifest-listed data file missing from
    //    disk → manifests_complete drops (a deleted referenced file
    //    is NOT an orphan — no_orphans stays green)
    val victim = copy.resolve(SnapshotLog.files(copy, 1).head)
    java.nio.file.Files.delete(victim)
    assert(fsck() == (1L, 0L, 1L, 2L, 2L), "missing data file not detected")
    java.nio.file.Files.copy(
      live.resolve(SnapshotLog.files(copy, 1).head), victim)
    // 4. gapped chain: commit v3 as an alias of v2's file list (so
    //    v2's files stay referenced), then delete v2's manifest —
    //    contiguity drops AND the cycle deployment's pin (v2)
    //    dangles; completeness and orphans stay green by construction
    assert(SnapshotLog.commitVersion(copy, 3,
      SnapshotLog.files(copy, 2)), "v3 alias commit refused")
    assert(fsck() == (1L, 1L, 1L, 2L, 2L), "alias v3 broke a detector")
    java.nio.file.Files.delete(
      copy.resolve("_manifests").resolve("v00002.manifest"))
    assert(fsck() == (0L, 1L, 1L, 2L, 1L), "chain gap not detected")
    // and through it all, the LIVE log never moved
    assert(streaming.StreamOps.fsckLogRow(live) == (1L, 1L, 1L, 2L, 2L),
           "fsck spec disturbed the live log")
  }
}
