package graft

import java.nio.file.Files

/** [[BucketedCache.fsckArtifact]]'s detectors proven on synthetic
  * dirs (the GateModelSpec discipline: the declared q390 only ever
  * sees healthy artifacts — a green build commits no torn publish —
  * so each detector's sensitivity is test-only by necessity). */
class CacheFsckSpec extends SparkSpecBase {

  test("fsckArtifact: commit and bucket-layout detectors each catch their own fault") {
    val tbl = "graft_fsckspec_synth"
    val p = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_bucket_" +
        tbl.stripPrefix("graft_"))
    def fsck() = BucketedCache.fsckArtifact(tbl, declaredBuckets = 8)
    import scala.jdk.CollectionConverters._
    def wipe(): Unit =
      if (Files.exists(p))
        Files.walk(p).iterator.asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(Files.deleteIfExists(_))
    wipe()
    try {
      // absent dir: neither committed nor bucketed
      assert(fsck() == (0L, 0L), "absent artifact read as healthy")
      // data file present but NO _SUCCESS — the torn-publish window
      // the rename-commit protocol makes observable
      Files.createDirectories(p)
      Files.write(
        p.resolve("part-00000-aaaa_00000.c000.snappy.parquet"),
        Array[Byte](0x50, 0x41, 0x52))
      assert(fsck() == (0L, 1L), "torn publish not detected")
      // commit record lands: all green
      Files.write(p.resolve("_SUCCESS"), Array.empty[Byte])
      assert(fsck() == (1L, 1L), "healthy artifact not all-green")
      // a data file WITHOUT a bucket-id suffix (a by-hand drop or a
      // non-bucketed rebuild): the co-location guarantee is gone
      val stray = p.resolve("stray.parquet")
      Files.write(stray, Array[Byte](1))
      assert(fsck() == (1L, 0L), "unbucketed file not detected")
      Files.delete(stray)
      // a bucket id AT/PAST the declared count: written under a
      // different bucketing than the readers assume
      val over = p.resolve("part-00001-aaaa_00009.c000.snappy.parquet")
      Files.write(over, Array[Byte](1))
      assert(fsck() == (1L, 0L), "out-of-range bucket id not detected")
      Files.delete(over)
      assert(fsck() == (1L, 1L), "repair did not restore all-green")
    } finally wipe()
  }
}
