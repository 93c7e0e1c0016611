package graft.sources

import graft.{OpModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-layout scan paths (SURVEY.md §4): static partition
  * pruning and dynamic partition pruning (DPP), demonstrated by writing
  * the events table out partitioned by `event_type` — the layout a
  * 100 TB ingest would use — and reading it back.
  *
  *  - q62: a literal partition predicate never touches the other
  *    partition directories (`PartitionFilters` in the scan, asserted in
  *    PlanShapeSpec).
  *  - q63: the partition predicate arrives only through a join with a
  *    filtered dimension; Spark inserts a dynamic pruning subquery so
  *    the fact scan still skips partitions at runtime.
  *  - q90: sort-key clustering — lineitem rewritten range-partitioned +
  *    sorted by l_shipdate so parquet row-group min/max stats make a
  *    date-range scan skip ~97% of the data (measured in PlanShapeSpec).
  */
object PartitionedOps extends OpModule {

  /** Builds a derived on-disk layout once per (layout, sfDir) per JVM
    * under java.io.tmpdir and returns its location. Writes to a scratch
    * dir, then atomic-renames into place: a crashed partial write must
    * never be mistaken for the cached copy. */
  private def cachedLayout(layout: String, d: String)
                          (write: String => Unit): String = synchronized {
    val key = d.replaceAll("[^a-zA-Z0-9]", "_")
    val dir = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_${layout}_$key")
    if (!java.nio.file.Files.exists(dir)) {
      val scratchRoot = java.nio.file.Files.createTempDirectory("graft_part_scratch")
      val scratch = scratchRoot.resolve(layout)
      try {
        write(scratch.toString)
        try java.nio.file.Files.move(scratch, dir,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          // lost a cross-process race: someone else completed it. On
          // Linux a rename onto an existing non-empty dir surfaces as
          // DirectoryNotEmptyException (ENOTEMPTY), not
          // FileAlreadyExistsException — accept any FileSystemException
          // as long as the winner's copy is in place.
          case e: java.nio.file.FileSystemException
            if java.nio.file.Files.exists(dir) =>
        }
      } finally { // the scratch tree is garbage on every path post-move
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.exists(scratchRoot)) {
          java.nio.file.Files.walk(scratchRoot).iterator.asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
    }
    dir.toString
  }

  /** Writes events partitioned by event_type under a per-sfDir temp path
    * (once per JVM) and returns its location. */
  def partitionedEventsDir(s: SparkSession, d: String): String =
    cachedLayout("part_events", d) { scratch =>
      Tables(s, d, "events")
        .write.mode("overwrite").partitionBy("event_type")
        .parquet(scratch)
    }

  /** Writes lineitem range-partitioned AND sorted by l_shipdate with
    * deliberately small parquet row groups (so even the test SFs produce
    * many row groups). This is the sort-key clustering a 100 TB fact
    * table would use: every row group's l_shipdate min/max stats cover a
    * narrow slice, so a date predicate pushed to the parquet reader
    * skips the vast majority of row groups without decoding them. */
  def sortedLineitemDir(s: SparkSession, d: String): String =
    cachedLayout("sorted_lineitem", d) { scratch =>
      // the sort key is stored as DATE, not the source's NTZ timestamp:
      // shipdate is a calendar date (all values midnight-aligned, checked
      // at every SF), DATE stats are INT32 days with exact ordering, and
      // — measured here — parquet row-group skipping does not fire for
      // TIMESTAMP_NTZ predicates while DATE predicates prune perfectly
      Tables(s, d, "lineitem")
        .withColumn("l_shipdate", col("l_shipdate").cast("date"))
        .repartitionByRange(8, col("l_shipdate"))
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(scratch)
    }

  /** Writes lineitem clustered on a BIT-INTERLEAVED (l_shipdate,
    * l_partkey) key — z-order-lite: each dimension quantized to 8 cells
    * (3 bits) against its measured min/max, bits interleaved
    * d2 p2 d1 p1 d0 p0 into a 6-bit z value, rows range-partitioned
    * (16) and sorted by it with small row groups. Because neighboring
    * z values agree on their high bits, every row group covers a NARROW
    * slice of BOTH raw columns, so parquet min/max stats prune
    * row groups for a date-range predicate AND a partkey-range
    * predicate from the one layout — the property a single-key sort
    * (q90) fundamentally cannot give: q90 serves date scans perfectly
    * and partkey scans not at all. The granularity trade is inherent:
    * 3 bits/dimension bounds best-case pruning at ~1/8 per family
    * (PlanShapeSpec measures both). The z key is layout metadata only —
    * it is dropped before the write, and the quantization bounds come
    * from the data, so the layout stays a pure re-organization. */
  def zorderLineitemDir(s: SparkSession, d: String): String =
    cachedLayout("zorder_lineitem", d) { scratch =>
      val li = Tables(s, d, "lineitem")
        .withColumn("l_shipdate", col("l_shipdate").cast("date"))
      val b = li.agg(min(col("l_shipdate")).as("dlo"),
                     max(col("l_shipdate")).as("dhi"),
                     min(col("l_partkey")).as("plo"),
                     max(col("l_partkey")).as("phi")).head()
      val (dlo, dhi) = (b.getDate(0), b.getDate(1))
      val (plo, phi) = (b.getLong(2), b.getLong(3))
      val dspan = math.max(1L,
        dhi.toLocalDate.toEpochDay - dlo.toLocalDate.toEpochDay + 1)
      val pspan = math.max(1L, phi - plo + 1)
      def cell(c: Column, span: Long): Column =
        least(lit(7), floor(c * 8 / lit(span))).cast("int")
      val dcell = cell(datediff(col("l_shipdate"), lit(dlo)).cast("long"), dspan)
      val pcell = cell(col("l_partkey") - lit(plo), pspan)
      val z = (0 until 3).map(i =>
        shiftleft(shiftright(col("dc"), i).bitwiseAND(lit(1)), 2 * i + 1) +
        shiftleft(shiftright(col("pc"), i).bitwiseAND(lit(1)), 2 * i))
        .reduce(_ + _)
      li.withColumn("dc", dcell).withColumn("pc", pcell)
        .withColumn("zk", z)
        .repartitionByRange(16, col("zk"))
        .sortWithinPartitions("zk")
        .drop("dc", "pc", "zk")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(scratch)
    }

  /** The FRAGMENTED ingest layout: events scattered across 64 small
    * files keyed by a salt — the shape a streaming micro-batch ingest
    * (or q122's file sink) leaves behind after a day: every file covers
    * the whole time span, so min/max stats prune nothing and every
    * query pays 64 file opens. Ingest derives the `day` DATE column
    * (the table's clustering key — q90's measured finding applies:
    * parquet stats prune DATE, not timestamps). The q124 fixture. */
  def fragmentedEventsDir(s: SparkSession, d: String): String =
    cachedLayout("frag_events", d) { scratch =>
      Tables(s, d, "events")
        .withColumn("day", to_date(col("ts")))
        .repartition(64, pmod(col("event_id"), lit(64)))
        .write.mode("overwrite").parquet(scratch)
    }

  /** The nightly COMPACTION (OPTIMIZE) job: read the fragmented table,
    * bin-pack into a few large files, and restore the day/event-time
    * clustering so row-group stats prune again. Compaction is the
    * maintenance op that keeps a streaming-ingested 100 TB table
    * queryable — without it the file count grows with ingest batches
    * forever (file-open cost) and time-range scans read everything
    * (no clustering). Small row groups as in q90 so the test SFs
    * produce enough groups to measure skipping. */
  def compactedEventsDir(s: SparkSession, d: String): String =
    cachedLayout("compact_events", d) { scratch =>
      s.read.parquet(fragmentedEventsDir(s, d))
        .repartitionByRange(4, col("day"), col("ts"))
        .sortWithinPartitions("day", "ts")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(scratch)
    }

  /** Incremental OPTIMIZE (q166): rewrites ONLY the `day=` partition
    * dirs of `root` holding more than `maxFiles` parquet files — each
    * is compacted to one ts-sorted small-row-group file (q124's skip
    * restoration, scoped to the partition) — and returns the rewritten
    * partition names. Untouched partitions keep their files
    * byte-identical: the partition dir is the maintenance TRANSACTION
    * UNIT, which is what makes nightly OPTIMIZE affordable at 100 TB —
    * cost ∝ new ingest, not table size (q124 rewrites everything it
    * reads, the right shape only for a first backfill). Single-writer
    * per partition by contract; concurrent-writer commits are
    * [[graft.BucketedCache.publish]]'s department. Package-visible:
    * IncCompactSpec drives generations directly on its own dir. */
  private[graft] def optimizeDayPartitions(s: SparkSession, root: String,
                                           maxFiles: Int = 1): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val rootP = java.nio.file.Paths.get(root)
    def parquetFiles(p: java.nio.file.Path): Seq[java.nio.file.Path] =
      java.nio.file.Files.list(p).iterator.asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    val fragmented = java.nio.file.Files.list(rootP).iterator.asScala
      .filter(_.getFileName.toString.startsWith("day="))
      .filter(p => parquetFiles(p).size > maxFiles).toSeq.sortBy(_.toString)
    for (dd <- fragmented) {
      val scratch = java.nio.file.Files.createTempDirectory(rootP, ".optimize")
      try {
        s.read.parquet(dd.toString)
          .repartition(1).sortWithinPartitions("ts")
          .write.mode("overwrite")
          .option("parquet.block.size", 64 * 1024)
          .parquet(scratch.resolve("out").toString)
        val olds = parquetFiles(dd)
        parquetFiles(scratch.resolve("out")).zipWithIndex.foreach {
          case (f, i) => java.nio.file.Files.move(f,
            dd.resolve(s"compacted-$i.parquet"))
        }
        olds.foreach(java.nio.file.Files.delete)
      } finally {
        java.nio.file.Files.walk(scratch).iterator.asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    fragmented.map(_.getFileName.toString)
  }

  /** The q166 fixture: a day-partitioned events table taken through two
    * ingest→OPTIMIZE generations. Gen 1: days before Jan 16 land as
    * 4-file-per-day ingest fragments and are compacted. Gen 2: the
    * remaining days land fragmented and the SECOND, incremental
    * OPTIMIZE pass runs — the builder REQUIRES that it rewrote exactly
    * the new days and left every gen-1 file untouched (name-for-name),
    * so a layout regression fails the build loudly rather than
    * silently re-paying full-table maintenance. */
  def incCompactedEventsDir(s: SparkSession, d: String): String =
    cachedLayout("inc_compact_events", d) { scratch =>
      import scala.jdk.CollectionConverters._
      val boundary = java.sql.Date.valueOf("2024-01-16")
      val ev = Tables(s, d, "events").withColumn("day", to_date(col("ts")))
      def ingest(part: DataFrame): Unit = part
        .repartition(4, pmod(col("event_id"), lit(4)))
        .write.mode("append").partitionBy("day").parquet(scratch)
      ingest(ev.where(col("day") < boundary))
      optimizeDayPartitions(s, scratch)
      def snapshot(): Map[String, Set[String]] =
        java.nio.file.Files.list(java.nio.file.Paths.get(scratch))
          .iterator.asScala
          .filter(_.getFileName.toString.startsWith("day=")).map { p =>
            p.getFileName.toString ->
              java.nio.file.Files.list(p).iterator.asScala
                .map(_.getFileName.toString)
                .filter(_.endsWith(".parquet")).toSet
          }.toMap
      val gen1 = snapshot()
      ingest(ev.where(col("day") >= boundary))
      val rewritten = optimizeDayPartitions(s, scratch)
      val after = snapshot()
      require(rewritten.forall(_ >= "day=2024-01-16"),
        s"incremental OPTIMIZE rewrote a gen-1 partition: $rewritten")
      require(gen1.forall { case (k, v) => after(k) == v },
        "incremental OPTIMIZE disturbed compacted gen-1 files")
    }

  /** Minimal MANIFEST-BASED SNAPSHOT LOG (q167) — the file-level half
    * of the lakehouse lifecycle the row-level family (q117 diff → q119
    * MERGE → q123 SCD2 → q136 time travel) doesn't cover, and the GC
    * counterpart of [[graft.BucketedCache.publish]]'s commit contract:
    *
    *  - a SNAPSHOT is a text manifest (`_manifests/vNNNNN.manifest`)
    *    listing the data files it references, committed with the same
    *    scratch-write + single atomic-rename protocol as `publish`
    *    (readers observe a whole manifest or none);
    *  - data files are IMMUTABLE once referenced — a rewrite (q124
    *    compaction, q119 MERGE) writes NEW files and commits a new
    *    manifest; superseded files stay on disk so older snapshots
    *    keep reading (file-level time travel), and manifests can SHARE
    *    files (an append commits old files + new ones);
    *  - VACUUM is the retention op: keep the last K manifests, delete
    *    every data file no KEPT manifest references (the reference
    *    union, never just-the-latest — shared files must survive) plus
    *    orphans from crashed writers. Production retention is
    *    age-based (e.g. 7 days) precisely so in-flight writers that
    *    have written files but not yet committed a manifest are never
    *    collected; keep-K models it at test scale under q166's
    *    single-maintenance-writer contract.
    *
    * At 100 TB the same three pieces are the table format: manifests
    * become the transaction log, the atomic rename becomes the store's
    * conditional manifest write, and VACUUM is the nightly GC whose
    * cost is one log read + one file listing — never a data scan. */
  private[graft] object SnapshotLog {
    import java.nio.file.{Files, Path, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    private def mdir(root: Path) = root.resolve("_manifests")
    private def mfile(root: Path, v: Int) =
      mdir(root).resolve(f"v$v%05d.manifest")

    def commit(root: Path, names: Seq[String]): Int = {
      Files.createDirectories(mdir(root))
      val v = latest(root) + 1
      val tmp = Files.createTempFile(mdir(root), ".commit", ".tmp")
      Files.write(tmp, names.sorted.mkString("\n").getBytes("UTF-8"))
      Files.move(tmp, mfile(root, v), StandardCopyOption.ATOMIC_MOVE)
      v
    }

    /** Idempotent commit of a SPECIFIC version — the streaming CDC
      * writer's `batchId + 1` contract (q298): a replayed micro-batch
      * (restart from checkpoint, double-fire) finds its version
      * already committed and returns false; its data files, if any
      * were re-added, are orphans for [[vacuum]]. The exists-check +
      * rename pair can race a concurrent twin, but per-version content
      * is deterministic by the writer contract, so either outcome
      * leaves the same committed bytes. */
    def commitVersion(root: Path, v: Int, names: Seq[String]): Boolean = {
      Files.createDirectories(mdir(root))
      if (Files.exists(mfile(root, v))) return false
      val tmp = Files.createTempFile(mdir(root), ".commit", ".tmp")
      Files.write(tmp, names.sorted.mkString("\n").getBytes("UTF-8"))
      try {
        Files.move(tmp, mfile(root, v), StandardCopyOption.ATOMIC_MOVE)
        true
      } catch {
        case _: java.nio.file.FileSystemException
          if Files.exists(mfile(root, v)) =>
          Files.deleteIfExists(tmp); false
      }
    }

    def versions(root: Path): Seq[Int] =
      if (!Files.exists(mdir(root))) Seq.empty
      else Files.list(mdir(root)).iterator.asScala
        .map(_.getFileName.toString)
        .filter(_.matches("v\\d+\\.manifest")) // branch manifests excluded
        .map(_.stripPrefix("v").stripSuffix(".manifest").toInt).toSeq.sorted

    // ---- branches (added r13, q335): a branch is its own manifest
    // chain (`<name>-vNNNNN.manifest`) over the SAME data-file
    // directory — the Iceberg/Nessie model: creating a branch copies a
    // main version's FILE LIST (zero data movement), branch commits
    // add manifests main never reads, and main's history is untouched
    // (versions() above excludes branch manifests by pattern).
    private def bfile(root: Path, br: String, v: Int) =
      mdir(root).resolve(f"$br-v$v%05d.manifest")

    def branchVersions(root: Path, br: String): Seq[Int] =
      if (!Files.exists(mdir(root))) Seq.empty
      else Files.list(mdir(root)).iterator.asScala
        .map(_.getFileName.toString)
        .filter(_.matches(java.util.regex.Pattern.quote(br) +
                          "-v\\d+\\.manifest"))
        .map(_.stripPrefix(s"$br-v").stripSuffix(".manifest").toInt)
        .toSeq.sorted

    def branchCommit(root: Path, br: String, names: Seq[String]): Int = {
      Files.createDirectories(mdir(root))
      val v = branchVersions(root, br).lastOption.getOrElse(0) + 1
      val tmp = Files.createTempFile(mdir(root), ".commit", ".tmp")
      Files.write(tmp, names.sorted.mkString("\n").getBytes("UTF-8"))
      Files.move(tmp, bfile(root, br, v), StandardCopyOption.ATOMIC_MOVE)
      v
    }

    def branchFiles(root: Path, br: String, v: Int): Seq[String] =
      new String(Files.readAllBytes(bfile(root, br, v)), "UTF-8")
        .split("\n").filter(_.nonEmpty).toSeq

    def branchRead(s: SparkSession, root: Path, br: String,
                   v: Int): DataFrame =
      s.read.parquet(
        branchFiles(root, br, v).map(root.resolve(_).toString): _*)

    def latest(root: Path): Int = versions(root).lastOption.getOrElse(0)

    def files(root: Path, v: Int): Seq[String] =
      new String(Files.readAllBytes(mfile(root, v)), "UTF-8")
        .split("\n").filter(_.nonEmpty).toSeq

    def read(s: SparkSession, root: Path, v: Int): DataFrame =
      s.read.parquet(files(root, v).map(root.resolve(_).toString): _*)

    /** Every data file referenced by ANY manifest — main or branch —
      * at `root`: [[vacuum]]'s liveness rule as a readable set, the
      * orphan test q388's fsck runs (a data file in the dir that no
      * manifest references is a crashed writer's garbage). */
    def referencedFiles(root: Path): Set[String] =
      if (!Files.exists(mdir(root))) Set.empty
      else scala.util.Using.resource(Files.list(mdir(root))) { st =>
        st.iterator.asScala
          .map(_.getFileName.toString)
          .filter(_.matches(".*v\\d+\\.manifest"))
          .flatMap(n => new String(
            Files.readAllBytes(mdir(root).resolve(n)), "UTF-8")
            .split("\n").filter(_.nonEmpty)).toSet
      }

    /** Deletes manifests older than the last `keep` and every data file
      * referenced by NO kept manifest; returns (deleted data files,
      * dropped versions). Idempotent; never touches a kept manifest's
      * files. */
    def vacuum(root: Path, keep: Int): (Seq[String], Seq[Int]) = {
      val vs = versions(root)
      val (drop, kept) = vs.splitAt(math.max(0, vs.size - keep))
      // every BRANCH manifest pins its files too (r13): a retention
      // vacuum of main must never collect a file a live branch reads
      val branchLive: Set[String] =
        if (!Files.exists(mdir(root))) Set.empty
        else Files.list(mdir(root)).iterator.asScala
          .map(_.getFileName.toString)
          .filter(_.matches(".+-v\\d+\\.manifest"))
          .flatMap(n => new String(
            Files.readAllBytes(mdir(root).resolve(n)), "UTF-8")
            .split("\n").filter(_.nonEmpty)).toSet
      val live = kept.flatMap(files(root, _)).toSet ++ branchLive
      val dead = Files.list(root).iterator.asScala
        .filter(Files.isRegularFile(_)).map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !live.contains(n))
        .toSeq.sorted
      dead.foreach(n => Files.delete(root.resolve(n)))
      drop.foreach(v => Files.delete(mfile(root, v)))
      (dead, drop)
    }

    /** Writes `df` as data files named `<prefix>-N.parquet` in `root`
      * (via a scratch dir — files appear in the table dir complete) and
      * returns the names WITHOUT committing them: commit order is
      * files-then-manifest, so a crash before [[commit]] leaves only
      * orphans for [[vacuum]]. */
    def addFiles(s: SparkSession, root: Path, prefix: String,
                 df: DataFrame): Seq[String] = {
      val scratch = Files.createTempDirectory("graft_snap_add")
      try {
        df.write.mode("overwrite")
          .option("parquet.block.size", 64 * 1024)
          .parquet(scratch.resolve("out").toString)
        Files.list(scratch.resolve("out")).iterator.asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .toSeq.sortBy(_.getFileName.toString).zipWithIndex.map {
            case (f, i) =>
              val name = s"$prefix-$i.parquet"
              // REPLACE_EXISTING: a crashed-then-replayed writer that
              // moved its files but never committed re-adds the SAME
              // deterministic content under the same names (q298's
              // replay path) — no committed manifest references an
              // uncommitted name, so the overwrite is unobservable
              Files.move(f, root.resolve(name),
                StandardCopyOption.REPLACE_EXISTING)
              name
          }
      } finally {
        Files.walk(scratch).iterator.asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(p => Files.deleteIfExists(p))
      }
    }
  }

  /** The q167 fixture: an events table taken through three snapshot
    * generations and one retention VACUUM. v1 = fragmented ingest of
    * the early days; v2 = v1's content COMPACTED (new files; v1's stay
    * for time travel) + the middle days appended; v3 = the late days
    * appended — sharing v2's files, the property that forces vacuum to
    * union kept manifests. Then `vacuum(keep = 2)` drops v1 and
    * collects exactly the fragments only v1 referenced. The builder
    * REQUIRES the collected set is exactly v1's private files and that
    * v2 and v3 still read complete — a GC bug fails the build loudly.
    * SnapshotVacuumSpec drives the same lifecycle plus the orphan and
    * idempotence contracts on its own dir. */
  def snapshotEventsDir(s: SparkSession, d: String): String =
    cachedLayout("snap_events", d) { scratch =>
      val root = java.nio.file.Paths.get(scratch)
      java.nio.file.Files.createDirectories(root)
      val b1 = lit("2024-01-16").cast("date")
      val b2 = lit("2024-01-24").cast("date")
      val ev = Tables(s, d, "events").withColumn("day", to_date(col("ts")))
      val g1 = SnapshotLog.addFiles(s, root, "g1",
        ev.where(col("day") < b1).repartition(4, pmod(col("event_id"), lit(4))))
      SnapshotLog.commit(root, g1)
      val g2c = SnapshotLog.addFiles(s, root, "g2c",
        SnapshotLog.read(s, root, 1)
          .repartitionByRange(2, col("day"), col("ts"))
          .sortWithinPartitions("day", "ts"))
      val g2n = SnapshotLog.addFiles(s, root, "g2n",
        ev.where(col("day") >= b1 && col("day") < b2).coalesce(1))
      SnapshotLog.commit(root, g2c ++ g2n)
      val g3 = SnapshotLog.addFiles(s, root, "g3",
        ev.where(col("day") >= b2).coalesce(1))
      SnapshotLog.commit(root, g2c ++ g2n ++ g3)
      val (deleted, dropped) = SnapshotLog.vacuum(root, keep = 2)
      require(deleted.toSet == g1.toSet && dropped == Seq(1),
        s"vacuum collected the wrong set: $deleted / $dropped")
      require(SnapshotLog.read(s, root, 2).count() ==
                ev.where(col("day") < b2).count() &&
              SnapshotLog.read(s, root, 3).count() == ev.count(),
        "a kept snapshot lost rows after vacuum")
    }

  /** The q335 fixture: a BRANCHED snapshot table (orders key/price
    * projection). main v1 = keys ≡0 (mod 4); main v2 = +≡1; branch
    * `dev` created AT v2 (its v1 manifest is a copy of main v2's file
    * list — zero data movement); dev v2 = +≡2 (a branch-only ingest
    * main never sees); main v3 = +≡3 (main moves on independently).
    * The divergence is by construction: main∖dev = slice 3,
    * dev∖main = slice 2, base = slices 0+1. */
  def branchedOrdersDir(s: SparkSession, d: String): String =
    cachedLayout("snap_branch", d) { scratch =>
      val root = java.nio.file.Paths.get(scratch)
      java.nio.file.Files.createDirectories(root)
      val o = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      def slice(k: Int) =
        o.where(pmod(col("o_orderkey"), lit(4)) === k).coalesce(1)
      val a = SnapshotLog.addFiles(s, root, "a", slice(0))
      SnapshotLog.commit(root, a)
      val b = SnapshotLog.addFiles(s, root, "b", slice(1))
      SnapshotLog.commit(root, a ++ b)
      SnapshotLog.branchCommit(root, "dev", SnapshotLog.files(root, 2))
      val c = SnapshotLog.addFiles(s, root, "c", slice(2))
      SnapshotLog.branchCommit(root, "dev",
        SnapshotLog.branchFiles(root, "dev", 1) ++ c)
      val dd = SnapshotLog.addFiles(s, root, "d", slice(3))
      SnapshotLog.commit(root, SnapshotLog.files(root, 2) ++ dd)
    }

  /** The q336 fixture: q335's branched lifecycle PLUS the merge —
    * main absorbs dev's delta (dev@latest ∖ the branch-point file
    * list) as main v4. File-level three-way merge: both sides only
    * ADDED files, so the merged manifest is main∪delta — union
    * semantics with zero data movement (the conflict-free case; a
    * same-file rewrite on both sides would need content-level
    * resolution, out of declared scope). */
  def mergedOrdersDir(s: SparkSession, d: String): String =
    cachedLayout("snap_merge", d) { scratch =>
      val root = java.nio.file.Paths.get(scratch)
      java.nio.file.Files.createDirectories(root)
      val o = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      def slice(k: Int) =
        o.where(pmod(col("o_orderkey"), lit(4)) === k).coalesce(1)
      val a = SnapshotLog.addFiles(s, root, "a", slice(0))
      SnapshotLog.commit(root, a)
      val b = SnapshotLog.addFiles(s, root, "b", slice(1))
      SnapshotLog.commit(root, a ++ b)
      val base = SnapshotLog.files(root, 2)
      SnapshotLog.branchCommit(root, "dev", base)
      val c = SnapshotLog.addFiles(s, root, "c", slice(2))
      SnapshotLog.branchCommit(root, "dev",
        SnapshotLog.branchFiles(root, "dev", 1) ++ c)
      val dd = SnapshotLog.addFiles(s, root, "d", slice(3))
      SnapshotLog.commit(root, base ++ dd)
      // the merge: dev's delta vs the branch point lands on main
      val delta = SnapshotLog
        .branchFiles(root, "dev",
                     SnapshotLog.branchVersions(root, "dev").last)
        .filterNot(base.toSet)
      SnapshotLog.commit(root,
        SnapshotLog.files(root, SnapshotLog.latest(root)) ++ delta)
    }

  /** The q168 fixture: SCHEMA EVOLUTION across ingest batches — the
    * other lifecycle fact of a 100 TB table besides fragmentation: the
    * producer ADDS a column mid-stream and history is never rewritten.
    * Batch 1 (days before Jan 16) lands with the original events
    * schema; batch 2 lands with a new `channel` STRING column. Batches
    * are `batch=N` directories, so each generation stays independently
    * readable (the old files genuinely lack the column — evolution is
    * a READER merge, not a backfill) and the batch id rides along as a
    * partition column. At scale the merged schema comes from the table
    * catalog, not a footer scan; the reader contract is the same:
    * old-file rows surface the new column as NULL. */
  def evolvedEventsDir(s: SparkSession, d: String): String =
    cachedLayout("evolved_events", d) { scratch =>
      val boundary = lit("2024-01-16").cast("date")
      val ev = Tables(s, d, "events")
      val channel = when(pmod(col("event_id"), lit(3)) === 0, "web")
        .when(pmod(col("event_id"), lit(3)) === 1, "app")
        .otherwise("api")
      ev.where(to_date(col("ts")) < boundary)
        .write.parquet(s"$scratch/batch=1")
      ev.where(to_date(col("ts")) >= boundary)
        .withColumn("channel", channel)
        .write.parquet(s"$scratch/batch=2")
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Schema evolution / mergeSchema read (added r11) — the declared
    // query reads the two-schema table (see [[evolvedEventsDir]])
    // with a merged schema and aggregates by channel, COALESCEing the
    // pre-evolution rows to 'legacy': the reader-merge contract (new
    // column is NULL for old files) made visible in the result. The
    // oracle recomputes the same split from the ORIGINAL events with
    // the batch boundary inlined — evolution must add information for
    // new rows and change nothing for old ones. CorrectnessSpec pins
    // the schema contract itself (merged field set, per-batch field
    // sets, NULL count = batch-1 rows).
    "q168_schema_evolution" -> { (s, d) =>
      s.read.option("mergeSchema", "true")
        .parquet(evolvedEventsDir(s, d))
        .groupBy(coalesce(col("channel"), lit("legacy")).as("channel"))
        .agg(count(lit(1)).as("cnt"),
             sum(col("value").cast("decimal(18,6)")).cast("double")
               .as("sum_value"))
        .orderBy("channel")
    },

    // Snapshot log + retention VACUUM (added r11) — the file-level
    // table format under the lakehouse family: immutable data files,
    // manifest commits (BucketedCache.publish's rename protocol),
    // file-level time travel, and GC that unions the KEPT manifests'
    // references (see [[SnapshotLog]] / [[snapshotEventsDir]] — the
    // builder self-checks the collected set). The declared query reads
    // the LATEST snapshot — whose manifest references the compacted v2
    // files plus two appends, while the dir may hold superseded ones —
    // and aggregates the full table; the oracle runs on the ORIGINAL
    // events, because three commits and a vacuum must stay a pure
    // re-organization. SnapshotVacuumSpec drives the contracts.
    // Snapshot-table BRANCHES (added r13) — the Iceberg/Nessie model
    // on q167's SnapshotLog, the last lakehouse lifecycle gap: a
    // branch is its own manifest chain over the SAME data files
    // (creation copies a version's FILE LIST — zero data movement),
    // branch commits are invisible to main, main moves on
    // independently, and vacuum pins every branch's files. The
    // declared query is the divergence report every dev/prod-isolation
    // workflow needs: per ref (base = the branch point, dev@latest,
    // main@latest), row count + the q244 order-free key checksum —
    // read ENTIRELY through the log ([[branchedOrdersDir]] builds
    // main v1→v2 →branch dev→ dev-only ingest / main-only ingest).
    // The oracle derives the same three row sets straight from orders
    // (the log must be invisible); SnapshotVacuumSpec drives branch
    // isolation + vacuum pinning on its own dir.
    "q335_snapshot_branch" -> { (s, d) =>
      val root = java.nio.file.Paths.get(branchedOrdersDir(s, d))
      def ck(ref: String, version: Int, df: DataFrame) = df
        .select(conv(substring(md5(col("o_orderkey").cast("string")),
                               1, 8), 16, 10).cast("long").as("h"))
        .agg(count(lit(1)).as("n_rows"),
             sum(col("h").cast("decimal(38,0)")).cast("long")
               .as("key_checksum"))
        .select(lit(ref).as("ref"), lit(version.toLong).as("version"),
                col("n_rows"), col("key_checksum"))
      val mv = SnapshotLog.latest(root)
      val bv = SnapshotLog.branchVersions(root, "dev").last
      ck("base", 2, SnapshotLog.read(s, root, 2))
        .unionAll(ck("dev", bv,
                     SnapshotLog.branchRead(s, root, "dev", bv)))
        .unionAll(ck("main", mv, SnapshotLog.read(s, root, mv)))
        .orderBy("ref")
    },

    // Branch MERGE (added r13) — q335's lifecycle completed: dev's
    // delta (dev@latest ∖ the branch-point file list) lands on main as
    // a new version — a file-level three-way merge, zero data movement
    // in the conflict-free adds-only case (the common one; same-file
    // rewrites on both sides need content resolution, declared out of
    // scope). The declared query is the MAIN AUDIT TRAIL across all
    // four versions (ingest → ingest → divergent ingest → merge): per
    // version, row count + q244 key checksum, read through the log.
    // The oracle derives each version's row set straight from orders —
    // every version, including the merged one, must be exactly its
    // slices. Time travel across the merge comes free (v3 still reads
    // the pre-merge table).
    "q336_branch_merge" -> { (s, d) =>
      val root = java.nio.file.Paths.get(mergedOrdersDir(s, d))
      def ck(version: Int) = SnapshotLog.read(s, root, version)
        .select(conv(substring(md5(col("o_orderkey").cast("string")),
                               1, 8), 16, 10).cast("long").as("h"))
        .agg(count(lit(1)).as("n_rows"),
             sum(col("h").cast("decimal(38,0)")).cast("long")
               .as("key_checksum"))
        .select(lit(version.toLong).as("version"), col("n_rows"),
                col("key_checksum"))
      (1 to SnapshotLog.latest(root)).map(ck).reduce(_.unionAll(_))
        .orderBy("version")
    },

    "q167_snapshot_vacuum" -> { (s, d) =>
      val root = java.nio.file.Paths.get(snapshotEventsDir(s, d))
      SnapshotLog.read(s, root, SnapshotLog.latest(root))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
             sum(col("value").cast("decimal(18,6)")).cast("double")
               .as("sum_value"))
        .orderBy("event_type")
    },

    // Incremental compaction / partition-scoped OPTIMIZE (added r11) —
    // q124's maintenance op made AFFORDABLE: compaction cost ∝ newly
    // ingested partitions, never table size. The query is a plain
    // time-range aggregate STRADDLING the generation boundary (reads
    // gen-1-compacted and gen-2-compacted days in one scan); the
    // operator under test is the layout lifecycle (see
    // [[incCompactedEventsDir]] — the builder self-checks that gen-1
    // files survive gen-2 maintenance byte-identically). Oracle runs
    // on the ORIGINAL events: two generations of maintenance must stay
    // a pure re-organization. PlanShapeSpec asserts every day dir ends
    // single-file; IncCompactSpec drives the generations directly.
    "q166_compact_incremental" -> { (s, d) =>
      s.read.parquet(incCompactedEventsDir(s, d))
        .where(col("day") >= lit("2024-01-12").cast("date") &&
               col("day") < lit("2024-01-20").cast("date"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
             sum(col("value").cast("decimal(18,6)")).cast("double")
               .as("sum_value"))
        .orderBy("event_type")
    },
    // Small-file compaction (added r10) — the query itself is a plain
    // time-range aggregate; the operator under test is the COMPACTED
    // LAYOUT: 64 span-covering ingest fragments rewritten as 4
    // ts-clustered files whose row-group stats serve the pushed date
    // predicate. The oracle runs on the ORIGINAL events — compaction,
    // like q90/q97's layouts, must be a pure re-organization.
    // PlanShapeSpec measures both halves of the claim: the file count
    // collapses ≥ 8×, and the range scan on the compacted layout
    // reads a fraction of the rows the fragmented one must.
    "q124_compact_layout" -> { (s, d) =>
      s.read.parquet(compactedEventsDir(s, d))
        .where(col("day") >= lit("2024-01-10").cast("date") &&
               col("day") < lit("2024-01-15").cast("date"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
             sum(col("value").cast("decimal(18,6)")).cast("double")
               .as("sum_value"))
        .orderBy("event_type")
    },

    "q62_partition_pruning" -> { (s, d) =>
      s.read.parquet(partitionedEventsDir(s, d))
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"),
             sum(col("value").cast("decimal(18,6)")).cast("double")
               .as("sum_value"))
        .orderBy("user_id")
    },

    // q90: sort-key clustered layout (added r6). The query itself is a
    // plain range-scan aggregate — the operator under test is the LAYOUT:
    // because the data is range-partitioned and sorted by l_shipdate,
    // the pushed-down date predicate lets the parquet reader skip every
    // row group whose min/max stats miss the window (~97% of them here).
    // At 100 TB this is the difference between reading 3 TB and 100 TB
    // for a one-quarter query; PlanShapeSpec measures the skip on the
    // scan's numOutputRows. Oracle runs on the ORIGINAL lineitem — the
    // layout must be a pure re-organization, never a semantic change.
    "q90_sorted_layout" -> { (s, d) =>
      s.read.parquet(sortedLineitemDir(s, d))
        .where(col("l_shipdate") >= lit("1996-06-01").cast("date") &&
               col("l_shipdate") < lit("1996-09-01").cast("date"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
             sum(col("l_quantity").cast("decimal(18,6)")).cast("double")
               .as("sum_qty"),
             sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double")
               .as("sum_price"))
        .orderBy("l_returnflag")
    },

    // q97: the two-key clustered layout under the predicate family q90
    // CANNOT serve — a partkey range scan. The layout (not the query)
    // is the operator under test: the oracle runs the same filter +
    // aggregate on the ORIGINAL lineitem, and PlanShapeSpec measures
    // row-group skipping on the z layout for BOTH predicate families.
    // The partkey cut is derived from the data (lowest eighth of the
    // key domain) with the identical integer arithmetic in both
    // engines, so the query is SF-independent.
    "q97_zorder_layout" -> { (s, d) =>
      val b = Tables(s, d, "lineitem")
        .agg(min("l_partkey"), max("l_partkey")).head()
      val cut = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 8
      s.read.parquet(zorderLineitemDir(s, d))
        .where(col("l_partkey") <= cut)
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("cnt"),
             sum(col("l_quantity").cast("decimal(18,6)")).cast("double")
               .as("sum_qty"),
             sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double")
               .as("sum_price"))
        .orderBy("l_linestatus")
    },

    "q63_dynamic_pruning" -> { (s, d) =>
      import s.implicits._
      // tiny dimension over the partition column; only 2 of 5 categories
      // survive the filter, so DPP should skip 3 partition dirs at
      // runtime. The dim must be a file scan (not a LocalRelation, whose
      // filter would be constant-folded away) for the DPP rule to see a
      // selective predicate.
      val dimDir = s"${sys.props("java.io.tmpdir")}/graft_event_dim"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dimDir))) {
        Seq(("click", "interactive"), ("view", "interactive"),
            ("purchase", "transactional"), ("signup", "lifecycle"),
            ("error", "diagnostic")).toDF("et", "category")
          .write.mode("overwrite").parquet(dimDir)
      }
      val dim = s.read.parquet(dimDir)
      s.read.parquet(partitionedEventsDir(s, d))
        .join(dim.where(col("category") === "interactive"),
              col("event_type") === col("et"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")
    },

    // Z-order data-skipping attestation (added r12) — q90 measured
    // that ONE-dimensional sort-key clustering makes row-group min/max
    // stats skip a date range; this measures what q90's layout CANNOT
    // do: serve a predicate box over TWO dimensions. The classic
    // Z-order (Morton) curve interleaves the bits of 8-bit min/max-
    // normalized ranks of (order day, custkey) — a pure closed-form
    // integer expression, engine-identical — and the attestation
    // SIMULATES row groups relationally (512-row groups by position in
    // each layout, per-group min/max, overlap count against a declared
    // box: 7 days × 10% of the key space), so the whole comparison is
    // DuckDB-oracled rather than a parquet-footer side effect. The two
    // layouts run as INDEPENDENT branches (r13): one column-pruned
    // scan + one bucketed rank window each, group stats reduced
    // BEFORE the layouts meet; at cluster scale each sort is a range
    // partition and groups are real row groups — the measured skip
    // ratios transfer directly (linear-by-date scans every group for
    // a key-selective box; Z-order skips on both dims)
    "q280_zorder_skipping" -> { (s, d) =>
      val o = Tables(s, d, "orders")
        .select(col("o_orderkey").as("key"),
                datediff(to_date(col("o_orderdate")),
                         lit("1995-01-01").cast("date")).cast("long")
                  .as("dd"),
                col("o_custkey").cast("long").as("ck"))
      // the 4 layout bounds collect ONCE at build (the q97 pattern —
      // a 1-row aggregate, not data rows) and bake into the branch
      // expressions as literals: the two layout branches then cost
      // exactly one column-pruned scan each, instead of re-deriving
      // the bounds subtree per use
      val rngRow = o.agg(min("dd"), max("dd"), min("ck"), max("ck"))
        .head()
      val (dmin, dmax) = (rngRow.getLong(0), rngRow.getLong(1))
      val (cmin, cmax) = (rngRow.getLong(2), rngRow.getLong(3))
      val zExpr = (0 until 8).map(i =>
        s"((bx div ${1L << i}) % 2) * ${1L << (2 * i + 1)} + " +
        s"((by div ${1L << i}) % 2) * ${1L << (2 * i)}")
        .mkString(" + ")
      val W = org.apache.spark.sql.expressions.Window
      // r19: `base` was a def — the cell-count pass and BOTH layout
      // branches re-ran the scan + the bit-interleave projection
      // (three derivations). Pinned, the narrow (dd, ck, key, buckets)
      // frame computes once and every consumer reads blocks
      // (guide §2.4: share one derivation).
      val (base, bh) = org.apache.spark.sql.graft.InternalPin.pin(o
        .withColumn("bx",
          expr(s"((dd - $dmin) * 256) div ${dmax - dmin + 1}"))
        .withColumn("by",
          expr(s"((ck - $cmin) * 256) div ${cmax - cmin + 1}"))
        .withColumn("z", expr(zExpr))
        // 256 value-range buckets per sort key: the global rank becomes
        // bucket offset + within-bucket row_number (q148's no-global-
        // sort discipline) — the naive `row_number() over (order by …)`
        // is a SinglePartition sort of the whole fact table, measured
        // 65 s at the 100× sweep; the bucketed form runs all ranks in
        // parallel and is EXACTLY the same order (equal sort values
        // can never straddle a value-range bucket boundary)
        .withColumn("bdd",
          expr(s"((dd - $dmin) * 256) div ${dmax - dmin + 1}"))
        .withColumn("bz", expr("(z * 256) div 65536")))
      bh.count(); graft.PinScope.retain(bh)
      // both offset tables come from ONE ≤256²-cell count pass (pinned:
      // each key's marginal rides the tiny cell table, not a fact scan)
      val (cells, h) = org.apache.spark.sql.graft.InternalPin.pin(
        base.groupBy("bdd", "bz").agg(count(lit(1)).as("c")))
      h.count(); graft.PinScope.retain(h)
      def offsets(bcol: String, oname: String) = {
        val wOff = W.orderBy(bcol)
          .rowsBetween(W.unboundedPreceding, -1)
        cells.groupBy(bcol).agg(sum("c").as("c"))
          .select(col(bcol).as(s"o_$bcol"),
                  coalesce(sum("c").over(wOff), lit(0L)).as(oname))
      }
      // The two layouts are INDEPENDENT branches (r13, verdict #5):
      // the r12 form chained both rank windows over the same wide
      // rows — shuffle-by-bdd-sort, then shuffle-by-bz-sort, then an
      // explode that pushed 2N wide rows into the group aggregate.
      // Each branch now carries only the columns ITS rank and group
      // stats need, the per-group reduction happens BEFORE the
      // layouts meet, and the union is of two ≤N/512-row group
      // tables, not of facts. Same rg assignment, same group stats —
      // a pure execution reshape.
      def layoutGroups(name: String, bcol: String, ord: String,
                       offName: String, cols: Seq[String]) =
        base.select(("dd" +: "ck" +: "key" +: cols).map(col): _*)
          .join(broadcast(offsets(bcol, offName)),
                col(bcol) === col(s"o_$bcol"))
          .withColumn("rg", expr(s"($offName + row_number() over " +
            s"(partition by $bcol order by $ord, key) - 1) div 512"))
          .groupBy("rg")
          .agg(count(lit(1)).as("rows_in"),
               min("dd").as("g_dlo"), max("dd").as("g_dhi"),
               min("ck").as("g_clo"), max("ck").as("g_chi"))
          .withColumn("layout", lit(name))
      val groups = layoutGroups("linear_date", "bdd", "dd", "offd",
                                Seq("bdd"))
        .unionByName(layoutGroups("zorder", "bz", "z", "offz",
                                  Seq("bz", "z")))
        // box A: 7 days × 10% of the key space (date-selective —
        // linear-by-date's home turf); box B: all dates × 1% of the
        // key space (key-selective — linear cannot skip AT ALL, the
        // Z-curve still can). The pair is the attestation: a single
        // sort key serves one box, the space-filling curve serves both.
        .withColumn("hit_a", col("g_dlo") <= lit(dmin + 1006L) &&
                             col("g_dhi") >= lit(dmin + 1000L) &&
                             col("g_clo") <= lit(cmin +
                               (cmax - cmin + 1) / 10) &&
                             col("g_chi") >= lit(cmin))
        .withColumn("hit_b", col("g_clo") <= lit(cmin +
                               (cmax - cmin + 1) / 100) &&
                             col("g_chi") >= lit(cmin))
      groups.select(col("layout"), col("rg"), col("rows_in"),
          explode(array(
            struct(lit("7d_x_10pct_keys").as("box"), col("hit_a").as("hit")),
            struct(lit("all_dates_x_1pct_keys").as("box"),
                   col("hit_b").as("hit")))).as("bh"))
        .groupBy(col("layout"), col("bh.box").as("box"))
        .agg(count(lit(1)).as("n_groups"),
             sum(when(col("bh.hit"), 1L).otherwise(0L))
               .as("groups_scanned"),
             sum(when(col("bh.hit"), col("rows_in")).otherwise(0L))
               .as("rows_scanned"))
        .withColumn("skip_ratio",
          round(lit(1.0) - col("groups_scanned").cast("double") /
                           col("n_groups").cast("double"), 6))
        .orderBy("layout", "box")
    }
  )

  def oracles: Map[String, String] = Map(
    // the day column is to_date(ts) derived at ingest; the oracle
    // derives it inline from the original table
    "q124_compact_layout" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE CAST(ts AS DATE) >= DATE '2024-01-10'
        |  AND CAST(ts AS DATE) < DATE '2024-01-15'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the reader-merge contract recomputed from the original table:
    // post-boundary rows carry the derived channel, pre-boundary rows
    // surface as 'legacy' (the NULL-for-old-files rule)
    "q168_schema_evolution" ->
      """SELECT CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
        |  THEN CASE event_id % 3 WHEN 0 THEN 'web'
        |       WHEN 1 THEN 'app' ELSE 'api' END
        |  ELSE 'legacy' END AS channel,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // three snapshot commits and a retention vacuum must stay a pure
    // re-organization of the original events
    // every main version derives straight from the orders slices:
    // v1 = mod-4 key 0; v2 = +1; v3 = +3; v4 (the merge) = all
    "q336_branch_merge" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |         AS BIGINT) AS h,
        |    o_orderkey % 4 AS m
        |  FROM orders),
        |r AS (
        |  SELECT 1 AS version, m IN (0) AS keep, h FROM o
        |  UNION ALL SELECT 2, m IN (0, 1), h FROM o
        |  UNION ALL SELECT 3, m IN (0, 1, 3), h FROM o
        |  UNION ALL SELECT 4, TRUE, h FROM o)
        |SELECT CAST(version AS BIGINT) AS version, count(*) AS n_rows,
        |  CAST(sum(CAST(h AS DECIMAL(38,0))) AS BIGINT) AS key_checksum
        |FROM r WHERE keep GROUP BY version ORDER BY version""".stripMargin,

    // the log must be invisible: the three refs derive straight from
    // the orders slices (base = mod-4 keys 0+1; dev adds 2; main adds 3)
    "q335_snapshot_branch" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |         AS BIGINT) AS h,
        |    o_orderkey % 4 AS m
        |  FROM orders),
        |r AS (
        |  SELECT 'base' AS ref, 2 AS version, m IN (0, 1) AS keep, h
        |    FROM o
        |  UNION ALL
        |  SELECT 'dev', 2, m IN (0, 1, 2), h FROM o
        |  UNION ALL
        |  SELECT 'main', 3, m IN (0, 1, 3), h FROM o)
        |SELECT ref, CAST(version AS BIGINT) AS version,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(h AS DECIMAL(38,0))) AS BIGINT) AS key_checksum
        |FROM r WHERE keep GROUP BY ref, version
        |ORDER BY ref""".stripMargin,

    "q167_snapshot_vacuum" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // two generations of partition-scoped maintenance must stay a pure
    // re-organization of the original events
    "q166_compact_incremental" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE CAST(ts AS DATE) >= DATE '2024-01-12'
        |  AND CAST(ts AS DATE) < DATE '2024-01-20'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q62_partition_pruning" ->
      """SELECT user_id, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q63_dynamic_pruning" ->
      """SELECT event_type, count(*) AS cnt FROM events
        |WHERE event_type IN ('click', 'view')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q97_zorder_layout" ->
      """SELECT l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_partkey <= (SELECT min(l_partkey) +
        |  (max(l_partkey) - min(l_partkey)) // 8 FROM lineitem)
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q90_sorted_layout" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-06-01'
        |  AND l_shipdate < TIMESTAMP '1996-09-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q280_zorder_skipping" -> {
      val zSql = (0 until 8).map(i =>
        s"((bx // ${1L << i}) % 2) * ${1L << (2 * i + 1)} + " +
        s"((by // ${1L << i}) % 2) * ${1L << (2 * i)}")
        .mkString(" + ")
      s"""WITH o AS (
         |  SELECT o_orderkey AS key,
         |    CAST(datediff('day', DATE '1995-01-01',
         |                  CAST(o_orderdate AS DATE)) AS BIGINT) AS dd,
         |    CAST(o_custkey AS BIGINT) AS ck
         |  FROM orders),
         |rng AS (
         |  SELECT min(dd) AS dmin, max(dd) AS dmax,
         |         min(ck) AS cmin, max(ck) AS cmax
         |  FROM o),
         |b AS (
         |  SELECT key, dd, ck, dmin, cmin, cmax,
         |    ((dd - dmin) * 256) // (dmax - dmin + 1) AS bx,
         |    ((ck - cmin) * 256) // (cmax - cmin + 1) AS by
         |  FROM o, rng),
         |z AS (SELECT *, $zSql AS zv FROM b),
         |rgs AS (
         |  SELECT *,
         |    (row_number() OVER (ORDER BY dd, key) - 1) // 512 AS rg_lin,
         |    (row_number() OVER (ORDER BY zv, key) - 1) // 512 AS rg_z
         |  FROM z),
         |lr AS (
         |  SELECT 'linear_date' AS layout, rg_lin AS rg, dd, ck,
         |         dmin, cmin, cmax FROM rgs
         |  UNION ALL
         |  SELECT 'zorder', rg_z, dd, ck, dmin, cmin, cmax FROM rgs),
         |groups AS (
         |  SELECT layout, rg, count(*) AS rows_in,
         |    min(dd) AS g_dlo, max(dd) AS g_dhi,
         |    min(ck) AS g_clo, max(ck) AS g_chi,
         |    min(dmin) AS dmin, min(cmin) AS cmin, min(cmax) AS cmax
         |  FROM lr GROUP BY 1, 2),
         |h AS (
         |  SELECT *,
         |    g_dlo <= dmin + 1006 AND g_dhi >= dmin + 1000 AND
         |    g_clo <= cmin + (cmax - cmin + 1) // 10 AND g_chi >= cmin
         |      AS hit_a,
         |    g_clo <= cmin + (cmax - cmin + 1) // 100 AND g_chi >= cmin
         |      AS hit_b
         |  FROM groups),
         |bh AS (
         |  SELECT layout, '7d_x_10pct_keys' AS box, rows_in,
         |         hit_a AS hit FROM h
         |  UNION ALL
         |  SELECT layout, 'all_dates_x_1pct_keys', rows_in, hit_b
         |  FROM h)
         |SELECT layout, box, count(*) AS n_groups,
         |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
         |    AS groups_scanned,
         |  CAST(sum(CASE WHEN hit THEN rows_in ELSE 0 END) AS BIGINT)
         |    AS rows_scanned,
         |  round(1.0 - CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END)
         |                   AS DOUBLE) /
         |              CAST(count(*) AS DOUBLE), 6) AS skip_ratio
         |FROM bh GROUP BY 1, 2 ORDER BY layout, box""".stripMargin
    }
  )
}
