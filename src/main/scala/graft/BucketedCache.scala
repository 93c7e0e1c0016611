package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Write-once cache for bucketed parquet tables (SURVEY.md §4's
  * co-located-join layout): the production discipline of "bucket the
  * fact table once, register it, query it many times" for q59's
  * zero-exchange join and q76's persisted dedup signature index.
  *
  * Concurrency invariant: the bucketed files are written to a scratch
  * directory and atomic-renamed into the stable per-(name, sfDir) path,
  * so a reader can NEVER observe a half-written layout — it either sees
  * nothing (and becomes a writer) or the complete winner (`_SUCCESS`
  * inside the renamed dir). Two JVMs racing both write scratch copies;
  * exactly one rename wins, the loser discards its scratch. This closes
  * the clobber window the previous in-place `saveAsTable` had, where two
  * processes could interleave writes into the SAME final directory and
  * then register a corrupt mix. In-JVM, writers serialize on a
  * per-(name, sfDir) monitor — NOT a global lock: the cluster artifact's
  * build runs a multi-round fixpoint inside its critical section, and a
  * global lock would block every unrelated index build (band index, gram
  * index, IVF index) for the duration of the most expensive job in the
  * suite. Catalog registration is re-checked per call because catalog
  * state is per-SparkSession.
  */
object BucketedCache {

  /** One monitor per (name, sfDir): independent artifacts build
    * concurrently; two callers of the SAME artifact serialize. Keyed on
    * the TUPLE, not a joined string — a "_"-joined key could collide
    * for distinct pairs because "_" is also what sanitization emits
    * (name "a_b" + dir "c" vs "a" + dir "b/c"). */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Object]()

  /** 8-hex fingerprint of the corpus dir's PHYSICAL LAYOUT (every
    * regular file under it: path + size + mtime, sorted) — the r13
    * staging-dir discipline applied to the artifact cache (the r14
    * verdict's #8): artifacts key on (name, sfDir, fingerprint), so a
    * corpus mutated IN PLACE — a table rewritten, parts added, files
    * touched — can never silently serve a stale index; the changed
    * fingerprint routes every consumer to a fresh build. Stale
    * fingerprint dirs linger in tmp, the same never-delete-under-a-
    * reader price staging pays. Coarse by design (any table's change
    * rebuilds every artifact of the dir): corectness over reuse — an
    * artifact's true read-set is knowable only to its builder, and
    * the test harness never mutates a corpus, so the rebuild fires
    * exactly when something actually changed. */
  private[graft] def corpusFingerprint(sfDir: String): String = {
    val root = java.nio.file.Paths.get(sfDir)
    val sig =
      if (!java.nio.file.Files.isDirectory(root)) s"absent:$sfDir"
      else {
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(java.nio.file.Files.walk(root)) { st =>
          st.iterator.asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(p => s"${root.relativize(p)}:" +
              s"${java.nio.file.Files.size(p)}:" +
              java.nio.file.Files.getLastModifiedTime(p).toMillis)
            .toSeq.sorted.mkString("|")
        }
      }
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
  }

  /** The catalog name [[ensure]] registers for (name, sfDir) at the
    * corpus's CURRENT fingerprint — the one reconstruction point for
    * specs that assert an artifact exists. */
  private[graft] def tableName(name: String, sfDir: String): String = {
    val sfKey = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    s"graft_${name}_${sfKey}_${corpusFingerprint(sfDir)}"
  }

  /** One artifact's COMMIT + LAYOUT audit (q390's per-artifact fsck,
    * the [[graft.streaming.StreamOps.fsckLogRow]] discipline applied
    * to the cache: O(files), never reads row data). Walks the
    * published dir behind catalog table `tbl` (the inverse of
    * [[tableName]]'s path formula — and since the name EMBEDS the
    * corpus's current fingerprint, auditing the reconstructed path is
    * itself the freshness check: a stale build lives under a
    * different fingerprint and would simply not be here):
    *   - committed: the `_SUCCESS` commit record exists — absent
    *     means a torn publish (the rename-commit protocol's one
    *     invariant; CacheFsckSpec proves the detector on a fake dir)
    *   - bucketed_ok: every data file carries a Spark bucket-id
    *     suffix (`_NNNNN.c`) in [0, declaredBuckets) — a file written
    *     WITHOUT bucketing (a by-hand drop, a non-bucketed rebuild)
    *     would join reads silently un-co-located, which is exactly
    *     the regression the bucketed layout exists to prevent
    * Returns (committed, bucketed_ok). */
  private[graft] def fsckArtifact(tbl: String, declaredBuckets: Int)
      : (Long, Long) = {
    val path = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_bucket_" +
        tbl.stripPrefix("graft_"))
    val committed =
      if (java.nio.file.Files.exists(path.resolve("_SUCCESS"))) 1L
      else 0L
    import scala.jdk.CollectionConverters._
    val dataFiles =
      if (!java.nio.file.Files.isDirectory(path)) Seq.empty[String]
      else scala.util.Using.resource(
          java.nio.file.Files.list(path)) { st =>
        st.iterator.asScala
          .map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSeq
      }
    val bucketIds = dataFiles.flatMap { n =>
      "_(\\d{5})\\.c".r.findFirstMatchIn(n).map(_.group(1).toInt)
    }
    val bucketedOk =
      if (dataFiles.nonEmpty && bucketIds.size == dataFiles.size &&
          bucketIds.forall(b => b >= 0 && b < declaredBuckets)) 1L
      else 0L
    (committed, bucketedOk)
  }

  /** Ensures a `buckets`-bucketed, key-sorted parquet table built from
    * `build` exists for (name, sfDir) at the corpus's current
    * fingerprint and is registered in `s`'s catalog. `columnsDdl` is
    * the table's column list for external registration (e.g.
    * "l_orderkey BIGINT, l_quantity DOUBLE"). Returns the table name. */
  def ensure(s: SparkSession, sfDir: String, name: String, columnsDdl: String,
             key: String, buckets: Int)(build: => DataFrame): String = {
    val sfKey = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    locks.computeIfAbsent((name, sfDir), _ => new Object).synchronized {
      val fp = corpusFingerprint(sfDir)
      val tbl = s"graft_${name}_${sfKey}_$fp"
      val path = java.nio.file.Paths.get(
        s"${sys.props("java.io.tmpdir")}/graft_bucket_${name}_${sfKey}_$fp")
      publish(s, path, tbl, key, buckets)(build)
      if (!s.catalog.tableExists(tbl)) {
        s.sql(s"""CREATE TABLE $tbl ($columnsDdl)
                 |USING parquet
                 |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
                 |LOCATION '$path'""".stripMargin)
      }
      tbl
    }
  }

  /** The TWO-WRITER COMMIT PROTOCOL (the cross-process half of the
    * concurrency invariant; the in-JVM monitor in [[ensure]] is the
    * other half). Package-visible so ArtifactCommitSpec can race two
    * writers directly, bypassing the monitor — exactly what two
    * independent JVMs do.
    *
    * Contract (single-winner rename-commit):
    *  1. `_SUCCESS` inside the FINAL path is the commit record; a
    *     complete commit is never deleted or overwritten by this code.
    *  2. Writers build into a private scratch dir and publish with ONE
    *     atomic rename — readers observe nothing or everything, and
    *     two racing writers cannot interleave files.
    *  3. The loser of the rename race observes the winner's `_SUCCESS`
    *     and ACCEPTS (returns success, discards its scratch): the
    *     artifact's content contract is "a complete build of this
    *     dataset", which any winner satisfies. This is last-completes-
    *     wins-nothing — not last-WRITER-wins: once a commit exists, no
    *     later writer replaces it.
    *  4. A final dir WITHOUT `_SUCCESS` is a crashed writer's leftover.
    *     It is cleared only on the rename FAILURE path (never
    *     preemptively — a pre-build delete could clear a commit that
    *     lands between check and delete), then the rename retries once;
    *     losing the retry means a live competitor committed: accept.
    *
    * At 100 TB the same protocol is the object-store flavor: scratch =
    * a job-scoped prefix, rename = the store's atomic manifest/marker
    * write (or a lakehouse log commit), crashed-writer GC = lifecycle
    * policy on unreferenced scratch prefixes. */
  private[graft] def publish(s: SparkSession, path: java.nio.file.Path,
                             tbl: String, key: String, buckets: Int)(
                             build: => DataFrame): Unit = {
    def ready: Boolean =
      java.nio.file.Files.exists(path.resolve("_SUCCESS"))
    if (ready) return
    val scratchRoot =
      java.nio.file.Files.createTempDirectory("graft_bucket_scratch")
    val scratch = scratchRoot.resolve("data")
    // bucketBy requires saveAsTable: write under a throwaway
    // catalog name pointing at the scratch path, then detach it
    val scratchTbl =
      tbl + "_scratch_" + java.util.UUID.randomUUID.toString.replace("-", "")
    def tryMove(): Boolean =
      try {
        java.nio.file.Files.move(scratch, path,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        true
      } catch { case _: java.nio.file.FileSystemException => false }
    try {
      // repartition on the bucket key first: HashPartitioning(key, n)
      // matches the bucket assignment, so each task owns exactly one
      // bucket → n files instead of (input partitions × n) fragments
      build.repartition(buckets, col(key))
        .write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
        .option("path", scratch.toString).saveAsTable(scratchTbl)
      s.sql(s"DROP TABLE IF EXISTS $scratchTbl") // external: files stay
      if (!tryMove() && !ready) {
        // occupied by something that is NOT a complete commit: a
        // crashed writer's leftover. Clear it, retry once; if the
        // retry also fails, a live competitor landed in between —
        // accept its commit (contract point 3), else surface.
        deleteTree(path)
        if (!tryMove() && !ready)
          throw new IllegalStateException(
            s"cannot commit bucketed artifact at $path")
      }
    } finally deleteTree(scratchRoot) // no-op for the moved dir
  }

  private[graft] def deleteTree(root: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator.asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
}
