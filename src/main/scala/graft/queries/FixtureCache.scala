package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Marker-guarded on-disk materialization of deterministic payload
  * fixtures (stripe PNGs, animated GIFs, …) the multimodal queries
  * exist to READ. Payload SYNTHESIS is corpus construction, not
  * operator work — running it inside a timed query inflates the bench
  * by encoder cost that no production scan pays (VERDICT r10 item #3) —
  * so each fixture builds once per (sfDir documents vintage) and the
  * timed queries measure scan → decode → operator only.
  *
  * The marker stores a signature of the source table's file listing;
  * a driver-regenerated fixture invalidates it. A missing source
  * listing is a hard error (a constant "absent" signature would pin
  * the first cached payload forever while the builders below read the
  * real table through the same `$dir/documents.parquet` path — they
  * would fail or, worse, silently serve stale doc_ids). The marker is
  * written via temp-file + atomic rename so a half-written signature
  * is never observable, and the whole check-and-build runs under a
  * per-fixture cross-process file lock (plus an in-JVM mutex — two
  * threads of one JVM would otherwise trip
  * OverlappingFileLockException): two JVMs sharing java.io.tmpdir that
  * both observe a stale marker would otherwise race
  * `write.mode(Overwrite)` into the same directory, and Overwrite
  * DELETES the dir while the loser's job is mid-commit (ADVICE r12 —
  * the payloads are deterministic, the write mechanics are not
  * idempotent).
  *
  * `fn` callers remain self-preparing (build-if-stale on first read),
  * so Verify/IsoBench stay correct standalone; Bench additionally runs
  * the builds in its untimed prepare phase.
  */
object FixtureCache {

  /** Run-scoped scratch directory for the stream-driving faces (input
    * drops, checkpoint, sink): created now, recursively deleted at JVM
    * exit, so repeated Bench/Verify invocations don't leak a re-written
    * input parquet + checkpoint per run into java.io.tmpdir (ADVICE
    * r13). Deletion must be deferred to exit because the face RETURNS
    * a lazy DataFrame over the sink path — the caller reads it after
    * `fn` returns. ONE static shutdown hook drains a queue of
    * registered roots (ADVICE r14): the faces call this per bench
    * repetition (min-of-3+ in ScaleBench), and a hook per call
    * accumulates threads without bound in a long bench JVM.
    */
  def scratchDir(prefix: String): java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory(prefix)
    scratchRoots.add(root)
    root
  }

  private val scratchRoots =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(); ()
    }
    var p = scratchRoots.poll()
    while (p != null) { rm(p.toFile); p = scratchRoots.poll() }
  }))

  /** The one source-table path every builder reads (Graft.table
    * resolves the same `$sfDir/$name.parquet`) — signature and build
    * must agree on it or staleness detection silently dies.
    */
  private def sourceListing(dir: String): java.io.File =
    new java.io.File(dir, "documents.parquet")

  def payloadParquet(
      s: SparkSession,
      dir: String,
      name: String)(build: => DataFrame): String = {
    val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val path = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_${name}_$key").getPath
    val marker = new java.io.File(path, "_GRAFT_READY")
    def sig(f: java.io.File): String =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName)
          .map(c => s"${c.getName}:${c.length}:${c.lastModified}")
          .mkString("|")
      else s"${f.length}:${f.lastModified}"
    val src = sourceListing(dir)
    require(src.exists,
      s"FixtureCache: source listing $src is missing — the staleness " +
        "signature would degenerate to a constant and never invalidate " +
        "a regenerated corpus")
    val want = sig(src)
    def fresh = marker.exists &&
      java.nio.file.Files.readString(marker.toPath) == want
    if (!fresh) buildLock.synchronized {
      // cross-process: exclusive-lock a sibling lockfile for the whole
      // re-check + build, so only one JVM ever writes `path` at a time
      // (the loser re-checks under the lock and finds the marker fresh)
      val lockPath = java.nio.file.Paths.get(path + ".lock")
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try {
          if (!fresh) {
            build.write.mode("overwrite").parquet(path)
            val tmp = java.nio.file.Files.createTempFile(
              java.nio.file.Paths.get(path), "_GRAFT_READY_", ".tmp")
            java.nio.file.Files.writeString(tmp, want)
            java.nio.file.Files.move(tmp, marker.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
        } finally lock.release()
      } finally ch.close()
    }
    path
  }

  /** In-JVM serialization of the locked section: JVM-internal file
    * locks are not reentrant across threads (OverlappingFileLockException),
    * and parallel suites within one sbt JVM may race the same fixture.
    */
  private val buildLock = new Object
}
