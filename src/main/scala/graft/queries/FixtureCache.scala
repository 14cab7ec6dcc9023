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
  * a driver-regenerated fixture invalidates it. `fn` callers remain
  * self-preparing (build-if-stale on first read), so Verify/IsoBench
  * stay correct standalone; Bench additionally runs the builds in its
  * untimed prepare phase.
  */
object FixtureCache {

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
    val want = sig(new java.io.File(dir, "documents.parquet"))
    val fresh = marker.exists &&
      java.nio.file.Files.readString(marker.toPath) == want
    if (!fresh) {
      build.write.mode("overwrite").parquet(path)
      java.nio.file.Files.writeString(marker.toPath, want)
    }
    path
  }
}
