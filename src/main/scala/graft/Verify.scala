package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // driver passes (sfDir, outDir); a third comma-separated name list
    // restricts the dump for fast local iteration on one query
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, Option.empty[Set[String]])
      case Array(a, b, f) => (a, b, Some(f.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // engine bootstrap default (see Graft.session): bucket pruning
      // needs the bucketed scan even when no join wants the hash dist
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      // splits self-scale to ~cores per scan (see Graft.session)
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST_BYTES", "16384"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Dead plans' broadcast/cache blocks are reaped by the
      // ContextCleaner only after a JVM GC notices the weak refs — at
      // big SFs a session running the whole catalog back-to-back
      // (several ~0.8 GB verify broadcasts among them) can exhaust
      // driver storage memory before any full GC happens ("Not enough
      // memory to build and broadcast", seen at sf10). Verify is
      // untimed, so nudge the reaper between queries.
      spark.catalog.clearCache()
      // the above-bound verify's materialized pair-list dirs are
      // consumed once the result parquet is written — reclaim /tmp
      // before the next query (ADVICE r12: the dirs otherwise leak
      // for the session lifetime)
      graft.dedup.Dedup.cleanupVerifyOutputs()
      System.gc()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
