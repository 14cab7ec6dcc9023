package graft.tools

import org.apache.spark.sql.functions._

/** How many FILES does each stream-face input drop contain, and
  * therefore how many micro-batches does `maxFilesPerTrigger=1` under
  * AvailableNow actually drain? The two stream faces were adjudicated
  * (r14 StreamFaceProbe) as majority fixed harness cost, but the
  * harness cost itself is proportional to the micro-batch COUNT —
  * each batch pays a checkpoint WAL/commit cycle AND a fresh
  * history-side pass of the operator. The faces' scaladoc says "two
  * drops → two micro-batches"; this probe checks whether the drop
  * writes actually produce one file each.
  */
object StreamDropProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.Graft.session("stream-drop-probe")
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.core.Graft.table(spark, sfDir, "documents")
      .select("doc_id", "text")
    val newDocs = d.filter(col("doc_id") % 3L === 0L)
    val half = newDocs
      .agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0)
    val root = java.nio.file.Files.createTempDirectory("graft_dropprobe")
    newDocs.filter(col("doc_id") <= half)
      .write.parquet(root.resolve("a").toString)
    newDocs.filter(col("doc_id") > half)
      .write.parquet(root.resolve("b").toString)
    def parquetFiles(p: java.nio.file.Path): Int = {
      val fs = p.toFile.listFiles()
      if (fs == null) 0 else fs.count(_.getName.endsWith(".parquet"))
    }
    println(s"[dropprobe] a=${parquetFiles(root.resolve("a"))} files, " +
      s"b=${parquetFiles(root.resolve("b"))} files " +
      s"(= micro-batches under maxFilesPerTrigger=1)")
    spark.stop()
  }
}
