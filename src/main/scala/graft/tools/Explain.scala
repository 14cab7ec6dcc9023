package graft.tools

import graft.core.Graft
import graft.queries.Registry

/** Plan inspector: prints the formatted physical plan of registered
  * queries so scans (PushedFilters/ReadSchema), join strategies, and
  * WholeStageCodegen spans can be reviewed per SURVEY §4.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Registry.all.map(_.name)
    val spark = Graft.session("graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      Registry.byName(n).fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
