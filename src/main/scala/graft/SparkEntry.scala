package graft

import graft.queries.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries and oracles are assembled from the graft.queries registry;
  * each QueryDef documents which SURVEY §2 operators it covers.
  */
object SparkEntry {

  /** Flagship query (SURVEY §3.3b catalog-curation chain) on sf0.001;
    * driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_flagship_quality_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator group from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** DuckDB-equivalent SQL for every SQL-expressible query; others get
    * the driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
