package graft

import graft.queries.Registry

/** Every registered query must run on sf0.001 and the ones with known
  * row expectations must meet them. The DuckDB value-level compare is
  * driver-side (tools/check.py locally).
  */
class QueriesSmokeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("registry has no duplicate names and every oracle is non-empty SQL") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    Registry.all.flatMap(_.oracle).foreach(sql => assert(sql.trim.nonEmpty))
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- Registry.all) {
    test(s"${q.name} [${q.covers}] runs on sf0.001") {
      val df = q.fn(spark, dir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      // near-dup/similarity queries may legitimately be small but the
      // relational/text ones must produce rows
      if (q.oracle.isDefined) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
