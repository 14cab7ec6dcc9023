package graft

import graft.plans.ArrayOps
import graft.signal.Signal
import graft.similarity.Ann
import org.apache.spark.sql.functions._

/** Native Catalyst expressions: codegen path vs interpreted vs HOF
  * parity, null semantics, SQL registration.
  */
class PlansSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0, 1.0, 1.0)),
    (3L, null.asInstanceOf[Array[Float]], Array(1.0, 2.0, 3.0))
  ).toDF("id", "vf", "vd")

  test("array_dot: float×double arrays, null propagation") {
    val got = vecs
      .select($"id", ArrayOps.array_dot($"vf", $"vd").as("dot"))
      .orderBy("id")
      .collect()
    assert(got(0).getDouble(1) == 1.0 * 4 + 2 * 5 + 3 * 6)
    assert(got(1).getDouble(1) == 0.0)
    assert(got(2).isNullAt(1))
  }

  test("array_dot matches HOF cosine on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(20)
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter($"a.vec_id" < $"b.vec_id")
      .select(
        Ann.cosineFast($"a.embedding", $"b.embedding").as("native"),
        Ann.cosineHof($"a.embedding", $"b.embedding").as("hof")
      )
      .collect()
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("wada_snr expression matches the Scala function") {
    val wave = Array.tabulate(2000) { i =>
      val t = math.sin(0.19634954 * (i + 1)); t * t * t + 0.01 * math.sin(78.233 * i)
    }
    val expected = Signal.wadaSnr(wave)
    val got = Seq(Tuple1(wave)).toDF("w")
      .select(ArrayOps.wada_snr_native($"w"))
      .head().getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("SQL registration: array_dot and wada_snr callable from SQL") {
    ArrayOps.register(spark)
    vecs.createOrReplaceTempView("plans_vecs")
    val r = spark.sql(
      "SELECT id, array_dot(vf, vd) AS d, wada_snr(vd) AS s FROM plans_vecs WHERE id = 1"
    ).head()
    assert(r.getDouble(1) == 32.0)
    assert(!r.isNullAt(2))
  }

  test("type check rejects non-array input with a clear message") {
    val err = intercept[Exception] {
      vecs.select(ArrayOps.array_dot($"id", $"vd")).collect()
    }
    assert(err.getMessage.contains("array_dot") || err.getMessage.toLowerCase.contains("type"))
  }

  test("count_min grid equals the per-cell groupBy truth across a real shuffle") {
    import graft.plans.CountMinAgg
    val keys = spark.range(2000L)
      .select((col("id") % 37L).as("k"))
      .repartition(7) // force partial buffers + serialize/merge path
    val grid = keys
      .agg(CountMinAgg.countMin(col("k"), depth = 4, width = 16).as("cms"))
      .head().getSeq[Long](0)
    assert(grid.length == 64)
    // rebuild every cell from the published hash and compare
    val truth = new Array[Long](64)
    (0L until 2000L).map(_ % 37L).foreach { x =>
      (0 until 4).foreach { d =>
        truth(d * 16 + CountMinAgg.cell(x, d, 16)) += 1L
      }
    }
    assert(grid == truth.toSeq)
    // every hash row's counters sum to the row count
    (0 until 4).foreach { d =>
      assert(grid.slice(d * 16, (d + 1) * 16).sum == 2000L)
    }
  }

  test("count_min point estimates upper-bound true counts, exact sans collision") {
    import graft.plans.CountMinAgg
    val xs = Seq.fill(50)(7L) ++ Seq.fill(3)(11L) ++ (100L to 120L)
    val grid = xs.toDF("k")
      .agg(CountMinAgg.countMin(col("k"), depth = 4, width = 64).as("cms"))
      .head().getSeq[Long](0)
    def est(x: Long): Long =
      (0 until 4).map(d => grid(d * 64 + CountMinAgg.cell(x, d, 64))).min
    val trueCnt = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    trueCnt.foreach { case (x, n) => assert(est(x) >= n, s"key $x") }
    // the heavy key's estimate is exact here (width 64 >> 23 keys
    // rarely collides on all 4 rows; if this ever flakes the constants
    // changed, which is the regression being pinned)
    assert(est(7L) == 50L)
  }

  test("count_min nulls are ignored and count_min is callable from SQL") {
    import graft.plans.CountMinAgg
    val df = Seq(Some(1L), None, Some(1L), Some(2L)).toDF("k")
    val grid = df
      .agg(CountMinAgg.countMin(col("k"), depth = 2, width = 8).as("cms"))
      .head().getSeq[Long](0)
    assert(grid.slice(0, 8).sum == 3L) // null contributed nothing
    ArrayOps.register(spark)
    df.createOrReplaceTempView("plans_cms")
    val viaSql = spark.sql(
      "SELECT count_min(k, 2, 8) FROM plans_cms").head().getSeq[Long](0)
    assert(viaSql == grid)
  }

  test("sorted_intersect_count: codegen parity with a reference merge, " +
    "null propagation, SQL registration, and a non-codegen (interpreted) " +
    "eval check") {
    import graft.plans.SortedIntersectCount
    import org.apache.spark.sql.graft.bridge.toExpr
    val rnd = new scala.util.Random(7)
    def sortedArr(n: Int): Array[Long] =
      Array.fill(n)(rnd.nextLong() % 1000).distinct.sorted
    val rows = (0 until 50).map { i =>
      (i.toLong, sortedArr(rnd.nextInt(40)), sortedArr(rnd.nextInt(40)))
    }
    def refCount(x: Array[Long], y: Array[Long]): Long =
      x.toSet.intersect(y.toSet).size.toLong
    val df = rows.toDF("id", "xa", "xb")
    val got = df
      .select($"id", ArrayOps.sorted_intersect_count($"xa", $"xb").as("c"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (i, x, y) =>
      assert(got(i) == refCount(x, y), s"row $i")
    }
    // interpreted eval (nullSafeEval) must agree with codegen
    val expr = SortedIntersectCount(toExpr($"xa"), toExpr($"xb"))
    rows.take(5).foreach { case (_, x, y) =>
      val ad = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(x)
      val bd = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(y)
      assert(expr.nullSafeEval(ad, bd) == refCount(x, y))
    }
    // null propagation
    val withNull = Seq(
      (1L, Array(1L, 2L), null.asInstanceOf[Array[Long]])
    ).toDF("id", "xa", "xb")
    assert(withNull
      .select(ArrayOps.sorted_intersect_count($"xa", $"xb"))
      .head().isNullAt(0))
    // SQL registration
    ArrayOps.register(spark)
    df.createOrReplaceTempView("plans_sic")
    val viaSql = spark.sql(
      "SELECT id, sorted_intersect_count(xa, xb) AS c FROM plans_sic")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == got)
    // type check failure is loud
    val err = intercept[Exception] {
      df.select(ArrayOps.sorted_intersect_count($"id", $"xa")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("sorted_intersect_count") ||
      err.getMessage.toLowerCase.contains("type"))
  }
}
