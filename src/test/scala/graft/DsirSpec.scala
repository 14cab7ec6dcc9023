package graft

import graft.text.Dsir

/** DSIR importance gate: mass discrimination, llr ordering, null/empty
  * handling, partitioning invariance — on a corpus where the target
  * and off-target vocabularies are hand-separable.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  // target corpus speaks {good, fine}; raw adds docs speaking {bad}
  private lazy val raw = Seq(
    (1L, "good fine good"),
    (2L, "good good fine fine"),
    (3L, "bad bad bad"),
    (4L, "good bad"),
    (5L, null: String),
    (6L, "")
  ).toDF("doc_id", "text")

  private lazy val target = raw.filter($"doc_id" <= 2L)

  private def scored = Dsir
    .dsirScore(raw, target, "doc_id", "text", buckets = 256,
      thetaPermille = 1000)
    .select($"doc_id", $"n_toks", $"t_mass", $"r_mass", $"llr", $"keep")
    .as[(Long, Long, Long, Long, Double, Boolean)]
    .collect()
    .map(r => r._1 -> r)
    .toMap

  test("target-vocabulary docs keep, off-target docs drop") {
    // target counts: good=4, fine=3 (Nt=7); raw adds bad=4 (Nr=13).
    // doc 1 (good fine good): t_mass=11·... exact check below; the
    // decision is t_mass·Nr >= r_mass·Nt.
    assert(scored(1L)._6, scored(1L).toString) // pure target vocab
    assert(scored(2L)._6, scored(2L).toString)
    assert(!scored(3L)._6, scored(3L).toString) // 'bad' never in target
    // doc 4 is half-and-half: good has target mass, bad has none —
    // verify the decision from first principles rather than pinning
    val (_, n4, t4, r4, _, keep4) = scored(4L)
    assert(n4 == 2L)
    assert(keep4 == (t4 * 13L >= r4 * 7L), scored(4L).toString)
  }

  test("masses are the exact count inner products") {
    // good: nt=4 nr=5(docs1,2,4); fine: nt=3 nr=3; bad: nt=0 nr=4
    // doc1 = 2·good + 1·fine: t=2·4+1·3=11, r=2·5+1·3=13, n=3
    assert(scored(1L)._2 == 3L)
    assert(scored(1L)._3 == 11L)
    assert(scored(1L)._4 == 13L)
    // doc3 = 3·bad: t=0, r=3·4=12
    assert(scored(3L)._3 == 0L && scored(3L)._4 == 12L)
  }

  test("llr orders target-like above off-target") {
    assert(scored(1L)._5 > scored(3L)._5)
    assert(scored(2L)._5 > scored(4L)._5)
    assert(scored(4L)._5 > scored(3L)._5) // mixed sits between
  }

  test("null and empty docs score zero and never keep") {
    for (id <- Seq(5L, 6L)) {
      val (_, n, t, r, llr, keep) = scored(id)
      assert(n == 0L && t == 0L && r == 0L && llr == 0.0d && !keep)
    }
  }

  test("scores are invariant to input partitioning") {
    val a = Dsir.dsirScore(raw.repartition(7), target, "doc_id", "text")
      .select("doc_id", "t_mass", "r_mass", "keep")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val b = Dsir.dsirScore(raw.coalesce(1), target, "doc_id", "text")
      .select("doc_id", "t_mass", "r_mass", "keep")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
