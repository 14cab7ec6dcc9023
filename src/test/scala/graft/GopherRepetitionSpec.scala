package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.Row

/** Hand-computed cases for the complete Gopher repetition table. */
class GopherRepetitionSpec extends SparkTestBase {
  import spark.implicits._

  private def signals(text: String): Row =
    TextAnalysis
      .gopherRepetitionSignals(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()(0)

  test("top-{2,3,4}-gram chars with deterministic tie-break") {
    // 2-grams: "a b"x3, "b a"x2 -> 3*3=9
    // 3-grams: "a b a"x2 ties "b a b"x2 -> lexicographic "a b a" -> 2*5=10
    // 4-grams: "a b a b"x2 -> 2*7=14
    val r = signals("a b a b a b")
    assert(r.getAs[Long]("n_chars") == 6L)
    assert(r.getAs[Long]("n_tok") == 6L)
    assert(r.getAs[Long]("top2_chars") == 9L)
    assert(r.getAs[Long]("top3_chars") == 10L)
    assert(r.getAs[Long]("top4_chars") == 14L)
    assert(r.getAs[Long]("dup5_chars") == 0L) // both 5-grams unique
  }

  test("duplicated 5-gram coverage counts each token once") {
    // "x y z w v" repeats at positions 1 and 6 -> all 10 tokens covered
    val r = signals("x y z w v x y z w v")
    assert(r.getAs[Long]("dup5_chars") == 10L)
    assert(r.getAs[Long]("dup6_chars") == 0L) // all 6-grams distinct
  }

  test("overlapping duplicated grams never double-count a token") {
    // 6x"a": both 5-grams are "a a a a a" (count 2) and they overlap on
    // tokens 2..5 — coverage is the 6 distinct tokens, chars = 6
    val r = signals("a a a a a a")
    assert(r.getAs[Long]("dup5_chars") == 6L)
    assert(r.getAs[Long]("top2_chars") == 5L * 3L) // "a a"x5, len 3
  }

  test("short and empty docs produce zeros") {
    val r = signals("")
    assert(r.getAs[Long]("n_chars") == 0L)
    assert(r.getAs[Long]("n_tok") == 1L) // split(' ', -1) of "" is [""]
    for (c <- Seq("top2_chars", "top3_chars", "top4_chars",
        "dup5_chars", "dup10_chars"))
      assert(r.getAs[Long](c) == 0L)
    val s = signals("one two three")
    assert(s.getAs[Long]("top4_chars") == 0L) // 3 tokens < 4
    assert(s.getAs[Long]("top3_chars") == 1L * 13L)
  }
}
