package graft.operators

import graft.SparkSpec
import graft.operators.pack.Chunker
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")

  private def chunks(text: String, max: Int, ov: Int): Seq[(Long, Long, String)] =
    Chunker.chunk(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
        max, ov)
      .select("chunk_idx", "n_tok", "chunk_text")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq

  test("stride windows cover every token; neighbors share exactly overlap") {
    val got = chunks(doc(12), max = 4, ov = 1)
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(got.map(_._3) == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10 t11 t12"))
    assert(got.map(_._2) == Seq(4L, 4L, 4L, 3L))
    // reconstruction: drop the overlap prefix of every chunk after the
    // first, concatenate, recover the document
    val rebuilt = (got.head._3 +: got.tail.map(_._3.split(" ").drop(1)
      .mkString(" "))).mkString(" ")
    assert(rebuilt == doc(12))
  }

  test("a doc at or under maxTokens is one whole chunk") {
    for (n <- Seq(1, 3, 4)) {
      val got = chunks(doc(n), max = 4, ov = 2)
      assert(got == Seq((0L, n.toLong, doc(n))))
    }
  }

  test("no trailing chunk is a pure suffix of its predecessor") {
    // n=9, max=4, ov=1, step=3: starts 0,3,6 — a naive 0,3,6,9 grid
    // would emit an empty 4th chunk; starts stop at n-ov-1
    val got = chunks(doc(9), 4, 1)
    assert(got.map(_._3) == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9"))
    for (Seq(a, b) <- got.sliding(2))
      assert(b._2 > 1, s"chunk ${b._1} adds nothing beyond the overlap")
  }

  test("zero overlap tiles exactly") {
    val got = chunks(doc(10), 5, 0)
    assert(got.map(_._3) == Seq("t1 t2 t3 t4 t5", "t6 t7 t8 t9 t10"))
  }

  test("one scan, zero shuffles") {
    val d = (1L to 50L).map(i => (i, doc(20))).toDF("doc_id", "text")
    val plan = Chunker.chunk(d, "doc_id", "text", 8, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("rejects bad knobs") {
    val d = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunker.chunk(d, "doc_id", "text", 0, 0))
    intercept[IllegalArgumentException](Chunker.chunk(d, "doc_id", "text", 4, 4))
  }
}
