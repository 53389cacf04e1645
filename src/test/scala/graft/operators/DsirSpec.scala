package graft.operators

import graft.SparkSpec
import graft.operators.text.Dsir
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target exemplars share a vocabulary; one raw doc copies it, the
  // other is disjoint gibberish — DSIR must rank the copy higher
  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "target"),
    (2L, "the quick brown cat naps under the lazy dog", "target"),
    (3L, "quick brown fox and the lazy dog again today", "raw"),
    (4L, "zzq wvx qqj kkp zzt vvb nnm ooq ppw eer", "raw"),
    (5L, "", "raw") // no tokens → no feature row at all
  ).toDF("doc_id", "text", "src")

  test("target-like raw documents outweigh dissimilar ones") {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text",
      col("src") === "target", buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.contains(3L) && w.contains(4L))
    assert(w(3L) > w(4L),
      s"vocabulary-sharing doc should outrank gibberish: $w")
    assert(!w.contains(5L), "token-less documents produce no weight row")
  }

  test("n_feats counts unigrams plus adjacent bigrams") {
    val nf = Dsir.importanceWeights(corpus, "doc_id", "text",
      col("src") === "target", buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 9 tokens → 9 unigrams + 8 bigrams
    assert(nf(1L) == 17L)
    assert(nf(3L) == 17L)
  }

  test("weights are invariant to input partitioning") {
    val a = Dsir.importanceWeights(corpus, "doc_id", "text",
      col("src") === "target", buckets = 512)
      .collect().map(_.toSeq).toSet
    val b = Dsir.importanceWeights(corpus.repartition(7), "doc_id", "text",
      col("src") === "target", buckets = 512)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("selectTopK returns only raw-pool docs, best first") {
    val sel = Dsir.selectTopK(corpus, "doc_id", "text",
      col("src") === "target", k = 2, buckets = 512).collect()
    assert(sel.map(_.getLong(0)).toSeq == Seq(3L, 4L),
      "targets excluded; the target-like doc ranks first")
    assert(sel(0).getLong(1) > sel(1).getLong(1))
  }
}
