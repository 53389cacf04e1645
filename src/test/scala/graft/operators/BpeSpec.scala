package graft.operators

import graft.SparkSpec
import graft.operators.text.Bpe
import org.apache.spark.sql.functions._

/** BPE tokenizer training: hand-computed merges, greedy-fold overlap
  * semantics, and train/inference consistency.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("learnMerges reproduces the hand-computed sequence") {
    // corpus: "low low lower" — word table: low×2, lower×1
    // step 1 pairs: (l,o)=3, (o,w)=3 → tie breaks to (l,o); merged: lo
    // step 2: (lo,w)=3, (w,e)=1, (e,r)=1 → (lo,w); merged: low
    // step 3: (low,e)=1, (e,r)=1 → (e,r) vs (low,e): count tie at 1,
    //         lhs asc: "e" < "low" → (e,r)
    val m = Bpe.learnMerges(docs(1L -> "low low lower"), "text", 3)
    assert(m.map(x => (x.step, x.lhs, x.rhs, x.n)) ===
      Seq((1, "l", "o", 3L), (2, "lo", "w", 3L), (3, "e", "r", 1L)))
  }

  test("applyMerge is greedy left-to-right non-overlapping") {
    val df = Seq("aaa", "aaaa", "aab", "baa").toDF("w")
      .select(col("w"),
        Bpe.applyMerge(Bpe.charSymbols(col("w")), "a", "a").as("s"))
    val got = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("aaa") === Seq("aa", "a"))
    assert(got("aaaa") === Seq("aa", "aa"))
    assert(got("aab") === Seq("aa", "b"))
    assert(got("baa") === Seq("b", "aa"))
  }

  test("a merged symbol does not cascade within the same pass") {
    // merge (a, b): "abb" → [ab, b], NOT [abb]; the freshly created
    // "ab" must not act as the lhs of a second (a, b) application
    val s = Seq("abb").toDF("w")
      .select(Bpe.applyMerge(Bpe.charSymbols(col("w")), "a", "b"))
      .as[Seq[String]].head()
    assert(s === Seq("ab", "b"))
  }

  test("adjacentPairs handles short arrays") {
    val got = Seq("", "x", "xy", "xyz").toDF("w")
      .select(col("w"), Bpe.adjacentPairs(Bpe.charSymbols(col("w"))).as("p"))
      .select(col("w"), expr("transform(p, q -> concat(q.lhs, '|', q.rhs))"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("") === Seq())
    assert(got("x") === Seq())
    assert(got("xy") === Seq("x|y"))
    assert(got("xyz") === Seq("x|y", "y|z"))
  }

  test("pair counts weight by word frequency, not document count") {
    // "ab ab ab" in one doc = 3 occurrences of (a, b)
    val m = Bpe.pairCounts(Bpe.wordTable(docs(1L -> "ab ab ab", 2L -> "cd"), "text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("a", "b")) === 3L)
    assert(m(("c", "d")) === 1L)
  }

  test("tokenCounts matches a per-doc recount under the learned merges") {
    val df = docs(
      1L -> "low low lower lowest",
      2L -> "newer newest low",
      3L -> "wide wider widest")
    val (merges, seg) = Bpe.learnSegmented(df, "text", 4)
    val got = Bpe.tokenCounts(df, "doc_id", "text", seg)
      .as[(Long, Long)].collect().toMap
    // independent recount: apply the merge list per word via the fold
    val expected = df.select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .select(col("doc_id"),
        size(merges.foldLeft(Bpe.charSymbols(col("w"))) { (c, m) =>
          Bpe.applyMerge(c, m.lhs, m.rhs)
        }).cast("long").as("n"))
      .groupBy("doc_id").agg(sum("n").as("n_tok"))
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
    // merges apply in learned order; vocabulary compressed the corpus
    val naive = df.select(sum(size(Bpe.charSymbols(
      regexp_replace(col("text"), "\\s+", ""))))).as[Long].head()
    assert(got.values.sum < naive)
  }

  test("learnMerges stops early when the vocabulary is fully merged") {
    val m = Bpe.learnMerges(docs(1L -> "ab"), "text", 10)
    assert(m.size === 1) // (a,b) → "ab"; no pairs remain
    assert((m.head.lhs, m.head.rhs) === ("a", "b"))
  }

  // ---- randomized equivalence against a driver-side reference trainer ----

  /** Plain-Scala greedy merge: the non-overlapping left-to-right fold the
    * distributed expression claims to implement.
    */
  private def refMerge(syms: List[String], l: String, r: String): List[String] =
    syms.foldLeft(List.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r)
        acc.init :+ (l + r)
      else acc :+ x
    }

  /** Plain-Scala BPE trainer over word frequencies with the same
    * (count DESC, lhs ASC, rhs ASC) total-order tiebreak.
    */
  private def refLearn(texts: Seq[String], k: Int): Seq[(String, String, Long)] = {
    var words: Map[List[String], Long] = texts
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, n) => w.split("").toList -> n }
    val out = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var done = false
    while (i < k && !done) {
      val counts = words.toSeq.flatMap { case (s, n) =>
        s.zip(s.drop(1)).map(p => p -> n)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        out += ((l, r, n))
        words = words.toSeq.map { case (s, c) => refMerge(s, l, r) -> c }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        i += 1
      }
    }
    out.result()
  }

  test("random corpora: distributed training equals the reference trainer") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abc"
    def randWord() =
      (0 until (1 + rnd.nextInt(5))).map(_ => alphabet(rnd.nextInt(3))).mkString
    for (trial <- 1 to 5) {
      val texts = (0 until 8).map(_ =>
        (0 until (1 + rnd.nextInt(10))).map(_ => randWord()).mkString(" "))
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Bpe.learnMerges(df, "text", 5).map(m => (m.lhs, m.rhs, m.n))
      val want = refLearn(texts, 5)
      assert(got === want, s"trial $trial corpus: ${texts.mkString(" | ")}")
    }
  }
}
