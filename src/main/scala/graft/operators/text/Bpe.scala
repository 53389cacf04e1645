package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ScratchCache

/** Distributed byte-pair-encoding (BPE) tokenizer training (Sennrich et
  * al., "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016 — the standard LLM tokenizer-training recipe). Training is
  * the iterative loop: count every ADJACENT symbol pair, merge the most
  * frequent pair everywhere, repeat. Symbols start as single characters;
  * merges never cross word boundaries (the published pre-tokenization),
  * so the working set is the DISTINCT-WORD frequency table, not the
  * corpus: one corpus scan builds (word, count), and every subsequent
  * iteration touches only that vocabulary-sized table with pair counts
  * weighted by word frequency — exactly how the reference algorithm is
  * stated, and the reason BPE training is tractable at 100 TB (the
  * vocabulary grows ~Heaps-law sublinearly while the corpus grows
  * linearly).
  *
  * Scale shape: iteration = codegen'd adjacent-pair explode over the
  * word table feeding a keyed weighted aggregate with map-side combine,
  * a 1-row argmax `collect` (the merge decision is the one scalar that
  * MUST come to the driver), and a map-only re-segmentation fold. The
  * superseded word-table pass is released immediately (the
  * kCenterCoreset pattern), so the loop holds at most two cached
  * vocab-sized projections regardless of merge count. Nothing is
  * pairwise. Inference ([[tokenCounts]]) joins exploded corpus words
  * against the segmented vocabulary — a broadcast join, since the
  * vocabulary stays executor-sized.
  *
  * Determinism / oracle: argmax ties break on (count DESC, lhs ASC,
  * rhs ASC) — a total order — so the learned merge table is
  * bit-reproducible and a DuckDB oracle replays the training loop
  * exactly (`queries.Pipeline` builds the replay as a CTE chain over a
  * marker-bracketed word form whose non-overlapping left-to-right
  * `replace` provably equals the greedy fold below).
  *
  * Reference connection: the reference engine has no tokenizer plane —
  * this is training-data-pipeline surface (SURVEY §2 LLM operators)
  * complementing its flow analytics.
  */
object Bpe {

  /** One learned merge: at `step`, `(lhs, rhs)` was the most frequent
    * adjacent pair, occurring `n` times corpus-wide (weighted by word
    * frequency).
    */
  final case class Merge(step: Int, lhs: String, rhs: String, n: Long)

  /** Initial segmentation: one symbol per character. Spark's
    * `split(_, "")` keeps a trailing empty match under its limit=-1
    * semantics, so empties are filtered to match the oracle's split.
    */
  def charSymbols(word: Column): Column =
    filter(split(word, ""), c => c =!= lit(""))

  /** Adjacent (lhs, rhs) symbol pairs of a symbol array — the array
    * zipped against itself shifted by one. Arrays shorter than 2 yield
    * an empty pair array (slice with length 0).
    */
  def adjacentPairs(symbols: Column): Column = {
    val n = greatest(size(symbols) - 1, lit(0))
    zip_with(
      slice(symbols, lit(1), n), slice(symbols, lit(2), n),
      (a, b) => struct(a.as("lhs"), b.as("rhs")))
  }

  /** The distinct-word frequency table: (word, wn, syms) with `syms`
    * the initial character segmentation. One corpus scan; everything
    * downstream is vocabulary-sized.
    */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("wn"))
      .withColumn("syms", charSymbols(col("word")))

  /** Corpus-wide adjacent-pair counts over the current segmentation,
    * weighted by word frequency: (lhs, rhs, n).
    */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("wn"), explode(adjacentPairs(col("syms"))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum("wn").as("n"))

  /** Apply one merge greedily left-to-right: fold the symbol array,
    * replacing each `[..., lhs] ++ [rhs]` boundary with `[..., lhsrhs]`.
    * Non-overlapping: a symbol created by this pass never re-merges as
    * the `rhs` of the same pass (the fold consumed it), and never as the
    * `lhs` (the concatenated symbol is strictly longer than `lhs`) —
    * exactly the semantics of a left-to-right non-overlapping string
    * replace, which is what the SQL oracle uses.
    */
  def applyMerge(symbols: Column, lhs: String, rhs: String): Column =
    aggregate(
      symbols,
      array().cast("array<string>"),
      (acc, x) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === lit(lhs) && x === lit(rhs),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
          .otherwise(concat(acc, array(x))))

  /** Train `numMerges` BPE merges over `df(textCol)`. Each iteration
    * collects exactly one row (the argmax pair).
    */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    val (merges, seg) = learnSegmented(df, textCol, numMerges)
    ScratchCache.release(seg)
    merges
  }

  /** [[learnMerges]] plus the final segmented vocabulary (word, wn,
    * syms), still registered with [[ScratchCache]] — consumers (e.g.
    * [[tokenCounts]]) trigger release via the entry point's
    * `releaseAll`.
    */
  def learnSegmented(df: DataFrame, textCol: String,
      numMerges: Int): (Seq[Merge], DataFrame) = {
    var cur = ScratchCache.persist(wordTable(df, textCol))
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val top = pairCounts(cur)
        .orderBy(desc("n"), asc("lhs"), asc("rhs"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true // vocabulary fully merged (tiny inputs)
      else {
        val r = top(0)
        val (l, rt, n) = (r.getString(0), r.getString(1), r.getLong(2))
        merges += Merge(step, l, rt, n)
        val next = ScratchCache.persist(
          cur.withColumn("syms", applyMerge(col("syms"), l, rt)))
        next.count() // materialize before releasing the parent pass
        ScratchCache.release(cur)
        cur = next
        step += 1
      }
    }
    (merges.result(), cur)
  }

  /** Segment every document with a trained vocabulary (the inference
    * side): explode corpus words, broadcast-join the segmented
    * vocabulary, roll up per document → (idCol, n_tok). Documents with
    * no non-empty word produce no row (inner join), matching the word
    * model.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
      segmentedVocab: DataFrame): DataFrame = {
    val vocab = broadcast(
      segmentedVocab.select(col("word"), size(col("syms")).cast("long").as("n_sym")))
    df.select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .join(vocab, "word")
      .groupBy(idCol).agg(sum("n_sym").as("n_tok"))
  }
}
