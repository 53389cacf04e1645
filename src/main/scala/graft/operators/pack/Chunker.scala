package graft.operators.pack

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into overlapping
  * token-window chunks of at most `maxTokens` tokens, advancing by
  * `maxTokens - overlap` per chunk (the training-data "stride" split
  * every long document goes through before batching; the complement of
  * [[SequencePacking]], which concatenates SHORT documents — a real
  * pipeline chunks the long tail, then packs).
  *
  * Chunk starts are `0, step, 2·step, …` while `start < n − overlap`
  * (plus always the chunk at 0), so every token is covered, consecutive
  * chunks share exactly `overlap` tokens, and no trailing chunk is a
  * pure suffix of its predecessor. The final chunk may be shorter than
  * `maxTokens`.
  *
  * Scale shape: one scan, zero shuffles, fully codegen'd — tokenize,
  * `sequence` the start offsets, explode, `slice`+`array_join` the
  * window back to text. Output size is `n/step`-fold, the same
  * replication every chunking pass pays; chunk identity
  * `(id, chunk_idx)` is a pure function of the input, so re-runs and
  * task retries emit identical chunks (safe under speculative
  * execution and incremental re-releases).
  */
object Chunker {

  def chunk(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val step = maxTokens - overlap
    val toks = graft.operators.text.TextAnalysis.tokens(col(textCol))
    df.withColumn("__w", toks)
      .withColumn("__n", size(col("__w")).cast("long"))
      // last admissible start: the largest multiple of step covering a
      // token not already covered — sequence() is end-INCLUSIVE, so the
      // bound is n − overlap − 1, floored at 0 for short docs
      .withColumn("__s",
        explode(sequence(lit(0L),
          greatest(col("__n") - (overlap + 1).toLong, lit(0L)),
          lit(step.toLong))))
      .select(col(idCol),
        expr(s"__s div $step").as("chunk_idx"),
        least(lit(maxTokens.toLong), col("__n") - col("__s")).as("n_tok"),
        array_join(slice(col("__w"), (col("__s") + 1L).cast("int"),
          lit(maxTokens)), " ").as("chunk_text"))
  }
}
