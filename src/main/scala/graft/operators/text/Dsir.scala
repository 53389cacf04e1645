package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting for training-data selection (Xie et
  * al., "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): score every document in a raw pool by how much more
  * likely its hashed-n-gram bag is under a target-domain unigram+bigram
  * model than under the raw-pool model, then keep the highest-weighted
  * documents. This is the standard published recipe for "find me more
  * data that looks like my curated set" at corpus scale.
  *
  * Engine-exact by construction, like [[TextAnalysis.surprisal]]: the
  * per-bucket log-likelihood ratio is quantized to whole bits via exact
  * integer log2 (`floor(log2(n)) = length(bin(n)) − 1`), with Laplace
  * (+1) smoothing so empty buckets stay finite — no float `ln`, no
  * summation-order sensitivity, so a SQL oracle reproduces every value
  * bit-for-bit. Features hash through the engine-portable 48-bit md5
  * slice (see `Dedup.minhashLshPortable`), not xxhash64, for the same
  * reason.
  *
  * Scale shape: one corpus scan explodes (doc, bucket) occurrences; the
  * model is a `buckets`-row aggregate of that stream (8k rows — always
  * broadcast); scoring is the feature stream re-joined against the
  * broadcast model and rolled up per document with map-side combine.
  * Nothing is pairwise, nothing collects, and the only wide exchanges
  * are the bucket aggregate and the per-doc rollup — both keyed, both
  * AQE-coalescible. The hashed feature space is fixed at `buckets`
  * regardless of corpus vocabulary, which is the point of DSIR's hashing
  * trick: the model stays broadcastable at 100 TB.
  */
object Dsir {

  /** Engine-portable 48-bit hash: the first 12 hex digits of md5 as a
    * non-negative long (collision-irrelevant here — a collision only
    * merges two feature buckets, which hashing does anyway).
    */
  private def hash48(s: Column): Column =
    graft.expressions.PortableHash.md5Prefix48(s)

  /** Importance weights for every document: (doc_id, n_feats,
    * logw_bits). `logw_bits` is the integer-bit quantized
    * log2(p_target(doc)/p_raw(doc)) under unigram+bigram hashed
    * bag-of-words models with Laplace smoothing; higher = more
    * target-like. `isTarget` marks the in-domain exemplar rows (they are
    * scored too; [[selectTopK]] excludes them). Documents with no
    * non-empty token produce no row, matching the feature model.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 8192): DataFrame =
    weightsWithFlag(df, idCol, textCol, isTarget, buckets)
      .select(col("doc_id"), col("n_feats"), col("logw_bits"))

  /** [[importanceWeights]] plus the per-doc `is_t` flag carried through
    * the rollup (`max(is_t)` — constant within a doc), so [[selectTopK]]
    * can exclude the target exemplars WITHOUT re-joining the corpus.
    */
  private def weightsWithFlag(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val base = df.select(col(idCol).as("doc_id"), isTarget.as("is_t"),
      filter(TextAnalysis.tokens(col(textCol)),
        t => length(t) > 0).as("w"))
    // occurrence stream (NOT deduped — DSIR fits multinomial bag models):
    // unigrams plus adjacent-pair bigrams, each hashed into its bucket
    // persisted (fixed-width (long, bool, long) rows — the compact form
    // AFTER hashing): the model-count aggregate and the scoring join both
    // read this stream, and recomputing it means tokenizing + exploding
    // + md5-hashing the whole corpus twice
    val feats = graft.ScratchCache.persist(base
      .select(col("doc_id"), col("is_t"),
        explode(concat(
          col("w"),
          when(size(col("w")) >= 2,
            transform(slice(col("w"), lit(1), size(col("w")) - 1),
              (t, i) => concat_ws(" ", t, element_at(col("w"), i + 2))))
            .otherwise(array().cast("array<string>")))).as("f"))
      .select(col("doc_id"), col("is_t"),
        pmod(hash48(col("f")), lit(buckets.toLong)).as("b")))
    // both models in one pass over the stream
    val counts = feats.groupBy("b").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("is_t"), 0L).otherwise(1L)).as("cr"))
    // smoothed totals: every one of the `buckets` cells gets its +1
    val totals = counts.agg(
      (sum("ct") + buckets).as("nt_s"), (sum("cr") + buckets).as("nr_s"))
    // per-doc Σ_f [bits(ct_f+1) − bits(cr_f+1)]; the totals' constant
    // bits(nr_s) − bits(nt_s) folds in once per feature occurrence
    feats.join(broadcast(counts), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum(length(bin(col("ct") + 1)) - length(bin(col("cr") + 1)))
          .cast("long").as("sum_bits"),
        max(col("is_t")).as("is_t"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_feats"),
        (col("sum_bits") + col("n_feats") *
          (length(bin(col("nr_s"))) - length(bin(col("nt_s")))))
          .cast("long").as("logw_bits"),
        col("is_t"))
  }

  /** The selection step: top `k` raw-pool documents by importance weight
    * (weight desc, doc_id asc tiebreak — deterministic), excluding the
    * target exemplars themselves. The deterministic top-k variant of
    * DSIR's resampling; plans as TakeOrderedAndProject (per-partition
    * top-k, no global sort).
    */
  def selectTopK(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, k: Int, buckets: Int = 8192): DataFrame =
    weightsWithFlag(df, idCol, textCol, isTarget, buckets)
      .where(!coalesce(col("is_t"), lit(false)))
      .orderBy(desc("logw_bits"), col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("logw_bits"))
}
