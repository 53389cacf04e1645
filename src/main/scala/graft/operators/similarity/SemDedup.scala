package graft.operators.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.Sketches

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540, public): partition the embedding space with a
  * k-means codebook, then detect near-identical pairs INSIDE each cell
  * only, keeping the lowest-id member of every near-dup relation. The
  * cluster bound is the whole trick — pair work drops from O(n²) to
  * Σ cellsize², and the codebook k is the knob that trades recall
  * (cross-cell dups are missed by design) against cost.
  *
  * Scale shape: assignment is a projection (centroids ride the task
  * closure — no join), so the only shuffle is the intra-cell self-join
  * keyed on `cell`. At production scale k is chosen so cells hold
  * O(10³–10⁴) vectors (k ≈ n / target-cell-size, tens of thousands of
  * cells for a billion-row corpus) — partitions stay balanced and AQE's
  * skew split covers stragglers. The 8-cell default in the oracle query
  * is the correctness-scale setting, not the production one.
  *
  * Norms are computed once per row below the join ([[CosineSearch]]'s
  * hoisting pattern); per-pair work is one codegen'd dot product.
  */
object SemDedup {

  /** Flags every vector that has a LOWER-id neighbor in its cell with
    * cosine similarity ≥ threshold — those rows are the purge set; the
    * unflagged rows are the SemDeDup survivors (every near-dup relation
    * keeps its lowest id, the exact-dedup keeper convention).
    *
    * @return (dup_id, cell, near_id, sim_e6): the flagged vector, its
    *         cell, its lowest-id above-threshold neighbor, and that
    *         pair's similarity — deterministic (near_id is unique per
    *         dup_id), so an SQL oracle reproduces rows exactly
    */
  def dupCandidates(corpus: DataFrame, centroids: Array[Array[Double]],
      thresholdE6: Long, idCol: String = "id",
      embCol: String = "embedding"): DataFrame = {
    val v = col(embCol).cast("array<double>")
    // query-scoped persist: both sides of the intra-cell self-join read
    // this projection — without it the corpus is scanned and the k-means
    // assignment recomputed twice (the simhashPairs hoisting pattern)
    val cells = graft.ScratchCache.persist(KMeans.withCell(
        corpus.select(col(idCol).cast("long").as("id"), col(embCol)),
        centroids, embCol)
      .select(col("id"), col("cell"), v.as("v"),
        sqrt(Sketches.dotProduct(v, v)).as("vn")))

    val a = cells.select(col("cell"), col("id").as("id_a"),
      col("v").as("qv"), col("vn").as("qv_n"))
    val b = cells.select(col("cell"), col("id").as("dup_id"),
      col("v").as("cv"), col("vn").as("cv_n"))
    // same FP ops as CosineSearch.exactPairs: dot / (norm · norm), e6-quantized
    val simE6 = round(Sketches.dotProduct(col("qv"), col("cv")) /
      (col("qv_n") * col("cv_n")) * 1e6).cast("long")

    val pairs = a.join(b, Seq("cell"))
      .where(col("id_a") < col("dup_id"))
      .select(col("dup_id"), col("cell"), col("id_a"), simE6.as("sim_e6"))
      .where(col("sim_e6") >= thresholdE6)

    // one row per duplicate: its lowest-id qualifying neighbor (the
    // window shares the pair shuffle's cell partitioning upstream; the
    // dup_id repartition is k rows per dup, tiny by construction)
    val w = Window.partitionBy("dup_id").orderBy("id_a")
    pairs.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("dup_id"), col("cell"), col("id_a").as("near_id"),
        col("sim_e6"))
  }

  /** The survivor view: the corpus minus [[dupCandidates]] (left-anti on
    * the id) — the actual "shrink the corpus" step.
    */
  def survivors(corpus: DataFrame, centroids: Array[Array[Double]],
      thresholdE6: Long, idCol: String = "id",
      embCol: String = "embedding"): DataFrame =
    corpus.join(
      dupCandidates(corpus, centroids, thresholdE6, idCol, embCol)
        .select(col("dup_id").as(idCol)),
      Seq(idCol), "left_anti")
}
