package graft.operators.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.Sketches

/** Distributed k-means over an embedding column — the codebook trainer
  * behind IVF cells ([[CosineSearch.ivfTopK]]) and embedding-space corpus
  * bucketing.
  *
  * Scale shape (Lloyd's algorithm, Spark-first): centroids are a k×dim
  * literal carried in the task closure (k·dim doubles — kilobytes), the
  * assignment step is one codegen'd projection over the corpus (argmax of
  * k dot products, no join, no shuffle), and the update step is one
  * partial-aggregated groupBy(cell, dim) shuffle of k·dim rows per
  * partition. The corpus is scanned once per iteration and never moves.
  */
object KMeans {

  /** The cosine-argmax cell expression over an `array<double>` vector
    * column: similarity quantized to 1e-6 with ties broken by the lower
    * cell id, so assignments are deterministic and engine-portable.
    * Returns the winning (negSim, cell) struct.
    *
    * The denominator is floored at 1e-12: a zero-norm vector (or all-zero
    * centroid) has dot product 0 against everything, so the guarded ratio
    * is exactly 0 for every cell and the id tiebreak assigns it to cell 0
    * deterministically — instead of NaN similarity casting to 0 and
    * outranking negative-cosine cells arbitrarily.
    */
  private def bestCell(v: org.apache.spark.sql.Column,
      centroids: Array[Array[Double]]): org.apache.spark.sql.Column = {
    val centNorms = centroids.map(c => math.sqrt(c.map(x => x * x).sum))
    val vn = sqrt(Sketches.dotProduct(v, v))
    // (−sim_e6, cell) structs sort ascending → best cell first
    element_at(sort_array(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(
        (-round(Sketches.dotProduct(v, typedLit(c.toSeq)) /
          greatest(vn * centNorms(i), lit(1e-12)) * 1e6)).cast("long").as("negSim"),
        lit(i).as("cell"))
    }.toIndexedSeq: _*)), 1)
  }

  /** Adds the cosine-argmax `cell` column while keeping every input
    * column — the projection-only assignment used when downstream work
    * needs the vector alongside its cell (e.g. [[SemDedup]]'s intra-cell
    * prune). No join, no shuffle: the centroids ride the task closure.
    */
  def withCell(corpus: DataFrame, centroids: Array[Array[Double]],
      embCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty)
    corpus.withColumn("cell",
      bestCell(col(embCol).cast("array<double>"), centroids).getField("cell"))
  }

  /** Cosine argmax cell assignment against fixed centroids. */
  def assign(corpus: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "id", embCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty)
    val best = bestCell(col(embCol).cast("array<double>"), centroids)
    corpus.select(col(idCol).as("id"),
      best.getField("cell").as("cell"),
      (-best.getField("negSim")).as("sim_e6"))
  }

  /** One Lloyd update: mean vector per cell of the current assignment.
    * Returns the new centroids (cells losing every member keep their old
    * centroid). One corpus scan — assignment and vector ride the same
    * projection (no join) — then a (cell, dim)-keyed aggregation of
    * k·dim result rows.
    */
  def lloydStep(corpus: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "id", embCol: String = "embedding"): Array[Array[Double]] = {
    val v = col(embCol).cast("array<double>")
    val means = corpus
      .select(bestCell(v, centroids).getField("cell").as("cell"), v.as("v"))
      .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg("x").as("m"))
      .collect()
    val next = centroids.map(_.clone())
    means.foreach { r =>
      next(r.getAs[Int]("cell"))(r.getAs[Int]("pos")) = r.getAs[Double]("m")
    }
    next
  }

  /** Deterministic seed centroids: the k lowest-id vectors. */
  def seedCentroids(corpus: DataFrame, k: Int, idCol: String = "id",
      embCol: String = "embedding"): Array[Array[Double]] =
    corpus.orderBy(col(idCol)).limit(k)
      .select(col(embCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)

  /** Runs `iters` Lloyd iterations from deterministic seeds (the k
    * lowest-id vectors). Returns (centroids, final assignment).
    */
  def fit(corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "id", embCol: String = "embedding")
      : (Array[Array[Double]], DataFrame) = {
    var cents = seedCentroids(corpus, k, idCol, embCol)
    (0 until iters).foreach { _ =>
      cents = lloydStep(corpus, cents, idCol, embCol)
    }
    (cents, assign(corpus, cents, idCol, embCol))
  }
}
