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

  /** Cosine argmax cell assignment against fixed centroids. Similarity is
    * quantized to 1e-6 with ties broken by the lower cell id, so
    * assignments are deterministic and engine-portable.
    */
  def assign(corpus: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "id", embCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty)
    val centNorms = centroids.map(c => math.sqrt(c.map(x => x * x).sum))
    val v = col(embCol).cast("array<double>")
    val vn = sqrt(Sketches.dotProduct(v, v))
    // (−sim_e6, cell) structs sort ascending → best cell first; the row's
    // own norm divides out of the argmax but is kept so sim_e6 is a true
    // quantized cosine (portable across engines)
    val ranked = sort_array(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(
        (-round(Sketches.dotProduct(v, typedLit(c.toSeq)) /
          (vn * centNorms(i)) * 1e6)).cast("long").as("negSim"),
        lit(i).as("cell"))
    }.toIndexedSeq: _*))
    corpus.select(col(idCol).as("id"),
      element_at(ranked, 1).getField("cell").as("cell"),
      (-element_at(ranked, 1).getField("negSim")).as("sim_e6"))
  }

  /** One Lloyd update: mean vector per cell of the current assignment.
    * Returns the new centroids (cells losing every member keep their old
    * centroid). The aggregation is (cell, dim)-keyed — k·dim result rows.
    */
  def lloydStep(corpus: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "id", embCol: String = "embedding"): Array[Array[Double]] = {
    val assigned = assign(corpus, centroids, idCol, embCol)
      .join(corpus.select(col(idCol).as("id"),
        col(embCol).cast("array<double>").as("v")), Seq("id"))
    val means = assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg("x").as("m"))
      .collect()
    val next = centroids.map(_.clone())
    means.foreach { r =>
      next(r.getAs[Int]("cell"))(r.getAs[Int]("pos")) = r.getAs[Double]("m")
    }
    next
  }

  /** Runs `iters` Lloyd iterations from deterministic seeds (the k
    * lowest-id vectors). Returns (centroids, final assignment).
    */
  def fit(corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "id", embCol: String = "embedding")
      : (Array[Array[Double]], DataFrame) = {
    var cents: Array[Array[Double]] = corpus.orderBy(col(idCol)).limit(k)
      .select(col(embCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    (0 until iters).foreach { _ =>
      cents = lloydStep(corpus, cents, idCol, embCol)
    }
    (cents, assign(corpus, cents, idCol, embCol))
  }
}
