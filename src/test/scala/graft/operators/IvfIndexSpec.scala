package graft.operators

import graft.SparkSpec
import graft.operators.similarity.CosineSearch
import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.Files

/** Persisted IVF index: search-from-index equals the inline operator
  * bit-for-bit, and the probe reads only the probed cells (partition
  * pruning), which is the point of materializing the index.
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int) =
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(d => math.sin(i * 31 + d * 7).toFloat))
    }.toDF("id", "embedding")

  private def queries(c: org.apache.spark.sql.DataFrame) =
    c.where($"id" < 5).select($"id".as("qid"), $"embedding")

  test("index search returns exactly the inline ivfTopK rows") {
    val c = vecs(120, 8)
    val dir = Files.createTempDirectory("ivf").toFile.getAbsolutePath
    CosineSearch.buildIvfIndex(c, dir, nlist = 8)
    val fromIndex = CosineSearch
      .searchIvfIndex(spark, dir, queries(c), k = 5, nprobe = 3)
      .orderBy("qid", "rank").collect()
    val inline = CosineSearch
      .ivfTopK(queries(c), c, k = 5, nlist = 8, nprobe = 3)
      .orderBy("qid", "rank").collect()
    assert(fromIndex.toSeq === inline.toSeq)
    assert(fromIndex.nonEmpty)
  }

  test("the probe plans a literal partition filter on cell") {
    val c = vecs(120, 8)
    val dir = Files.createTempDirectory("ivf").toFile.getAbsolutePath
    CosineSearch.buildIvfIndex(c, dir, nlist = 8)
    val plan = CosineSearch
      .searchIvfIndex(spark, dir, queries(c), k = 5, nprobe = 2)
      .queryExecution.explainString(FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.nonEmpty, s"expected a partitioned scan:\n$plan")
    assert(pf.exists(l => l.contains("cell") && l.contains("IN")),
      s"probe must push cell IN (...) to the scan:\n$plan")
  }

  test("a trained codebook round-trips through the stored index") {
    val c = vecs(60, 4)
    val cb = Array(
      Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0), Array(0.0, 0.0, 0.0, 1.0))
    val dir = Files.createTempDirectory("ivf").toFile.getAbsolutePath
    CosineSearch.buildIvfIndex(c, dir, nlist = 4, codebook = Some(cb))
    val fromIndex = CosineSearch
      .searchIvfIndex(spark, dir, queries(c), k = 3, nprobe = 2)
      .orderBy("qid", "rank").collect()
    val inline = CosineSearch
      .ivfTopK(queries(c), c, k = 3, nlist = 4, nprobe = 2, codebook = Some(cb))
      .orderBy("qid", "rank").collect()
    assert(fromIndex.toSeq === inline.toSeq)
  }
}
