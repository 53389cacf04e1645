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

  test("incremental append with replay equals a one-shot build") {
    val all = vecs(160, 8)
    val dir = Files.createTempDirectory("ivfinc").toFile.getAbsolutePath
    // seed build over the first 100 ids; the lowest-id codebook is the
    // same one a one-shot build over all 160 derives, so the two indexes
    // are comparable cell-for-cell
    CosineSearch.buildIvfIndex(all.where($"id" < 100), dir, nlist = 8)
    val b1 = all.where($"id" >= 100 && $"id" < 130)
    CosineSearch.appendIvfIndex(spark, dir, b1, batchId = Some(0L))
    // at-least-once replay of the same batch id must not duplicate
    CosineSearch.appendIvfIndex(spark, dir, b1, batchId = Some(0L))
    CosineSearch.appendIvfIndex(spark, dir, all.where($"id" >= 130),
      batchId = Some(1L))
    assert(spark.read.parquet(s"$dir/cells").count() === 160)

    val oneShot = Files.createTempDirectory("ivfone").toFile.getAbsolutePath
    CosineSearch.buildIvfIndex(all, oneShot, nlist = 8)
    val a = CosineSearch.searchIvfIndex(spark, dir, queries(all), 5, 3)
      .orderBy("qid", "rank").collect()
    val b = CosineSearch.searchIvfIndex(spark, oneShot, queries(all), 5, 3)
      .orderBy("qid", "rank").collect()
    assert(a.toSeq === b.toSeq)
    // the appended vectors are actually findable: a query ON one of them
    // returns itself-adjacent neighbors from the new id range
    val q150 = all.where($"id" === 150).select($"id".as("qid"), $"embedding")
    val got = CosineSearch.searchIvfIndex(spark, dir, q150, 3, 3).collect()
    assert(got.nonEmpty)
  }

  test("persisted ivf-pq index equals the inline search and stores no vectors") {
    import graft.operators.similarity.ProductQuant
    val c = vecs(120, 16)
    val corpus = c
    val dir = Files.createTempDirectory("ivfpq").toFile.getAbsolutePath
    ProductQuant.buildIvfPqIndex(c, dir, nlist = 8, m = 4, ksub = 8)
    val fromIndex = ProductQuant
      .searchIvfPqIndex(spark, dir, queries(c), corpus, k = 5, nprobe = 3)
      .orderBy("qid", "rank").collect()
    val inline = ProductQuant
      .ivfPqSearch(queries(c), c, k = 5, nlist = 8, nprobe = 3, m = 4, ksub = 8)
      .orderBy("qid", "rank").collect()
    assert(fromIndex.toSeq === inline.toSeq)
    assert(fromIndex.nonEmpty)
    // the 64×-smaller claim is structural: the stored rows are codes
    // only — no float vector column anywhere in the index
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.columns.toSet === Set("id", "codes", "cell"))
    // and the probe is a literal partition filter, like the IVF index
    val plan = ProductQuant
      .searchIvfPqIndex(spark, dir, queries(c), corpus, k = 5, nprobe = 2)
      .queryExecution.explainString(FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("cell") && l.contains("IN")),
      s"probe must push cell IN (...) to the scan:\n$plan")
  }

  test("ivf-pq incremental append with replay equals a one-shot build") {
    import graft.operators.similarity.ProductQuant
    val all = vecs(160, 16)
    val dir = Files.createTempDirectory("ivfpqinc").toFile.getAbsolutePath
    // seed build over the first 100 ids; both codebooks (coarse cells, PQ
    // sub-spaces) derive from the lowest-id rows, so a one-shot build
    // over all 160 trains identically and the indexes compare cell-for-cell
    ProductQuant.buildIvfPqIndex(all.where($"id" < 100), dir,
      nlist = 8, m = 4, ksub = 8)
    val b1 = all.where($"id" >= 100 && $"id" < 130)
    ProductQuant.appendIvfPqIndex(spark, dir, b1, batchId = Some(0L))
    // at-least-once replay of the same batch id must not double-append
    ProductQuant.appendIvfPqIndex(spark, dir, b1, batchId = Some(0L))
    ProductQuant.appendIvfPqIndex(spark, dir, all.where($"id" >= 130),
      batchId = Some(1L))
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.count() === 160)
    // appended rows round-trip the index schema: codes-only rows whose
    // arrays match the stored codebook's m, valid cell partition values
    assert(cells.columns.toSet === Set("id", "codes", "cell"))
    import org.apache.spark.sql.functions.{col, size => asize}
    assert(cells.where(asize(col("codes")) =!= 4).count() === 0)
    assert(cells.where(col("cell") < 0 || col("cell") >= 8).count() === 0)

    val oneShot = Files.createTempDirectory("ivfpqone").toFile.getAbsolutePath
    ProductQuant.buildIvfPqIndex(all, oneShot, nlist = 8, m = 4, ksub = 8)
    val a = ProductQuant.searchIvfPqIndex(spark, dir, queries(all), all,
      k = 5, nprobe = 3).orderBy("qid", "rank").collect()
    val b = ProductQuant.searchIvfPqIndex(spark, oneShot, queries(all), all,
      k = 5, nprobe = 3).orderBy("qid", "rank").collect()
    assert(a.toSeq === b.toSeq)
    // an appended vector is findable through the probe path
    val q150 = all.where($"id" === 150).select($"id".as("qid"), $"embedding")
    val got = ProductQuant.searchIvfPqIndex(spark, dir, q150, all,
      k = 3, nprobe = 3).collect()
    assert(got.nonEmpty)
  }

  test("a live stream keeps the ivf-pq index fresh via foreachBatch") {
    import graft.operators.similarity.ProductQuant
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = vecs(40, 16)
    val dir = Files.createTempDirectory("ivfpqstream").toFile.getAbsolutePath
    ProductQuant.buildIvfPqIndex(base, dir, nlist = 4, m = 4, ksub = 8)
    val in = MemoryStream[(Long, Array[Float])]
    val q = in.toDF().toDF("id", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        ProductQuant.appendIvfPqIndex(spark, dir, b, batchId = Some(id))
      }
      .option("checkpointLocation",
        Files.createTempDirectory("ivfpqck").toFile.getAbsolutePath)
      .start()
    try {
      in.addData((100L, Array.tabulate(16)(d => math.sin(100 * 31 + d * 7).toFloat)))
      q.processAllAvailable()
      in.addData((101L, Array.tabulate(16)(d => math.sin(101 * 31 + d * 7).toFloat)))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(s"$dir/cells").count() === 42)
  }

  test("a live stream keeps the index fresh via foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = vecs(40, 4)
    val dir = Files.createTempDirectory("ivfstream").toFile.getAbsolutePath
    CosineSearch.buildIvfIndex(base, dir, nlist = 4)
    val in = MemoryStream[(Long, Array[Float])]
    val q = in.toDF().toDF("id", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        CosineSearch.appendIvfIndex(spark, dir, b, batchId = Some(id))
      }
      .option("checkpointLocation",
        Files.createTempDirectory("ivfck").toFile.getAbsolutePath)
      .start()
    try {
      in.addData((100L, Array.tabulate(4)(d => math.sin(100 * 31 + d * 7).toFloat)))
      q.processAllAvailable()
      in.addData((101L, Array.tabulate(4)(d => math.sin(101 * 31 + d * 7).toFloat)))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(s"$dir/cells").count() === 42)
  }
}
