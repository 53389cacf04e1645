package graft.operators

import graft.SparkSpec
import graft.operators.pack.ExportManifest
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sharded export + manifest: round-trip verification and the
  * stability/determinism properties a release consumer relies on.
  */
class ExportManifestSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, s"doc number $i content")).toDF("doc_id", "text")

  test("writeSharded round-trips: re-derived manifest matches exactly") {
    val dir = Files.createTempDirectory("manifest").toFile.getAbsolutePath
    val df = corpus(200)
    val written = ExportManifest.writeSharded(df, "doc_id", "text", 8, dir)
      .orderBy("shard").collect()
    // consumer side: re-read the files, recompute the manifest
    val readBack = spark.read.parquet(dir).drop("shard")
    val rederived = ExportManifest.manifest(readBack, "doc_id", "text", 8)
      .orderBy("shard").collect()
    assert(written.toSeq === rederived.toSeq)
    // every doc landed in exactly one shard
    assert(readBack.count() === 200)
    assert(readBack.select("doc_id").distinct().count() === 200)
  }

  test("shard assignment is stable under corpus growth") {
    val before = corpus(100)
      .select(col("doc_id"), ExportManifest.shardOf(col("doc_id"), 8).as("s"))
      .as[(Long, Int)].collect().toMap
    val after = corpus(300)
      .select(col("doc_id"), ExportManifest.shardOf(col("doc_id"), 8).as("s"))
      .as[(Long, Int)].collect().toMap
    before.foreach { case (id, s) => assert(after(id) === s) }
  }

  test("checksum is order-insensitive but content-sensitive") {
    val base = ExportManifest.manifest(corpus(50), "doc_id", "text", 4)
      .select("shard", "checksum").as[(Int, Long)].collect().toMap
    val shuffled = ExportManifest.manifest(
      corpus(50).orderBy(rand(7)).repartition(13), "doc_id", "text", 4)
      .select("shard", "checksum").as[(Int, Long)].collect().toMap
    assert(base === shuffled)
    val tampered = ExportManifest.manifest(
      corpus(50).withColumn("text",
        when(col("doc_id") === 17L, lit("tampered")).otherwise(col("text"))),
      "doc_id", "text", 4)
      .select("shard", "checksum").as[(Int, Long)].collect().toMap
    assert(base !== tampered)
  }
}
