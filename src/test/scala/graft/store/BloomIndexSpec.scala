package graft.store

import java.sql.Timestamp
import java.time.Instant
import scala.jdk.CollectionConverters._
import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.functions._

/** The parquet half of the reference's skip indexes
  * (`common/schema/config.go:123-133`): `bloom(0.001)` columns must come
  * out of every store write as per-file parquet bloom filters, readable
  * from the footer, accepting present values and rejecting absent ones.
  *
  * Parquet only MATERIALIZES a bloom when a column chunk falls back from
  * dictionary encoding (a complete dictionary is already an exact filter
  * — the `set(0)` index, strictly stronger than any bloom, and the state
  * every low-cardinality column stays in). The spec shrinks
  * `parquet.dictionary.page.size` so its small fixture overflows the
  * dictionary the way a 256 MB production file of addresses does, which
  * is exactly the regime the bloom exists for.
  */
class BloomIndexSpec extends SparkSpec {

  private def mkFlows(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (Timestamp.from(Instant.parse("2024-03-01T00:00:00Z").plusSeconds(i * 5L)),
        s"exp${i % 2}", "eth0", "eth1", "up", "down", 1000L, 1000L,
        "transit", "peering", "p1", "p2", "external", "internal",
        64500L + (i % 97), 65000L + (i % 101), f"C${i % 70}%02d", f"D${i % 70}%02d",
        100L + i, 2L)
    }.toDF("TimeReceived", "ExporterName", "InIfName", "OutIfName",
      "InIfDescription", "OutIfDescription", "InIfSpeed", "OutIfSpeed",
      "InIfConnectivity", "OutIfConnectivity", "InIfProvider", "OutIfProvider",
      "InIfBoundary", "OutIfBoundary",
      "SrcAS", "DstAS", "SrcCountry", "DstCountry", "Bytes", "Packets")
      .withColumn("__i", col("Bytes") - 100L)
      .withColumn("SrcAddr", lastOctet("192.0.2.0", pmod(col("__i"), lit(100L))))
      .withColumn("DstAddr", lastOctet("198.51.100.0", pmod(col("__i"), lit(100L))))
      .withColumn("SrcPort", (lit(1024L) + pmod(col("__i"), lit(90L))).cast("long"))
      .withColumn("DstPort", (lit(2048L) + pmod(col("__i"), lit(110L))).cast("long"))
      .withColumn("ExporterAddress",
        lit(graft.functions.Ip.parse("10.0.0.1")))
      .drop("__i")
  }

  /** 16-byte v6-mapped address `base` with its last octet replaced by
    * `octet` (< 256) — per-row distinct binaries without a 22+ tuple.
    */
  private def lastOctet(base: String, octet: org.apache.spark.sql.Column) =
    concat(lit(graft.functions.Ip.parse(base).dropRight(1)),
      unhex(lpad(hex(octet), 2, "0")))

  test("store writes carry bloom filters on the reference's skip-index columns") {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = java.nio.file.Files.createTempDirectory("bloomstore").toString
    val store = new FlowStore(spark, root)
    conf.setInt("parquet.dictionary.page.size", 256)
    try store.writeBatch(mkFlows(400))
    finally conf.unset("parquet.dictionary.page.size")

    val fs = new Path(root).getFileSystem(conf)
    def parquetFiles(table: String) = fs.listStatus(new Path(s"$root/$table"))
      .filter(_.isDirectory)
      .flatMap(d => fs.listStatus(d.getPath))
      .map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    val files = parquetFiles("flows")
    assert(files.nonEmpty)

    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(files.head, conf))
    try {
      val block = reader.getFooter.getBlocks.get(0)
      val cols = block.getColumns.asScala.map(c => c.getPath.toDotString -> c).toMap
      val bfr = reader.getBloomFilterDataReader(block)

      for (c <- FlowStore.BloomColumns.keys) {
        val bloom = bfr.readBloomFilter(cols(c))
        assert(bloom != null, s"no bloom filter written for $c")
      }
      // non-indexed measures carry no bloom
      assert(bfr.readBloomFilter(cols("Bytes")) == null)

      // the SrcAddr bloom accepts the present address and rejects an
      // absent one (FPP 0.001 — one probe cannot plausibly false-positive)
      val bloom = bfr.readBloomFilter(cols("SrcAddr"))
      val present = Binary.fromConstantByteArray(
        graft.functions.Ip.parse("192.0.2.1"))
      val absent = Binary.fromConstantByteArray(
        graft.functions.Ip.parse("203.0.113.77"))
      assert(bloom.findHash(bloom.hash(present)))
      assert(!bloom.findHash(bloom.hash(absent)))

      // SrcAS (long column) behaves the same
      val asBloom = bfr.readBloomFilter(cols("SrcAS"))
      assert(asBloom.findHash(asBloom.hash(64501L)))
      assert(!asBloom.findHash(asBloom.hash(9999L)))

      // page-level column index on TimeReceived: the min/max-per-page
      // structure the time-clustered layout exists to feed — every
      // engine query's time-range predicate prunes at PAGE granularity,
      // below the row-group stats (ClickHouse's index_granularity analog)
      val ci = reader.readColumnIndex(cols("TimeReceived"))
      assert(ci != null && ci.getMinValues.size() > 0)
    } finally reader.close()

    // rollups keep the non-mainOnly dims (SrcAS yes, SrcPort no — it is
    // mainOnly and dropped by rollupDelta), hence those blooms
    val rollFiles = parquetFiles("flows_1h")
    val rr = ParquetFileReader.open(HadoopInputFile.fromPath(rollFiles.head, conf))
    try {
      val block = rr.getFooter.getBlocks.get(0)
      val cols = block.getColumns.asScala.map(c => c.getPath.toDotString -> c).toMap
      assert(rr.getBloomFilterDataReader(block).readBloomFilter(cols("SrcAS")) != null)
      assert(!cols.contains("SrcPort"))
    } finally rr.close()

    // and the indexed scan still answers correctly
    val got = spark.read.parquet(s"$root/flows")
      .filter(col("SrcAS") === 64501L).count()
    assert(got == mkFlows(400).filter(col("SrcAS") === 64501L).count())

    // INT64 timestamps make the time predicate actually PUSH: with the
    // INT96 session default it silently stays driver-side and no file,
    // row group, or page ever prunes on time
    val q = spark.read.parquet(s"$root/flows")
      .filter(col("TimeReceived") >=
        java.sql.Timestamp.from(Instant.parse("2024-03-01T00:10:00Z")))
    val scan = q.queryExecution.executedPlan.toString
    val pushed = scan.linesIterator.find(_.contains("PushedFilters"))
    assert(pushed.exists(_.contains("TimeReceived")),
      s"time predicate not pushed to parquet:\n$scan")
  }

  test("a low-cardinality chunk stays fully dictionary-encoded (the set-index state)") {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = java.nio.file.Files.createTempDirectory("bloomdict").toString
    new FlowStore(spark, root).writeBatch(mkFlows(400))
    val fs = new Path(root).getFileSystem(conf)
    val file = fs.listStatus(new Path(s"$root/flows"))
      .filter(_.isDirectory).flatMap(d => fs.listStatus(d.getPath))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val block = reader.getFooter.getBlocks.get(0)
      val cc = block.getColumns.asScala
        .find(_.getPath.toDotString == "SrcCountry").get
      // 70 countries fit the default 1 MB dictionary: equality pruning
      // comes from the dictionary page itself, so parquet (correctly)
      // drops the redundant bloom
      assert(cc.hasDictionaryPage)
      assert(reader.getBloomFilterDataReader(block).readBloomFilter(cc) == null)
    } finally reader.close()
  }
}
