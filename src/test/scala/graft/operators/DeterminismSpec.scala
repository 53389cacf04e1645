package graft.operators

import graft.SparkSpec
import graft.operators.similarity.Sampling
import graft.operators.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioning-independence regression: every sampling/ordering operator
  * documented as "deterministic across runs, engines, and partitionings"
  * must produce IDENTICAL rows whether the input arrives as one partition
  * or many — the property that makes re-runs, backfills, and
  * cluster-size changes reproducible at 100 TB. A hidden dependence on
  * `spark_partition_id`/`monotonically_increasing_id`/input order would
  * pass single-run specs and silently break reproducibility.
  */
class DeterminismSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: DataFrame =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def samePartitioned(f: DataFrame => DataFrame): Unit = {
    val one = rows(f(docs.repartition(1)))
    val many = rows(f(docs.repartition(13)))
    assert(one == many, s"partitioning changed the result: " +
      s"${(one diff many).take(3)} vs ${(many diff one).take(3)}")
    assert(one.nonEmpty)
  }

  test("shuffle shards are partitioning-independent") {
    samePartitioned(d =>
      Sampling.shuffleShards(d.select("doc_id"), col("doc_id"), "e1"))
  }

  test("token budget keeps the same rows under any partitioning") {
    samePartitioned(d => Sampling.tokenBudget(
      d.select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("toks")),
      col("source"), col("doc_id"), col("toks"), budget = 1000L, salt = "s"))
  }

  test("per-group reservoir picks the same rows under any partitioning") {
    samePartitioned(d => Sampling.reservoirPerGroup(
      d.select("doc_id", "source"), col("source"),
      col("doc_id").cast("string"), k = 5))
  }

  test("mixture copies and weighted keep are pure row functions") {
    samePartitioned(d => d.select(col("doc_id"),
      Sampling.mixtureCopies(col("doc_id"), col("source"),
        Map("src1" -> 2500000L, "src2" -> 300000L)).as("copies"),
      Sampling.weightedKeep(col("doc_id"), lit(400000L), "w").as("keep")))
  }

  test("train/eval split is content-only") {
    samePartitioned(d => d.select(col("doc_id"),
      TextAnalysis.splitLabel(col("text")).as("split")))
  }
}

/** Partitioning-independence for the decode pipeline: datagrams arriving
  * in any partitioning (and any within-partition order — the group
  * function sorts by seq) must decode to identical flow sets.
  */
class DecodeDeterminismSpec extends SparkSpec {
  import graft.decode._
  import graft.functions.Ip
  import spark.implicits._

  test("decode yields identical flows under any envelope partitioning") {
    val src = Ip.parse("127.0.0.1")
    val envs = Seq("options-template", "options-data", "template", "data")
      .zipWithIndex.flatMap { case (n, i) =>
        Pcap.datagrams(Pcap.readResource(s"/graft/pcap/$n.pcap"))
          .zipWithIndex.map { case (d, j) =>
            DecodePipeline.envelope(i.toLong * 10 + j, RawFlow.encode(RawFlow(
              timeReceived = d.tsSec, payload = d.payload, sourceAddress = src,
              decoder = RawFlow.DecoderNetflow)))
          }
      }
    def run(parts: Int): Set[String] =
      DecodePipeline.decode(
        spark.createDataset(scala.util.Random.javaRandomToRandom(
          new java.util.Random(parts)).shuffle(envs)).repartition(parts))
        .collect().map(f => f.copy(ExporterAddress = null, SrcAddr = null,
          DstAddr = null, NextHop = null, SrcAddrNAT = null, DstAddrNAT = null)
          .toString + graft.functions.Ip.render(f.SrcAddr)).toSet
    val one = run(1)
    val many = run(13)
    assert(one == many && one.size == 4)
  }
}
