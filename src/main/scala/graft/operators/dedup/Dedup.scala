package graft.operators.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.text.TextAnalysis

/** Deduplication operators for corpus pipelines, scale-first:
  *
  *  - exact: hash-groupBy (one shuffle on a 16-byte key, not the payload);
  *  - n-gram Jaccard: shingle inverted index → pair counting (shuffles
  *    scale with shingle collisions, not n²);
  *  - MinHash+LSH: constant-size signatures, banded bucketing, candidate
  *    verification — the 100 TB path where full pair joins are impossible;
  *  - SimHash: 64-bit sketch with banded Hamming blocking.
  */
object Dedup {

  /** Exact duplicate groups by content hash: (hash, dup_count, keeper).
    * Keeper = min id (stable). Only the hash and id shuffle.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("content_hash"), col(idCol).as("id"))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("dup_count"), min("id").as("keeper"))

  /** (id, shingle) inverted index, distinct per doc. */
  private def shingleIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      explode(TextAnalysis.shingles(col(textCol))).as("s"))

  /** Exact word-3-gram Jaccard over all pairs sharing ≥1 shingle.
    * Returns (id_a, id_b, common, jaccard_pm) for pairs ≥ threshold.
    * Pair generation is an equi-join on the shingle — cost is Σ c_s² over
    * shingle frequencies, not n² (salt/stop-shingle cap via `maxShingleDf`).
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxShingleDf: Option[Int] = None): DataFrame = {
    val idx = shingleIndex(df, idCol, textCol)
    // document-frequency cap: drop degenerate stop-shingles (scale guard)
    val filtered = maxShingleDf match {
      case Some(cap) =>
        val hot = idx.groupBy("s").agg(count(lit(1)).as("df"))
          .where(col("df") > cap).select("s")
        idx.join(broadcast(hot), Seq("s"), "left_anti")
      case None => idx
    }
    val sizes = filtered.groupBy("id").agg(count(lit(1)).as("n"))
    val pairs = filtered.as("a")
      .join(filtered.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    val jac = col("common") * lit(1.0) /
      (col("na.n") + col("nb.n") - col("common"))
    pairs
      .join(sizes.as("na"), col("id_a") === col("na.id"))
      .join(sizes.as("nb"), col("id_b") === col("nb.id"))
      .where(jac >= threshold)
      .select(col("id_a"), col("id_b"), col("common"),
        round(jac * 1000).cast("long").as("jaccard_pm"))
  }

  /** MinHash signature: k hash functions h_i(x) = (a_i·x + b_i) mod p over
    * xxhash64 token/shingle hashes. Seeded — deterministic across runs.
    * p = 2³¹−1 keeps every product below 2⁶² (no ANSI long overflow).
    */
  private val P = (1L << 31) - 1

  private def hashParams(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((math.abs(rnd.nextLong()) % (P - 1) + 1, math.abs(rnd.nextLong()) % P))
  }

  def minhashSignature(shingleSet: Column, k: Int = 128, seed: Long = 42L): Column = {
    val params = hashParams(k, seed)
    val hashes = transform(shingleSet, s => pmod(xxhash64(s), lit(P)))
    array(params.map { case (a, b) =>
      array_min(transform(hashes, h => pmod(h * a + b, lit(P))))
    }: _*)
  }

  /** MinHash+LSH near-dup pairs: band the k-wide signature into
    * `bands` groups, bucket-join on (band, band-hash), then verify
    * candidates with exact Jaccard. Only same-bucket docs ever meet —
    * the join volume is bounded by bucket sizes, independent of n².
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 128, bands: Int = 32,
      seed: Long = 42L): DataFrame = {
    val rows = k / bands
    val withSig = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", minhashSignature(TextAnalysis.shingles(col("text")), k, seed))
      .where(size(TextAnalysis.shingles(col("text"))) > 0)
    val banded = withSig.select(col("id"), col("text"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"), xxhash64(concat_ws("_",
          slice(col("sig"), b * rows + 1, lit(rows)))).as("bh")))).as("bb"))
      .select(col("id"), col("text"), col("bb.band"), col("bb.bh"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.text").as("text_a"),
        col("b.id").as("id_b"), col("b.text").as("text_b"))
      .distinct()
    // verify: exact Jaccard on the candidate pair's shingle sets
    val sa = TextAnalysis.shingles(col("text_a"))
    val sb = TextAnalysis.shingles(col("text_b"))
    val common = size(array_intersect(sa, sb))
    val jac = common * lit(1.0) / (size(sa) + size(sb) - common)
    cand.where(jac >= threshold)
      .select(col("id_a"), col("id_b"),
        round(jac * 1000).cast("long").as("jaccard_pm"))
  }

  /** 64-bit SimHash over token xxhash64 values: per-bit majority vote. */
  def simhash(tokenSet: Column): Column = {
    val hashes = transform(tokenSet, t => xxhash64(t))
    val bits = (0 until 64).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-dup pairs with banded Hamming blocking: 4×16-bit chunks;
    * pairs agreeing on ≥1 chunk are candidates (catches all pairs with
    * Hamming distance ≤ 3), verified by exact bit_count.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSim = df.select(col(idCol).as("id"),
      simhash(TextAnalysis.tokens(col(textCol))).as("sh"))
    val chunked = withSim.select(col("id"), col("sh"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sh"), c * 16).bitwiseAND(lit(0xffffL)).as("cv"))): _*))
        .as("cc"))
      .select(col("id"), col("sh"), col("cc.chunk"), col("cc.cv"))
    val dist = bit_count(col("a.sh").bitwiseXOR(col("b.sh")))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        dist.as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-duplicate pairs via the similarity module's
    * LSH buckets; see [[graft.operators.similarity.CosineSearch]].
    */
}
