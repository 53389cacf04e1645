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

  /** Per-permutation minima over a pre-materialized hash-array column.
    * IMPORTANT: `hashesCol` must be a bound column (not an inline
    * expression) — each of the k min-expressions references it, and an
    * inline tree would be duplicated k× (codegen blowup, interpreted
    * fallback).
    */
  private def minhashFromHashes(hashesCol: Column, k: Int, seed: Long): Column = {
    val params = hashParams(k, seed)
    array(params.map { case (a, b) =>
      array_min(transform(hashesCol, h => pmod(h * a + b, lit(P))))
    }: _*)
  }

  def minhashSignature(shingleSet: Column, k: Int = 128, seed: Long = 42L): Column =
    minhashFromHashes(transform(shingleSet, s => pmod(xxhash64(s), lit(P))), k, seed)

  /** MinHash+LSH near-dup pairs: band the k-wide signature into
    * `bands` groups, bucket-join on (band, band-hash), then verify
    * candidates with exact Jaccard. Only same-bucket docs ever meet —
    * the join volume is bounded by bucket sizes, independent of n².
    * The pipeline is staged into separate projections so shingles and
    * hashes are computed exactly once per document.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 128, bands: Int = 32,
      seed: Long = 42L): DataFrame = {
    val rows = k / bands
    val shingled = df
      .select(col(idCol).as("id"), TextAnalysis.shingles(col(textCol)).as("sh"))
      .where(size(col("sh")) > 0)
    val hashed = shingled
      .select(col("id"), col("sh"),
        transform(col("sh"), s => pmod(xxhash64(s), lit(P))).as("hashes"))
    val withSig = hashed
      .select(col("id"), col("sh"),
        minhashFromHashes(col("hashes"), k, seed).as("sig"))
    val banded = withSig.select(col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"), xxhash64(concat_ws("_",
          slice(col("sig"), b * rows + 1, lit(rows)))).as("bh")))).as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bh"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.sh").as("sh_a"),
        col("b.id").as("id_b"), col("b.sh").as("sh_b"))
      .distinct()
    // verify: exact Jaccard on the carried shingle sets
    val common = size(array_intersect(col("sh_a"), col("sh_b")))
    val jac = common * lit(1.0) / (size(col("sh_a")) + size(col("sh_b")) - common)
    cand
      .select(col("id_a"), col("id_b"), common.as("common"),
        round(jac * 1000).cast("long").as("jaccard_pm"),
        (jac >= threshold).as("keep"))
      .where(col("keep"))
      .select("id_a", "id_b", "jaccard_pm")
  }

  /** 64-bit SimHash from a pre-materialized hash-array column (see
    * [[minhashFromHashes]] for why the input must be a bound column).
    */
  def simhashFromHashes(hashesCol: Column): Column = {
    val bits = (0 until 64).map { j =>
      val vote = aggregate(hashesCol, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** 64-bit SimHash over a token/shingle set column. */
  def simhash(tokenSet: Column): Column =
    simhashFromHashes(transform(tokenSet, t => xxhash64(t)))

  /** SimHash near-dup pairs with banded Hamming blocking: 4×16-bit chunks;
    * pairs agreeing on ≥1 chunk are candidates (catches all pairs with
    * Hamming distance ≤ 3), verified by exact bit_count. Uses 3-gram
    * shingles (token sets from a small vocabulary make every document
    * collide, degenerating the blocking join to n²).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSim = df
      .select(col(idCol).as("id"),
        transform(TextAnalysis.shingles(col(textCol)),
          t => xxhash64(t)).as("hashes"))
      .select(col("id"), simhashFromHashes(col("hashes")).as("sh"))
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
