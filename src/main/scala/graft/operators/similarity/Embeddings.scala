package graft.operators.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding storage transforms for large corpora.
  *
  * Int8 scalar quantization: per-vector symmetric scale (max-abs / 127),
  * 4× smaller storage and memory-bandwidth-bound scans at 100 TB; the
  * scale column rides along so dot products dequantize on the fly
  * (`dot(q_a, q_b) · scale_a · scale_b`). All expressions are pure
  * `Column` math — deterministic across engines.
  */
object Embeddings {

  /** Per-vector symmetric quantization scale: max|x| / 127. */
  def int8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x))) / 127.0

  /** Quantized vector: round(x / scale) ∈ [-127, 127] (int). */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x => round(x / scale).cast("int"))

  /** Dequantized vector. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x * scale)

  /** Total absolute reconstruction error of the int8 round trip. */
  def reconstructionError(v: Column, scale: Column): Column =
    aggregate(
      zip_with(v, dequantize(quantizeInt8(v, scale), scale),
        (x, y) => abs(x - y)),
      lit(0.0), (acc, e) => acc + e)
}

/** Deterministic per-stratum sampling: the first hex nibble of the
  * content hash buckets every row into 16 stable slots, and each stratum
  * keeps `rate16/16` of its rows. Content-hash based — stable across
  * runs, engines, and partitionings (the class-balancing companion of the
  * train/eval split).
  */
object Sampling {

  /** Keep predicate: hash-nibble(key) < rate16(stratum), default
    * `defaultRate16` for unlisted strata. Rates are sixteenths.
    */
  def stratifiedKeep(key: Column, stratum: Column,
      rates16: Map[String, Int], defaultRate16: Int = 16): Column = {
    val nibble =
      graft.expressions.PortableHash.md5Prefix(key, 1).cast("int")
    rates16.foldLeft(when(lit(false), lit(false))) { case (acc, (s, r)) =>
      acc.when(stratum === s, nibble < r)
    }.otherwise(nibble < defaultRate16)
  }

  /** Deterministic per-stratum reservoir: exactly min(k, |stratum|) rows
    * per group, selected by content-hash order — the balanced-subsample
    * step of corpus construction, reproducible across runs, engines, and
    * partitionings (unlike a seeded random reservoir, whose output depends
    * on row order). One shuffle keyed by the stratum; `WindowGroupLimit`
    * caps each group's rows before the exchange at scale.
    *
    * @return the input rows that survive, plus a `sample_rank` column
    */
  def reservoirPerGroup(df: org.apache.spark.sql.DataFrame, stratum: Column,
      key: Column, k: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(md5(key), key)
    df.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
  }

  /** Deterministic corpus shuffle for training export: every row gets a
    * stable (shard, pos) — shard from the first `hexChars` nibbles of the
    * salted content hash (16^hexChars shards), pos by hash order within
    * the shard. (shard asc, pos asc) is a total order that needs NO
    * global sort: the shard assignment is a projection and the in-shard
    * ranking is a window partitioned by shard, so every shard ranks in
    * parallel and a writer emits one file per shard. Re-salting reshuffles
    * the corpus reproducibly (epoch = salt), independent of input
    * partitioning or engine.
    *
    * Sizing: each shard's rows sort within ONE task (spillable, but slow
    * past executor memory) — pick `hexChars` so corpus/16^hexChars fits a
    * task comfortably: 2 (256 shards) to the low-TB corpus range, 4 (65k
    * shards) for ~100 TB, up to 8 (4B shards).
    */
  def shuffleShards(df: org.apache.spark.sql.DataFrame, key: Column,
      salt: String, hexChars: Int = 2): org.apache.spark.sql.DataFrame = {
    require(hexChars >= 1 && hexChars <= 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_shuffle_h"), key)
    df.withColumn("_shuffle_h", md5(concat(key.cast("string"), lit(salt))))
      .withColumn("shard",
        conv(substring(col("_shuffle_h"), 1, hexChars), 16, 10).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_shuffle_h")
  }

  /** Deterministic token-budget sampling per stratum (the "N tokens per
    * domain" step of training-mix construction): each stratum's rows are
    * taken in salted-content-hash order until the stratum's running token
    * total reaches the budget. The greedy boundary rule is
    * "starts-before-budget": a row is kept iff the tokens BEFORE it are
    * under the budget, so the last kept row may overshoot (and every
    * stratum with any rows keeps at least one — a budget smaller than one
    * document still samples it rather than silently dropping the domain).
    *
    * Integer window cumsum in hash order — deterministic across runs,
    * engines, and partitionings; re-salting redraws the sample (epoch =
    * salt). One shuffle keyed by the stratum; the running sum is a window
    * over each stratum partition.
    *
    * @return surviving rows plus `cum_toks` (running total INCLUDING the
    *         row, in hash order)
    */
  def tokenBudget(df: org.apache.spark.sql.DataFrame, stratum: Column,
      key: Column, tokens: Column, budget: Long,
      salt: String = ""): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum)
      .orderBy(md5(concat(key.cast("string"), lit(salt))), key)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("cum_toks", sum(tokens.cast("long")).over(w))
      .where(col("cum_toks") - tokens.cast("long") < budget)
  }

  /** Deterministic PER-ROW Bernoulli keep with probability `weightPpm/1e6`
    * — quality-weighted downsampling (keep good documents with high
    * probability, noisy ones with low) where [[mixtureCopies]] weights
    * whole strata. Same integer construction: the row's salted content
    * hash yields a 24-bit slice `h`, and the row survives iff
    * `h·1e6 < weightPpm·2²⁴` (cross-multiplied — no floats anywhere, so
    * an SQL oracle reproduces every keep decision bit-exactly).
    * Deterministic across runs, engines, and partitionings; re-salting
    * redraws (epoch = salt). Pure projection — no shuffle.
    */
  def weightedKeep(key: Column, weightPpm: Column, salt: String = ""): Column = {
    val h = graft.expressions.PortableHash.md5Prefix(
      concat(key.cast("string"), lit(salt)), 6)
    h * 1000000L < weightPpm.cast("long") * 16777216L
  }

  /** Deterministic mixture weighting (data mixing): how many copies of a
    * row its stratum's weight produces. A weight of `w` ppm (1e6 = keep
    * exactly once) yields `floor(w/1e6)` guaranteed copies plus one more
    * when the row's salted content hash falls below the fractional part —
    * so a 2.3e6-ppm stratum is up-sampled 2.3× in expectation with a
    * per-row choice that is deterministic across runs, engines, and
    * partitionings. Weights < 1e6 down-sample the same way. All the
    * arithmetic is integer (24-bit hash slice vs ppm threshold), so an SQL
    * oracle reproduces it bit-exactly. Re-salting redraws the fractional
    * choices (epoch = salt). Pure projection — no shuffle; pair with
    * `explode(sequence(1, copies))` to materialize the weighted corpus.
    */
  def mixtureCopies(key: Column, stratum: Column,
      weightsPpm: Map[String, Long], defaultPpm: Long = 1000000L,
      salt: String = ""): Column = {
    require((weightsPpm.values ++ Seq(defaultPpm)).forall(w => w >= 0L),
      "weights must be non-negative")
    // 24-bit hash slice: compare h/2^24 < frac by cross-multiplying into
    // exact integer space (h·1e6 < frac_ppm·2^24)
    val h = graft.expressions.PortableHash.md5Prefix(
      concat(key.cast("string"), lit(salt)), 6)
    val w = weightsPpm.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (s, p)) => acc.when(stratum === s, lit(p))
    }.otherwise(lit(defaultPpm))
    (floor(w / 1000000L).cast("long") +
      when(h * 1000000L < (w % 1000000L) * 16777216L, 1L).otherwise(0L))
      .cast("long")
  }

  /** Temperature-scaled mixture shares at τ = 2: per-source sampling
    * weight ∝ n_s^(1/τ) = √n_s — the multilingual / data-mixing recipe
    * (mT5, XLM-R exemplar sampling) that flattens the head and boosts the
    * tail of the source-size distribution, between proportional (τ = 1)
    * and uniform (τ → ∞). Feed `share_ppm` into [[mixtureCopies]] (per-row
    * Bernoulli thinning) to realize the mix.
    *
    * Engine-exact: √ of an integer is IEEE-754 correctly rounded in every
    * engine, so ⌊√n⌋ is bit-identical across Spark and a SQL oracle;
    * shares and budgets use integer division. (Arbitrary τ needs a
    * non-correctly-rounded `pow` — that variant would follow the
    * integer-bits quantization of `TextAnalysis.surprisal` instead.)
    *
    * Scale shape: a per-source count aggregate (map-side combined; output
    * rows = #sources, always tiny) and one broadcast total — the corpus
    * scans once, nothing else moves.
    *
    * @return (source, n_in, w, share_ppm, n_budget): w = ⌊√n_in⌋,
    *         share_ppm = w·10⁶ div Σw, n_budget = budget·w div Σw
    */
  def temperatureShares(df: org.apache.spark.sql.DataFrame, stratum: Column,
      budget: Long): org.apache.spark.sql.DataFrame = {
    require(budget >= 0L, "budget must be non-negative")
    val counts = df.groupBy(stratum.as("source"))
      .agg(count(lit(1)).as("n_in"))
      .withColumn("w", floor(sqrt(col("n_in"))).cast("long"))
    val tot = counts.agg(sum("w").as("tw"))
    counts.crossJoin(broadcast(tot))
      .select(col("source"), col("n_in"), col("w"),
        expr("w * 1000000 div tw").as("share_ppm"),
        expr(s"w * $budget div tw").as("n_budget"))
  }

  /** Class-balanced oversampling to EXACT parity: every label's rows
    * replicate until each label totals exactly max-label-count rows —
    * the minority-class resampling step of classifier training-set
    * construction. Each row gets `max_n div n_label` copies, plus one
    * extra for the first `max_n mod n_label` rows in content-hash order
    * (deterministic, engine-portable: no RNG, no row-order dependence).
    *
    * Scale shape: a per-label count aggregate (tiny, broadcast), a
    * 1-row max (broadcast cross join, the A10 scalar pattern), one
    * rank window keyed by label, and a codegen'd `explode(sequence)` —
    * output volume is #labels · max_n by construction, so the blow-up
    * is bounded by the imbalance ratio, which the caller sees in the
    * returned `copy_idx` (1..copies per source row).
    */
  def classBalance(df: org.apache.spark.sql.DataFrame, labelCol: Column,
      key: Column): org.apache.spark.sql.DataFrame = {
    val counts = df.groupBy(labelCol.as("__lab")).agg(count(lit(1)).as("__n"))
    val mx = counts.agg(max("__n").as("__mx"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(labelCol).orderBy(md5(key.cast("string")), key)
    df.withColumn("__rk", row_number().over(w))
      .join(broadcast(counts), labelCol === col("__lab"))
      .crossJoin(broadcast(mx))
      .withColumn("__copies",
        expr("__mx div __n") +
          when(col("__rk") <= expr("__mx % __n"), 1L).otherwise(0L))
      .withColumn("copy_idx", explode(sequence(lit(1L), col("__copies"))))
      .drop("__lab", "__n", "__mx", "__rk", "__copies")
  }
}
