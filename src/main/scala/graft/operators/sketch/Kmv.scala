package graft.operators.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketch.
  *
  * The mergeable-sketch way to count distincts at 100 TB: each group keeps
  * only its k smallest distinct hash values (a fixed k·8-byte synopsis,
  * however large the group), and the k-th minimum estimates the distinct
  * count as `(k-1) / kth_min_fraction` (Bar-Yossef et al. 2002; the
  * estimator ClickHouse's `uniqCombined` and DataSketches' theta sketch
  * descend from). Two sketches merge by unioning their hash sets and
  * re-truncating to k — so per-source sketches roll up to a corpus-wide
  * union estimate WITHOUT rescanning the corpus, exactly how rollup tables
  * maintain distinct counts incrementally.
  *
  * Everything is integer arithmetic on a 48-bit md5-slice hash (the repo's
  * engine-portable base hash, `Dedup.scala` convention), so a SQL oracle
  * reproduces estimates bit-for-bit — no float estimator drift between
  * engines.
  *
  * Scale shape: the only shuffle is hash-partitioning distinct (group,
  * hash) pairs; the k-smallest step is a `row_number <= k` filter that
  * Spark's WindowGroupLimit rewrite bounds BEFORE the shuffle (each map
  * task forwards at most k rows per group), so no task ever materializes a
  * group's full distinct set. Merging reads the per-group sketches
  * (k rows per group), never the data.
  */
object Kmv {

  /** 2^48 as a long — the hash space size for the estimator. */
  val HashSpace: Long = 1L << 48

  /** Engine-portable 48-bit hash: md5 hex slice, exact in any engine. */
  def portableHash48(c: Column): Column =
    graft.expressions.PortableHash.md5Prefix48(c.cast("string"))

  /** Per-group KMV sketch rows: the k smallest distinct hashes of
    * `valueCol`, one row per kept hash — `(g, h, rk)` with `rk` the
    * 1-based rank. `g` is the group key cast to string so the schema is
    * stable under [[mergeAll]]'s `__union` label (no silent set-op
    * widening for non-string keys). Null values are excluded before
    * hashing — `COUNT(DISTINCT x)` semantics, and md5(null)=null would
    * otherwise sort first (NULLS FIRST) and silently displace a real
    * minimum. This row form (not an array) is what merges and
    * re-aggregations consume; [[estimate]] folds it to one row per group.
    */
  def sketch(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2 (got $k): the estimator divides by k-1")
    require(k <= 32768,
      s"KMV k must be <= 32768 (got $k): (k-1) * 2^48 must fit in a long")
    import org.apache.spark.sql.expressions.Window
    val hashed = df
      .where(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        portableHash48(col(valueCol)).as("h"))
      .distinct() // one shuffle: hash-partition (g, h)
    // row_number <= k is WindowGroupLimit-eligible: each map task forwards
    // at most k candidate rows per group into the window shuffle
    hashed
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("h"))))
      .where(col("rk") <= k)
  }

  /** Fold sketch rows to one row per group:
    * `(g, n_kept, est_distinct)`. Groups with fewer than k distinct
    * values are exact (the sketch IS the value set); otherwise
    * `est = (k-1) * 2^48 div kth` where kth is the k-th smallest hash —
    * exact integer division, so the oracle matches bit-for-bit.
    */
  def estimate(sketchRows: DataFrame, k: Int): DataFrame =
    sketchRows.groupBy("g").agg(
      count(lit(1)).as("n_kept"),
      max("h").as("kth"))
      .select(col("g"), col("n_kept"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"(${k - 1} * ${HashSpace}L) div kth"))
          .as("est_distinct"))

  /** Merge per-group sketches into ONE union sketch (re-truncated to k),
    * reading only the sketch rows — the incremental-rollup path. Returns
    * the same row form as [[sketch]] with `g` = `unionLabel`.
    */
  def mergeAll(sketchRows: DataFrame, k: Int,
      unionLabel: String = "__union"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // global k-smallest FIRST, as orderBy+limit — TakeOrderedAndProject
    // keeps k per map task then merges k·tasks rows, instead of shuffling
    // every group's sketch (G·k rows) into one window partition. The
    // row_number that re-ranks runs over <= k rows by construction.
    sketchRows
      .select(col("h")).distinct()
      .orderBy(col("h")).limit(k)
      .select(lit(unionLabel).as("g"), col("h"),
        row_number().over(Window.orderBy(col("h"))).as("rk"))
  }

  /** Per-group distinct estimates PLUS the merged union estimate, from one
    * pass over the data: `(g, n_kept, est_distinct)` for every group and a
    * `__union` row computed by merging the per-group sketches (never
    * rescanning the data — the point of a mergeable sketch).
    */
  def groupedWithUnion(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    // query-scoped persist (released by the entry point's releaseAll):
    // both the per-group estimates and the union merge read the sketch
    val sk = graft.ScratchCache.persist(sketch(df, groupCol, valueCol, k))
    estimate(sk, k).unionAll(estimate(mergeAll(sk, k), k))
  }

  /** Re-key sketch rows to a coarser group and re-truncate to k — the
    * hierarchical rollup step (hour sketches → day sketches → totals)
    * that maintains distinct counts incrementally: each level reads only
    * the finer level's k-row-per-group sketches, never the data. This is
    * the mergeable property ClickHouse's `uniqCombinedState`/`-Merge`
    * rollup pipelines rely on, expressed over the row form.
    */
  def regroup(sketchRows: DataFrame, newKey: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    sketchRows
      .select(newKey.cast("string").as("g"), col("h")).distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("h"))))
      .where(col("rk") <= k)
  }

  /** Pairwise Jaccard similarity of the groups' DISTINCT-value sets,
    * estimated from the per-group sketches alone — the bottom-k estimator
    * (Cohen & Kaplan 2007): the k smallest hashes of A ∪ B are a uniform
    * sample of the union, so the fraction of them present in BOTH
    * sketches estimates |A∩B| / |A∪B|. Exact when the union holds fewer
    * than k distinct values. This is the corpus-scale twin of an exact
    * overlap join (`q_source_overlap`): the corpus is scanned once to
    * sketch; the G×G matrix is then computed on G·k sketch rows, never
    * rescanning the data.
    *
    * Scale shape: the group list is tiny (a pairwise matrix is inherently
    * G², so G is small — sources, languages, shards); `allPairs` rides a
    * broadcast into two equi-joins over the sketch rows (no OR-join, no
    * nested loop), and the per-pair k-truncation is WindowGroupLimit-
    * bounded on the (ga, gb) key.
    *
    * @return (ga, gb, n_union_kept, common, jaccard_pm) for every
    *         unordered group pair, ga < gb lexicographically
    */
  def pairwiseJaccard(sketchRows: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val groups = sketchRows.select(col("g")).distinct()
    val allPairs = broadcast(
      groups.select(col("g").as("ga"))
        .crossJoin(groups.select(col("g").as("gb")))
        .where(col("ga") < col("gb")))
    val sides =
      allPairs.join(sketchRows.select(col("g"), col("h")), col("g") === col("ga"))
        .select(col("ga"), col("gb"), col("h"),
          lit(1L).as("in_a"), lit(0L).as("in_b"))
      .unionAll(
        allPairs.join(sketchRows.select(col("g"), col("h")), col("g") === col("gb"))
          .select(col("ga"), col("gb"), col("h"),
            lit(0L).as("in_a"), lit(1L).as("in_b")))
    sides
      .groupBy("ga", "gb", "h")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))))
      .where(col("rk") <= k)
      .groupBy("ga", "gb")
      .agg(count(lit(1)).as("n_union_kept"),
        sum(col("in_a") * col("in_b")).as("common"))
      .select(col("ga"), col("gb"), col("n_union_kept"), col("common"),
        expr("common * 1000 div n_union_kept").as("jaccard_pm"))
  }

  /** Per-group sketch rows that CARRY the sampled value: `(g, v, h, rk)`.
    * The k smallest distinct hashes select a uniform sample of the
    * group's distinct VALUES (hash order is value-independent), which is
    * what [[domainQuantiles]] consumes. Same null/string-key rules as
    * [[sketch]]; `v` is the value cast to long (the repo's integer-exact
    * oracle convention).
    */
  def sketchWithValues(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 32768, s"KMV needs 2 <= k <= 32768 (got $k)")
    import org.apache.spark.sql.expressions.Window
    df.where(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"),
        portableHash48(col(valueCol)).as("h"))
      .distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("h"))))
      .where(col("rk") <= k)
  }

  /** Quantiles of each group's DISTINCT-value domain, estimated from the
    * bottom-k value sample: the sampled values are sorted and the
    * ⌈p·n/100⌉-th is reported (exact integer ranks, the
    * `adaptiveCutoffs` convention — no interpolation to drift between
    * engines). Exact for groups below k (the sample IS the domain);
    * above k it is the classic bottom-k domain-quantile estimator. Note
    * these are quantiles of the distinct-VALUE distribution, not the
    * row-weighted distribution — carry counts alongside the sketch if
    * row weighting is needed.
    *
    * @param pcts percent ranks (1..100), one output column `p<pct>` each
    */
  def domainQuantiles(sketchRows: DataFrame, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be within 1..100 (got $pcts)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g"))
    val ranked = sketchRows
      .withColumn("vr", row_number().over(w.orderBy(col("v"))))
      .withColumn("n", count(lit(1)).over(w))
    // ceil(p·n/100) without floats: (p·n + 99) div 100 — exact
    val pctCols = pcts.map(p => max(when(
      col("vr") === expr(s"(n * $p + 99) div 100"), col("v")))
      .cast("long").as(s"p$p"))
    ranked.groupBy("g").agg(
      max("n").cast("long").as("n_sampled"), pctCols: _*)
  }
}
