package graft.operators

import org.apache.spark.sql.DataFrame

/** Round-robin-spread a FILE-BACKED frame across the session's cores
  * before an expensive per-row stage, when its scan would otherwise
  * run on fewer tasks than the machine has cores (guide §2.5 "one
  * huge unsplittable file → repartition immediately after the read",
  * §2.6 idle capacity).
  *
  * Why: the dedup/text fronts' dominant per-row work — tokenize,
  * shingle, md5/xxhash per gram — runs in the projection directly
  * above the corpus scan, BEFORE any exchange introduces parallelism.
  * A gate-scale corpus arrives as ONE parquet file with one row
  * group, so that stage runs one task while every other core idles
  * (measured: the single-task shingling stages were the serial wall
  * of q_incr_release_lsh and every portable store drive at sf0.1).
  *
  * Scale posture, by construction rather than tuning:
  *  - a production corpus scan has ≥ cores input files (or enough
  *    bytes to split), fails the trigger, and is returned UNCHANGED —
  *    zero extra exchange at 100 TB;
  *  - a non-file-backed frame (a streaming micro-batch, an in-memory
  *    fixture) reports no input files and is returned unchanged — its
  *    partitioning is the upstream's to decide;
  *  - the byte bound (cores × `spark.sql.files.maxPartitionBytes`)
  *    keeps the spread's own shuffle trivially small relative to the
  *    per-row work it parallelizes: past it the scan splits well on
  *    its own.
  *
  * Results are unchanged: every consumer is set-level (joins and
  * aggregations over hashes/counts), and Spark's sort-before-
  * repartition keeps the round-robin assignment deterministic under
  * task retries (SPARK-23207).
  */
object Spread {
  /** The spread width when the narrow-scan trigger fires, 0 when the
    * frame should be left alone. Cost of the decision: one cached file
    * listing read (`inputFiles`) plus ≤ cores `getFileStatus` calls;
    * any error (e.g. a file compacted away between listing and status)
    * reads as "leave it alone".
    */
  private def targetFor(df: DataFrame): Int = {
    try {
      val sc = df.sparkSession.sparkContext
      val target = sc.defaultParallelism
      val files = df.inputFiles
      if (files.isEmpty || files.length >= target) return 0
      val hconf = sc.hadoopConfiguration
      val maxPartBytes = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
      var bytes = 0L
      var i = 0
      while (i < files.length) {
        val p = new org.apache.hadoop.fs.Path(files(i))
        bytes += p.getFileSystem(hconf).getFileStatus(p).getLen
        if (bytes > maxPartBytes * target) return 0
        i += 1
      }
      target
    } catch { case scala.util.control.NonFatal(_) => 0 }
  }

  /** `df` repartitioned to `defaultParallelism` when the trigger
    * fires, `df` itself otherwise. For projections whose output feeds
    * MAP-heavy consumers (banding, window, sketch — few downstream
    * exchanges); exchange-heavy consumers take [[wideThenFold]].
    */
  def wide(df: DataFrame): DataFrame = {
    val t = targetFor(df)
    if (t > 0) df.repartition(t) else df
  }

  /** Spread for an expensive projection whose OUTPUT feeds
    * EXCHANGE-heavy consumers (the inverted-index pipelines: explode,
    * df-cap join, pair self-join): `build` runs over the spread frame
    * so its per-row work parallelizes, then the result folds back to
    * a narrow width. Without the fold every downstream KB-scale
    * exchange pays (spread-width map tasks × reduce partitions)
    * bypass-writer shuffle files — measured 4–7× CPU on the index
    * pipelines, the round-16 store-gate disease re-created. The fold
    * is one extra exchange of the PROJECTED rows (8-byte hashes, not
    * text) and caps downstream map counts at width/8. Identity at
    * production scale (the trigger never fires past the byte bound).
    */
  def wideThenFold(df: DataFrame)(build: DataFrame => DataFrame): DataFrame = {
    val t = targetFor(df)
    if (t <= 0) build(df)
    else build(df.repartition(t)).repartition(math.max(2, t / 8))
  }
}
