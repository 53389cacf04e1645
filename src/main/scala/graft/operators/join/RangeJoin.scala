package graft.operators.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: attach to each point row the interval rows
  * whose half-open span `[start, end)` contains the point — "which
  * maintenance window / incident / campaign was active when this
  * happened". The generic companion of [[AsOf]]: as-of picks the single
  * nearest reference row; a range join keeps EVERY containing interval
  * (intervals may overlap, so the result is genuinely many-to-many).
  *
  * Scale shape: a naive `ON p >= start AND p < end` is a non-equi join —
  * Spark can only plan it as a (broadcast) nested loop, O(|points| ×
  * |intervals|) comparisons. This operator restores an equi key by
  * BUCKETIZING the domain: each interval explodes into the fixed-width
  * buckets it touches, each point maps to exactly one bucket, and the
  * join becomes a hash equi-join on the bucket (plus any explicit keys)
  * with a residual containment filter. Each (point, interval) match
  * meets in exactly one bucket — the point's — so no dedup pass is
  * needed. Cost at 100 TB: one hash join keyed on ~⌈len/bucket⌉-fold
  * replicated intervals; pick `bucket` near the typical interval length
  * so the blowup stays O(1). Interval tables are usually control-plane
  * sized — the default broadcasts them and the points never shuffle at
  * all; disable `broadcastIntervals` for large interval sides and the
  * same plan becomes a shuffled hash join on the bucket, still never a
  * nested loop.
  *
  * Columns are joined over a long domain (epoch seconds, byte offsets,
  * any integer axis); floor-bucketing is exact for negative values too
  * (`pmod`, not truncating division).
  */
object RangeJoin {

  /** Join `points` to the `intervals` whose `[startCol, endCol)` span
    * contains `pointCol`, both expressed in the same long domain.
    * Emits all point columns plus the interval columns; points matching
    * k intervals appear k times, points matching none are dropped
    * (inner semantics — wrap with a left join on a key column when
    * unmatched points must survive).
    *
    * @param bucket   bucket width in domain units (> 0); choose near the
    *                 typical interval length — each interval is
    *                 replicated ⌈len/bucket⌉(+1) times
    * @param keyCols  extra equi-join keys present on both sides
    * @param broadcastIntervals broadcast the exploded interval side
    *                 (default — interval tables are control-plane sized)
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucket: Long, keyCols: Seq[String] = Nil,
      broadcastIntervals: Boolean = true): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    // exact floor(x / bucket) for any sign: pmod is non-negative, so the
    // subtraction lands on a multiple of bucket and the division is exact
    def fd(c: org.apache.spark.sql.Column) =
      (c - pmod(c, lit(bucket))) / lit(bucket)
    // empty/inverted spans can never contain a point; drop them before
    // the explode (sequence() would throw on a descending range)
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__b",
        explode(sequence(fd(col(startCol)).cast("long"),
          // end is exclusive: the last touched bucket is the one holding
          // end-1, not end (an interval ending exactly on a boundary
          // must not replicate into the bucket it never reaches)
          fd(col(endCol) - lit(1L)).cast("long"))))
    val pt = points.withColumn("__b", fd(col(pointCol)).cast("long"))
    val side = if (broadcastIntervals) broadcast(iv) else iv
    pt.join(side,
        Seq("__b") ++ keyCols,
        "inner")
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__b")
  }

  /** Interval×interval overlap join: pair every `left` span
    * `[leftStart, leftEnd)` with every `right` span `[rightStart,
    * rightEnd)` it intersects (strictly — half-open spans that merely
    * touch do not overlap). The many-to-many sibling of
    * [[pointInInterval]]: "which maintenance windows intersected which
    * incidents", "which user-activity spans crossed which deploys".
    *
    * Same bucketization as [[pointInInterval]], but with BOTH sides
    * exploded an overlapping pair can meet in every shared bucket, so
    * each pair is claimed by exactly one RESPONSIBLE bucket — the one
    * containing `max(leftStart, rightStart)`, the overlap's first
    * instant, which every genuinely overlapping pair has in exactly one
    * bucket. The claim is a codegen'd filter, not a dedup shuffle.
    *
    * Cost model at scale: replication is ⌈len/bucket⌉ per row per side;
    * the join is a hash equi-join on (bucket ++ keyCols). Very long
    * intervals replicate proportionally — split pathological spans
    * upstream or raise `bucket` (results are bucket-invariant, only the
    * replication factor moves).
    *
    * Non-key column names must be disjoint across the two sides (the
    * result carries both sides' columns).
    */
  def intervalOverlap(left: DataFrame, leftStart: String, leftEnd: String,
      right: DataFrame, rightStart: String, rightEnd: String,
      bucket: Long, keyCols: Seq[String] = Nil,
      broadcastRight: Boolean = true): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    val clash = (left.columns.toSet intersect right.columns.toSet) --
      keyCols.toSet
    require(clash.isEmpty,
      s"non-key columns shared by both sides would be ambiguous: $clash")
    def fd(c: org.apache.spark.sql.Column) =
      (c - pmod(c, lit(bucket))) / lit(bucket)
    def burst(df: DataFrame, s: String, e: String) = df
      .where(col(e) > col(s))
      .withColumn("__b",
        explode(sequence(fd(col(s)).cast("long"),
          fd(col(e) - lit(1L)).cast("long"))))
    val l = burst(left, leftStart, leftEnd)
    val r = burst(right, rightStart, rightEnd)
    val side = if (broadcastRight) broadcast(r) else r
    l.join(side, Seq("__b") ++ keyCols, "inner")
      .where(col(leftStart) < col(rightEnd) &&
        col(rightStart) < col(leftEnd))
      // one claim per pair: the bucket holding the overlap's first instant
      .where(fd(greatest(col(leftStart), col(rightStart))).cast("long") ===
        col("__b"))
      .drop("__b")
  }
}
