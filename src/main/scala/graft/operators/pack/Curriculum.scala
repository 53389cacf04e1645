package graft.operators.pack

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum ordering: assign every document a training STAGE by global
  * percentile of an integer difficulty score (easy → hard is the classic
  * curriculum; any monotone score works), and a deterministic SHARD +
  * within-shard slot so the emitted order is stable across runs,
  * executors, and releases — a re-release with unchanged docs reproduces
  * the identical curriculum, and an incremental release only reorders
  * stages whose percentile cuts moved.
  *
  * Scale shape: the only non-linear step is ranking, and it never ranks
  * ROWS. The corpus aggregates once into the DISTINCT-SCORE frequency
  * table (integer scores — token counts, rounded quality, any
  * discretized metric — keep it small by construction: bounded by the
  * score range, not the corpus), a cumulative window over that
  * value-table derives each value's exact global rank interval, and the
  * resulting value→stage map broadcast-joins back onto the corpus. Rows
  * with equal scores land in the same stage, so assignment is
  * value-deterministic: no global row sort, no single-partition window
  * over the corpus, no tiebreak nondeterminism. Shard and slot are pure
  * hashes of the id (engine-portable 48-bit md5 slice, the library's
  * standard), so the within-stage "shuffle" needs no randomness source
  * and no coordination.
  *
  * The reference's analog is ClickHouse's ORDER BY sampling the console
  * uses for stable pagination; the training-pipeline need it serves is
  * curriculum schedules (Bengio et al. 2009) and the deterministic
  * data-order reproducibility every large pretraining run requires.
  */
object Curriculum {

  private def hash48(s: Column): Column =
    graft.expressions.PortableHash.md5Prefix48(s)

  /** Stage assigned to rows whose `scoreCol` is null: they carry no
    * difficulty signal, so they get a deterministic out-of-band stage
    * instead of silently vanishing (a null group key never equi-matches,
    * so an inner join would delete them — the DocJsonl reject
    * discipline, applied here).
    */
  val NullStage: Long = -1L

  /** Per-doc curriculum assignment: emits the input columns plus
    * `stage` (0-based, by ascending `scoreCol` percentile), `shard`
    * (hash of `idCol` mod `shards`) and `slot` (within-shard order key —
    * sort by it for the deterministic interleave).
    *
    * `scoreCol` must be integral; discretize continuous scores first
    * (the distinct-score table is the scalability contract).
    */
  def order(df: DataFrame, idCol: String, scoreCol: String,
      stages: Int, shards: Int): DataFrame = {
    require(stages > 0 && shards > 0, "stages and shards must be positive")
    // null scores are excluded from the percentile table (they would
    // shift every cut) and land in NullStage via the left join below
    val v = df.where(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol)).agg(count(lit(1)).as("__c"))
    // cumulative count of strictly-smaller scores = the value's first
    // global rank (0-based); the window runs over the value table only
    val m = v
      .withColumn("__cumb",
        sum("__c").over(Window.orderBy(col(scoreCol))) - col("__c"))
    val tot = v.agg(sum("__c").cast("long").as("__n"))
    val stageMap = m.crossJoin(tot)
      .select(col(scoreCol),
        expr(s"(__cumb * $stages) div __n").cast("long").as("stage"))
    df.join(broadcast(stageMap), Seq(scoreCol), "left")
      .withColumn("stage", coalesce(col("stage"), lit(NullStage)))
      .withColumn("shard", pmod(hash48(col(idCol).cast("string")), lit(shards.toLong)))
      .withColumn("slot", hash48(concat(col(idCol).cast("string"), lit(":slot"))))
  }
}
