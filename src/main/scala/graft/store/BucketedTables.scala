package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The id-hash bucket LAYOUT shared by the durable stores
  * ([[graft.operators.dedup.ReleaseStore]],
  * [[graft.operators.dedup.MediaStore]]): id-keyed tables write under
  * `__bucket = pmod(xxhash64(id), effectiveBuckets)` partition dirs, so
  * id-keyed anti-joins (accepted-id resolution, dedupAppend replay
  * guards) and id-driven state reads prune their stored-side scan to
  * the buckets the probing ids can hash into — the lever that keeps
  * small steady-state micro-batches flat-cost as the stored corpus
  * grows. Each store defines [[effectiveBuckets]] with pin-wins
  * semantics (the `store.meta` layout field beats the constructor;
  * pre-bucketing legacy tables stay unbucketed at 0).
  */
private[graft] trait BucketedTables extends DurableStore {

  /** The LIVE bucket count: 0 = unbucketed legacy layout. */
  protected def effectiveBuckets: Int

  /** Bucket-pruned accepted-id resolution: a stored row outside the
    * batch ids' hash buckets cannot match any batch id, so the
    * anti-join scans only the touched partition dirs. Rides
    * [[readTable]], so an unbucketed legacy table falls back to the
    * full schema'd scan and a table with no partition dirs yet (only
    * all-empty appends) reads as a literal empty frame instead of
    * freezing an empty inferred schema.
    */
  protected override def storedAcceptIds(idColName: String, table: String,
      batchIds: DataFrame): DataFrame =
    readTable(table,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idColName,
          batchIds.schema("__bid").dataType))),
      bucketsOf(batchIds, "__bid"))
      .select(col(idColName).as("__bid"))

  protected def bucketOf(idc: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    pmod(xxhash64(idc), lit(effectiveBuckets)).cast("int")

  /** Read an id-keyed store table with an explicit logical schema,
    * tolerating both layouts (the `__bucket` partition column is added
    * to the read schema and dropped — callers see the logical shape).
    * `buckets` prunes the scan to the given partition values: correct
    * whenever the consuming join's probe ids all hash inside them.
    */
  protected def readTable(table: String,
      logical: org.apache.spark.sql.types.StructType,
      buckets: Option[Seq[Int]] = None): DataFrame = {
    // a never-ingested table reads as a literal empty frame in EITHER
    // layout — accessor behavior must not depend on the bucket modulus
    // (a monitoring read before the first micro-batch is legal)
    if (!fs.exists(hPath(s"$path/$table")))
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        logical)
    if (effectiveBuckets > 0) {
      // a bucketed table with NO partition dirs yet (only all-empty
      // appends so far) must read as a LITERAL empty frame, not a
      // planned scan: a scan planned now freezes an empty partition
      // schema, and a consumer executing after this ingest's own
      // appends would meet newly-created __bucket dirs with the wrong
      // partition arity. The literal is also semantically right — any
      // rows arriving between plan and execution are the current
      // batch's own, which every consumer excludes anyway.
      val dirP = hPath(s"$path/$table")
      val hasParts = fs.exists(dirP) && fs.listStatus(dirP)
        .exists(_.getPath.getName.startsWith("__bucket="))
      if (!hasParts)
        return spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          logical)
      val schema = org.apache.spark.sql.types.StructType(logical.fields :+
        org.apache.spark.sql.types.StructField("__bucket",
          org.apache.spark.sql.types.IntegerType))
      val df = spark.read.schema(schema).parquet(s"$path/$table")
      (buckets match {
        case Some(bs) => df.where(col("__bucket").isin(bs: _*))
        case None => df
      }).drop("__bucket")
    } else spark.read.schema(logical).parquet(s"$path/$table")
  }

  /** Cheap invariants a caller-re-stated modulus must pass BEFORE a
    * pin-loss re-pin is accepted ([[effectiveBuckets]]' bucketed-but-
    * unpinned branch): the layout cannot reveal its own modulus, but it
    * CAN refute a wrong guess — (a) every on-disk `__bucket=N` dir must
    * have N < buckets (a layout containing `__bucket=7` refutes a
    * re-pin of 4), and (b) the ids inside one sampled dir must hash to
    * exactly that dir value under the candidate modulus (a re-pin of
    * 512 against a 256-bucket layout passes (a) but scatters half of
    * any dir's ids elsewhere). A wrong modulus accepted here would
    * silently corrupt every replay guard — pruned anti-joins missing
    * stored ids, duplicates appending under committed markers — so
    * refusal is the only safe failure mode. One dir listing plus one
    * single-dir scan, paid once per pin-loss recovery (never on the
    * ingest path).
    */
  protected def validateRepin(table: String, idColName: String,
      buckets: Int): Unit = {
    val dir = hPath(s"$path/$table")
    if (!fs.exists(dir)) return
    val parts = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("__bucket="))
      .map(_.stripPrefix("__bucket=").toInt)
    parts.find(_ >= buckets).foreach { b =>
      throw new IllegalStateException(
        s"re-pin stateBuckets=$buckets rejected: $table contains " +
        s"__bucket=$b - the original modulus must exceed every " +
        "existing bucket value")
    }
    parts.sorted.headOption.foreach { b =>
      val bad = spark.read.parquet(s"$path/$table/__bucket=$b")
        .where(pmod(xxhash64(col(idColName)), lit(buckets)) =!= b)
        .limit(1).count()
      if (bad > 0) throw new IllegalStateException(
        s"re-pin stateBuckets=$buckets rejected: ids under " +
        s"$table/__bucket=$b do not hash to $b at that modulus - " +
        "re-state the ORIGINAL bucket count")
    }
  }

  /** The distinct buckets a frame's ids hash into — the prune set for
    * id-keyed anti-joins (one tiny collect per ingest). None when the
    * store is unbucketed or every bucket is touched anyway.
    */
  protected def bucketsOf(ids: DataFrame,
      idColName: String): Option[Seq[Int]] =
    if (effectiveBuckets == 0) None
    else {
      val bs = ids.select(bucketOf(col(idColName)).as("b")).distinct()
        .collect().map(_.getInt(0)).toSeq
      if (bs.size >= effectiveBuckets) None else Some(bs)
    }

  /** Append `df` under the store's layout (bucket partition dirs when
    * bucketed). Rows are CLUSTERED by bucket before the write — without
    * the repartition, `partitionBy` emits one file per (task × touched
    * bucket) and a 32-task append over 256 buckets writes thousands of
    * KB-sized files per batch per table (measured: 14,837 files per
    * state table after ten ×10-corpus batches — the file listing, not
    * the data, became the scan cost). Clustered, an append writes one
    * file per touched bucket; the shuffle it costs is batch-sized.
    */
  protected def appendBucketed(df: DataFrame, idColName: String,
      dir: String): Unit =
    if (effectiveBuckets > 0)
      df.withColumn("__bucket", bucketOf(col(idColName)))
        .repartition(col("__bucket"))
        .write.partitionBy("__bucket").mode(SaveMode.Append).parquet(dir)
    else df.write.mode(SaveMode.Append).parquet(dir)
}
