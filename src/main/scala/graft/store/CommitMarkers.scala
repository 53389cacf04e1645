package graft.store

import org.apache.spark.sql.SparkSession

/** Per-table streaming batch-id commit markers — the exactly-once guard
  * shared by every store that appends from `foreachBatch` (at-least-once
  * delivery): a replayed batch id skips exactly the tables that already
  * durably wrote it. Marker IO goes through the path's own Hadoop
  * filesystem (the root may be an object store); the write is
  * create-temp-then-rename, which HDFS-like filesystems rename
  * atomically. Single-writer per root, like the checkpoint itself;
  * wiping a checkpoint to restart a stream must wipe `_commits` too.
  */
final class CommitMarkers(spark: SparkSession, root: String) {

  private def fs = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Last streaming batch id durably written to `table`, −1 if none. */
  def lastCommitted(table: String): Long = {
    val path = new org.apache.hadoop.fs.Path(s"$root/_commits/$table")
    val f = fs
    if (!f.exists(path)) -1L
    else {
      val in = f.open(path)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      if (s.isEmpty) -1L else s.toLong
    }
  }

  def markCommitted(table: String, id: Long): Unit = {
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val f = fs
    val tmp = p(s"$root/_commits/$table.tmp")
    val out = f.create(tmp, true)
    try out.write(id.toString.getBytes("UTF-8")) finally out.close()
    f.delete(p(s"$root/_commits/$table"), false)
    if (!f.rename(tmp, p(s"$root/_commits/$table")))
      throw new java.io.IOException(
        s"failed to install commit marker for $table (batch $id)")
  }

  /** Run `write` unless `batchId` is already committed for `table`; mark
    * it committed after. No-op guard when no id is given (batch callers).
    */
  def guarded(table: String, batchId: Option[Long])
      (write: => Unit): Unit = batchId match {
    case Some(id) if lastCommitted(table) >= id => ()
    case Some(id) => write; markCommitted(table, id)
    case None => write
  }
}
