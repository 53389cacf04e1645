package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Schema reconciliation for stored tables (reference
  * `orchestrator/clickhouse/migrations_helpers.go:408-628`: diff
  * `system.columns` vs the desired registry schema, emit idempotent
  * ALTERs).
  *
  * Parquet is schema-on-read, so "migration" means: verify the stored
  * footprint is compatible with the registry (same-name columns must be
  * identical or safely widenable), then read through the desired schema —
  * missing columns materialize as typed nulls, dropped columns are
  * projected away. No data rewrite, idempotent by construction.
  */
object SchemaReconcile {

  sealed trait Action { def column: String }
  /** Column in the registry but not in storage — reads as typed null. */
  final case class AddColumn(column: String, dataType: DataType) extends Action
  /** Column in storage but not in the registry — projected away. */
  final case class DropColumn(column: String) extends Action
  /** Stored type widens losslessly to the registry type. */
  final case class WidenColumn(column: String, from: DataType, to: DataType)
    extends Action
  /** Irreconcilable type conflict — surfaced, never silently cast. */
  final case class Incompatible(column: String, have: DataType, want: DataType)
    extends Action

  private def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case _ => false
  }

  /** Diff stored schema vs desired registry schema. */
  def diff(stored: StructType, desired: StructType): Seq[Action] = {
    val storedBy = stored.fields.map(f => f.name -> f.dataType).toMap
    val desiredBy = desired.fields.map(f => f.name -> f.dataType).toMap
    val adds = desired.fields.collect {
      case f if !storedBy.contains(f.name) => AddColumn(f.name, f.dataType)
    }
    val drops = stored.fields.collect {
      case f if !desiredBy.contains(f.name) => DropColumn(f.name)
    }
    val changes = desired.fields.flatMap { f =>
      storedBy.get(f.name).flatMap { have =>
        if (have == f.dataType) None
        else if (widens(have, f.dataType)) Some(WidenColumn(f.name, have, f.dataType))
        else Some(Incompatible(f.name, have, f.dataType))
      }
    }
    (adds ++ drops ++ changes).toSeq
  }

  /** Reconcile a stored parquet table against the desired schema: throws
    * on [[Incompatible]] columns, otherwise returns the table read through
    * the desired schema (adds → typed nulls, drops → projected away,
    * widens → cast).
    */
  def readAs(spark: SparkSession, path: String, desired: StructType): DataFrame = {
    val raw = spark.read.parquet(path)
    val actions = diff(raw.schema, desired)
    val bad = actions.collect { case i: Incompatible => i }
    if (bad.nonEmpty) throw new IllegalStateException(
      s"irreconcilable columns: ${bad.map(b =>
        s"${b.column} stored=${b.have.sql} desired=${b.want.sql}").mkString(", ")}")
    val cols = desired.fields.map { f =>
      if (raw.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    raw.select(cols.toIndexedSeq: _*)
  }
}
