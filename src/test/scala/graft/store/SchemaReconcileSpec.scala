package graft.store

import graft.SparkSpec
import org.apache.spark.sql.types._

class SchemaReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("reconcile_").toString + "/t"

  test("diff reports adds, drops, widens, and conflicts") {
    val stored = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType),
      StructField("gone", StringType), StructField("bad", StringType)))
    val desired = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("added", DoubleType), StructField("bad", LongType)))
    val actions = SchemaReconcile.diff(stored, desired)
    assert(actions.contains(SchemaReconcile.AddColumn("added", DoubleType)))
    assert(actions.contains(SchemaReconcile.DropColumn("gone")))
    assert(actions.contains(SchemaReconcile.WidenColumn("a", IntegerType, LongType)))
    assert(actions.contains(
      SchemaReconcile.Incompatible("bad", StringType, LongType)))
  }

  test("readAs evolves stored data to the registry schema, idempotently") {
    val path = tmp()
    Seq((1, "x"), (2, "y")).toDF("a", "b").write.parquet(path)
    val desired = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", LongType)))
    val out = SchemaReconcile.readAs(spark, path, desired)
    assert(out.schema == desired)
    val rows = out.orderBy("a").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.forall(_.isNullAt(2))) // added column reads as null
    // idempotent: reconciling the already-conforming output schema is a no-op
    assert(SchemaReconcile.diff(out.schema, desired).isEmpty)
  }

  test("readAs refuses irreconcilable type conflicts") {
    val path = tmp()
    Seq(("1", "x")).toDF("a", "b").write.parquet(path)
    val desired = StructType(Seq(StructField("a", LongType)))
    val e = intercept[IllegalStateException] {
      SchemaReconcile.readAs(spark, path, desired)
    }
    assert(e.getMessage.contains("a"))
  }
}
