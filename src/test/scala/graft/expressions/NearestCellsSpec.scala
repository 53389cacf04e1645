package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NearestCells must reproduce the sort_array-of-structs form it
  * replaced: ranked by (−dot/max(‖c‖, 1e-12) ascending, cell id
  * ascending), truncated to n, identical in interpreted eval and
  * whole-stage codegen.
  */
class NearestCellsSpec extends SparkSpec {
  import spark.implicits._

  private val cents: Array[Array[Double]] = Array(
    Array(1.0, 0.0, 0.0),
    Array(0.0, 1.0, 0.0),
    Array(0.0, 0.0, 1.0),
    Array(1.0, 1.0, 0.0),
    Array(0.0, 0.0, 0.0)) // all-zero: the 1e-12 norm guard path

  /** The composed reference form NearestCells replaced, verbatim. */
  private def composedRank(vec: org.apache.spark.sql.Column) = {
    val centNorms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    sort_array(array(
      cents.zipWithIndex.map { case (c, i) =>
        struct((-Sketches.dotProduct(vec, typedLit(c.toSeq)) /
          math.max(centNorms(i), 1e-12)).as("negSim"),
          lit(i).as("cell"))
      }.toIndexedSeq: _*))
  }

  test("full ranking equals the composed sort_array form, incl. ties and the zero centroid") {
    val df = Seq(
      Seq(0.5, 0.5, 0.0),   // exact tie between cells 0 and 1 → id order
      Seq(3.0, 0.0, 0.0),
      Seq(0.0, 0.0, 2.0),
      Seq(1.0, 1.0, 1.0),
      Seq(-1.0, -2.0, 0.5),
      Seq(0.0, 0.0, 0.0)    // zero vector: every negSim −0.0, ids ascend
    ).toDF("v").select(col("v").cast("array<double>").as("v"))
    val rows = df.select(
      NearestCells(col("v"), cents, cents.length).as("native"),
      transform(composedRank(col("v")), s => s.getField("cell"))
        .as("composed")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1).map(_.asInstanceOf[Int]))
    }
  }

  test("n truncates to the prefix of the full ranking") {
    val df = Seq(Seq(0.2, 0.9, 0.1)).toDF("v")
      .select(col("v").cast("array<double>").as("v"))
    val full = df.select(NearestCells(col("v"), cents, cents.length))
      .collect()(0).getSeq[Int](0)
    (1 to cents.length).foreach { n =>
      val got = df.select(NearestCells(col("v"), cents, n))
        .collect()(0).getSeq[Int](0)
      assert(got == full.take(n), s"n=$n")
    }
  }

  test("interpreted eval matches codegen") {
    val df = Seq(Seq(0.5, 0.5, 0.0), Seq(1.0, 2.0, 3.0))
      .toDF("v").select(col("v").cast("array<double>").as("v"))
    val base = df.select(NearestCells(col("v"), cents, 3).as("cells"))
    val viaCodegen = base.collect().map(_.getSeq[Int](0))
    val olds = Seq("spark.sql.codegen.wholeStage",
      "spark.sql.codegen.factoryMode").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = base.collect().map(_.getSeq[Int](0))
      assert(viaCodegen.toSeq == interpreted.toSeq)
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
