package graft.expressions

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The `n` nearest IVF cells of an `array<double>` vector, as cell ids
  * ranked by (−cos·‖c‖⁻¹ ascending, cell id ascending) — i.e. most
  * similar first, lowest id on ties.
  *
  * This is the coarse-quantizer assignment the whole IVF family runs
  * per row (corpus assignment at n = 1, query probe ranking at
  * n = nprobe). The composed form — `sort_array(array(struct(−dot/‖c‖,
  * i) …))` over nlist struct entries — allocates nlist structs plus a
  * GenericArrayData per row and then sorts them through `SortArray`,
  * which is `CodegenFallback` (interpreted, per-element comparator on
  * boxed rows): measured 239 s for one 200k-vector assignment at
  * nlist = 64. Here the dots accumulate in one pass (same index order
  * as [[Sketches.dotProduct]]) and the top-n selection is an O(n·nlist)
  * scan over a primitive array — no structs, no sort, one virtual call
  * per row, inside whole-stage codegen.
  *
  * Arithmetic is bit-identical to the composed form: per-centroid
  * negSim = −(Σᵢ v(i)·c(i)) / max(‖c‖, 1e-12) with the sum
  * accumulating in index order and the norm guarded at 1e-12 exactly
  * as before (an all-zero centroid would otherwise score NaN and
  * become unprobeable), and the `<`-only selection scan keeps the
  * lowest cell id on exact ties — the same (negSim, cell) struct order
  * `sort_array` produced, so every caller's output rows are unchanged
  * FOR NON-NULL vectors. Non-finite negSims (a NaN input vector) rank
  * after all finite ones, matching Spark's Double ordering in
  * `sort_array`. One deliberate divergence: a NULL input vector yields
  * a NULL cell list (standard UnaryExpression null propagation), where
  * the composed form assigned such rows a concrete cell from null
  * negSims — NULL is the honest answer (a null vector has no nearest
  * cell), and it composes consistently with the rest of the similarity
  * family, where null embeddings already drop out of every dot-product
  * ranking; they are unreachable by search either way.
  */
case class NearestCells(child: Expression, cents: Array[Array[Double]],
    n: Int) extends UnaryExpression {
  require(cents.nonEmpty && n >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells needs array<double>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  // same fold order as the composed form's centNorms — keep bit parity
  private val norms: Array[Double] =
    cents.map(c => math.max(math.sqrt(c.map(x => x * x).sum), 1e-12))

  def compute(input: ArrayData): ArrayData = {
    val m = cents.length
    val neg = new Array[Double](m)
    var ci = 0
    while (ci < m) {
      val c = cents(ci)
      val k = math.min(input.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < k) { acc += input.getDouble(i) * c(i); i += 1 }
      neg(ci) = -acc / norms(ci)
      ci += 1
    }
    val take = math.min(n, m)
    val out = new Array[Any](take)
    val used = new Array[Boolean](m)
    var t = 0
    while (t < take) {
      // strict < keeps the lowest cell id on ties; NaNs never win a <
      // comparison, so finite cells exhaust first and the fallback
      // below ranks NaN cells last in id order — sort_array's ordering
      var best = -1
      var bestV = Double.PositiveInfinity
      var j = 0
      while (j < m) {
        if (!used(j) && neg(j) < bestV) { best = j; bestV = neg(j) }
        j += 1
      }
      if (best < 0) {
        var f = 0
        while (f < m && best < 0) { if (!used(f)) best = f; f += 1 }
      }
      used(best) = true
      out(t) = best
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call per row into [[compute]]; the child stays inside
    // the surrounding whole-stage-codegen'd projection
    val ref = ctx.addReferenceObj("cellRanker", this,
      classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
}

object NearestCells {
  def apply(vec: org.apache.spark.sql.Column, cents: Array[Array[Double]],
      n: Int): org.apache.spark.sql.Column =
    GraftBridge.column(NearestCells(GraftBridge.expression(vec), cents, n))
}
