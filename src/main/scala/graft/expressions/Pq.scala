package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared quantization for the PQ expressions: EXACTLY Spark's
  * `round(x).cast("long")` on a double — `BigDecimal.valueOf` (decimal
  * string form) + HALF_UP — so a native one-pass operator produces values
  * bit-identical to the composed `round(...)`-based form the DuckDB
  * oracles were verified against.
  */
private[expressions] object PqRound {
  def rnd(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
}

/** One-pass PQ encoder: the full `array<double>` vector in, the m
  * sub-space code indices out (`array<int>`). For sub-space j the code is
  * the argmin over the ksub centroids of the e6-quantized L2 surrogate
  * ‖cent‖² − 2·⟨sub, cent⟩, ties to the lower code — the same quantized
  * comparison as the composed sort_array-of-structs form, collapsed into
  * one virtual call so whole-stage codegen stays small (the unrolled
  * form compiles m·ksub slice+dot+round subtrees per row).
  *
  * Reference analog: none (the reference has no vector path); PQ follows
  * Jégou et al., TPAMI 2011.
  */
case class PqEncode(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(cb.nonEmpty && cb.head.nonEmpty && cb.head.head.nonEmpty)
  private val m = cb.length
  private val ksub = cb.head.length
  private val dsub = cb.head.head.length
  // ‖cent‖² in construction order (sum left-to-right, like the composed
  // form's driver-side literal)
  private val cc: Array[Array[Double]] =
    cb.map(_.map(c => { var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }; s }))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<double>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  def compute(input: ArrayData): ArrayData = {
    // a short vector would read out of bounds from generated code and a
    // long one would silently encode only a prefix — fail loudly instead
    if (input.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: embedding has ${input.numElements()} dims, " +
          s"codebook expects ${m * dsub} (m=$m × dsub=$dsub)")
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var bestD = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val cent = cb(j)(c)
        var dot = 0.0
        var d = 0
        val off = j * dsub
        while (d < dsub) { dot += input.getDouble(off + d) * cent(d); d += 1 }
        val dE6 = PqRound.rnd((cc(j)(c) - dot * 2) * 1e6)
        if (dE6 < bestD) { bestD = dE6; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncoder", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** One-pass PQ lookup-table builder for a query vector: `array<long>` of
  * length m·ksub with lut[j·ksub + c] = round(⟨q_j, cent_jc⟩ · 1e6) — the
  * integer ADC terms [[PqEncode]]'s codes index into.
  */
case class PqLut(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(cb.nonEmpty && cb.head.nonEmpty && cb.head.head.nonEmpty)
  private val m = cb.length
  private val ksub = cb.head.length
  private val dsub = cb.head.head.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_lut needs array<double>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_lut"

  def compute(input: ArrayData): ArrayData = {
    if (input.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_lut: query vector has ${input.numElements()} dims, " +
          s"codebook expects ${m * dsub} (m=$m × dsub=$dsub)")
    val lut = new Array[Long](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val cent = cb(j)(c)
        var dot = 0.0
        var d = 0
        val off = j * dsub
        while (d < dsub) { dot += input.getDouble(off + d) * cent(d); d += 1 }
        lut(j * ksub + c) = PqRound.rnd(dot * 1e6)
        c += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression): PqLut =
    copy(child = c)
}
