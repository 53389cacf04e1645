package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** The engine-portable base hash, natively: the first `hexChars` hex
  * nibbles of md5(input) as an unsigned long — bit-identical to the
  * composed form `conv(substring(md5(s), 1, hexChars), 16, 10)
  * .cast("long")` that every portable operator (portable MinHash/LSH
  * front, KMV, DSIR, winnowing, manifest/curriculum keys, salted
  * splits) evaluates per SHINGLE on the hot path.
  *
  * The composed form pays, per element: a MessageDigest provider
  * lookup + instance allocation (inside commons-codec's md5Hex), a
  * 32-char hex string allocation, a UTF8String wrap, a substring
  * slice, NumberConverter's base-16 → base-10 digit walk producing a
  * DECIMAL STRING, and a string → long parse. Only the digest itself
  * is the hash; everything after is format conversion. This
  * expression reuses a thread-local MessageDigest and assembles the
  * value from the first ⌈hexChars/2⌉ digest bytes directly — zero
  * intermediate strings — and stays inside whole-stage codegen.
  *
  * Equality with the composed form is spec-pinned property-style over
  * unicode/empty/long inputs (PortableHashSpec); the DuckDB oracle
  * keeps computing the composed SQL, so oracle parity of every
  * portable query re-proves the equivalence end to end.
  */
case class Md5Prefix(child: Expression, hexChars: Int)
    extends UnaryExpression {
  require(hexChars >= 1 && hexChars <= 15,
    s"hexChars must be in [1, 15] to fit an unsigned long, got $hexChars")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix needs string, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix"

  def compute(input: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = Md5Prefix.digests.get()
    md.reset()
    val digest = md.digest(input.getBytes)
    var v = 0L
    var i = 0
    while (i < hexChars) {
      val b = digest(i >> 1)
      val nib = if ((i & 1) == 0) (b >> 4) & 0xf else b & 0xf
      v = (v << 4) | nib.toLong
      i += 1
    }
    v
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call per row into [[compute]] — the expression itself
    // stays inside the surrounding whole-stage-codegen'd projection
    val ref = ctx.addReferenceObj("md5prefix", this, classOf[Md5Prefix].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Md5Prefix =
    copy(child = c)
}

object Md5Prefix {
  /** Thread-local digest: MessageDigest is stateful and the expression
    * instance is shared across local-mode task threads; reusing one
    * instance per thread removes the per-element provider lookup +
    * allocation the composed md5() pays inside commons-codec.
    */
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

object PortableHash {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** `conv(substring(md5(s), 1, 12), 16, 10).cast("long")` — the 48-bit
    * portable base hash — as one native expression.
    */
  def md5Prefix48(s: Column): Column = column(Md5Prefix(expression(s), 12))

  /** First `hexChars` md5 hex nibbles as an unsigned long. */
  def md5Prefix(s: Column, hexChars: Int): Column =
    column(Md5Prefix(expression(s), hexChars))
}
