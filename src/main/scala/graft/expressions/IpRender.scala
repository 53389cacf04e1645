package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** P9 display rendering of the canonical 16-byte address: dotted quad for
  * v4-mapped, RFC 5952-ish for v6 (reference
  * `replaceRegexpOne(IPv6NumToString(addr),'^::ffff:','')`).
  *
  * Native expression instead of a Scala UDF: no row-encoder round trip per
  * value, stays inside whole-stage codegen (one virtual call per row), and
  * ALIAS columns built on it prune like any other expression.
  */
case class IpToString(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ip_to_string needs binary, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "ip_to_string"

  def compute(b: Array[Byte]): UTF8String =
    UTF8String.fromString(graft.functions.Ip.render(b))

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ipRender", this, classOf[IpToString].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): IpToString =
    copy(child = c)
}

object IpToString {
  def apply(c: Column): Column =
    GraftBridge.column(new IpToString(GraftBridge.expression(c)))
}

/** P11 privacy/aggregation truncation of the canonical 16-byte address:
  * keep v4bits for v4-mapped addresses, v6bits otherwise. Native — one
  * masked copy per row, no UDF encoder round trip.
  */
case class IpTruncate(child: Expression, v4bits: Int, v6bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ip_truncate needs binary, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "ip_truncate"

  def compute(b: Array[Byte]): Array[Byte] =
    if (graft.functions.Ip.isV4Mapped(b))
      graft.functions.Ip.truncate(b, 96 + v4bits)
    else graft.functions.Ip.truncate(b, v6bits)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ipTrunc", this, classOf[IpTruncate].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): IpTruncate =
    copy(child = c)
}

object IpTruncate {
  def apply(c: Column, v4bits: Int, v6bits: Int): Column =
    GraftBridge.column(new IpTruncate(GraftBridge.expression(c), v4bits, v6bits))
}

/** J5 longest-prefix-match attribute lookup as a native expression: the
  * prefix table (inheritance pre-flattened) rides along as a task-serialized
  * reference object — one copy per executor, one virtual call per row, no
  * UDF encoder round trip. Null on miss or missing attribute.
  */
case class LpmLookup(child: Expression, table: graft.functions.Lpm.Table,
    attr: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lpm_lookup needs binary, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "lpm_lookup"

  def compute(b: Array[Byte]): UTF8String =
    table.lookup(b).flatMap(_.get(attr))
      .map(UTF8String.fromString).orNull

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lpm", this, classOf[LpmLookup].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(c: Expression): LpmLookup =
    copy(child = c)
}

object LpmLookup {
  def apply(c: Column, table: graft.functions.Lpm.Table, attr: String): Column =
    GraftBridge.column(new LpmLookup(GraftBridge.expression(c), table, attr))
}
