package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** J4 BGP RIB lookup as a native expression: (address, preferred next hop)
  * → one field of the next-hop-preferring longest-prefix route selection
  * (reference `outlet/routing/provider/bmp/rib.go:451-492`). The route
  * table rides as a task-serialized reference object — one copy per
  * executor, one virtual call per row, codegen-friendly like its sibling
  * [[LpmLookup]].
  */
case class RibLookup(left: Expression, right: Expression,
    table: graft.functions.Rib.Table, field: String) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        if (RibLookup.fields.contains(field)) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"rib_lookup field must be one of ${RibLookup.fields.mkString(", ")}")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"rib_lookup needs (binary, binary), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = field match {
    case "asn" => LongType
    case "aspath" | "communities" => ArrayType(LongType)
    case "netmask" => IntegerType
    case "nexthop" => BinaryType
  }
  override def nullable: Boolean = true
  override def prettyName: String = "rib_lookup"

  // preferred next hop may be null (source-side lookups pass none,
  // reference enricher.go:134) — only a null address short-circuits
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val addr = left.eval(input)
    if (addr == null) null
    else compute(addr.asInstanceOf[Array[Byte]],
      right.eval(input).asInstanceOf[Array[Byte]])
  }

  def compute(addr: Array[Byte], nh: Array[Byte]): Any = {
    val r = table.lookup(addr, nh)
    if (r == null) null
    else field match {
      case "asn" => r.asn
      case "aspath" => new GenericArrayData(r.asPath)
      case "communities" => new GenericArrayData(r.communities)
      case "netmask" => r.netMask
      case "nexthop" => r.nextHop
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val ref = ctx.addReferenceObj("rib", this, classOf[RibLookup].getName)
    val addrGen = left.genCode(ctx)
    val nhGen = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    val boxed = CodeGenerator.boxedType(dataType)
    val obj = ctx.freshName("ribResult")
    ev.copy(code = code"""
      ${addrGen.code}
      ${nhGen.code}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
      if (!${addrGen.isNull}) {
        Object $obj = $ref.compute(${addrGen.value},
          ${nhGen.isNull} ? null : ${nhGen.value});
        if ($obj != null) {
          ${ev.isNull} = false;
          ${ev.value} = ($boxed) $obj;
        }
      }""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): RibLookup =
    copy(left = l, right = r)
}

object RibLookup {
  val fields = Set("asn", "aspath", "communities", "netmask", "nexthop")

  def apply(addr: Column, nh: Column, table: graft.functions.Rib.Table,
      field: String): Column =
    GraftBridge.column(new RibLookup(GraftBridge.expression(addr),
      GraftBridge.expression(nh), table, field))
}
