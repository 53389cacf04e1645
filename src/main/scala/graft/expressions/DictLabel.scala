package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `dictGetOrDefault('dict', 'name', key, default)` for small in-memory
  * dictionaries (reference J1/P1 labeling): the map ships as a
  * task-serialized reference object, one hash probe per row inside
  * codegen. For dictionaries too large to serialize with tasks, use a
  * broadcast DataFrame join instead — this is the scalar-lookup shape for
  * the small bounded dictionaries (ASNs, protocols, ports).
  */
case class DictLabel(child: Expression, dict: Map[Long, String],
    default: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dict_label needs an integral key, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "dict_label"

  private lazy val utf8: Map[Long, UTF8String] =
    dict.map { case (k, v) => k -> UTF8String.fromString(v) }
  private lazy val defaultUtf8 = UTF8String.fromString(default)

  def compute(key: Long): UTF8String = utf8.getOrElse(key, defaultUtf8)

  override def nullSafeEval(input: Any): Any = input match {
    case l: java.lang.Long => compute(l)
    case i: java.lang.Integer => compute(i.toLong)
    case s: java.lang.Short => compute(s.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dictLabel", this, classOf[DictLabel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute((long) $c);")
  }

  override protected def withNewChildInternal(c: Expression): DictLabel =
    copy(child = c)
}

object DictLabel {
  def apply(c: Column, dict: Map[Long, String], default: String): Column =
    GraftBridge.column(new DictLabel(GraftBridge.expression(c), dict, default))
}
