package graft.filter

/** Typed AST of the filter DSL (reference grammar:
  * `console/filter/parser.peg`; helpers `console/filter/helpers.go`).
  */
sealed trait FilterExpr
object FilterExpr {
  final case class And(l: FilterExpr, r: FilterExpr) extends FilterExpr
  final case class Or(l: FilterExpr, r: FilterExpr) extends FilterExpr
  final case class Not(e: FilterExpr) extends FilterExpr

  sealed trait Value
  final case class NumV(v: Long) extends Value
  final case class StrV(v: String) extends Value
  final case class IpV(bytes: Array[Byte]) extends Value
  final case class CidrV(cidr: String) extends Value
  final case class MacV(v: Long) extends Value
  /** 32-bit community packed (a<<16)|b. */
  final case class CommunityV(v: Long) extends Value
  /** large community a:b:c packed into a decimal UInt128. */
  final case class LargeCommunityV(v: java.math.BigDecimal) extends Value
  /** right-hand side referencing another column (string compare). */
  final case class ColV(name: String) extends Value

  sealed trait Op
  case object Eq extends Op
  case object Ne extends Op
  case object Lt extends Op
  case object Le extends Op
  case object Gt extends Op
  case object Ge extends Op
  case object Like extends Op
  case object ILike extends Op
  case object Unlike extends Op
  case object IUnlike extends Op
  /** subnet containment `<<` / `!<<`. */
  case object InSubnet extends Op
  case object NotInSubnet extends Op

  final case class Cmp(column: String, op: Op, value: Value) extends FilterExpr
  final case class In(column: String, values: Seq[Value], negated: Boolean)
      extends FilterExpr
}

/** Parse error with position and the token classes that would have been
  * accepted — powers operator auto-completion
  * (reference `console/filter/error.go`).
  */
final case class FilterParseError(pos: Int, message: String,
    expected: Set[String]) extends Exception(s"at $pos: $message")
