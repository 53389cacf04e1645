package graft.filter

import graft.functions.{Ip, Render}
import graft.schema.{ParserType, Schema}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import FilterExpr._

/** Compiled filter: the Spark predicate plus routing metadata
  * (reference `console/query/filter.go`: `MainTableRequired` drives
  * rollup-vs-main table selection).
  */
final case class CompiledFilter(
    predicate: Column,
    reversePredicate: Column,
    mainTableRequired: Boolean,
    referencedColumns: Set[String])

/** Compiles the filter AST into Spark `Column` predicates — once in normal
  * direction and once with Src↔Dst / InIf↔OutIf swapped (reference parses
  * the text twice, `console/query/filter.go:65-86`; we reuse one AST with
  * two column mappings, same semantics).
  */
object FilterCompiler {

  def compile(schema: Schema, input: String): Either[FilterParseError, CompiledFilter] =
    FilterParser.parse(schema, input).map { ast =>
      val refs = referenced(ast)
      CompiledFilter(
        predicate = compileExpr(schema, ast, reverse = false),
        reversePredicate = compileExpr(schema, ast, reverse = true),
        mainTableRequired = refs.exists(schema.isMainOnly),
        referencedColumns = refs)
    }

  def referenced(e: FilterExpr): Set[String] = e match {
    case And(l, r) => referenced(l) ++ referenced(r)
    case Or(l, r) => referenced(l) ++ referenced(r)
    case Not(x) => referenced(x)
    case Cmp(c, _, ColV(other)) => Set(c, other)
    case Cmp(c, _, _) => Set(c)
    case In(c, _, _) => Set(c)
  }

  def compileExpr(schema: Schema, e: FilterExpr, reverse: Boolean): Column = {
    def colOf(name: String): Column =
      col(if (reverse) schema.reverseName(name) else name)

    def valueLit(v: Value): Column = v match {
      case NumV(x) => lit(x)
      case StrV(x) => lit(x)
      case IpV(b) => lit(b)
      case MacV(x) => lit(x)
      case CommunityV(x) => lit(x)
      case LargeCommunityV(x) => lit(x)
      case ColV(other) => colOf(other)
      case CidrV(c) => lit(c)
    }

    e match {
      case And(l, r) => compileExpr(schema, l, reverse) && compileExpr(schema, r, reverse)
      case Or(l, r) => compileExpr(schema, l, reverse) || compileExpr(schema, r, reverse)
      case Not(x) => !compileExpr(schema, x, reverse)

      case Cmp(name, op, value) =>
        val c = colOf(name)
        val pt = schema.byName(name).parserType
        (op, value, pt) match {
          // subnet containment compiles to BETWEEN over the canonical bytes
          // (reference `helpers.go:288-313`)
          case (InSubnet, CidrV(cidr), _) => Ip.inSubnet(c, cidr)
          case (NotInSubnet, CidrV(cidr), _) => !Ip.inSubnet(c, cidr)
          // prefix column: "a.b.c.d/n" string equality on the rendered prefix
          // (reference `helpers.go:179-198`)
          case (o, CidrV(cidr), ParserType.Prefix) =>
            val base = c === lit(normalizePrefix(cidr))
            if (o == Ne) !base else base
          // array membership: has(col, x) (aspath/communities/array(uint))
          case (o, NumV(x), ParserType.AsPath | ParserType.ArrayUInt) =>
            val base = array_contains(c, x)
            if (o == Ne) !base else base
          case (o, CommunityV(x), _) =>
            val base = array_contains(c, x)
            if (o == Ne) !base else base
          case (o, LargeCommunityV(x), _) =>
            // large communities live in a sibling Decimal(39,0) array column
            val lcCol = colOf(largeCommunityColumn(name))
            val base = array_contains(lcCol, lit(x).cast("decimal(38,0)"))
            if (o == Ne) !base else base
          case (Eq, v, _) => c === valueLit(v)
          case (Ne, v, _) => c =!= valueLit(v)
          case (Lt, v, _) => c < valueLit(v)
          case (Le, v, _) => c <= valueLit(v)
          case (Gt, v, _) => c > valueLit(v)
          case (Ge, v, _) => c >= valueLit(v)
          case (Like, StrV(p), _) => c.like(p)
          case (ILike, StrV(p), _) => c.ilike(p)
          case (Unlike, StrV(p), _) => !c.like(p)
          case (IUnlike, StrV(p), _) => !c.ilike(p)
          case other => throw new IllegalStateException(s"unreachable: $other")
        }

      // IP IN-lists mix exact members with OR'd subnet ranges
      // (reference `helpers.go:203-231`)
      case In(name, values, negated) =>
        val c = colOf(name)
        val exact = values.collect {
          case IpV(b) => lit(b)
          case NumV(x) => lit(x)
          case StrV(x) => lit(x)
          case MacV(x) => lit(x)
        }
        val ranges = values.collect { case CidrV(cidr) => Ip.inSubnet(c, cidr) }
        val inPart = if (exact.nonEmpty) Some(c.isin(exact: _*)) else None
        val base = (inPart.toSeq ++ ranges).reduce(_ || _)
        if (negated) !base else base
    }
  }

  /** Large-community filters target the `<Src|Dst>LargeCommunities` column
    * even when written against `Communities` (reference `helpers.go:269-285`).
    */
  private def largeCommunityColumn(name: String): String =
    if (name.endsWith("LargeCommunities")) name
    else name.stripSuffix("Communities") + "LargeCommunities"

  /** Canonical "addr/len" rendering used by the prefix columns. */
  private def normalizePrefix(cidr: String): String = {
    val Array(ip, bits) = cidr.split("/")
    Ip.render(Ip.parse(ip)) + "/" + bits.toInt
  }
}
