package graft.filter

import graft.schema.{ParserType, Schema}
import FilterExpr._

/** Recursive-descent parser for the filter DSL. Grammar surface mirrors the
  * reference PEG (`console/filter/parser.peg`, 418 LoC): boolean AND/OR/NOT
  * with SQL precedence, parentheses, `--` and C-style comments, and
  * column-type-driven comparison forms (`console/filter/helpers.go:146-155`).
  *
  * Column names resolve case-insensitively against the schema; unknown
  * columns and type-mismatched operators are parse errors.
  */
final class FilterParser(schema: Schema, input: String) {
  private var pos = 0
  private var expectedAt = 0
  private var expectedSet = Set.empty[String]

  private def fail(msg: String, expected: String*): Nothing = {
    if (pos >= expectedAt) {
      if (pos > expectedAt) { expectedAt = pos; expectedSet = Set.empty }
      expectedSet ++= expected
    }
    throw FilterParseError(expectedAt, msg, expectedSet)
  }

  private def expect(what: String): Unit = {
    if (pos >= expectedAt) {
      if (pos > expectedAt) { expectedAt = pos; expectedSet = Set.empty }
      expectedSet += what
    }
  }

  // --- lexing helpers -------------------------------------------------------
  private def ws(): Unit = {
    var advanced = true
    while (advanced) {
      advanced = false
      while (pos < input.length && input(pos).isWhitespace) { pos += 1; advanced = true }
      if (input.startsWith("--", pos)) {
        while (pos < input.length && input(pos) != '\n') pos += 1
        advanced = true
      }
      if (input.startsWith("/*", pos)) {
        val end = input.indexOf("*/", pos + 2)
        if (end < 0) fail("unterminated comment")
        pos = end + 2
        advanced = true
      }
    }
  }

  private def peekWord(): String = {
    var i = pos
    while (i < input.length && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
    input.substring(pos, i)
  }

  private def eatKeyword(kw: String): Boolean = {
    ws()
    val w = peekWord()
    if (w.equalsIgnoreCase(kw)) { pos += w.length; true } else { expect(kw); false }
  }

  private def eatSymbol(s: String): Boolean = {
    ws()
    if (input.startsWith(s, pos)) { pos += s.length; true } else { expect(s); false }
  }

  private def parseString(): String = {
    ws()
    if (pos >= input.length || (input(pos) != '\'' && input(pos) != '"'))
      fail("expected string literal", "string")
    val quote = input(pos)
    pos += 1
    val sb = new StringBuilder
    while (pos < input.length && input(pos) != quote) {
      if (input(pos) == '\\' && pos + 1 < input.length) {
        sb.append(input(pos + 1)); pos += 2
      } else { sb.append(input(pos)); pos += 1 }
    }
    if (pos >= input.length) fail("unterminated string")
    pos += 1
    sb.toString
  }

  private def parseNumber(): Long = {
    ws()
    val start = pos
    // literals past Long range are positioned parse errors, not
    // NumberFormatExceptions escaping the Either contract
    if (pos < input.length && input.startsWith("0x", pos)) {
      pos += 2
      while (pos < input.length && isHex(input(pos))) pos += 1
      if (pos == start + 2) fail("expected hex digits", "number")
      try java.lang.Long.parseLong(input.substring(start + 2, pos), 16)
      catch { case _: NumberFormatException =>
        pos = start; fail("hex literal out of range", "number") }
    } else {
      while (pos < input.length && input(pos).isDigit) pos += 1
      if (pos == start) fail("expected number", "number")
      try input.substring(start, pos).toLong
      catch { case _: NumberFormatException =>
        pos = start; fail("number out of range", "number") }
    }
  }

  private def isHex(c: Char): Boolean = c.isDigit ||
    (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** IPv4/IPv6 literal (unquoted or quoted). */
  private def parseIpLiteral(): String = {
    ws()
    if (pos < input.length && (input(pos) == '\'' || input(pos) == '"'))
      return parseString()
    val start = pos
    while (pos < input.length && (isHex(input(pos)) || input(pos) == '.' ||
      input(pos) == ':' || input(pos) == '/')) pos += 1
    if (pos == start) fail("expected IP address", "ip")
    input.substring(start, pos)
  }

  private def tryParse[A](p: () => A): Option[A] = {
    val save = pos
    try Some(p()) catch { case _: FilterParseError => pos = save; None }
  }

  // --- grammar --------------------------------------------------------------
  def parseFilter(): FilterExpr = {
    val e = parseOr()
    ws()
    if (pos < input.length) fail(s"unexpected input at '${input.drop(pos).take(20)}'")
    e
  }

  private def parseOr(): FilterExpr = {
    var left = parseAnd()
    while ({ ws(); peekWord().equalsIgnoreCase("OR") }) {
      pos += 2
      left = Or(left, parseAnd())
    }
    left
  }

  private def parseAnd(): FilterExpr = {
    var left = parseUnary()
    while ({ ws(); peekWord().equalsIgnoreCase("AND") }) {
      pos += 3
      left = And(left, parseUnary())
    }
    left
  }

  private def parseUnary(): FilterExpr = {
    ws()
    if (peekWord().equalsIgnoreCase("NOT")) {
      pos += 3
      Not(parseUnary())
    } else if (pos < input.length && input(pos) == '(') {
      pos += 1
      val e = parseOr()
      ws()
      if (pos >= input.length || input(pos) != ')') fail("expected ')'", ")")
      pos += 1
      e
    } else parseComparison()
  }

  private def parseComparison(): FilterExpr = {
    ws()
    val w = peekWord()
    if (w.isEmpty) fail("expected column name", "column")
    val spec = schema.enabled.find(_.name.equalsIgnoreCase(w))
      .getOrElse(fail(s"unknown column '$w'", "column"))
    pos += w.length
    import ParserType._
    spec.parserType match {
      case Ip => ipComparison(spec.name)
      case Prefix => prefixComparison(spec.name)
      case Mac => macComparison(spec.name)
      case Str => stringComparison(spec.name)
      case UInt => uintComparison(spec.name)
      case Proto => protoComparison(spec.name)
      case Asn => asnComparison(spec.name)
      case AsPath => aspathComparison(spec.name)
      case Community => communityComparison(spec.name)
      case ArrayUInt => arrayComparison(spec.name)
      case Boundary => enumComparison(spec.name, Seq("undefined", "external", "internal"))
      case Direction => enumComparison(spec.name, Seq("undefined", "ingress", "egress"))
      case EType => etypeComparison(spec.name)
    }
  }

  private def eqNeOp(): Op = {
    ws()
    if (eatSymbol("!=")) Ne
    else if (eatSymbol("=")) Eq
    else fail("expected operator", "=", "!=")
  }

  private def ipBytes(s: String): Array[Byte] =
    try graft.functions.Ip.parse(s)
    catch { case _: Exception => fail(s"invalid IP literal '$s'", "ip") }

  private def cidr(s: String): String = {
    try { graft.functions.Ip.cidrRange(s); s }
    catch { case _: FilterParseError => throw FilterParseError(pos, s"invalid subnet '$s'", Set("subnet"))
            case _: Exception => fail(s"invalid subnet '$s'", "subnet") }
  }

  private def ipValue(): Value = {
    val lit = parseIpLiteral()
    if (lit.contains('/')) CidrV(cidr(lit))
    else IpV(ipBytes(lit))
  }

  private def ipComparison(col: String): FilterExpr = {
    ws()
    if (eatSymbol("!<<")) Cmp(col, NotInSubnet, CidrV(cidr(parseIpLiteral())))
    else if (eatSymbol("<<")) Cmp(col, InSubnet, CidrV(cidr(parseIpLiteral())))
    else if (peekWord().equalsIgnoreCase("IN")) { pos += 2; In(col, parseList(() => ipValue()), negated = false) }
    else if (peekWord().equalsIgnoreCase("NOTIN")) { pos += 5; In(col, parseList(() => ipValue()), negated = true) }
    else {
      val op = if (eatSymbol("!=")) Ne else if (eatSymbol("=")) Eq
        else fail("expected operator", "=", "!=", "<<", "!<<", "IN", "NOTIN")
      Cmp(col, op, IpV(ipBytes(parseIpLiteral())))
    }
  }

  private def prefixComparison(col: String): FilterExpr = {
    val op = eqNeOp()
    val v = parseIpLiteral()
    if (!v.contains('/')) fail("expected prefix like 10.0.0.0/8", "prefix")
    Cmp(col, op, CidrV(cidr(v)))
  }

  private def macComparison(col: String): FilterExpr = {
    val op = eqNeOp()
    ws()
    val start = pos
    while (pos < input.length && (isHex(input(pos)) || input(pos) == ':' ||
      input(pos) == '-')) pos += 1
    if (pos == start) fail("expected MAC address", "mac")
    val lit = input.substring(start, pos)
    // malformed literals ("aa::bb" → empty segment, >2-hex words, wrong
    // group count) are positioned parse errors, not NumberFormatExceptions
    val parts = lit.split("[:-]", -1)
    if (parts.length != 6 || parts.exists(p => p.isEmpty || p.length > 2)) {
      pos = start
      fail("expected MAC address (6 colon/dash-separated hex octets)", "mac")
    }
    Cmp(col, op, MacV(graft.functions.Render.macToNum(lit)))
  }

  private def stringComparison(col: String): FilterExpr = {
    ws()
    val w = peekWord()
    def strOrCol(): Value = {
      ws()
      if (pos < input.length && (input(pos) == '\'' || input(pos) == '"'))
        StrV(parseString())
      else {
        val id = peekWord()
        if (id.nonEmpty && schema.enabled.exists(_.name.equalsIgnoreCase(id))) {
          pos += id.length
          ColV(schema.enabled.find(_.name.equalsIgnoreCase(id)).get.name)
        } else StrV(parseString())
      }
    }
    if (w.equalsIgnoreCase("LIKE")) { pos += 4; Cmp(col, Like, StrV(parseString())) }
    else if (w.equalsIgnoreCase("ILIKE")) { pos += 5; Cmp(col, ILike, StrV(parseString())) }
    else if (w.equalsIgnoreCase("UNLIKE")) { pos += 6; Cmp(col, Unlike, StrV(parseString())) }
    else if (w.equalsIgnoreCase("IUNLIKE")) { pos += 7; Cmp(col, IUnlike, StrV(parseString())) }
    else if (w.equalsIgnoreCase("IN")) { pos += 2; In(col, parseList(() => StrV(parseString())), negated = false) }
    else if (w.equalsIgnoreCase("NOTIN")) { pos += 5; In(col, parseList(() => StrV(parseString())), negated = true) }
    else {
      val op = if (eatSymbol("!=")) Ne else if (eatSymbol("=")) Eq
        else fail("expected operator", "=", "!=", "LIKE", "ILIKE", "UNLIKE", "IUNLIKE", "IN", "NOTIN")
      Cmp(col, op, strOrCol())
    }
  }

  private def uintComparison(col: String): FilterExpr = {
    ws()
    val w = peekWord()
    if (w.equalsIgnoreCase("IN")) { pos += 2; In(col, parseList(() => NumV(parseNumber())), negated = false) }
    else if (w.equalsIgnoreCase("NOTIN")) { pos += 5; In(col, parseList(() => NumV(parseNumber())), negated = true) }
    else {
      val op =
        if (eatSymbol("!=")) Ne
        else if (eatSymbol(">=")) Ge
        else if (eatSymbol("<=")) Le
        else if (eatSymbol(">")) Gt
        else if (eatSymbol("<")) Lt
        else if (eatSymbol("=")) Eq
        else fail("expected operator", "=", "!=", "<", "<=", ">", ">=", "IN", "NOTIN")
      Cmp(col, op, NumV(parseNumber()))
    }
  }

  /** IANA protocol names accepted by the proto parser (reference matches by
    * dictionary name, `helpers.go:237-242`); shared with dimension
    * rendering via [[graft.functions.Dictionaries]].
    */
  private val protoNames = graft.functions.Dictionaries.protocolNumbers

  private def protoComparison(col: String): FilterExpr = {
    ws()
    val save = pos
    // name form: Proto = 'TCP'
    if (pos < input.length) {
      val opOpt = tryParse { () =>
        val op = eqNeOp()
        ws()
        if (pos < input.length && (input(pos) == '\'' || input(pos) == '"')) {
          val name = parseString()
          val num = protoNames.getOrElse(name.toUpperCase,
            fail(s"unknown protocol name '$name'", "protocol"))
          (op, num)
        } else fail("not a name", "number")
      }
      opOpt match {
        case Some((op, num)) => return Cmp(col, op, NumV(num))
        case None => pos = save
      }
    }
    uintComparison(col)
  }

  private def asnLiteral(): Long = {
    ws()
    val w = peekWord()
    if (w.toUpperCase.startsWith("AS") && w.length > 2 && w.drop(2).forall(_.isDigit)) {
      pos += w.length
      w.drop(2).toLong
    } else parseNumber()
  }

  private def asnComparison(col: String): FilterExpr = {
    ws()
    val w = peekWord()
    if (w.equalsIgnoreCase("IN")) { pos += 2; In(col, parseList(() => NumV(asnLiteral())), negated = false) }
    else if (w.equalsIgnoreCase("NOTIN")) { pos += 5; In(col, parseList(() => NumV(asnLiteral())), negated = true) }
    else {
      val op = eqNeOp()
      Cmp(col, op, NumV(asnLiteral()))
    }
  }

  private def aspathComparison(col: String): FilterExpr = {
    val op = eqNeOp()
    Cmp(col, op, NumV(asnLiteral()))
  }

  private def communityComparison(col: String): FilterExpr = {
    val op = eqNeOp()
    ws()
    val a = parseNumber()
    if (!eatSymbol(":")) fail("expected ':' in community", ":")
    val b = parseNumber()
    val save = pos
    if (eatSymbol(":")) {
      val c = tryParse(() => parseNumber())
      c match {
        case Some(cv) =>
          // large community halves are 32-bit; an oversized word would
          // silently alias into its neighbor instead of erroring
          if (a > 0xffffffffL || b > 0xffffffffL || cv > 0xffffffffL)
            fail("large community part exceeds 32 bits", "community")
          return Cmp(col, op,
            LargeCommunityV(graft.functions.Render.packLargeCommunity(a, b, cv)))
        case None => pos = save
      }
    }
    // community halves are 16-bit: 1:65536 would alias to 2:0
    if (a > 0xffffL || b > 0xffffL)
      fail("community part exceeds 16 bits", "community")
    Cmp(col, op, CommunityV((a << 16) | b))
  }

  private def arrayComparison(col: String): FilterExpr = {
    val op = eqNeOp()
    Cmp(col, op, NumV(parseNumber()))
  }

  private def enumComparison(col: String, values: Seq[String]): FilterExpr = {
    val op = eqNeOp()
    ws()
    val v = if (pos < input.length && (input(pos) == '\'' || input(pos) == '"'))
      parseString()
    else { val w = peekWord(); pos += w.length; w }
    values.find(_.equalsIgnoreCase(v)) match {
      case Some(canonical) => Cmp(col, op, StrV(canonical))
      case None => fail(s"expected one of ${values.mkString(", ")}", values: _*)
    }
  }

  private def etypeComparison(col: String): FilterExpr = {
    val op = eqNeOp()
    ws()
    val v = if (pos < input.length && (input(pos) == '\'' || input(pos) == '"'))
      parseString()
    else { val w = peekWord(); pos += w.length; w }
    val num = v.toUpperCase match {
      case "IPV4" => 0x800L
      case "IPV6" => 0x86ddL
      case _ => fail("expected IPv4 or IPv6", "IPv4", "IPv6")
    }
    Cmp(col, op, NumV(num))
  }

  private def parseList(one: () => Value): Seq[Value] = {
    ws()
    if (pos >= input.length || input(pos) != '(') fail("expected '('", "(")
    pos += 1
    val buf = scala.collection.mutable.ArrayBuffer[Value]()
    buf += one()
    ws()
    while (pos < input.length && input(pos) == ',') {
      pos += 1
      buf += one()
      ws()
    }
    if (pos >= input.length || input(pos) != ')') fail("expected ')'", ")")
    pos += 1
    buf.toSeq
  }
}

object FilterParser {
  /** Parse, returning the AST or a positioned error. */
  def parse(schema: Schema, input: String): Either[FilterParseError, FilterExpr] =
    try Right(new FilterParser(schema, input).parseFilter())
    catch {
      case e: FilterParseError => Left(e)
      // belt: a literal-decoding throw must never escape the Either
      // contract (the validate/complete endpoints depend on it)
      case e @ (_: NumberFormatException | _: IllegalArgumentException) =>
        Left(FilterParseError(0,
          Option(e.getMessage).getOrElse("invalid literal"), Set.empty))
    }

  /** Expected-token extraction on a partial parse — powers completion
    * (reference `console/filter.go:138-164`).
    */
  def expectedAt(schema: Schema, input: String): Set[String] =
    parse(schema, input) match {
      case Left(e) => e.expected
      case Right(_) => Set.empty
    }
}
