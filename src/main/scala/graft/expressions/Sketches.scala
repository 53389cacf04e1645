package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass sketch expressions for the dedup operators.
  *
  * The composed-`functions._` forms of these sketches are O(k) passes over
  * the input array (`array_min(transform(...))` × k permutations for
  * MinHash, one `aggregate(...)` per bit for SimHash), each materializing
  * an intermediate array — ~128 allocations per row and an expression tree
  * big enough to fall out of whole-stage codegen. These native expressions
  * compute the whole signature in a single loop with zero intermediate
  * allocation, with `doGenCode` so they stay inside codegen.
  */

/** MinHash signature: for permutation i, min over the input hashes h of
  * (a(i)·h + b(i)) mod p with p = 2³¹−1 (same math as the reference's
  * k-permutation MinHash; all products < 2⁶² so no Long overflow).
  *
  * Input: `array<long>` of element hashes already reduced mod p.
  * Output: `array<long>` of length k (nulls never; empty input yields an
  * empty array — callers filter empty shingle sets first).
  */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression {
  require(a.length == b.length && a.nonEmpty)

  private val p = (1L << 31) - 1

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    // freshName for every local: nullSafeCodeGen only brace-scopes the body
    // when the child is nullable, so fixed names would collide when two
    // sketch expressions share one codegen'd projection
    val (n, k, mins, i, h, j, v) = (ctx.freshName("n"), ctx.freshName("k"),
      ctx.freshName("mins"), ctx.freshName("i"), ctx.freshName("h"),
      ctx.freshName("j"), ctx.freshName("v"))
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |int $n = $c.numElements();
         |int $k = $aRef.length;
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($h * $aRef[$j] + $bRef[$j]) % ${p}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = $n == 0
         |  ? new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0])
         |  : new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** 64-bit SimHash of an `array<long>` of element hashes: bit j of the
  * result is set iff Σ over hashes of (bit j set ? +1 : −1) is positive.
  * Single pass, 64 int counters, no intermediate arrays.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var res = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) res |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (n, counts, i, h, j, res, j2) = (ctx.freshName("n"),
      ctx.freshName("counts"), ctx.freshName("i"), ctx.freshName("h"),
      ctx.freshName("j"), ctx.freshName("res"), ctx.freshName("j2"))
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |int $n = $c.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long $res = 0L;
         |for (int $j2 = 0; $j2 < 64; $j2++) {
         |  if ($counts[$j2] > 0) $res |= 1L << $j2;
         |}
         |${ev.value} = $res;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** Dot product of two `array<double>` columns in one pass with no
  * intermediate allocation. The composed `aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)` form materializes the zipped array per evaluation — per
  * candidate PAIR in a similarity join. Accumulation order is
  * left-to-right, identical to the composed form, so results are
  * bit-for-bit unchanged.
  */
case class DotProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product needs two array<double>, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (n, acc, i) =
      (ctx.freshName("n"), ctx.freshName("acc"), ctx.freshName("i"))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Distinct word n-gram shingles of a token array, one pass.
  *
  * The composed form (`transform(sequence(...), i => concat_ws(" ",
  * element_at(toks, i), ...))`) re-evaluates the token-array *expression*
  * inside the lambda — n `element_at`s per shingle each re-running the
  * upstream regex split, ~3·|tokens| regex splits per row. Here the child
  * is evaluated exactly once and shingles assemble in a single loop,
  * first-occurrence order, duplicates dropped.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  def compute(input: ArrayData): ArrayData = {
    val m = input.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](m)
    var i = 0
    while (i < m) {
      toks(i) = input.getUTF8String(i)
      i += 1
    }
    i = 0
    while (i <= m - n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks(i + j); j += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call per row into [[compute]] — the child (typically a
    // regex split) is still evaluated exactly once by the surrounding
    // whole-stage-codegen'd projection
    val ref = ctx.addReferenceObj("shingler", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** Character n-grams of a string, positional (an occurrence stream — NOT
  * deduped, unlike [[WordShingles]]), in one O(len) pass over the UTF-8
  * bytes. The composed form (`transform(sequence(1, len-2), i =>
  * substr(t, i, 3))`) is quadratic per document: `substr` on UTF-8 has no
  * O(1) character index, so extracting position i costs O(i) — measured
  * ~4 s for 1.5 M trigrams where this expression takes milliseconds.
  * Walks character boundaries once, then emits each window as a byte
  * slice. Strings shorter than n yield an empty array.
  */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams needs string, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  def compute(input: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val bytes = input.getBytes
    val len = bytes.length
    // char start offsets (offs(c) = byte offset of char c; offs(chars)=len)
    val offs = new Array[Int](len + 1)
    var i = 0
    var chars = 0
    while (i < len) {
      offs(chars) = i
      chars += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(chars) = len
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](chars - n + 1)
    var k = 0
    while (k <= chars - n) {
      out(k) = UTF8String.fromBytes(bytes, offs(k), offs(k + n) - offs(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call per row into [[compute]]; the child stays inside
    // the surrounding whole-stage-codegen'd projection
    val ref = ctx.addReferenceObj("ngrammer", this, classOf[CharNGrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): CharNGrams =
    copy(child = c)
}

/** SQL registration for the native expressions whose parameters are
  * expressible as SQL arguments — after [[GraftFunctions.registerAll]],
  * `spark.sql("SELECT simhash64(...), word_shingles(..., 3), ...")` works
  * like any built-in.
  */
object GraftFunctions {
  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftBridge.registerFunction(spark, "word_shingles",
      args => WordShingles(args.head, intLit(args(1), "n")))
    GraftBridge.registerFunction(spark, "char_ngrams",
      args => CharNGrams(args.head, intLit(args(1), "n")))
    GraftBridge.registerFunction(spark, "simhash64",
      args => SimHash64(args.head))
    GraftBridge.registerFunction(spark, "rolling_hash64",
      args => RollingHash64(args.head))
    GraftBridge.registerFunction(spark, "normalize_text",
      args => NormalizeText(args.head))
    GraftBridge.registerFunction(spark, "dot_product",
      args => DotProduct(args.head, args(1)))
    GraftBridge.registerFunction(spark, "ip_to_string",
      args => IpToString(args.head))
    GraftBridge.registerFunction(spark, "ip_truncate",
      args => IpTruncate(args.head,
        intLit(args(1), "v4bits"), intLit(args(2), "v6bits")))
  }
}

/** Polynomial rolling hash (Rabin–Karp) over a string's UTF-8 bytes:
  * acc = (acc·B + byte) mod M with B = 131, M = 2⁶¹−1 (Mersenne).
  * acc·131 exceeds 64 bits, so the product is formed as 128 bits via
  * `Math.multiplyHigh` and reduced with the Mersenne identity
  * 2⁶⁴ ≡ 8 (mod 2⁶¹−1): hi·2⁶⁴ + lo ≡ 8·hi + (lo >>> 61) + (lo & M).
  * The 61-bit output space keeps duplicate-grouping birthday collisions
  * negligible at corpus scale (~10⁹ docs ⇒ p ≈ 2·10⁻⁴), unlike a 31-bit
  * modulus which reaches 50 % at only ~55 k docs. The DuckDB oracle
  * reproduces it exactly by folding over `hex(encode(text))` byte pairs
  * with HUGEINT arithmetic. One pass, zero allocation, codegen'd.
  * Empty strings hash to 0.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash64 needs string, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val M = RollingHash64.Mersenne61
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      val hi = Math.multiplyHigh(acc, 131L)
      val lo = acc * 131L
      var r = (hi << 3) + (lo >>> 61) + (lo & M)
      if (r >= M) r -= M
      r += (bytes(i) & 0xff)
      if (r >= M) r -= M
      acc = r
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (bytes, acc, i, hi, lo, r) =
      (ctx.freshName("bytes"), ctx.freshName("acc"), ctx.freshName("i"),
        ctx.freshName("hi"), ctx.freshName("lo"), ctx.freshName("r"))
    val M = s"${RollingHash64.Mersenne61}L"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  long $hi = Math.multiplyHigh($acc, 131L);
         |  long $lo = $acc * 131L;
         |  long $r = ($hi << 3) + ($lo >>> 61) + ($lo & $M);
         |  if ($r >= $M) $r -= $M;
         |  $r += ($bytes[$i] & 0xff);
         |  if ($r >= $M) $r -= $M;
         |  $acc = $r;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): RollingHash64 =
    copy(child = c)
}

object RollingHash64 {
  /** 2⁶¹−1, the largest Mersenne prime fitting a signed Long. */
  val Mersenne61: Long = (1L << 61) - 1
}

object Sketches {
  import GraftBridge.{column, expression}

  /** Column API for [[WordShingles]]. */
  def wordShingles(tokens: Column, n: Int): Column =
    column(WordShingles(expression(tokens), n))

  /** Column API for [[CharNGrams]]. */
  def charNGrams(text: Column, n: Int): Column =
    column(CharNGrams(expression(text), n))

  /** Column API for [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Column API for [[MinHashSig]]. */
  def minhashSig(hashes: Column, a: Array[Long], b: Array[Long]): Column =
    column(MinHashSig(expression(hashes), a, b))

  /** Column API for [[SimHash64]]. */
  def simhash64(hashes: Column): Column = column(SimHash64(expression(hashes)))

  /** Column API for [[RollingHash64]]. */
  def rollingHash64(text: Column): Column =
    column(RollingHash64(expression(text)))

  /** Column API for [[NormalizeText]]. */
  def normalizeText(text: Column): Column =
    column(NormalizeText(expression(text)))

  /** Column API for [[PqEncode]]. */
  def pqEncode(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    column(PqEncode(expression(vec), cb))

  /** Column API for [[PqLut]]. */
  def pqLut(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    column(PqLut(expression(vec), cb))
}
