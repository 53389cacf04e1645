package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native one-pass sketch expressions must agree exactly with the
  * composed `functions._` forms they replaced (same hash family, same
  * tie-breaking), in both interpreted eval and whole-stage codegen.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val P = (1L << 31) - 1

  test("MinHashSig matches array_min(transform(...)) per permutation") {
    val a = Array(3L, 7L, 12345L)
    val b = Array(11L, 0L, 999L)
    val df = Seq(
      Seq("a b c", "b c d", "c d e"),
      Seq("x y z"),
      Seq.empty[String]).toDF("sh")
    val hashes = transform(col("sh"), s => pmod(xxhash64(s), lit(P)))
    val composed = array((0 until 3).map { i =>
      array_min(transform(hashes, h => pmod(h * a(i) + b(i), lit(P))))
    }: _*)
    val rows = df.select(
      Sketches.minhashSig(hashes, a, b).as("native"),
      composed.as("composed")).collect()
    rows.foreach { r =>
      val native = r.getSeq[Long](0)
      val comp = r.getSeq[Any](1)
      if (comp.forall(_ == null)) assert(native.isEmpty) // empty input
      else assert(native == comp.map(_.asInstanceOf[Long]))
    }
  }

  test("SimHash64 matches per-bit aggregate votes") {
    val df = Seq(
      Seq("alpha", "beta", "gamma", "alpha"),
      Seq("one"),
      Seq.empty[String]).toDF("toks")
    val hashes = transform(col("toks"), t => xxhash64(t))
    val composedBits = (0 until 64).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val rows = df.select(
      Sketches.simhash64(hashes).as("native"),
      composedBits.as("composed")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("pq_encode rejects a vector that disagrees with the codebook shape") {
    import spark.implicits._
    // codebook: m=2 subspaces × ksub=2 centroids × dsub=2 dims → 4-dim input
    val cb = Array.fill(2, 2, 2)(0.5)
    val bad = Seq(Seq(1.0, 2.0, 3.0)).toDF("embedding") // 3 dims ≠ 4
    val err = intercept[Exception] {
      bad.select(Sketches.pqEncode(org.apache.spark.sql.functions
        .col("embedding"), cb)).collect()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("pq_encode")) ||
        mentions(t.getCause))
    assert(mentions(err))
    val ok = Seq(Seq(1.0, 2.0, 3.0, 4.0)).toDF("embedding")
    assert(ok.select(Sketches.pqEncode(org.apache.spark.sql.functions
      .col("embedding"), cb)).collect().length == 1)
  }

  test("expressions survive both codegen and interpreted paths") {
    val df = spark.range(200).select(
      array((0 until 16).map(i => xxhash64(col("id") + i)): _*).as("hs"))
    val a = Array.tabulate(8)(i => 2L * i + 1)
    val b = Array.tabulate(8)(i => 31L * i)
    val hashesModP = transform(col("hs"), h => pmod(h, lit(P)))
    val base = df.select(
      Sketches.minhashSig(hashesModP, a, b).as("mh"),
      Sketches.simhash64(col("hs")).as("sh"))
    val viaCodegen = base.collect()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interpreted = base.collect()
      assert(viaCodegen.map(_.toString).toSeq == interpreted.map(_.toString).toSeq)
    }
  }

  test("native expressions are SQL-callable after registration") {
    GraftFunctions.registerAll(spark)
    Seq(("the quick brown fox jumps", 1L)).toDF("text", "id")
      .createOrReplaceTempView("sqldocs")
    val row = spark.sql("""
      SELECT word_shingles(split(trim(text), '\\s+'), 3) AS sh,
             simhash64(transform(split(trim(text), '\\s+'), t -> xxhash64(t))) AS sim,
             dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp
      FROM sqldocs""").collect()(0)
    assert(row.getSeq[String](0) == Seq("the quick brown", "quick brown fox",
      "brown fox jumps"))
    assert(row.getLong(1) != 0L)
    assert(row.getDouble(2) == 11.0)
    val ip = spark.sql(
      "SELECT ip_to_string(ip_truncate(X'00000000000000000000ffff0a010203', 24, 128))")
      .collect()(0).getString(0)
    assert(ip == "10.1.2.0")
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}

class RollingHashSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("matches the reference polynomial over UTF-8 bytes") {
    // BigInt reference: (acc·131 + byte) mod 2⁶¹−1, no overflow tricks —
    // checks the multiplyHigh/Mersenne reduction in the expression.
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(BigInt(0))((a, b) =>
        (a * 131 + (b & 0xff)) % ((BigInt(1) << 61) - 1)).toLong
    val inputs = Seq("key agg row", "", "a", "the quick brown fox",
      "aé漢字", "x" * 5000)
    val got = inputs.toDF("t")
      .select(graft.expressions.Sketches.rollingHash64(col("t")))
      .as[Long].collect().toSeq
    assert(got == inputs.map(ref))
  }

  test("output exercises the full 61-bit range") {
    val fps = (1 to 64).map(i => s"doc $i body " + ("w" * i)).toDF("t")
      .select(graft.expressions.Sketches.rollingHash64(col("t")))
      .as[Long].collect()
    assert(fps.forall(fp => fp >= 0 && fp < ((1L << 61) - 1)))
    // with a 61-bit space, some hash of 64 random-ish docs should exceed 2³¹
    assert(fps.exists(_ > (1L << 31)))
  }

  test("order-sensitive unlike the bag-of-words fingerprint") {
    val df = Seq("alpha beta", "beta alpha").toDF("t")
    val fps = df.select(graft.expressions.Sketches.rollingHash64(col("t")))
      .as[Long].collect().toSet
    assert(fps.size == 2)
  }

  test("char ngrams slice by code point, not byte") {
    val df = Seq("héllo", "ab", "日本語だ", "xyz").toDF("t")
    val got = df.select(graft.expressions.Sketches.charNGrams(col("t"), 3))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(
      Seq("hél", "éll", "llo"),     // 2-byte é must not split
      Seq.empty,                     // shorter than n
      Seq("日本語", "本語だ"),        // 3-byte chars
      Seq("xyz")))
    // matches the substr-based composed form on multi-byte text
    val composed = df.select(expr(
      "CASE WHEN char_length(t) >= 3 THEN " +
        "transform(sequence(1, char_length(t) - 2), i -> substring(t, i, 3)) " +
        "ELSE array() END"))
      .as[Seq[String]].collect().toSeq
    assert(got == composed)
  }
}
