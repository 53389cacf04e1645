package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** JSONL corpus ingestion: every line routed exactly once, with the
  * right cause.
  */
class DocJsonlSpec extends SparkSpec {
  import spark.implicits._

  private def writeLines(lines: Seq[String]): String = {
    val f = Files.createTempFile("docs", ".jsonl")
    Files.write(f, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  test("good, missing-field, and malformed lines route exactly once") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0", "n_chars": 11}""",
      """{"doc_id": 2, "text": "ok", "lang": "en", "source": "s1", "n_chars": 2}""",
      """{"text": "no id here", "lang": "en", "source": "s0", "n_chars": 10}""",
      """{"doc_id": 4, "lang": "en", "source": "s0", "n_chars": 0}""",
      """{"doc_id": "not-a-number", "text": "type drift", "source": "s0"}""",
      """this is not json at all""",
      """{"doc_id": 7, "text": "trailing", "source":""" // truncated
    ))
    val tagged = DocJsonl.read(spark, path)
    assert(tagged.count() === 7)
    val good = DocJsonl.good(tagged)
    assert(good.select("doc_id").as[Long].collect().sorted === Array(1L, 2L))
    val counts = DocJsonl.dropCounts(tagged)
      .as[(String, Long)].collect().toMap
    assert(counts === Map(
      // non-json line, truncated line, AND the type-drift line:
      // PERMISSIVE corrupts the whole record on a type mismatch
      "malformed_json" -> 3L,
      "missing_id" -> 1L,
      "missing_text" -> 1L))
    // reject stream keeps the raw line for malformed json
    val raws = DocJsonl.bad(tagged)
      .where($"drop_cause" === "malformed_json")
      .select("raw").as[String].collect()
    assert(raws.exists(_.contains("not json at all")))
  }

  test("streaming ingest routes across arriving files with live counters") {
    val dir = Files.createTempDirectory("docstream")
    val tagged = DocJsonl.readStream(spark, dir.toString)
    val q = DocJsonl.dropCounts(tagged)
      .writeStream.format("memory").queryName("doc_drops")
      .outputMode("complete").start()
    try {
      Files.write(dir.resolve("a.jsonl"),
        ("""{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""" +
          "\n" + """not json""").getBytes(StandardCharsets.UTF_8))
      q.processAllAvailable()
      val c1 = spark.table("doc_drops").as[(String, Long)].collect().toMap
      assert(c1 === Map("malformed_json" -> 1L))
      Files.write(dir.resolve("b.jsonl"),
        ("""{"text": "no id", "lang": "en", "source": "s", "n_chars": 5}""" +
          "\n" + """broken too""").getBytes(StandardCharsets.UTF_8))
      q.processAllAvailable()
      val c2 = spark.table("doc_drops").as[(String, Long)].collect().toMap
      assert(c2 === Map("malformed_json" -> 2L, "missing_id" -> 1L))
    } finally q.stop()
  }

  test("a fully clean file yields no rejects") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "a", "lang": "en", "source": "s", "n_chars": 1}""",
      """{"doc_id": 2, "text": "b", "lang": "de", "source": "s", "n_chars": 1}"""))
    val tagged = DocJsonl.read(spark, path)
    assert(DocJsonl.good(tagged).count() === 2)
    assert(DocJsonl.dropCounts(tagged).count() === 0)
  }
}
