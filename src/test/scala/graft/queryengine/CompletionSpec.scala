package graft.queryengine

import graft.SparkSpec
import graft.schema.FlowSchema
import org.apache.spark.sql.functions._

class CompletionSpec extends SparkSpec {
  private val schema = FlowSchema.schema

  test("column completion by prefix") {
    val got = Completion.complete(schema, "SrcCo").map(_.value)
    assert(got.contains("SrcCountry"))
    assert(got.forall(_.toLowerCase.startsWith("srcco")))
  }

  test("operator completion after a column") {
    val got = Completion.complete(schema, "SrcPort ").map(_.value).toSet
    assert(got.exists(Set("=", "!=", ">=", "IN")))
    assert(Completion.complete(schema, "SrcAddr ").map(_.value).toSet
      .contains("<<"))
  }

  test("complete filter yields no suggestions") {
    assert(Completion.complete(schema, "SrcPort = 443").isEmpty)
  }

  test("a fresh token after AND/( suggests all columns, not the keyword") {
    // trailing space: the NEXT token is starting — prefix must be empty
    // (trimming first would make "and" the prefix and suggest nothing)
    val afterAnd = Completion.complete(schema, "SrcPort = 443 AND ")
    assert(afterAnd.nonEmpty && afterAnd.forall(_.kind == "column"))
    val afterParen = Completion.complete(schema, "(")
    assert(afterParen.nonEmpty)
    // no trailing space: the last token IS the prefix being typed
    val typing = Completion.complete(schema, "SrcPort = 443 AND SrcCo")
    assert(typing.map(_.value).contains("SrcCountry"))
  }

  test("value completion ranks by position then frequency, merges dict") {
    import spark.implicits._
    val flows = Seq("https", "https", "http", "ssh", "sshd")
      .toDF("DstPortName")
    val dict = Seq("httpx").toDF("v")
    val got = Completion.values(flows, "DstPortName", "http",
      dictionary = Some(dict), limit = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // position 1 matches first; within equal position, frequency desc
    assert(got.map(_._1) == Seq("https", "http", "httpx"))
    assert(got.head._2 == 2L)
    val bare = Completion.values(flows, "DstPortName", "ss").collect()
      .map(_.getString(0)).toSeq
    assert(bare == Seq("ssh", "sshd"))
  }
}
