package graft.queryengine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.filter.FilterParser
import graft.schema.Schema

/** Filter completion (reference `POST /filter/complete`,
  * `console/filter.go:138-339`): suggests columns (schema, by prefix),
  * operators (expected-token extraction from a partial parse), and values
  * (frequency-ranked scan of recent flows UNION DISTINCT dictionary-wide
  * candidates, ordered by match position then frequency — A11 + §2.7).
  */
object Completion {

  final case class Suggestion(kind: String, value: String)

  /** Column / operator suggestions for a partial filter text. */
  def complete(schema: Schema, input: String, limit: Int = 20): Seq[Suggestion] = {
    val expected = FilterParser.expectedAt(schema, input)
    if (expected.isEmpty) return Nil // parses fully — nothing to suggest
    if (expected.contains("column")) {
      // a trailing space/paren means the NEXT token starts fresh — trimming
      // first would misuse the previous word (e.g. "X = 1 AND " → "and")
      // as the prefix and suggest nothing
      val prefix =
        if (input.isEmpty || input.last.isWhitespace || input.last == '(') ""
        else input.split("\\s+|\\(").lastOption.getOrElse("").toLowerCase
      schema.enabled.map(_.name)
        .filter(_.toLowerCase.startsWith(prefix))
        .sorted.take(limit)
        .map(Suggestion("column", _))
    } else {
      expected.toSeq.sorted.take(limit).map(Suggestion("operator", _))
    }
  }

  /** Value suggestions for one column: observed values ranked by match
    * position then frequency (reference `console/filter.go:25-45,
    * 218-339`), merged UNION DISTINCT with dictionary-wide candidates.
    */
  def values(flows: DataFrame, column: String, prefix: String,
      dictionary: Option[DataFrame] = None, limit: Int = 10): DataFrame = {
    val observed = flows.select(col(column).cast("string").as("v"))
      .where(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("freq"))
    val merged = dictionary match {
      case Some(d) =>
        observed.unionByName(
          d.select(col("v").cast("string").as("v"), lit(0L).as("freq")))
          .groupBy("v").agg(sum("freq").as("freq"))
      case None => observed
    }
    val p = prefix.toLowerCase
    val filtered = if (p.isEmpty) merged
      else merged.where(instr(lower(col("v")), p) > 0)
    filtered
      .orderBy(
        (if (p.isEmpty) lit(0) else instr(lower(col("v")), p)).asc,
        desc("freq"), asc("v"))
      .limit(limit)
      .select(col("v"), col("freq"))
  }
}
