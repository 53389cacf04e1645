package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Lpm

/** The per-flow enrichment pipeline (SURVEY §2.8 I5–I7; reference
  * `outlet/core/enricher.go:25-189`): metadata lookup joins, networks LPM
  * attributes, classifier rules, validation drops.
  *
  * Every lookup is a broadcast (stream-static) join or a closure-carried
  * LPM table — the flow stream itself never shuffles during enrichment.
  */
object Enrichment {

  /** Interface metadata dimension: one row per (ExporterAddress, IfIndex)
    * (reference `outlet/metadata`, J3). Expected columns:
    * exporter_addr binary, if_index int, exporter_name, if_name, if_desc,
    * if_speed, if_connectivity, if_provider, if_boundary.
    */
  final case class MetadataDim(df: DataFrame)

  /** Classifier rule (reference expr-lang classifiers, I6): when
    * `condition` holds, assign `outputs` (column → value expression);
    * first matching rule wins per output. `reject` drops the flow.
    */
  final case class Rule(
      condition: Column,
      outputs: Map[String, Column] = Map.empty,
      reject: Boolean = false)

  /** Joins interface metadata for both directions. A flow survives with
    * ONE matched side (partial attrs stay null); only flows with metadata
    * on NEITHER side drop, counted via the `metadata` observer —
    * reference `enricher.go:82-89` skips when "input and output
    * interfaces missing" and keeps one-sided matches.
    */
  def withMetadata(flows: DataFrame, metadata: MetadataDim): DataFrame = {
    def side(df: DataFrame, prefix: String, idxCol: String): DataFrame = {
      val m = metadata.df.select(
        col("exporter_addr"), col("if_index"),
        col("exporter_name").as("m_exporter_name"),
        col("if_name").as(s"${prefix}Name"),
        col("if_desc").as(s"${prefix}Description"),
        col("if_speed").as(s"${prefix}Speed"),
        col("if_connectivity").as(s"${prefix}Connectivity"),
        col("if_provider").as(s"${prefix}Provider"),
        col("if_boundary").as(s"${prefix}Boundary"))
      val joined = df.join(broadcast(m),
        df("ExporterAddress") === m("exporter_addr") &&
          df(idxCol) === m("if_index"),
        "left")
        .drop("exporter_addr", "if_index")
      // ExporterName comes from whichever side matched first
      (if (joined.columns.contains("ExporterName"))
        joined.withColumn("ExporterName",
          coalesce(col("ExporterName"), col("m_exporter_name")))
      else joined.withColumn("ExporterName", col("m_exporter_name")))
        .drop("m_exporter_name")
    }
    val enriched = side(side(flows, "InIf", "InIfIndex"), "OutIf", "OutIfIndex")
    enriched
      .observe("metadata",
        count(lit(1)).as("rows"),
        count(when(col("InIfName").isNull && col("OutIfName").isNull, 1))
          .as("dropped_no_interface"))
      .where(col("InIfName").isNotNull || col("OutIfName").isNotNull)
  }

  /** Networks LPM attributes for Src and Dst addresses (J5): attaches
    * `<Src|Dst><attr>` for every attribute name in `attrs`, preferring an
    * existing non-null value (provider precedence = coalesce chain, I5).
    */
  def withNetworks(flows: DataFrame, table: Lpm.Table,
      attrs: Map[String, String]): DataFrame = {
    Seq("Src", "Dst").foldLeft(flows) { (df, dir) =>
      attrs.foldLeft(df) { case (d, (attrName, colSuffix)) =>
        val target = s"$dir$colSuffix"
        val looked = Lpm.lookupAttr(table, attrName)(col(s"${dir}Addr"))
        if (d.columns.contains(target))
          d.withColumn(target, coalesce(col(target), looked))
        else d.withColumn(target, looked)
      }
    }
  }

  /** Applies classifier rules: rejects first, then first-match-wins
    * assignments per output column.
    */
  def withClassifiers(flows: DataFrame, rules: Seq[Rule]): DataFrame = {
    val rejectPred = rules.filter(_.reject).map(_.condition)
      .reduceOption(_ || _)
    val kept = rejectPred.fold(flows)(p => flows.where(!coalesce(p, lit(false))))
    val outputs = rules.filterNot(_.reject).flatMap(_.outputs.keys).distinct
    outputs.foldLeft(kept) { (df, out) =>
      val cases = rules.filterNot(_.reject).flatMap(r =>
        r.outputs.get(out).map(v => (r.condition, v)))
      val chain = cases.foldLeft[Column](
        if (df.columns.contains(out)) col(out) else lit(null)) {
        case (acc, (cond, value)) => when(cond && acc.isNull, value).otherwise(acc)
      }
      df.withColumn(out, chain)
    }
  }

  /** Custom-dictionary generated columns (J2, reference
    * `common/schema/root.go:107-184`): broadcast left join on the dict key,
    * missing keys get the dictGetOrDefault default. Materialized at ingest
    * exactly like the reference's raw-consumer MV, so the query plane sees
    * plain columns.
    */
  def withCustomDict(flows: DataFrame, dict: graft.schema.CustomDict,
      source: DataFrame): DataFrame = {
    // exactly one row per key: duplicate dict rows would fan out flow rows
    // and inflate every downstream aggregate, whereas the reference's
    // dictGetOrDefault always returns a single value per key. min(struct)
    // picks the surviving attribute tuple deterministically (lexicographic
    // over the attributes), independent of partitioning.
    val attrOut = dict.attributes.values.toSeq
    val sel = source.select(
      col(dict.dictKeyColumn).as("__dict_key") +:
        dict.attributes.map { case (a, out) => col(a).as(out) }.toSeq: _*)
      .groupBy("__dict_key")
      .agg(min(struct(attrOut.map(col): _*)).as("__attrs"))
      .select(col("__dict_key") +:
        attrOut.map(a => col(s"__attrs.`$a`").as(a)): _*)
    val joined = flows.join(broadcast(sel),
      flows(dict.keyColumn) === col("__dict_key"), "left")
      .drop("__dict_key")
    dict.attributes.values.foldLeft(joined) { (d, out) =>
      d.withColumn(out, coalesce(col(out), lit(dict.default)))
    }
  }

  /** Custom dictionary with the reference's `ip_trie` layout (J2;
    * `common/schema/config.go:93-104`): the dictionary key column holds
    * CIDR prefixes and the flow key is a 16-byte address, so lookups are
    * longest-prefix-match with parent-attribute inheritance — the same
    * semantics as the networks join (J5), applied to user dictionaries.
    *
    * Joinless: the prefix table builds ONCE on the driver (inheritance
    * flattened at build) and ships in the task closure; each address
    * resolves by binary search + parent chain. The fact stream never
    * shuffles — the equi-join path of [[withCustomDict]] covers hashed
    * layouts, this covers the trie layout.
    */
  def withCustomDictTrie(flows: DataFrame, dict: graft.schema.CustomDict,
      source: DataFrame): DataFrame = {
    import graft.functions.Lpm
    val attrIn = dict.attributes.keys.toSeq
    val entries = source
      .select(col(dict.dictKeyColumn).cast("string").as("__prefix") +:
        attrIn.map(a => col(a).cast("string").as(a)): _*)
      .collect().toSeq.map { r =>
        Lpm.PrefixEntry(r.getAs[String]("__prefix"),
          attrIn.flatMap(a => Option(r.getAs[String](a)).map(a -> _)).toMap)
      }
    val table = Lpm.Table.build(entries)
    dict.attributes.foldLeft(flows) { case (d, (a, out)) =>
      d.withColumn(out,
        coalesce(Lpm.lookupAttr(table, a)(col(dict.keyColumn)),
          lit(dict.default)))
    }
  }

  /** Validation (I7): drop flows with no sampling rate or zero packets;
    * attach named observers so drop causes are countable from the driver
    * (the Spark analogue of the reference's per-cause metrics).
    */
  def validated(flows: DataFrame): DataFrame = {
    flows
      .observe("enrichment",
        count(lit(1)).as("rows"),
        count(when(col("SamplingRate").isNull || col("SamplingRate") <= 0, 1))
          .as("dropped_sampling"),
        count(when(col("Packets").isNull || col("Packets") <= 0, 1))
          .as("dropped_empty"))
      .where(col("SamplingRate").isNotNull && col("SamplingRate") > 0 &&
        col("Packets").isNotNull && col("Packets") > 0)
  }
}
