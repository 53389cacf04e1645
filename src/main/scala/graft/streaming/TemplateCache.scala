package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful template decoding (SURVEY §2.8 I2): NetFlow v9/IPFIX data
  * records are opaque until the exporter's template record arrives, so the
  * decoder keeps a per-(exporter, observation domain) template cache
  * (reference `outlet/flow/decoder/netflow/templates.go` — per-exporter
  * state, persisted, data records with no template dropped and counted).
  *
  * Spark shape: `flatMapGroupsWithState` keyed by exporter — the idiomatic
  * carrier for per-key evolving state in Structured Streaming. State is a
  * small map (template id → field names) per exporter; it lives in the
  * state store (checkpointed, partitioned by key), so a 1000-executor
  * cluster holds each exporter's templates exactly where that exporter's
  * records hash — no broadcast, no coordination.
  *
  * Late/refreshed templates replace earlier ones (reference semantics);
  * data records arriving before their template are dropped and surface in
  * the per-exporter `misses` counter carried on every decoded row batch.
  */
object TemplateCache {

  /** One wire record: a template definition (`kind = "template"`,
    * payload = comma-separated field names) or a data record
    * (`kind = "data"`, payload = comma-separated values). `seq` is the
    * exporter's packet sequence number (NetFlow carries one): rows within
    * a micro-batch are processed in `seq` order, since Spark does not
    * guarantee row order within a group.
    */
  final case class RawRecord(
      exporter: String, kind: String, templateId: Int, payload: String,
      seq: Long = 0L)

  /** A decoded data record: field name → value per its template. */
  final case class DecodedRecord(
      exporter: String, templateId: Int, fields: Map[String, String],
      misses: Long)

  /** Per-exporter state: known templates + dropped-record count. */
  final case class ExporterState(
      templates: Map[Int, Seq[String]], misses: Long)

  private def decodeGroup(
      exporter: String,
      rows: Iterator[RawRecord],
      state: GroupState[ExporterState]): Iterator[DecodedRecord] = {
    var st = state.getOption.getOrElse(ExporterState(Map.empty, 0L))
    val out = scala.collection.mutable.ArrayBuffer[DecodedRecord]()
    rows.toSeq.sortBy(_.seq).foreach { r =>
      r.kind match {
        case "template" =>
          // limit -1 like the data-record split: a plain split drops
          // trailing empty field names and the arity check would then
          // reject conforming records
          st = st.copy(templates =
            st.templates + (r.templateId -> r.payload.split(",", -1).toSeq))
        case _ =>
          st.templates.get(r.templateId) match {
            case Some(fieldNames) =>
              val values = r.payload.split(",", -1)
              // a value count that disagrees with the template is a
              // malformed or stale-template record — dropped and counted
              // like an unknown template (zip would silently truncate,
              // masking the mismatch with a partial row)
              if (values.length == fieldNames.length)
                out += DecodedRecord(exporter, r.templateId,
                  fieldNames.zip(values).toMap, st.misses)
              else st = st.copy(misses = st.misses + 1)
            case None =>
              st = st.copy(misses = st.misses + 1)
          }
      }
    }
    state.update(st)
    out.iterator
  }

  /** Decodes a raw-record stream against the evolving per-exporter
    * template cache. Works identically on batch Datasets (Spark runs
    * `flatMapGroupsWithState` over groups) and streams (state persists
    * across micro-batches via the checkpointed state store).
    */
  def decode(stream: Dataset[RawRecord]): Dataset[DecodedRecord] = {
    implicit val stateEnc = Encoders.product[ExporterState]
    implicit val outEnc = Encoders.product[DecodedRecord]
    stream
      .groupByKey(_.exporter)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(decodeGroup)
  }
}
