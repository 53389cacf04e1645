package graft.decode

/** One field spec of a (options) template record: IPFIX information
  * element id, wire length (0xffff = variable), enterprise number (0 =
  * IANA). RFC 3954 §5.2 / RFC 7011 §3.4.1.
  */
final case class TemplateField(ftype: Int, flen: Int, pen: Long)

/** A stored template: `kind` is "template" or "options_template";
  * `scopeCount` is the number of leading scope fields (options templates
  * only). Mirrors reference `outlet/flow/decoder/netflow/templates.go:33-49`
  * keyed by (version, obsDomainID, templateID) per exporter.
  */
final case class TemplateEntry(kind: String, scopeCount: Int, fields: Seq[TemplateField])

/** Per-exporter decode state: templates and option-derived sampling rates.
  * Encodable as a Spark product (string keys) so it can ride the
  * Structured-Streaming state store in `flatMapGroupsWithState` — each
  * exporter's templates live exactly where its records hash, no broadcast
  * (reference keeps the same per-exporter map in memory,
  * `templates.go:15-31`; Spark's state store adds checkpointing for free).
  */
final case class TemplateState(
    templates: Map[String, TemplateEntry],
    samplingRates: Map[String, Long],
    templatesSeen: Long,
    recordsDropped: Long) {

  import TemplateState.key

  def template(version: Int, obsDomainId: Long, templateId: Int): Option[TemplateEntry] =
    templates.get(key(version, obsDomainId, templateId))

  def withTemplate(version: Int, obsDomainId: Long, templateId: Int,
      entry: TemplateEntry): TemplateState =
    copy(templates = templates + (key(version, obsDomainId, templateId) -> entry),
      templatesSeen = templatesSeen + 1)

  def samplingRate(version: Int, obsDomainId: Long, samplerId: Long): Long =
    samplingRates.getOrElse(key(version, obsDomainId, samplerId), 0L)

  def withSamplingRate(version: Int, obsDomainId: Long, samplerId: Long,
      rate: Long): TemplateState =
    copy(samplingRates = samplingRates + (key(version, obsDomainId, samplerId) -> rate))

  def withDrop(): TemplateState = copy(recordsDropped = recordsDropped + 1)
}

object TemplateState {
  val empty: TemplateState = TemplateState(Map.empty, Map.empty, 0L, 0L)
  private def key(version: Int, obsDomainId: Long, id: Long): String =
    s"$version:$obsDomainId:$id"
}
