package graft.decode

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Spark integration of the datagram decoders — the engine's ingest chain
  * (reference `outlet/core/worker.go:61-68` → `outlet/flow/decoder.go:21-56`):
  * RawFlow protobuf envelope → NetFlow/sFlow decode → [[DecodedFlow]] rows.
  *
  * Shape: `flatMapGroupsWithState` keyed by the exporter source address.
  * NetFlow v9/IPFIX is stateful (templates + option sampling rates must be
  * seen before data records decode), and hashing by exporter puts each
  * exporter's [[TemplateState]] exactly where its datagrams land — on a
  * 1000-executor cluster templates never broadcast, and the state store
  * checkpoints them for free. sFlow is stateless and passes through the
  * same group function.
  *
  * Works identically on batch Datasets and streams (Spark runs the same
  * group function; state persists across micro-batches in streaming).
  */
object DecodePipeline {

  /** One received datagram envelope: `data` is RawFlow protobuf bytes;
    * `exporter` the routing key (hex source address); `seq` a receive
    * sequence for deterministic in-group ordering (Spark does not preserve
    * row order within a group).
    */
  final case class RawEnvelope(exporter: String, seq: Long, data: Array[Byte])

  /** Wrap raw RawFlow protobuf bytes for decoding, extracting the group
    * key from the envelope's source address. Uses the field-3-only scan —
    * no payload copy — so the envelope protobuf is fully decoded exactly
    * once (inside the group function), not twice per datagram.
    */
  def envelope(seq: Long, rawFlowBytes: Array[Byte]): RawEnvelope = {
    val key = RawFlow.sourceAddressOf(rawFlowBytes)
      .map(_.map(b => f"${b & 0xff}%02x").mkString)
      .getOrElse("")
    RawEnvelope(key, seq, rawFlowBytes)
  }

  /** Decode one envelope against the exporter's template state.
    *
    * The envelope's `rate_limit` field is enforced downstream by
    * [[graft.streaming.RateLimit]] over the decoded stream — a batch
    * engine sees whole ticks, so limiting after decode (one window over
    * the same exporter partitioning) replaces the reference's in-worker
    * token bucket (`outlet/core/worker.go:78-99`).
    */
  def decodeOne(state: TemplateState, data: Array[Byte]): (TemplateState, Seq[DecodedFlow]) =
    RawFlow.decode(data) match {
      case None => (state, Nil) // undecodable protobuf: dropped + counted
      case Some(raw) =>
        val source = Addr.to16(raw.sourceAddress)
        if (source == null) (state, Nil)
        else {
          val options = DecodeOptions(raw.timestampSource, RawFlow.decapOf(raw.decapsulationProtocol))
          raw.decoder match {
            case RawFlow.DecoderNetflow =>
              val r = NetflowDecoder.decode(raw.payload, source, raw.timeReceived, options, state)
              (r.state, r.flows)
            case RawFlow.DecoderSflow =>
              val r = SflowDecoder.decode(raw.payload, raw.timeReceived, options)
              val flows =
                if (raw.useSourceAddress) r.flows.map(_.copy(ExporterAddress = source))
                else r.flows
              (state, flows)
            case _ => (state, Nil)
          }
        }
    }

  private def decodeGroup(exporter: String, rows: Iterator[RawEnvelope],
      state: GroupState[TemplateState]): Iterator[DecodedFlow] = {
    var st = state.getOption.getOrElse(TemplateState.empty)
    val out = scala.collection.mutable.ArrayBuffer.empty[DecodedFlow]
    rows.toSeq.sortBy(_.seq).foreach { env =>
      val (st2, flows) = decodeOne(st, env.data)
      st = st2
      out ++= flows
    }
    state.update(st)
    out.iterator
  }

  /** Batch or streaming decode of an envelope Dataset. */
  def decode(envelopes: Dataset[RawEnvelope]): Dataset[DecodedFlow] = {
    implicit val stateEnc = Encoders.product[TemplateState]
    implicit val outEnc = Encoders.product[DecodedFlow]
    envelopes
      .groupByKey(_.exporter)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(decodeGroup)
  }

  /** Replay a pcap capture as RawFlow envelopes (file-replay source S2):
    * each UDP datagram becomes one envelope with the capture timestamp,
    * mirroring what the reference inlet would have produced on the wire.
    */
  def pcapEnvelopes(spark: SparkSession, pcapBytes: Array[Byte],
      sourceAddress: Array[Byte], decoder: Int,
      timestampSource: Int = DecodeOptions.TsInput): Dataset[RawEnvelope] = {
    import spark.implicits._
    val envs = Pcap.datagrams(pcapBytes).zipWithIndex.map { case (d, i) =>
      envelope(i.toLong, RawFlow.encode(RawFlow(
        timeReceived = d.tsSec,
        payload = d.payload,
        sourceAddress = sourceAddress,
        decoder = decoder,
        timestampSource = timestampSource)))
    }
    spark.createDataset(envs)
  }
}
