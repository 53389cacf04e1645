package graft.decode

import scala.collection.mutable.ArrayBuffer

/** The RawFlow envelope — the wire contract between the inlet (UDP
  * receivers) and the outlet workers (reference `common/pb/rawflow.proto:6-34`,
  * consumed at `outlet/core/worker.go:61-68`). Hand-rolled proto3 codec:
  * the message uses only varint and length-delimited fields, so a full
  * protobuf runtime is unnecessary.
  *
  * Field numbers: 1 time_received (varint), 2 payload (bytes),
  * 3 source_address (bytes, 16), 4 use_source_address (varint bool),
  * 5 decoder (varint enum), 6 timestamp_source (varint enum),
  * 7 decapsulation_protocol (varint enum), 8 rate_limit (varint).
  */
final case class RawFlow(
    timeReceived: Long = 0L,
    payload: Array[Byte] = Array.emptyByteArray,
    sourceAddress: Array[Byte] = Array.emptyByteArray,
    useSourceAddress: Boolean = false,
    decoder: Int = RawFlow.DecoderUnspecified,
    timestampSource: Int = DecodeOptions.TsInput,
    decapsulationProtocol: Int = 0,
    rateLimit: Long = 0L)

object RawFlow {
  val DecoderUnspecified = 0
  val DecoderNetflow = 1
  val DecoderSflow = 2
  val DecoderGob = 3

  val DecapNone = 0
  val DecapIpip = 1
  val DecapGre = 2
  val DecapVxlan = 3
  val DecapSrv6 = 4

  def decapOf(i: Int): PacketParse.Decap = i match {
    case DecapIpip => PacketParse.DecapIpip
    case DecapGre => PacketParse.DecapGre
    case DecapVxlan => PacketParse.DecapVxlan
    case DecapSrv6 => PacketParse.DecapSrv6
    case _ => PacketParse.DecapNone
  }

  private def writeVarint(out: ArrayBuffer[Byte], v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    out += (v & 0x7f).toByte
  }

  private def writeBytes(out: ArrayBuffer[Byte], field: Int, b: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2)
    writeVarint(out, b.length.toLong)
    out ++= b
  }

  private def writeUint(out: ArrayBuffer[Byte], field: Int, v: Long): Unit =
    if (v != 0) { writeVarint(out, (field << 3) | 0); writeVarint(out, v) }

  /** proto3 serialization (zero/empty fields omitted, ascending order). */
  def encode(m: RawFlow): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    writeUint(out, 1, m.timeReceived)
    if (m.payload.nonEmpty) writeBytes(out, 2, m.payload)
    if (m.sourceAddress.nonEmpty) writeBytes(out, 3, m.sourceAddress)
    if (m.useSourceAddress) writeUint(out, 4, 1L)
    writeUint(out, 5, m.decoder.toLong)
    writeUint(out, 6, m.timestampSource.toLong)
    writeUint(out, 7, m.decapsulationProtocol.toLong)
    writeUint(out, 8, m.rateLimit)
    out.toArray
  }

  /** Light scan for field 3 (source_address) only — the group-key
    * extraction of [[graft.decode.DecodePipeline.envelope]]. Walks tags
    * and skips values without copying the (much larger) payload, so the
    * full envelope decodes exactly once, inside the group function.
    */
  def sourceAddressOf(data: Array[Byte]): Option[Array[Byte]] = {
    var pos = 0
    def varint(): Long = {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        if (pos >= data.length || shift > 63) throw new IllegalArgumentException("varint")
        val b = data(pos); pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    try {
      while (pos < data.length) {
        val tag = varint()
        val field = (tag >>> 3).toInt
        (tag & 7).toInt match {
          case 0 => varint()
          case 2 =>
            val len = varint().toInt
            if (len < 0 || pos + len > data.length)
              throw new IllegalArgumentException("length")
            if (field == 3)
              return Some(java.util.Arrays.copyOfRange(data, pos, pos + len))
            pos += len
          case 1 => pos += 8
          case 5 => pos += 4
          case w => throw new IllegalArgumentException(s"wire type $w")
        }
      }
      None
    } catch {
      case _: IllegalArgumentException => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Decode, skipping unknown fields per proto3 rules; returns None on a
    * malformed buffer (reference drops such flows with a counter,
    * `worker.go:64-68`).
    */
  def decode(data: Array[Byte]): Option[RawFlow] = {
    var m = RawFlow()
    var pos = 0

    def varint(): Long = {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        if (pos >= data.length || shift > 63) throw new IllegalArgumentException("varint")
        val b = data(pos); pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }

    try {
      while (pos < data.length) {
        val tag = varint()
        val field = (tag >>> 3).toInt
        val wire = (tag & 7).toInt
        wire match {
          case 0 =>
            val v = varint()
            field match {
              case 1 => m = m.copy(timeReceived = v)
              case 4 => m = m.copy(useSourceAddress = v != 0)
              case 5 => m = m.copy(decoder = v.toInt)
              case 6 => m = m.copy(timestampSource = v.toInt)
              case 7 => m = m.copy(decapsulationProtocol = v.toInt)
              case 8 => m = m.copy(rateLimit = v)
              case _ => ()
            }
          case 2 =>
            val len = varint().toInt
            if (len < 0 || pos + len > data.length)
              throw new IllegalArgumentException("length")
            val b = java.util.Arrays.copyOfRange(data, pos, pos + len)
            pos += len
            field match {
              case 2 => m = m.copy(payload = b)
              case 3 => m = m.copy(sourceAddress = b)
              case _ => ()
            }
          case 1 => // 64-bit, unknown field
            if (pos + 8 > data.length) throw new IllegalArgumentException("fixed64")
            pos += 8
          case 5 => // 32-bit, unknown field
            if (pos + 4 > data.length) throw new IllegalArgumentException("fixed32")
            pos += 4
          case _ => throw new IllegalArgumentException(s"wire type $wire")
        }
      }
      Some(m)
    } catch {
      case _: IllegalArgumentException => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}
