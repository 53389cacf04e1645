package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.dedup.Dedup
import graft.operators.text.TextAnalysis

/** Streaming NEAR-duplicate candidate detection — the continuous twin of
  * [[graft.operators.dedup.Dedup.minhashLsh]] (the batch path over the
  * same signatures): incoming documents are MinHash-signed and banded in
  * one projection, and each (band, band-hash) bucket keeps ONE keeper —
  * the lowest doc id seen within the watermark horizon — in the state
  * store. A document landing in a non-empty bucket emits a candidate pair
  * against the keeper as it arrives, so near-dups surface while the
  * stream runs instead of waiting for the nightly batch pass.
  *
  * Semantics match the batch LSH stage: candidates are *bucket
  * collisions*, deliberately unverified — exact Jaccard verification
  * joins the shingle sets back by id, which needs the document store, not
  * the stream (same retrieve-then-verify split as the batch operator; a
  * candidate emitted here and verified false is dropped there). A pair is
  * emitted once per colliding band; downstream `dropDuplicates` or the
  * verify join collapses multiplicity.
  *
  * Scale shape: state per bucket is 3 longs, and buckets expire by
  * event-time timeout once the watermark passes their horizon, so state
  * is bounded by the number of DISTINCT band-buckets active within one
  * window — not stream history. Each bucket's state lives where its
  * (band, hash) key hashes; no shuffle beyond the groupBy's own.
  */
object StreamNearDup {

  final case class BandRow(doc_id: Long, ts: java.sql.Timestamp,
      band: Int, bh: Long)

  /** Bucket state: the keeper (lowest doc id in the horizon) and the
    * newest event time seen (drives the expiry timeout).
    */
  final case class Bucket(keeperId: Long, lastTsMs: Long)

  final case class Candidate(doc_id: Long, keeper_id: Long, band: Int)

  private def fold(horizonMs: Long)(
      key: (Int, Long),
      rows: Iterator[BandRow],
      state: GroupState[Bucket]): Iterator[Candidate] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val docs = rows.toSeq.sortBy(_.doc_id)
    val out = scala.collection.mutable.ArrayBuffer[Candidate]()
    var keeper = state.getOption.map(_.keeperId).getOrElse(Long.MaxValue)
    var lastTs = state.getOption.map(_.lastTsMs).getOrElse(0L)
    docs.foreach { d =>
      lastTs = math.max(lastTs, d.ts.getTime)
      if (keeper == Long.MaxValue) keeper = d.doc_id
      else if (d.doc_id < keeper) {
        // the newcomer has the lower id: it becomes keeper and the old
        // keeper is its candidate (ids in a pair always order keeper <)
        out += Candidate(keeper, d.doc_id, key._1)
        keeper = d.doc_id
      } else if (d.doc_id != keeper) out += Candidate(d.doc_id, keeper, key._1)
    }
    state.update(Bucket(keeper, lastTs))
    state.setTimeoutTimestamp(lastTs + horizonMs)
    out.iterator
  }

  /** Candidate pairs from a (doc_id, ts, text) stream. The caller must be
    * able to `withWatermark` on `tsCol` — it is applied here, and buckets
    * expire `horizon` past their newest document.
    */
  def candidates(stream: DataFrame, idCol: String, tsCol: String,
      textCol: String, k: Int = 128, bands: Int = 32, seed: Long = 42L,
      watermark: String = "10 minutes",
      horizonMs: Long = 600000L): Dataset[Candidate] = {
    val rowsPerBand = k / bands
    val banded = stream
      .select(col(idCol).cast("long").as("doc_id"),
        col(tsCol).cast("timestamp").as("ts"),
        // minhashSignature hashes the shingles itself (pmod(xxhash64, P)) —
        // passing pre-hashed values would double-hash and break signature
        // parity with the batch minhashLsh path
        Dedup.minhashSignature(TextAnalysis.shingles(col(textCol)), k, seed)
          .as("sig"))
      .where(size(col("sig")) > 0)
      .select(col("doc_id"), col("ts"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.cast("int").as("band"),
            xxhash64(b, slice(col("sig"), b * rowsPerBand + 1,
              lit(rowsPerBand))).as("bh")))).as("bb"))
      .select(col("doc_id"), col("ts"), col("bb.band"), col("bb.bh"))
      .withWatermark("ts", watermark)
      .as[BandRow](Encoders.product[BandRow])
    implicit val stateEnc = Encoders.product[Bucket]
    implicit val outEnc = Encoders.product[Candidate]
    banded
      .groupByKey(r => (r.band, r.bh))(
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold(horizonMs))
  }
}
