package graft.operators.dedup

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, continuously-maintained dedup release: the storage twin of
  * [[Dedup.incrementalRelease]] for streaming corpus ingest
  * (`writeStream.foreachBatch((b, id) => store.ingest(b, Some(id)))`).
  *
  * Parquet tables under `path` — `docs` (the corpus), `scored` (the
  * accumulated scored pair set, (id_a, id_b, common, n_a, n_b,
  * batch)), `batches/batch=N` (the per-batch ACCEPTED-id sidecars)
  * and, for uncapped `lshFront` stores, the per-doc LSH-front state
  * (`shingles`/`bands`/`prefixes` — see below) — each append guarded
  * by the per-table commit markers every other store uses
  * ([[graft.store.CommitMarkers]]), so at-least-once `foreachBatch`
  * replays are exactly-once.
  *
  * ID CONTRACT: doc ids are globally unique across the STORE, not
  * across the stream — a re-crawled id arriving in a later batch is
  * IGNORED (first write wins; replace/update semantics are a different
  * store). The sidecar makes that replay-safe: a batch's accepted ids
  * (new, in-batch-deduped, not yet stored) are resolved ONCE, before
  * any append, and persisted; a replay — even one interleaved with a
  * partial docs append — reuses the stored set, so batch membership in
  * the pair delta is identical on every attempt and the docs append
  * (itself anti-joined against the live table) lands each accepted row
  * exactly once.
  *
  * Each ingest pays [[Dedup.incrementalScoredPairs]]' cost — the
  * batch's shingle stream probing the accumulated corpus plus the
  * batch self-join; corpus×corpus is never re-joined, which is the only
  * affordable cadence at 100 TB. [[products]] re-derives the full
  * eight-product release from the stored pair set on demand, exactly
  * like a from-scratch [[Dedup.releasePipeline]] over the accumulated
  * corpus (uncapped, bit-identically — ReleaseStoreSpec pins it; the
  * capped df-drift contract is [[Dedup.incrementalRelease]]'s).
  *
  * SHAPE PIN: the constructor knobs that determine what the persisted
  * tables mean (fronts, cap, band shape, seed, columns) are recorded
  * in `store.meta` at first ingest and validated on every entry point
  * — a reopen with a different shape throws instead of silently
  * misreading the tables; the two in-place upgrades (either front
  * false → true) stay legal and move the pin.
  *
  * GROWTH DISCIPLINE (a year of 5-second batches must not mean ~6M
  * files): [[compact]] rewrites `docs`/`scored` to target-sized files
  * with the FlowStore write-temp-then-swap install (no reader window
  * over a half-written table) and prunes sidecars for fully-committed
  * batches; and [[productsCached]] maintains the CC label table
  * incrementally per threshold — new pairs merge into the persisted
  * labels (prior components ride along as star edges), so a release
  * over years of accumulated pairs re-clusters only what the latest
  * batches added.
  */
final class ReleaseStore(protected val spark: SparkSession,
    protected val path: String,
    idCol: String, textCol: String, maxShingleDf: Option[Int] = None,
    /** LSH-front the per-batch delta ([[Dedup.incrementalLshScoredPairs]]):
      * banded batch×all + one-side-batch prefix probes instead of the
      * exact index probe join. Same union-completeness argument as
      * [[Dedup.incrementalReleaseLsh]] — every ≥-threshold pair is
      * batch-touching exactly when its later doc arrives, so the
      * accumulated scored set yields identical products (spec-pinned);
      * gate the band shape with [[Dedup.lshAudit]] for the corpus's
      * similarity profile before trusting Jaccard recall at scale.
      */
    lshFront: Boolean = false,
    containThreshold: Double = 0.8,
    k: Int = 128, bands: Int = 32, seed: Long = 42L,
    /** Hash the LSH front in the oracle-replicable family (48-bit md5
      * shingles, slice-equality banding — [[Dedup.lshScoredPairs]]'
      * `portable`): gate queries construct portable stores so an
      * external SQL oracle can replicate the accumulated release;
      * production stores keep the ~order-cheaper xxhash64 family. A
      * STORE-WIDE property — the two families' shingle/band state rows
      * are mutually unreadable — so it is pinned in `store.meta` like
      * every other shape knob.
      */
    portable: Boolean = false,
    /** Store LSH-front state COLLAPSED by distinct shingle set (the
      * [[Dedup.releasePipelineLsh]] `collapseExact` posture made
      * durable): state tables hold one row per distinct set (its
      * REPRESENTATIVE — the first-ingested min id), a `members`
      * (id, rep, batch) table records which docs carry each set, and
      * `scored` accumulates REP-level pairs that [[products]] expands
      * to member level on read (cross pairs inherit the rep pair's
      * scores; within-group pairs synthesize at common = n — exactness
      * per [[Dedup.expandCollapsedScored]]). The crawl-store payoff: a
      * batch that is mostly exact duplicates of stored content appends
      * ONLY membership rows — no state rows, no probes, no scored
      * rows — so per-batch ingest cost tracks NOVEL content, not batch
      * size, and the store's state tables grow with distinct content,
      * not the crawl. Requires the uncapped `lshFront` shape
      * (stateEnabled); a construction-time property of the store — an
      * existing per-doc store upgrades in place by a one-time backfill
      * (state rebuilt rep-level, `scored` rewritten to rep pairs —
      * identical sets score identically, so the rewrite is a pure
      * dedup) on first ingest.
      */
    collapseFront: Boolean = false,
    /** Id-hash bucket count for the LAYOUT of the id-keyed tables
      * (`docs`, `shingles`/`bands`/`prefixes`, `members`): when > 0,
      * rows are written under `__bucket = pmod(xxhash64(id), buckets)`
      * partition dirs, so every id-keyed anti-join (accepted-id
      * resolution, the dedupAppend replay guards) and the candidate
      * scoring read prune to the buckets the probing ids can hash into
      * instead of scanning the whole stored table. A LAYOUT property
      * pinned at store creation (`store.meta`); the effective value
      * always comes from the pin on reopen, and pre-pin legacy stores
      * stay unbucketed (0). Candidate PROBES (bands, prefix index) are
      * keyed by band/shingle, not id — they remain columnar scans of
      * stored state by design.
      *
      * DEFAULT 0 (unbucketed) — and MEASUREMENT FOUND NO WINNING
      * REGIME (PLANS.md round 13, `bucketregime`): at 10⁸ id-keyed
      * rows / 16 Ki buckets / 500-id micro-batches — the exact shape
      * the layout was argued for — the bucketed store ran ~2× SLOWER
      * end to end, because the costs the prune was aimed at are
      * better removed elsewhere: the replay-guard anti-joins that
      * used to sort the whole store per batch are probe-INVERTED now
      * ([[graft.store.DurableStore.probeAntiJoin]] streams the store
      * against a broadcast probe), and content probes were never
      * id-prunable. Meanwhile the layout taxes EVERY scan with
      * per-dir listing/open overhead and its partition metadata
      * overflows the planner's file-listing cache. (Earlier ×10
      * measurement, same verdict from the small side: 256 buckets
      * made 5k-doc batch walls 25–32 s vs 7–10 s unbucketed.) The
      * machinery stays pin-governed and spec-pinned for tables that
      * genuinely need dir-level pruning; nothing in this repo
      * recommends setting it.
      */
    stateBuckets: Int = 0,
    /** Stored-corpus row count past which the EXACT front engages both
      * its maintained sidecars ([[exactStateMinRows]]'s doc — the
      * measured 50k default; exists-wins once created). A tuning knob,
      * not a shape property: the sidecars' MEANING is
      * threshold-independent, so it is not pinned and reopens may
      * restate it (an already-created sidecar keeps maintaining
      * regardless).
      */
    exactSidecarMinRows: Long = 50000L) extends graft.store.DurableStore
    with graft.store.BucketedTables {

  require(!collapseFront || (lshFront && maxShingleDf.isEmpty),
    "collapseFront requires the uncapped lshFront store (stateEnabled)")

  /** The LIVE bucket count: the pin wins; a pinned store without the
    * field is pre-bucketing history (unbucketed, 0); an unpinned store
    * with existing UNBUCKETED tables stays unbucketed; only a genuinely
    * fresh store takes the constructor value. An unpinned store whose
    * tables ARE bucketed lost its pin mid-install — the dirs cannot
    * reveal the modulus, and guessing wrong silently corrupts every
    * replay guard (pruned anti-joins miss stored ids, re-accepted ids
    * append duplicates under committed markers) — so the caller must
    * re-state the original modulus to re-pin; a zero/absent constructor
    * value refuses.
    */
  protected lazy val effectiveBuckets: Int = readShape() match {
    case Some(m) => m.get("buckets").map(_.toInt).getOrElse(0)
    case None =>
      recoverTable("docs") // an aside must not blind the layout probe
      if (fs.exists(hPath(s"$path/docs"))) {
        val bucketed = fs.listStatus(hPath(s"$path/docs"))
          .exists(_.getPath.getName.startsWith("__bucket="))
        if (bucketed) {
          if (stateBuckets <= 0) throw new IllegalStateException(
            s"store at $path has a bucketed layout but no shape pin " +
            "(a pin install crashed): reopen with the ORIGINAL " +
            "stateBuckets to re-pin - the layout cannot reveal its " +
            "own modulus and a wrong guess corrupts the replay guards")
          // the re-stated modulus is checkable against the layout —
          // refuse a refutable guess before it corrupts replay guards
          validateRepin("docs", idCol, stateBuckets)
          stateBuckets
        } else 0
      } else stateBuckets
  }

  // bucketOf / readTable / bucketsOf / appendBucketed live in
  // graft.store.BucketedTables (shared with MediaStore)

  /** LSH-FRONT STATE TABLES — `shingles` (id, sh), `bands`
    * (id, band, bh) and `prefixes` (id, s), appended per batch under
    * the same marker discipline as `docs`/`scored`. All three are
    * PER-DOC state: hashed shingle sets and banded MinHash signatures
    * are corpus-independent, and a doc's rarest-first prefix — ranked
    * by document frequency AS OF ITS INGEST — remains a valid prefix
    * forever (ANY subset of size n − ⌈t·n⌉ + 1 carries the containment
    * recall theorem; the ranking choice is performance only). So an
    * increment touches batch-bands × stored-bands and
    * batch-prefixes ⋈ stored-index instead of re-shingling, re-banding
    * and re-window-ranking the WHOLE corpus per batch — the two
    * corpus-linear passes [[Dedup.incrementalLshScoredPairs]] pays are
    * replaced by columnar scans of stored state probed by
    * broadcast-sized batch frames. Batch prefixes rank by batch-local
    * df (no global df table to maintain; staleness costs probe fuel,
    * never recall). Only the UNCAPPED lshFront store persists state —
    * a df-cap is a population property whose drift would invalidate
    * stored prefixes, so capped stores keep the recompute path (the
    * documented [[Dedup.incrementalRelease]] drift contract).
    *
    * The POSITIONAL prefix filter does NOT apply here (its minimal-
    * shared-row argument needs both sides ranked by ONE coherent
    * order, and stored prefixes deliberately keep their ingest-era
    * ranks), but the COUNT filter does: the subset argument is
    * ranking-free, so stores whose prefixes were written
    * [[Dedup.PrefixMinShared]] − 1 rows wide probe through
    * [[Dedup.prefixProbeCounted]] — single-collision fuel dies on the
    * stored path too. The width is a STORE property persisted in
    * `prefixes.meta` at state creation: legacy stores (no meta) keep
    * theorem-width prefixes and the plain probe, because filtering
    * against narrower stored rows would lose recall.
    */
  private val stateTables = Seq("shingles", "bands", "prefixes")

  /** Extra prefix rows beyond the theorem width in the STORED prefixes
    * table: the `prefixes.meta` value; 0 (plain-probe legacy) when the
    * table predates the meta file; the [[Dedup.PrefixMinShared]] width
    * for state not yet created.
    */
  private def prefixExtra: Int = {
    val meta = hPath(s"$path/prefixes.meta")
    if (fs.exists(meta)) {
      val in = fs.open(meta)
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toInt
      finally in.close()
    } else if (fs.exists(hPath(s"$path/prefixes"))) 0
    else Dedup.PrefixMinShared - 1
  }

  /** Pin the store's prefix width the moment state is first written
    * (idempotent — replay writes the same value). Write-temp-then-rename
    * like every other durable write here: a crash mid-write must not
    * leave an empty meta file that [[prefixExtra]]'s toInt chokes on
    * forever.
    */
  private def writePrefixMeta(extra: Int): Unit = {
    val meta = hPath(s"$path/prefixes.meta")
    if (!fs.exists(meta)) {
      val tmp = hPath(s"$path/prefixes.meta.tmp")
      val out = fs.create(tmp, true)
      try out.write(extra.toString.getBytes("UTF-8")) finally out.close()
      // a lost rename race means another writer pinned the (identical)
      // value first — drop the temp
      if (!fs.rename(tmp, meta)) fs.delete(tmp, false)
    }
  }
  private def stateEnabled: Boolean = lshFront && maxShingleDf.isEmpty

  /** EXACT-FRONT SIDECARS (round-16), two independent accelerations,
    * BOTH engaged by the same measured corpus-size dispatch
    * ([[exactStateMinRows]], exists-wins — below it the store runs
    * the round-15 shape exactly: recompute deltas, guards consulting
    * `docs`, zero sidecar maintenance, which the gate-scale A/B
    * measured cheapest at 5k docs; past it maintenance pays off and
    * the gap widens with the corpus):
    *
    * (1) `docids` — a narrow one-column sidecar mirroring `docs`' id
    * set. Each id-guard anti-join consults it instead of the fat
    * `docs` scan, so the consulted relation is statically SMALL at
    * ANY corpus size (at 10⁸ rows: ~1.6 GB of ids vs a multi-TB text
    * table) — which is what lets [[ingest]]'s scheduling regime
    * extend to the exact front (static planning cannot see column
    * pruning on `docs`, so AQE suspension used to degrade the guards'
    * runtime broadcasts to sort-merge joins of text-carrying frames —
    * the measured ~2.8× CPU that kept the exact front on the AQE job
    * floor). Consistency is NOT marker-split: docs appends FIRST and
    * docids second inside the same guarded block, so `docids ⊆ docs`
    * ids holds across every crash window; at ingest start
    * [[ensureDocIds]] compares the two tables' parquet footer ROW
    * COUNTS (zero Spark jobs, cached per immutable file) — given ⊆
    * and per-table id uniqueness, equal counts ⟺ equal sets — and
    * rebuilds the sidecar from `docs`' id column (one narrow pass)
    * after any mismatch (a crashed guard, a legacy or
    * threshold-crossing store backfilling). When the footer walk
    * cannot decide (cold cap), the ingest consults `docs` as before —
    * the sidecar is a pure accelerator.
    *
    * (2) `shingles` state for the UNCAPPED exact front — the SAME
    * table the LSH front maintains (identical
    * [[Dedup.hashedShingles]] content, so a later lshFront upgrade
    * backfills only bands/prefixes) — engaged only once the stored
    * corpus crosses [[exactStateMinRows]] (or the table already
    * exists: once created it is maintained forever). Below the
    * threshold the recompute delta wins: the state path pays
    * per-batch state writes plus multiple stored-array scans, and at
    * gate scale that MEASURED 2× the recompute's CPU (70 s vs 26 s at
    * sf0.01, counting-join shape, either AQE setting); above it the
    * trade reverses — the recompute's per-batch corpus re-tokenize is
    * the cost that grows with text volume, while the state path reads
    * columnar (id, sh) longs. The crossover engages via
    * [[ensureExactShingles]]' one-time backfill, exactly like the
    * lshFront upgrade. A df-CAP store never persists state: the cap
    * is a population property whose drift would invalidate stored
    * prefixes/shingle survivorship (the documented
    * [[Dedup.incrementalRelease]] contract).
    */
  private def exactDocIdsEnabled: Boolean = !lshFront

  /** Stored-corpus row threshold above which the uncapped exact front
    * maintains shingle state ([[storedExactDelta]]); below it the
    * recompute delta is measured-cheaper. MEASURED bracket (PLANS
    * round 16): at the 5k-doc gate the recompute path costs half the
    * state path's CPU (26 s vs 51+ s — state writes and extra stored
    * scans dominate a corpus whose full re-tokenize is trivial); at
    * the ×10 rehearsal's 50k docs the state path already wins and the
    * gap WIDENS with the stored corpus (500-doc steady-state batch
    * walls [4.5→5.7] s flat-ish vs [4.8→7.8] s corpus-linear, pair
    * parity exact at 250,600). 50k is the measured win point; past it
    * the recompute's per-batch corpus re-tokenize only grows. The
    * SAME threshold gates the `docids` sidecar (the gate A/B priced
    * its maintenance at +15% CPU on a corpus whose fat scan is
    * trivial — one dispatch, one story: past 50k rows the exact front
    * flips BOTH maintenance paths on). (The class is final, so the
    * spec override lives on the companion.)
    */
  private def exactStateMinRows: Long =
    ReleaseStore.exactStateMinRowsForTests.getOrElse(exactSidecarMinRows)

  /** Whether THIS ingest maintains exact-front shingle state: uncapped
    * exact front, and (already created) OR (corpus provably past the
    * threshold — zero-job footer count; an undecidable walk defers).
    */
  private def exactShinglesLive: Boolean =
    !lshFront && maxShingleDf.isEmpty && (
      fs.exists(hPath(s"$path/shingles")) ||
      tableFooterRows("docs").exists(_ >= exactStateMinRows))

  /** Whether THIS ingest's id guards may consult the `docids` sidecar
    * (set by [[ensureDocIds]] under the writeLock; single-writer per
    * store by contract).
    */
  @volatile private var docIdsUsable: Boolean = false

  /** Whether THIS ingest maintains the `docids` sidecar at all (set by
    * [[ensureDocIds]]): the table exists (exists-wins), or the corpus
    * provably crossed the shared size dispatch. Distinct from
    * [[docIdsUsable]] — a capped footer walk can leave an existing
    * sidecar maintained but unconsulted for one ingest.
    */
  @volatile private var docIdsLive: Boolean = false

  /** Bucket-pruned accepted-id resolution, routed through the narrow
    * `docids` sidecar when this ingest proved it consistent — the
    * consulted scan is then statically small (one long column), so the
    * plain anti-join broadcasts under static planning too (the regime
    * suspends AQE).
    */
  protected override def storedAcceptIds(idColName: String, table: String,
      batchIds: DataFrame): DataFrame =
    if (table == "docs" && docIdsUsable)
      readTable("docids",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            batchIds.schema("__bid").dataType))),
        bucketsOf(batchIds, "__bid"))
        .select(col("id").as("__bid"))
    else super.storedAcceptIds(idColName, table, batchIds)

  /** Decide the sidecar dispatch, then prove (or restore) `docids` ==
    * `docs`' id set for this ingest. Dispatch (shared threshold with
    * the shingle state, exists-wins): a store below
    * [[exactStateMinRows]] with no sidecar skips maintenance entirely
    * and its guards consult `docs` — the round-15 shape, measured
    * cheapest at gate scale. Once live: footer row counts equal →
    * usable as-is (zero jobs; steady state pays footer reads only for
    * the last append's files); unequal or sidecar missing → rebuild
    * from `docs`' id column (ONE pruned columnar pass — heals any
    * crash window and backfills a legacy or threshold-crossing
    * store); undecidable (cold-cap) → consult `docs` this ingest.
    */
  private def ensureDocIds(): Unit = {
    docIdsUsable = false
    docIdsLive = false
    if (!exactDocIdsEnabled) return
    // first ingest: no corpus yet, so by definition below the dispatch
    if (!fs.exists(hPath(s"$path/docs"))) return
    recoverTable("docids") // heal a compact-crash aside BEFORE exists
    val docsRows = tableFooterRows("docs")
    val exists = fs.exists(hPath(s"$path/docids"))
    if (!exists && !docsRows.exists(_ >= exactStateMinRows)) return
    docIdsLive = true
    val sideRows = if (exists) tableFooterRows("docids") else Some(-1L)
    (docsRows, sideRows) match {
      case (Some(d), Some(i)) if d == i => docIdsUsable = true
      case (Some(_), _) =>
        val ids = docs.select(col(idCol).as("id"))
        if (effectiveBuckets > 0)
          installTable(s"$path/docids",
            ids.withColumn("__bucket", bucketOf(col("id")))
              .repartition(col("__bucket")),
            ".backfill", Seq("__bucket"))
        else installTable(s"$path/docids", ids, ".backfill")
        docIdsUsable = true
      case _ => () // footer walk capped: docs stays the consulted scan
    }
  }

  /** Banded signatures in the store's pinned hash family. */
  private def bandsOf(sh: DataFrame): DataFrame =
    if (portable) Dedup.portableBands(sh, k, bands, seed)
    else Dedup.fastBands(sh, k, bands, seed)

  /** SHAPE PIN (`store.meta`): every constructor knob that determines
    * what the persisted tables MEAN — hash/band shape behind `scored`
    * and `bands`, the df-cap, the containment floor, id/text columns,
    * and the two front flags — recorded at first ingest and validated
    * on every subsequent entry point. Without it a reopen with
    * different flags corrupts silently rather than failing loudly: a
    * collapse store opened `collapseFront = false` reads REP-level
    * scored rows as member-level (products quietly shrink); a
    * state-enabled store opened `lshFront = false` recomputes deltas
    * while its state tables go stale, poisoning every later
    * state-probing reopen; a different `seed`/`k`/`bands` scores new
    * batches in a different hash space than the accumulated pairs.
    * The two documented in-place UPGRADES stay legal (false → true on
    * either front — [[ensureState]] backfills), and the pin follows
    * the upgrade; downgrades and every other mismatch throw. Legacy
    * stores (no meta) pin the current shape on next write — nothing
    * recorded means nothing to validate against.
    */
  private def shapeMap: Map[String, String] = Map(
    "idCol" -> idCol, "textCol" -> textCol,
    "maxShingleDf" -> maxShingleDf.map(_.toString).getOrElse("none"),
    "lshFront" -> lshFront.toString,
    "collapseFront" -> collapseFront.toString,
    "portable" -> portable.toString,
    "containPm" -> math.round(containThreshold * 1000).toString,
    "k" -> k.toString, "bands" -> bands.toString, "seed" -> seed.toString,
    // the EFFECTIVE layout, not the constructor default: a reopen can
    // never re-shape existing partition dirs
    "buckets" -> effectiveBuckets.toString)

  private def shapePin = hPath(s"$path/store.meta")

  private def readShape(): Option[Map[String, String]] =
    graft.store.DurableStore.readMeta(fs, shapePin)

  /** The shared write-temp-then-rename pin install
    * ([[graft.store.DurableStore.writeShapePin]]); overwrite is legal
    * here because front upgrades legitimately move the pin.
    */
  private def writeShape(): Unit = writeShapePin(shapeMap)

  /** Validate this instance's shape against the pin; `pin = true`
    * (write paths) records the shape when absent and moves it after a
    * legal front upgrade. A field absent from an older pin adopts the
    * current value — it was never recorded, so there is nothing to
    * contradict.
    */
  private def checkShape(pin: Boolean): Unit = readShape() match {
    case None => if (pin) writeShape()
    case Some(m) =>
      def bad(f: String, stored: String): Nothing =
        throw new IllegalStateException(
          s"ReleaseStore at $path was created with $f=$stored but opened " +
          s"with $f=${shapeMap(f)}; reopen with the stored shape " +
          "(fronts may only upgrade false -> true)")
      Seq("idCol", "textCol", "maxShingleDf", "containPm", "k", "bands",
        "seed", "portable", "buckets").foreach { f =>
        val stored = m.getOrElse(f, shapeMap(f))
        if (stored != shapeMap(f)) bad(f, stored)
      }
      Seq("lshFront" -> lshFront, "collapseFront" -> collapseFront)
        .foreach { case (f, cur) =>
          if (m.get(f).exists(_.toBoolean && !cur)) bad(f, "true")
        }
      if (pin && m != shapeMap) writeShape()
  }

  def docs: DataFrame = {
    recoverTable("docs")
    readInferred(s"$path/docs").drop("__bucket")
  }

  // storedAcceptIds: the bucket-pruned override lives in
  // graft.store.BucketedTables

  /** The accumulated scored pair set. `batch` records which ingest
    * generated each row (−1 for un-id'd batch calls) — the water mark
    * [[productsCached]]'s incremental clustering folds by.
    */
  def scored: DataFrame = { recoverTable("scored"); readInferred(s"$path/scored") }

  /** Whether collapse-front membership EXISTS — healing a compact-crash
    * aside first, exactly like the shingles exists-wins read: every
    * decision that branches on "members present" must see a table
    * sitting at `.compact.old` as present, or a collapse store's
    * products would silently read REP-level scored rows as
    * member-level (and an ingest would start a FRESH members table
    * beside the aside one, losing membership durably).
    */
  private def membersLive: Boolean = collapseFront && {
    recoverTable("members")
    fs.exists(hPath(s"$path/members"))
  }

  /** Collapse-front membership (id, rep, batch) — explicit schema so an
    * all-unique corpus's empty table still reads.
    */
  private def membersTable: DataFrame = {
    recoverTable("members")
    readTable("members", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rep",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("batch",
        org.apache.spark.sql.types.LongType))))
  }

  /** Member-level scored rows for product derivation: the collapse
    * store expands its REP-level pairs through `members`
    * ([[Dedup.expandCollapsedScored]] — cross pairs inherit scores,
    * within-group pairs synthesize at common = n); per-doc stores pass
    * through.
    */
  private def expandedScored(sc: DataFrame): DataFrame =
    if (!membersLive) sc
    else {
      recoverTable("shingles")
      // explicit schema (derived like storedStateDelta's): a shingles
      // dir whose only appends were all-empty frames has no data files
      // to infer from
      val shSchema = Dedup.hashedShingles(
        docs.limit(0), idCol, textCol, portable).schema
      val sizes = readTable("shingles", shSchema)
        .select(col("id"), size(col("sh")).cast("long").as("n"))
      Dedup.expandCollapsedScored(sc,
        membersTable.select(col("id"), col("rep")), sizes)
    }

  /** This batch's ACCEPTED ids — the shared sidecar-pinned resolution
    * ([[graft.store.DurableStore.resolveAccepted]]) against `docs`.
    */
  private def acceptedIds(batch: DataFrame,
      batchId: Option[Long]): DataFrame =
    resolveAccepted(batch, idCol, "docs", batchId)

  /** Ingest one micro-batch of documents (idCol, textCol + any carried
    * columns): append the batch's accepted rows to `docs` and their
    * batch-touching scored pair delta to `scored`, each exactly-once
    * under `batchId`.
    */
  def ingest(batch: DataFrame, batchId: Option[Long] = None): Unit =
    // under writeLock: a compact() racing this append would read the
    // table, swap the rewritten copy in, and silently DELETE the rows
    // this batch appended in between (while their commit marker says
    // they landed, so the replay would skip too)
    writeLock.synchronized {
    // scoped, not releaseAll: the ingest's own scratch persists (state
    // frames, candidate sets) die with the call, but frames the CALLER
    // holds — a persisted fingerprint/document corpus being sliced into
    // batches — must survive, or every subsequent batch silently
    // recomputes the caller's full lineage inside its own wall
    graft.ScratchCache.scoped {
    checkShape(pin = true)
    recoverTable("docs"); recoverTable("scored")
    if (stateEnabled) stateTables.foreach(recoverTable)
    // heal collapse membership BEFORE anything branches on its
    // existence (the upgrade probe and dedupAppend's anti-join guard
    // both do) — an unhealed aside would seed a FRESH members table
    if (collapseFront) recoverTable("members")
    // heal a compact-crash window BEFORE the exists-wins read: a
    // shingles table sitting at .compact.old must count as existing,
    // or this ingest would silently abandon live state
    if (exactDocIdsEnabled) recoverTable("shingles")
    val exactState = exactShinglesLive // one footer walk per ingest
    ensureDocIds()
    // micro-batch scheduling regime: with every consulted table small,
    // the ingest's many write actions run non-adaptively (one job per
    // action instead of one per exchange — the drive's scheduling
    // floor). LSH-front probes are hint-driven equi-joins where static
    // planning equals adaptive (collapse-drive jobs 154 -> 94 at
    // identical parity and cpu). The EXACT front joins the regime when
    // its state is live (round 16): the scored delta reads stored
    // shingle state instead of re-shingling the fat `docs` scan, and
    // the id guards consult the statically-small `docids` sidecar —
    // the two fat-scan-derived plans whose static size estimates used
    // to degrade runtime broadcasts to sort-merge joins under
    // suspension (the measured ~2.8–6x CPU regression). A capped
    // store, or an ingest whose sidecar could not be proven
    // consistent, keeps AQE.
    def regime[T](f: => T): T =
      if (lshFront) withSmallRegimeScheduling(Seq("docs", "scored") ++
        (if (stateEnabled) stateTables else Nil))(f)
      else f
    // The exact front's AQE posture, settled by round-16 A/B
    // measurement (sf0.01 gate, min-of-3, CPU self-attributed):
    // suspending AQE across the whole ingest cost 105 s CPU vs the
    // 26 s baseline (4× — the uncapped shingle index join is SKEWED
    // on corpus-wide hot shingles and AQE's skew splits are
    // load-bearing), and even guards-only suspension cost 51 s (the
    // fat-batch shuffles lose adaptive coalescing). Only the NARROW
    // actions — accepted-id resolution against the docids sidecar and
    // the sidecar's own append — run non-adaptively: their plans
    // consult statically-small scans where static == adaptive.
    def narrowRegime[T](f: => T): T =
      if (!lshFront && exactDocIdsEnabled && docIdsUsable &&
          !ReleaseStore.exactRegimeOff)
        withSmallRegimeScheduling(Seq("docids"))(f)
      else f
    val (accepted, bState, bShExact) = regime {
    val accepted = narrowRegime(acceptedIds(batch, batchId))
    // the touched-bucket set (one tiny collect): every id-keyed
    // anti-join below prunes its stored-side scan to these partitions
    val batchBuckets = bucketsOf(accepted, "__bid")
    // state backfill + appends run BEFORE the docs append: backfill
    // derives state from docs MINUS the current batch's accepted ids
    // (whose rows the marker-guarded appends below own), so a replay
    // interleaved with a landed docs append cannot double-count them
    val bState =
      if (stateEnabled) {
        ensureState(accepted)
        Some(appendState(batch, accepted, batchId, batchBuckets))
      } else None
    val bShExact =
      if (exactState) {
        ensureExactShingles(accepted)
        Some(appendExactShingles(batch, accepted, batchId, batchBuckets))
      } else None
    markers.guarded("docs", batchId) {
      // anti-join against the LIVE table: a replay after a landed-but-
      // unmarked append finds its rows present and appends nothing
      // (bucket-pruned: rows outside the batch's buckets cannot match;
      // consulted through the docids sidecar when proven consistent —
      // a replay's landed rows are visible there too, because the
      // footer-count gate already healed any docs/docids skew)
      val base = batch.dropDuplicates(idCol)
        .join(broadcast(accepted), col(idCol) === col("__bid"),
          "left_semi")
      val fresh =
        if (fs.exists(hPath(s"$path/docs")))
          probeAntiJoin(base, storedAcceptIds(idCol, "docs", accepted)
              .select(col("__bid").as(idCol)),
            Seq(idCol), "docs",
            probeKeys = Some(accepted.select(col("__bid").as(idCol))))
        else base
      appendBucketed(fresh, idCol, s"$path/docs")
      // the narrow id sidecar lands SECOND (docids ⊆ docs across any
      // crash — the ensureDocIds invariant), via the idempotent
      // anti-join append — only when the size dispatch keeps it live
      if (docIdsLive)
        narrowRegime(dedupAppend(accepted.select(col("__bid").as("id")),
          "docids", batchBuckets, accepted))
    }
    (accepted, bState, bShExact)
    }
    def scoredGuard(): Unit = markers.guarded("scored", batchId) {
      val delta = (bState, bShExact) match {
        case (Some((bsh, bBands, bPref)), _) =>
          storedStateDelta(bsh, bBands, bPref)
        case (None, Some(bsh)) =>
          storedExactDelta(bsh, accepted)
        case _ =>
          // batch membership = the ACCEPTED ids (not "rows in this
          // batch"): identical on every replay, and a re-crawled
          // duplicate id never re-marks its previously-stored row
          val marked = docs
            .join(broadcast(accepted), col(idCol) === col("__bid"), "left")
            .withColumn("__isb", col("__bid").isNotNull).drop("__bid")
          if (lshFront)
            Dedup.incrementalLshScoredPairs(marked, idCol, textCol,
              col("__isb"), containThreshold, maxShingleDf, k, bands, seed,
              portable)
          else
            Dedup.incrementalScoredPairs(marked, idCol, textCol,
              col("__isb"), maxShingleDf)
      }
      delta
        .withColumn("batch", lit(batchId.getOrElse(-1L)))
        .write.mode(SaveMode.Append).parquet(s"$path/scored")
    }
    regime(scoredGuard())
    }
    // the accepted-set checkpoint (un-id'd ingests only) has served its
    // last consumer — free its blocks (not ScratchCache-tracked:
    // localCheckpoint blocks need their own release)
    freeAcceptedCheckpoint()
  }

  /** Shingle, band and rarest-prefix the batch's accepted rows and
    * append them to the state tables (marker-guarded, same crash
    * window as `scored`). Returns the three batch-side frames — on a
    * replay whose appends are skipped, the recomputed frames equal the
    * stored ones (deterministic functions of the sidecar-pinned
    * accepted set).
    */
  /** Idempotent state append: anti-join the table's stored ids first.
    * Two replay windows need it: un-id'd ingests have NO marker
    * protection (guarded(None) always writes), and even an ID'D batch
    * can land a state append and die BEFORE its marker commits — the
    * replay's guarded re-runs the write, and without the anti-join
    * every state row would append a second time, durably corrupting
    * the scored delta of every later batch. The recomputed rows are
    * deterministic functions of the sidecar-pinned accepted set, so
    * skipping already-present ids is exactly replay semantics, per
    * table (a crash between the shingles and bands appends skips one
    * and lands the other). An id in the frame that is already stored
    * can ONLY be that window — re-crawled ids never reach a state
    * append (the accepted set excludes them) — and the join's right
    * side is one column-pruned id scan, bucket-pruned (the frame's ids
    * are accepted ids, so stored rows outside the batch's buckets
    * cannot collide) and probe-inverted when big: the probe key set IS
    * the accepted ids — already materialized as the sidecar — so the
    * store is streamed against a broadcast, never sorted.
    */
  private def dedupAppend(frame: DataFrame, table: String,
      batchBuckets: Option[Seq[Int]], accepted: DataFrame): Unit = {
    val fresh =
      if (fs.exists(hPath(s"$path/$table")))
        probeAntiJoin(frame,
          readTable(table, frame.schema, batchBuckets).select(col("id")),
          Seq("id"), table,
          probeKeys = Some(accepted.select(col("__bid").as("id"))))
      else frame
    appendBucketed(fresh, "id", s"$path/$table")
  }

  /** Backfill the exact front's `shingles` state from the stored
    * corpus (minus the current batch's accepted ids — the replay view,
    * exactly [[ensureState]]'s discipline): a store whose docs predate
    * the state pays the corpus pass ONCE, atomically, instead of
    * re-shingling per increment forever.
    */
  private def ensureExactShingles(accepted: DataFrame): Unit = {
    if (!fs.exists(hPath(s"$path/docs"))) return
    if (fs.exists(hPath(s"$path/shingles"))) return
    val base = docs.join(broadcast(accepted),
      col(idCol) === col("__bid"), "left_anti")
    val sh = Dedup.hashedShingles(base, idCol, textCol, portable)
    if (effectiveBuckets > 0)
      installTable(s"$path/shingles",
        sh.withColumn("__bucket", bucketOf(col("id")))
          .repartition(col("__bucket")),
        ".backfill", Seq("__bucket"))
    else installTable(s"$path/shingles", sh, ".backfill")
  }

  /** Shingle the batch's accepted rows and append them to the exact
    * front's `shingles` state (marker-guarded, [[dedupAppend]]
    * idempotent). Returns the batch-side frame — on a replay whose
    * append is skipped, the recomputed frame equals the stored one
    * (a deterministic function of the sidecar-pinned accepted set).
    */
  private def appendExactShingles(batch: DataFrame, accepted: DataFrame,
      batchId: Option[Long],
      batchBuckets: Option[Seq[Int]]): DataFrame = {
    val bdocs = batch.dropDuplicates(idCol)
      .join(accepted, col(idCol) === col("__bid"), "left_semi")
    val bsh = Dedup.hashedShingles(bdocs, idCol, textCol, portable)
    markers.guarded("shingles", batchId) {
      dedupAppend(bsh, "shingles", batchBuckets, accepted)
    }
    bsh
  }

  /** The exact front's batch-touching scored delta from STORED shingle
    * state — [[Dedup.incrementalScoredPairs]]' exact plan shape (the
    * counting index join with map-side partial aggregation; only
    * (id, s) long pairs ever shuffle, never shingle ARRAYS), with the
    * corpus-side index read from the persisted (id, sh) state instead
    * of re-tokenizing and re-shingling every stored document per batch
    * (the exact front's former corpus-linear CPU). The first cut of
    * this path scored candidates via array_intersect over the full
    * sets ([[Dedup.scoreCandidates]]) — measured 3.5× the recompute's
    * CPU at gate scale because both scoring joins shuffled the fat
    * array column; the counting shape is the one that was already
    * proven.
    */
  private def storedExactDelta(bsh: DataFrame,
      accepted: DataFrame): DataFrame = {
    val storedSh = widen("shingles", readTable("shingles", bsh.schema))
    // corpus side = stored state MINUS the batch's accepted ids (their
    // state rows were appended above; without the anti-join a
    // batch-internal pair would count once from the self-join and once
    // per member from the cross join)
    val acc = accepted.select(col("__bid").as("id"))
    val cSh = storedSh.join(broadcast(acc), Seq("id"), "left_anti")
    val bIdx = bsh.select(col("id"), explode(col("sh")).as("s"))
    val cIdx = cSh.select(col("id"), explode(col("sh")).as("s"))
    // batch × corpus, canonicalized to (min, max); batch × batch via
    // the ordered self-join — disjoint by construction
    val bc = bIdx.as("a").join(cIdx.as("b"), col("a.s") === col("b.s"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
    val bb = bIdx.as("a").join(bIdx.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val pairs = bc.unionAll(bb)
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    // sizes: narrow (id, n) over the stored state (the batch's rows
    // are appended, so every pair member resolves)
    val sizes = storedSh.select(col("id"), size(col("sh")).cast("long").as("n"))
    pairs
      .join(sizes.as("na"), col("id_a") === col("na.id"))
      .join(sizes.as("nb"), col("id_b") === col("nb.id"))
      .select(col("id_a"), col("id_b"), col("common"),
        col("na.n").as("n_a"), col("nb.n").as("n_b"))
  }

  private def appendState(batch: DataFrame, accepted: DataFrame,
      batchId: Option[Long],
      batchBuckets: Option[Seq[Int]]): (DataFrame, DataFrame, DataFrame) = {
    def dedupAppend(frame: DataFrame, table: String): Unit =
      this.dedupAppend(frame, table, batchBuckets, accepted)
    val bdocs = batch.dropDuplicates(idCol)
      .join(accepted, col(idCol) === col("__bid"), "left_semi")
    val bshAll = Dedup.hashedShingles(bdocs, idCol, textCol, portable)
    val bsh = if (!collapseFront) bshAll else {
      // group-membership resolution against PRIOR reps: stored state
      // minus this batch's accepted rows (the replay view — a landed
      // state append must not make the batch's own reps look prior).
      // Docs matching a stored set become members of its rep; the rest
      // group within the batch (rep = min id) and only THOSE reps get
      // state rows and probes below.
      val acc = accepted.select(col("__bid").as("id"))
      val priorReps =
        if (fs.exists(hPath(s"$path/shingles")))
          readTable("shingles", bshAll.schema)
            .join(broadcast(acc), Seq("id"), "left_anti")
            .select(col("id").as("rep"), sort_array(col("sh")).as("skey"))
        else bshAll.limit(0)
          .select(col("id").as("rep"), sort_array(col("sh")).as("skey"))
      val bKey = graft.ScratchCache.persist(
        bshAll.withColumn("skey", sort_array(col("sh"))))
      val matched = bKey.join(priorReps, Seq("skey"))
        .select(col("id"), col("rep"))
      val freshRep = bKey.join(priorReps, Seq("skey"), "left_anti")
        .withColumn("rep", min(col("id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("skey")))
      val members = matched.unionAll(freshRep.select(col("id"), col("rep")))
        .withColumn("batch", lit(batchId.getOrElse(-1L)))
      markers.guarded("members", batchId) {
        dedupAppend(members, "members")
      }
      graft.ScratchCache.persist(
        freshRep.where(col("id") === col("rep")).select(col("id"), col("sh")))
    }
    val bBands = graft.ScratchCache.persist(bandsOf(bsh))
    val bIdx = bsh.select(col("id"), explode(col("sh")).as("s"))
    // batch-local df ranking: rare-in-batch tracks rare-globally well
    // enough for probe economy, and ANY prefix choice keeps recall
    val bdf = bIdx.groupBy("s").agg(count(lit(1)).as("df"))
    val bSizes = bsh.select(col("id"), size(col("sh")).cast("long").as("n"))
    val pExtra = prefixExtra
    writePrefixMeta(pExtra)
    val bPref = graft.ScratchCache.persist(
      Dedup.rarestPrefix(bIdx, bSizes,
        math.round(containThreshold * 1000), bdf, extraRows = pExtra))
    markers.guarded("shingles", batchId) {
      dedupAppend(bsh, "shingles")
    }
    markers.guarded("bands", batchId) {
      dedupAppend(bBands, "bands")
    }
    markers.guarded("prefixes", batchId) {
      dedupAppend(bPref, "prefixes")
    }
    (bsh, bBands, bPref)
  }

  /** Backfill missing state tables from the stored corpus — a store
    * whose `docs` predate the state tables (ingested exact-front or
    * capped, or pre-state builds) upgrades on first state ingest by
    * paying the corpus pass ONCE, atomically (write-temp-then-rename),
    * instead of per increment.
    */
  private def ensureState(accepted: DataFrame): Unit = {
    if (!fs.exists(hPath(s"$path/docs"))) return
    // a collapse store without its members table is a per-doc (or
    // pre-state) history upgrading in place: ALL state tables rebuild
    // rep-level and `scored` rewrites to rep pairs, with the members
    // install LAST — its presence is the upgrade's commit point, and
    // every step before it is idempotent (deterministic rebuilds; the
    // scored rewrite maps rep-level rows identically)
    val upgrade = collapseFront && !fs.exists(hPath(s"$path/members"))
    val missing =
      if (upgrade) stateTables
      else stateTables.filterNot(t => fs.exists(hPath(s"$path/$t")))
    if (missing.isEmpty && !upgrade) return
    val base = docs.join(broadcast(accepted),
      col(idCol) === col("__bid"), "left_anti")
    val shAll = Dedup.hashedShingles(base, idCol, textCol, portable)
    val (sh, members) =
      if (!collapseFront) (shAll, None)
      else if (!upgrade) {
        // post-upgrade store healing a lost state table: rep assignment
        // is pinned by the stored members table — first-ingested reps
        // are NOT the global min id, so recomputing the grouping would
        // desync the rebuilt table from members and scored
        val acc = accepted.select(col("__bid").as("id"))
        val reps = membersTable.join(broadcast(acc), Seq("id"),
          "left_anti")
          .where(col("id") === col("rep")).select(col("id"))
        (graft.ScratchCache.persist(
          shAll.join(reps, Seq("id"), "left_semi")), None)
      } else {
        val grouped = graft.ScratchCache.persist(shAll.withColumn("rep",
          min(col("id")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(sort_array(col("sh"))))))
        // batch = −2: pre-history membership, folded only by FULL label
        // rebuilds (distinct from −1 = un-id'd ingest, which forces the
        // full-CC fallback)
        (graft.ScratchCache.persist(grouped
            .where(col("id") === col("rep")).select(col("id"), col("sh"))),
          Some(grouped.select(col("id"), col("rep"))
            .withColumn("batch", lit(-2L))))
      }
    // move-aside install: upgrades overwrite EXISTING per-doc tables; a
    // crash mid-sequence re-enters here (members still missing) and
    // rebuilds the same content. Id-keyed tables rebuild under the
    // store's layout (scored is pair-keyed — plain).
    def install(name: String, df: DataFrame): Unit =
      if (effectiveBuckets > 0 && name != "scored")
        // clustered like appendBucketed: without the repartition the
        // partitioned write emits one file per (task × bucket) — the
        // measured small-files regression
        installTable(s"$path/$name",
          df.withColumn("__bucket", bucketOf(col("id")))
            .repartition(col("__bucket")),
          ".backfill", Seq("__bucket"))
      else installTable(s"$path/$name", df, ".backfill")
    if (missing.contains("shingles")) install("shingles", sh)
    if (missing.contains("bands"))
      install("bands", bandsOf(sh))
    if (missing.contains("prefixes")) {
      // honor an existing width pin (meta is the single source of
      // truth); a store with no pin yet rebuilds at the current width
      val pExtra = prefixExtra
      writePrefixMeta(pExtra)
      val idx = sh.select(col("id"), explode(col("sh")).as("s"))
      val dfs = idx.groupBy("s").agg(count(lit(1)).as("df"))
      val sizes = sh.select(col("id"), size(col("sh")).cast("long").as("n"))
      install("prefixes", Dedup.rarestPrefix(idx, sizes,
        math.round(containThreshold * 1000), dfs, extraRows = pExtra))
    }
    members.foreach { m =>
      // rewrite the accumulated member-level pairs to rep level BEFORE
      // the members install commits the upgrade. Identical sets score
      // identically, so the rewrite is a pure dedup: map both ids to
      // their reps, drop within-group rows (synthesized on read), keep
      // the earliest batch stamp. Idempotent: reps are their own
      // members, so a second pass maps every row to itself.
      if (fs.exists(hPath(s"$path/scored"))) {
        val sc = scored
        val ma = m.select(col("id").as("id_a"), col("rep").as("ra"))
        val mb = m.select(col("id").as("id_b"), col("rep").as("rb"))
        val repScored = sc.join(ma, "id_a").join(mb, "id_b")
          .where(col("ra") =!= col("rb"))
          .select(least(col("ra"), col("rb")).as("id_a"),
            greatest(col("ra"), col("rb")).as("id_b"),
            col("common"),
            when(col("ra") <= col("rb"), col("n_a")).otherwise(col("n_b"))
              .as("n_a"),
            when(col("ra") <= col("rb"), col("n_b")).otherwise(col("n_a"))
              .as("n_b"),
            col("batch"))
          .groupBy("id_a", "id_b", "common", "n_a", "n_b")
          .agg(min("batch").as("batch"))
        install("scored", repScored)
      }
      // cached label tables' water marks predate the rep-level rewrite
      // and the backfilled membership — drop tables AND markers so the
      // next productsCached folds from scratch (one-time upgrade cost).
      // The schema-cache contract (DurableStore.readInferred: only the
      // installers may rewrite a table wholesale) covers this delete
      // too — invalidate alongside it (ADVICE r16)
      fs.delete(hPath(s"$path/clusters"), true)
      invalidateInferred(s"$path/clusters")
      val cDir = hPath(s"$path/_commits")
      if (fs.exists(cDir))
        fs.listStatus(cDir).map(_.getPath)
          .filter(_.getName.startsWith("clusters_t"))
          .foreach(fs.delete(_, false))
      install("members", m)
    }
    // persists released by ingest's scoped block (ensureState only runs
    // inside it) — a releaseAll here would nuke the caller's frames
  }

  /** The batch-touching scored delta from STORED state: batch bands
    * join the stored banded set, batch prefixes probe the stored index
    * (batch contained in anything) and stored prefixes probe the batch
    * index (anything contained in batch) — no corpus row is
    * re-shingled, re-banded or re-ranked; the corpus-side cost is
    * columnar scans of the state tables. Explicit read schemas: an
    * all-duplicate batch appends zero rows, and schema inference over
    * a dir with no data files would fail.
    */
  private def storedStateDelta(bsh: DataFrame, bBands: DataFrame,
      bPref: DataFrame): DataFrame = {
    // WIDEN the stored-side scans: a state table compacted to
    // ≲ cores × maxPartitionBytes reads as a handful of partitions, and
    // the probe pipelines here keep that partitioning through their
    // whole fan-out — the batch side broadcasts, so the explode + join
    // + partial pair-count aggregation all execute on the SCAN's
    // partitions. Measured at ×100 right after the mid-stream compact:
    // one task aggregating the probe fan-out for 20+ minutes while 31
    // cores idled (per-batch wall 156 s → 1214/1415 s). A bounded
    // shuffle of the stored side (its pre-fan-out scan size) restores
    // width; once the table outgrows cores × maxPartitionBytes the scan
    // is naturally wide and this is a no-op. Width comes from the
    // FileIndex side (DurableStore.widen's one listing), not from
    // df.rdd.getNumPartitions — instantiating the RDD forces split
    // planning on the driver per ingest.
    val storedSh = widen("shingles", readTable("shingles", bsh.schema))
    val storedBands = widen("bands", readTable("bands", bBands.schema))
    val storedPref = widen("prefixes", readTable("prefixes", bPref.schema))
    val storedIdx = storedSh.select(col("id"), explode(col("sh")).as("s"))
    val bIdx = bsh.select(col("id"), explode(col("sh")).as("s"))
    val candJ = bBands.as("a")
      .join(storedBands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
    // width-pinned stores probe through the count filter (exact recall
    // by the ranking-free subset argument); legacy theorem-width
    // prefixes keep the plain probe — filtering them would lose recall
    val minShared = prefixExtra + 1
    val ctPm = math.round(containThreshold * 1000)
    val candC =
      if (minShared <= 1)
        Dedup.prefixProbe(bPref, storedIdx)
          .unionAll(Dedup.prefixProbe(storedPref, bIdx))
      else {
        val bSizes = bsh.select(col("id"), size(col("sh")).cast("long").as("n"))
        val sSizes =
          storedSh.select(col("id"), size(col("sh")).cast("long").as("n"))
        Dedup.prefixProbeCounted(bPref, storedIdx, bSizes, ctPm, minShared)
          .unionAll(
            Dedup.prefixProbeCounted(storedPref, bIdx, sSizes, ctPm, minShared))
      }
    val cand = graft.ScratchCache.persist(candJ.unionAll(candC).distinct())
    val candIds = graft.ScratchCache.persist(
      cand.select(col("id_a").as("id"))
        .unionAll(cand.select(col("id_b").as("id"))).distinct())
    // the scoring read is the FAT scan (full shingle arrays) — prune it
    // to the candidates' buckets; sparse candidate sets (the re-crawl
    // steady state) touch a fraction of the partition dirs
    val candSh = readTable("shingles", bsh.schema,
      bucketsOf(candIds, "id"))
    Dedup.scoreCandidates(cand,
      candSh.join(broadcast(candIds), Seq("id"), "left_semi"))
  }

  /** Start the continuous durable release over a document STREAM: each
    * micro-batch ingests exactly-once under the checkpoint's batch ids
    * ([[ingest]] with `foreachBatch`'s id — the dedupAppend markers
    * make the sink's at-least-once replays no-ops). This is the durable
    * complement of the within-watermark streaming dedup twins
    * ([[graft.streaming.StreamDedup]] and friends): pairs accumulate
    * against the WHOLE stored corpus here, not just the watermark
    * window, and [[products]]/[[productsCached]] read the release at
    * any time while the stream runs (reads are driver-sequential per
    * store by the DurableStore contract). One active stream per store
    * per process — same contract as
    * [[graft.operators.dedup.MediaStore.start]].
    */
  def start(stream: DataFrame, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
          ingest(batch.toDF(), Some(id))
      }
      .start()

  /** The eight-product release over everything ingested so far, derived
    * from the STORED pair set — the pair join is never re-run.
    * Containment verifies at the STORE's `containThreshold` (a
    * constructor knob, not a per-call one): with `lshFront`, the prefix
    * front only guarantees candidates down to that threshold, so a
    * looser per-call value would silently miss pairs it never generated.
    */
  def products(threshold: Double, quality: DataFrame,
      sourceCol: String = "source"): Dedup.ReleaseProducts = {
    checkShape(pin = false)
    val sc0 = scored.drop("batch")
    // collapse stores label clusters at REP level + member star edges
    // instead of CC over the member-level expansion: identical sets are
    // jaccard-1 pairs, so membership IS connectivity, and min-label CC
    // over (rep pairs ∪ id→rep edges) equals CC over the expanded pair
    // set exactly (every member is present, reachability unchanged) —
    // while the edge set shrinks by the square of the dup-group size.
    // At ×100 replication that is the difference between clustering
    // 27.3M expanded pairs and ~250k rep pairs + one edge per doc; the
    // expansion itself remains lazy input to the output-sized products
    // (pairs/containment/overlap), which are inherently member-level.
    val labels =
      if (membersLive) {
        recoverTable("shingles")
        val shSchema = Dedup.hashedShingles(
          docs.limit(0), idCol, textCol, portable).schema
        val sizes = readTable("shingles", shSchema)
          .select(col("id"), size(col("sh")).cast("long").as("n"))
        Some(Dedup.collapsedClusterLabels(sc0,
          membersTable.select(col("id"), col("rep")), sizes, threshold))
      } else None
    Dedup.productsOf(
      graft.ScratchCache.persist(expandedScored(sc0)),
      docs, idCol, threshold, quality, sourceCol, containThreshold,
      clustersOverride = labels)
  }

  /** [[products]] with store-maintained clustering: the CC label table
    * persists per threshold under `clusters/`, and each call folds in
    * only the scored rows appended SINCE the last call — prior
    * components enter the merge as star edges (id → root), which
    * preserves connectivity exactly, so the merged labels equal a
    * from-scratch CC over all pairs (ReleaseStoreSpec pins it). At
    * 100 TB this is what keeps release cadence flat as history grows:
    * re-clustering cost tracks the increment, not the archive.
    *
    * Requires batch-id'd ingest ([[ingest]] with `batchId`): un-id'd
    * rows (`batch = −1`) have no water mark to fold by, so their
    * presence falls back to full CC for correctness.
    */
  def productsCached(threshold: Double, quality: DataFrame,
      sourceCol: String = "source"): Dedup.ReleaseProducts = {
    checkShape(pin = false)
    val pm = math.round(threshold * 1000)
    val table = s"clusters_t$pm"
    val dir = s"$path/clusters/t=$pm"
    // a marker WITHOUT its label table means a crash interrupted a prior
    // install: folding "batch > water" against an empty prior would
    // silently drop every pre-watermark pair from the clusters — treat
    // it as no watermark and rebuild from everything
    val water0 = markers.lastCommitted(table)
    val water = if (water0 >= 0 && !fs.exists(hPath(dir))) -1L else water0
    val top = markers.lastCommitted("scored")
    val sc = graft.ScratchCache.persist(scored)
    // collapse-front member edges (id ↔ rep): identical sets are
    // jaccard-1 pairs, so membership IS connectivity — the fold adds
    // them alongside the rep-level pairs instead of expanding the whole
    // pair set. Backfilled rows (batch = −2) enter full rebuilds only;
    // their connectivity is pre-history by construction.
    def memberEdges(sinceExclusive: Option[Long]): DataFrame = {
      val me = membersTable.where(col("id") =!= col("rep"))
      sinceExclusive.fold(me)(w => me.where(col("batch") > w))
        .select(col("id").as("id_a"), col("rep").as("id_b"))
    }
    val hasMembers = membersLive
    val labels: DataFrame = writeLock.synchronized {
      // footer-stat fast path (batchAllMarked): the common all-id'd
      // store decides from parquet min/max stats alone — zero driver
      // jobs per products call at streaming cadence
      val unmarked = hasUnmarkedRows("scored", sc) ||
        (hasMembers && hasUnmarkedRows("members", membersTable))
      if (unmarked) {
        // no water mark exists for un-id'd rows — full CC, no cache write
        val base = jaccardPairs(sc.drop("batch"), threshold)
        Dedup.connectedComponents(
          if (hasMembers) base.unionAll(memberEdges(None)) else base)
      } else if (water >= top && fs.exists(hPath(dir))) {
        readInferred(dir) // nothing new since the last fold
      } else {
        val prior =
          if (water >= 0 && fs.exists(hPath(dir))) readInferred(dir)
          else spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("id",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("cluster",
                org.apache.spark.sql.types.LongType))))
        // prior components ride into the merge as star edges id→root:
        // every old member stays reachable from its root, so CC over
        // (stars ∪ new pairs) labels exactly like CC over all pairs
        val newPairs = jaccardPairs(
          sc.where(col("batch") > water).drop("batch"), threshold)
          .select(col("id_a"), col("id_b"))
        // water < 0 is a full rebuild: backfilled (−2) member edges fold
        // in here and only here
        val newEdges =
          if (!hasMembers) newPairs
          else newPairs.unionAll(
            memberEdges(if (water < 0L) None else Some(water)))
        val merged = Dedup.connectedComponents(
          prior.select(col("id").as("id_a"), col("cluster").as("id_b"))
            .unionAll(newEdges))
        // move-aside install: no window where the marker is ahead of a
        // MISSING table; a crash between the renames is healed by the
        // water guard above (dir absent → full rebuild), and
        // install-then-mark means a crash before the mark just re-folds
        // idempotently (star edges)
        installTable(dir, merged, "")
        markers.markCommitted(table, top)
        readInferred(dir)
      }
    }
    Dedup.productsOf(
      graft.ScratchCache.persist(expandedScored(sc.drop("batch"))), docs,
      idCol, threshold, quality, sourceCol, containThreshold,
      clustersOverride = Some(labels))
  }

  /** The verified near-dup pair filter over a scored frame — kept in the
    * store so [[productsCached]]'s incremental fold applies the same
    * threshold semantics as [[Dedup]]'s products.
    */
  private def jaccardPairs(sc: DataFrame, threshold: Double): DataFrame = {
    val jac = col("common") * lit(1.0) /
      (col("n_a") + col("n_b") - col("common"))
    sc.where(jac >= threshold).select(col("id_a"), col("id_b"))
  }

  /** Small-file compaction: rewrite `docs` and `scored` to
    * `targetFileBytes`-sized files via write-temp-then-swap (two
    * renames; no reader window over a half-written table — the
    * FlowStore.compactFiles discipline), then prune the accepted-id
    * sidecars of fully-committed batches (a sidecar only matters while
    * its batch could still replay). Commit markers live under
    * `_commits/` and are untouched, so replay accounting survives
    * compaction. File count after: ≤ ⌈bytes/target⌉ per table, bounded
    * regardless of how many micro-batches accumulated.
    *
    * READER CONTRACT: a `DataFrame` obtained from [[docs]]/[[scored]]
    * (or a [[products]] result not yet fully consumed) BEFORE a
    * `compact()` holds the old file listing and is INVALIDATED by the
    * swap — executing it afterwards fails on missing files or reads
    * nothing. Re-resolve through the accessors after compaction; the
    * single-writer contract extends to sequencing reads around
    * `compact()`, exactly as it sequences them around [[ingest]].
    */
  def compact(targetFileBytes: Long = 256L * 1024 * 1024): Unit = {
    checkShape(pin = false)
    // state tables compact under the same swap discipline; a missing
    // table (exact-front store, pre-state history, per-doc store
    // without members) is skipped
    val bucketed: Set[String] =
      if (effectiveBuckets > 0) Set("docs", "members", "docids") ++
        stateTables
      else Set.empty
    (Seq("docs", "scored", "members", "docids") ++ stateTables).foreach { t =>
      compactTable(t, targetFileBytes,
        if (bucketed(t)) Seq("__bucket") else Nil)
    }
    pruneSidecars(Seq("docs", "scored"))
  }
}

object ReleaseStore {
  /** Measurement escape hatch (env var, visible through sbt's forked
    * JVM): keep AQE for exact-front ingests even when the state path
    * could suspend it — isolates "state path cost" from "scheduling
    * regime cost" in A/B runs.
    */
  private[dedup] def exactRegimeOff: Boolean =
    sys.env.get("GRAFT_EXACT_REGIME_OFF").exists(_.toBoolean)

  /** Spec hook for the exact-state size dispatch ([[ReleaseStore]] is
    * final): ReleaseStoreSpec lowers it to force the stored-state
    * delta at fixture scale and pin its parity with the recompute
    * path. Production never sets it.
    */
  @volatile private[graft] var exactStateMinRowsForTests
      : Option[Long] = None

  // the key=value pin parse lives in graft.store.DurableStore.readMeta,
  // shared by instance validation (readShape) and the operational
  // reopen ([[open]]) so the two can never disagree about the same file
  private def readMeta(fs: org.apache.hadoop.fs.FileSystem,
      pin: org.apache.hadoop.fs.Path): Option[Map[String, String]] =
    graft.store.DurableStore.readMeta(fs, pin)

  /** Construct a NEW store whose front flags come from the counting
    * planner instead of a caller bet — [[Dedup.releaseAuto]]'s
    * self-tuning dispatch extended to the DURABLE layout choice: price
    * the fronts on `sample` (the first corpus slice the caller has —
    * [[Dedup.frontDecisions]]' thresholds, counting aggregations only,
    * no candidate pair materialized), construct with the chosen shape,
    * and let the first ingest pin it. Collapse rides the LSH front
    * exactly as in `releaseAuto`. If `path` already holds a pinned
    * store the sample is IGNORED and [[open]] reconstructs it — the
    * pin, once made, IS the layout; re-pricing a later corpus must not
    * silently re-shape accumulated tables (a front change stays an
    * explicit upgrade through the constructor).
    */
  def createAuto(spark: SparkSession, path: String, sample: DataFrame,
      idCol: String, textCol: String,
      maxShingleDf: Option[Int] = None,
      containThreshold: Double = 0.8,
      k: Int = 128, bands: Int = 32, seed: Long = 42L,
      portable: Boolean = false): ReleaseStore = {
    val pin = new org.apache.hadoop.fs.Path(s"$path/store.meta")
    val fs = pin.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(pin)) return open(spark, path)
    // tables without a pin = a legacy (pre-pin) store whose shape is
    // UNKNOWN: re-pricing from the sample could construct the wrong
    // fronts over existing tables — exactly the silent corruption the
    // pin prevents. Refuse; an explicit construction with the original
    // flags re-pins it on next write.
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/docs")))
      throw new IllegalStateException(
        s"$path holds tables but no shape pin - construct ReleaseStore " +
        "explicitly with its original flags (the next write re-pins)")
    val (useLsh, useCollapse) = Dedup.frontDecisions(sample, idCol,
      textCol, containThreshold, maxShingleDf, k, bands, seed)
    System.err.println(
      s"[ReleaseStore.createAuto] lshFront = ${useLsh || useCollapse}, " +
      s"collapseFront = $useCollapse")
    new ReleaseStore(spark, path, idCol, textCol,
      maxShingleDf = maxShingleDf, lshFront = useLsh || useCollapse,
      containThreshold = containThreshold, k = k, bands = bands,
      seed = seed, portable = portable, collapseFront = useCollapse)
  }

  /** Reopen an existing store with its PINNED shape — the operational
    * entry point that cannot drift: every flag comes from `store.meta`,
    * not from the caller's memory of the original construction. Throws
    * on a store with no pin (pre-pin history, or never ingested) —
    * construct explicitly once and ingest to pin it.
    */
  def open(spark: SparkSession, path: String): ReleaseStore = {
    val p = new org.apache.hadoop.fs.Path(s"$path/store.meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = readMeta(fs, p).getOrElse(throw new IllegalStateException(
      s"no shape pin at $path/store.meta - construct ReleaseStore " +
      "explicitly (the first ingest records the shape)"))
    def req(f: String): String = m.getOrElse(f,
      throw new IllegalStateException(
        s"shape pin at $path/store.meta carries no '$f' - the pin is " +
        "truncated or predates the field; construct explicitly"))
    new ReleaseStore(spark, path, req("idCol"), req("textCol"),
      maxShingleDf = m.get("maxShingleDf").filter(_ != "none").map(_.toInt),
      lshFront = m.get("lshFront").exists(_.toBoolean),
      containThreshold =
        m.get("containPm").map(_.toLong).getOrElse(800L) / 1000.0,
      k = m.get("k").map(_.toInt).getOrElse(128),
      bands = m.get("bands").map(_.toInt).getOrElse(32),
      seed = m.get("seed").map(_.toLong).getOrElse(42L),
      portable = m.get("portable").exists(_.toBoolean),
      collapseFront = m.get("collapseFront").exists(_.toBoolean))
  }
}
