package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.dedup.Dedup
import graft.operators.multimodal.Multimodal
import graft.operators.similarity.CosineSearch
import graft.operators.text.{Bpe, Decontamination, Dsir, TextAnalysis}

/** Training-data pipeline operators over the `documents` / `embeddings`
  * tables: dedup (exact, fingerprint, n-gram Jaccard, MinHash+LSH,
  * SimHash), similarity search (brute-force + LSH), text analysis, and
  * the multimodal decode plumbing. Sketch-based operators have no SQL
  * oracle (driver records rows-only) but are spec-verified against exact
  * baselines.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  /** Per-JVM materialized media fixtures: the FIRST use of a named
    * fixture in a session encodes it to scratch parquet; every later
    * use — bench reps 2..n, and every query sharing the fixture —
    * reads the parquet back. Measured decode walls therefore time the
    * DECODE, not the fixture's own PNG/AVI/WAV encode (AudioSystem
    * .write and the PNG deflater used to sit inside the measured
    * lineage — min-of-3 now drops the encode with rep 1). Per-process
    * scratch keyed by (name, sf dir): fixture-arithmetic changes can
    * never go stale across runs, and the first call sweeps dead
    * fixture dirs from previous processes (single-writer per host, the
    * storeScratchDir contract).
    */
  private val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def fixtureMedia(s: SparkSession, dir: String,
      name: String)(build: => org.apache.spark.sql.Dataset[Multimodal.MediaRow])
      : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    val path = fixtureCache.computeIfAbsent(s"$name@$dir", _ => {
      if (fixtureCache.isEmpty) {
        val tmpRoot = new java.io.File(System.getProperty("java.io.tmpdir"))
        Option(tmpRoot.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("graft_media_fix_"))
          .foreach(f => new org.apache.hadoop.fs.Path(f.toString)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
            .delete(new org.apache.hadoop.fs.Path(f.toString), true))
      }
      val p = java.nio.file.Files
        .createTempDirectory("graft_media_fix_").toString
      build.write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path).as[Multimodal.MediaRow]
  }

  /** Fresh scratch dir for a release-store gate query, collecting the
    * PREVIOUS invocations' dead stores first (queries run sequentially
    * by contract, and a query's result is materialized before the next
    * query runs, so an earlier store dir has no live reader).
    */
  private def storeScratchDir(s: SparkSession): String = {
    val tmpRoot = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(tmpRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("graft_q_store_"))
      .foreach(f => new org.apache.hadoop.fs.Path(f.toString)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(f.toString), true))
    java.nio.file.Files.createTempDirectory("graft_q_store_").toString
  }

  /** The published family-store registry behind the composed-gate
    * PAIRS that drive one identical store lifecycle (q_embed_clusters ↔
    * q_embed_store; q_media_clusters ↔ q_media_store): driving the
    * lifecycle twice per family bought no additional coverage — both
    * gates' oracle comparisons are independent reads of the SAME
    * driven state — and at bench scale it was ~10–15 s of duplicated
    * wall per run. Whichever gate runs first publishes its driven
    * store (always built with per-batch cluster folds, so the
    * incremental-fold path is exercised regardless of order); the
    * CLUSTERS gate never reuses (its gate owns the fold path, and in
    * the bench's alphabetical order it is the family's builder whose
    * timing keeps pricing the full lifecycle), while the PAIRS gate
    * reuses the latest published build. Publishing replaces and
    * deletes the prior build's dir — queries run sequentially and
    * materialize fully, so a replaced dir has no live reader (the
    * storeScratchDir contract). Keyed per (family, corpus, session);
    * the dirs use their own prefix so the per-query store reaper never
    * collects a live published store.
    */
  private val famStores =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Object)]()

  private def famKey(family: String, s: SparkSession, dir: String): String =
    s"$family|$dir|${System.identityHashCode(s)}"

  private def reuseFamStore[T](family: String, s: SparkSession,
      dir: String): Option[T] =
    Option(famStores.get(famKey(family, s, dir)))
      .map(_._2.asInstanceOf[T])

  private def publishFamStore[T <: Object](family: String,
      s: SparkSession, dir: String, scratch: String, store: T): T = {
    val old = famStores.put(famKey(family, s, dir), (scratch, store))
    if (old != null && old._1 != scratch) {
      val p = new org.apache.hadoop.fs.Path(old._1)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }
    store
  }

  /** Fresh scratch dir for a PUBLISHED family store — its own prefix
    * (never matched by [[storeScratchDir]]'s reaper), collecting
    * leftovers of PREVIOUS processes first (anything not currently
    * registered is dead: crashed runs, earlier rounds).
    */
  private def famScratchDir(s: SparkSession): String = {
    val live = {
      val it = famStores.values().iterator()
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next()._1
      b.result()
    }
    val tmpRoot = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(tmpRoot.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("graft_q_famstore_") &&
        !live.contains(f.toString))
      .foreach(f => new org.apache.hadoop.fs.Path(f.toString)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(f.toString), true))
    java.nio.file.Files.createTempDirectory("graft_q_famstore_").toString
  }

  /** Drive a release-store gate: `batches` batches sliced by `sliceCol`
    * (every residue class must be NON-EMPTY for the gate to actually
    * cover increments — a pre-filtered corpus must pass a slice key the
    * filter doesn't collapse), with a mid-stream compact() before the
    * LAST ingest (so the gate covers ingest-after-compaction), then the
    * eight products from the stored pair set.
    */
  private def storeDrive(s: SparkSession, d: DataFrame,
      store: graft.operators.dedup.ReleaseStore,
      batches: Int = 3,
      sliceCol: Column = col("doc_id")): Dedup.ReleaseProducts = {
    (0L until batches.toLong).foreach { b =>
      store.ingest(d.where(pmod(sliceCol, lit(batches)) === b),
        batchId = Some(b))
      if (b == batches - 2L) store.compact(targetFileBytes = 8L * 1024 * 1024)
    }
    store.products(0.5,
      quality = d.select(col("doc_id").as("id"), col("n_chars").as("q")))
  }

  /** The q_clip_align / q_clip_purge frame table: even docs carry a
    * 4-frame clip with md5-derived frame keys, their odd sibling
    * carries frames 1..2 of it (a cut-out re-post) — REAL-decoded back
    * to per-frame hashes and persisted (clipAlignment self-joins its
    * input).
    */
  private def clipAlignFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir).select(col("doc_id")).as[Long]
    val media = fixtureMedia(s, dir, "clip_align")(
      d.mapPartitions(_.map { id =>
        val gid = id / 2
        def fk(i: Int): Long = h48(s"f${i}_$gid")
        val keys =
          if (id % 2 == 0) Seq(fk(0), fk(1), fk(2), fk(3))
          else Seq(fk(1), fk(2))
        Multimodal.MediaRow(id, "video", Multimodal.encodePathAvi(keys),
          "synth")
      }))
    graft.ScratchCache.persist(
      Multimodal.videoDHash(media).where(col("cause") === "ok")
        .select(col("media_id").as("id"),
          posexplode(col("frame_dhash")).as(Seq("frame_idx", "sh"))))
  }

  /** Drive a media-store gate: the q_image_neardup fingerprint table
    * (REAL PNG decode → dHash) arrives as two id-sliced batches into a
    * [[graft.operators.dedup.MediaStore]] under a scratch dir, with a
    * mid-stream compact() before the second ingest — ingest replay
    * discipline, compaction, and the stored-pair read path all sit
    * inside the oracle equality. `foldPerBatch` additionally calls
    * clusters() after EVERY ingest so the final labels come from a real
    * incremental star-edge fold, not one full build.
    */
  /** Drive an embed-store gate: the embeddings corpus arrives as two
    * vec_id-sliced batches into an [[graft.operators.dedup.EmbedStore]]
    * under a scratch dir (vector projections + sign-LSH postings +
    * verified pairs, marker-guarded), with a mid-stream compact()
    * before the second ingest. `foldPerBatch` additionally calls
    * clusters() after EVERY ingest so the final labels come from a
    * real incremental star-edge fold, not one full build — the
    * mediaStoreDrive discipline on the vector plane.
    */
  private def embedStoreDrive(s: SparkSession, dir: String,
      foldPerBatch: Boolean = false, scratch: Option[String] = None)
      : graft.operators.dedup.EmbedStore = {
    val store = new graft.operators.dedup.EmbedStore(s,
      scratch.getOrElse(storeScratchDir(s)), thresholdE6 = 400000L)
    val e = embs(s, dir).select(col("vec_id").as("id"), col("embedding"))
    (0L until 2L).foreach { b =>
      store.ingest(e.where(pmod(col("id"), lit(2)) === b),
        batchId = Some(b))
      if (foldPerBatch) store.clusters()
      if (b == 0L) store.compact(targetFileBytes = 8L * 1024 * 1024)
    }
    store
  }

  private def mediaStoreDrive(s: SparkSession, dir: String,
      foldPerBatch: Boolean = false,
      hashesOverride: Option[DataFrame] = None,
      scratch: Option[String] = None)
      : graft.operators.dedup.MediaStore = {
    val store = new graft.operators.dedup.MediaStore(s,
      scratch.getOrElse(storeScratchDir(s)))
    val h = hashesOverride.getOrElse(
      neardupHashes(s, dir).withColumn("kind", lit("image")))
    (0L until 2L).foreach { b =>
      store.ingest(h.where(pmod(col("id"), lit(2)) === b), batchId = Some(b))
      if (foldPerBatch) store.clusters()
      if (b == 0L) store.compact(targetFileBytes = 8L * 1024 * 1024)
    }
    store
  }

  /** The q_media_store_mixed fingerprint table: ONE corpus interleaves
    * all three modalities whose REAL-decoded fingerprints share the
    * SAME planted [[pathKey]] families — cross-kind 64-bit hash
    * collisions by construction. Within a 4-doc key group, members
    * `m = id % 4` sit at Hamming 0/1/3/8 from the group base while the
    * kind assignment (m ≤ 1 image, m = 2 audio, m = 3 video) leaves
    * exactly ONE in-kind pair (m 0↔1, Hamming 1) and puts the other
    * ≤3-Hamming relations (0↔2 at 3, 1↔2 at 2) ACROSS kinds — a
    * kind-blind store would pair and purge across modalities here.
    * `% 97` rows are planted empty for the cause routing, uniformly
    * across kinds.
    */
  private def mixedKindHashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir).select(col("doc_id")).as[Long]
    val media = fixtureMedia(s, dir, "mixed_kind")(d.mapPartitions(_.map {
      id =>
        val k = pathKey(id)
        val kind = (id % 4) match {
          case 0 | 1 => "image"
          case 2 => "audio"
          case _ => "video"
        }
        val payload =
          if (id % 97 == 0) Array.emptyByteArray
          else kind match {
            case "image" => Multimodal.encodePathPng(k)
            case "audio" => Multimodal.encodeStepWav(k)
            case _ => Multimodal.encodePathAvi(Seq(k, k, k))
          }
        Multimodal.MediaRow(id, kind, payload, "synth")
    }))
    graft.ScratchCache.persist(
      graft.operators.dedup.MediaStore.fingerprints(media))
  }

  /** Long-format (product, row_md5) rendering of a release's eight
    * products — each branch hashes the same canonical string its
    * standalone oracle derives, so one CORRECTNESS row verifies every
    * product at once. Shared by the three release entries.
    */
  private def releaseTags(r: Dedup.ReleaseProducts): DataFrame = {
    def tag(name: String, df: DataFrame, cols: Seq[String]) =
      df.select(lit(name).as("product"),
        md5(concat_ws("|", cols.map(c => col(c).cast("string")): _*))
          .as("row_md5"))
    tag("pairs", r.pairs, Seq("id_a", "id_b", "common", "jaccard_pm"))
      .unionAll(tag("clusters", r.clusters, Seq("id", "cluster")))
      .unionAll(tag("keepers", r.keepers,
        Seq("cluster", "keeper_id", "quality", "size")))
      .unionAll(tag("sizes", r.clusterSizes, Seq("size", "n_clusters")))
      .unionAll(tag("purge",
        r.survivors.groupBy(col("lang")).agg(count(lit(1)).as("n")),
        Seq("lang", "n")))
      .unionAll(tag("split", r.split, Seq("doc_id", "split")))
      .unionAll(tag("overlap", r.sourceOverlap,
        Seq("source_a", "source_b", "n_pairs")))
      .unionAll(tag("containment", r.containment,
        Seq("id_a", "id_b", "common", "cont_a_pm", "cont_b_pm")))
  }

  val defs: Map[String, Q] = Map(
    "q_dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir), "doc_id", "text")),

    // product-quantization ANN: codes + integer LUT scoring — the
    // memory-compression scale path (64× smaller than float vectors)
    "q_sim_pq" -> ((s, dir) => {
      val e = embs(s, dir)
      graft.operators.similarity.ProductQuant.search(
        e.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding")),
        e.select(col("vec_id").as("id"), col("embedding")), k = 5)
    }),

    // IVF-PQ: coarse cell pruning composed with code-based ADC scoring —
    // the full FAISS-IVFADC production shape (prune cells, scan codes,
    // re-rank survivors exactly)
    "q_sim_ivfpq" -> ((s, dir) => {
      val e = embs(s, dir)
      graft.operators.similarity.ProductQuant.ivfPqSearch(
        e.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding")),
        e.select(col("vec_id").as("id"), col("embedding")), k = 5)
    }),

    // IVF serving-ops diagnostic: per-cell occupancy + probe-cost share
    // — the histogram (with CosineSearch.imbalanceFactor) that decides
    // when the appended index's offline codebook rebuild actually runs
    "q_ivf_cells" -> ((s, dir) =>
      CosineSearch.ivfCellStats(
        embs(s, dir).select(col("vec_id").as("id"), col("embedding")),
        nlist = 16)),

    // kNN majority-vote label propagation: seed labels (vec_id >= 50)
    // classify the held-out head of the table
    "q_knn_classify" -> ((s, dir) => {
      val e = embs(s, dir)
      CosineSearch.knnClassify(
        e.where(col("vec_id") < 50).select(col("vec_id").as("qid"), col("embedding")),
        e.where(col("vec_id") >= 50)
          .select(col("vec_id").as("id"), col("embedding"),
            // long here matches the oracle's CAST(label AS BIGINT); the
            // operator itself is label-type generic
            col("label").cast("long").as("label")),
        k = 5)
    }),

    // unigram-LM surprisal in exact integer bits (perplexity-proxy quality)
    "q_surprisal" -> ((s, dir) =>
      TextAnalysis.surprisal(docs(s, dir), "doc_id", "text")),

    // token-budget sampling: ~1500 tokens per source, greedy in salted
    // hash order (the "N tokens per domain" training-mix step)
    "q_token_budget" -> ((s, dir) =>
      graft.operators.similarity.Sampling.tokenBudget(
        docs(s, dir).select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("toks")),
        col("source"), col("doc_id"), col("toks"),
        budget = 1500L, salt = "tb1")
        .select("doc_id", "source", "toks", "cum_toks")),

    // train/eval leakage audit: near-dup pairs (3-gram Jaccard ≥ 0.3)
    // that straddle the content-hash split — an eval document with a
    // near-copy in train invalidates the benchmark even though the exact
    // split can never leak (identical text hashes to the same side)
    "q_leakage" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.ngramJaccard(d, "doc_id", "text", threshold = 0.3,
        maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count())))
      val splits = d.select(col("doc_id"),
        TextAnalysis.splitLabel(col("text")).as("split"))
      pairs
        .join(splits.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
        .join(splits.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
        .where(col("sa") =!= col("sb"))
        .select(
          when(col("sa") === "train", col("id_a")).otherwise(col("id_b"))
            .as("train_id"),
          when(col("sa") === "train", col("id_b")).otherwise(col("id_a"))
            .as("eval_id"),
          col("jaccard_pm"))
    }),

    // longest corpus-duplicated token span (substring-level dedup signal)
    "q_dup_span" -> ((s, dir) =>
      TextAnalysis.dupSpanStats(docs(s, dir), "doc_id", "text", n = 8)),

    // bigram-LM conditional surprisal (order-sensitive quality signal)
    "q_bigram_surprisal" -> ((s, dir) =>
      TextAnalysis.bigramSurprisal(docs(s, dir), "doc_id", "text")),

    // OOV rate vs the corpus's top-500 token vocabulary (tokenizer
    // coverage signal)
    "q_oov" -> ((s, dir) =>
      TextAnalysis.oovRate(docs(s, dir), "doc_id", "text", vocabSize = 500)),

    // first-occurrence 3-gram novelty in ingestion (doc_id) order
    "q_novelty" -> ((s, dir) =>
      TextAnalysis.novelty(docs(s, dir), "doc_id", "text")),

    // per-source unigram drift: integer-ppm total-variation distance
    "q_source_drift" -> ((s, dir) =>
      TextAnalysis.sourceDrift(docs(s, dir), "source", "text")),

    // canonical normalization (NFC + casefold + whitespace collapse):
    // the pre-dedup cleanup pass; md5 of the normalized text is the
    // equality witness the oracle can reproduce
    "q_normalize" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        md5(graft.expressions.Sketches.normalizeText(col("text")))
          .as("norm_md5"),
        length(graft.expressions.Sketches.normalizeText(col("text")))
          .cast("long").as("norm_chars"))),

    "q_doc_fingerprint" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy("fp")
        .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))),

    "q_text_stats" -> ((s, dir) => {
      val d = docs(s, dir)
      val cols = TextAnalysis.qualityColumns(col("text"))
      d.select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
    }),

    "q_token_estimate" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenEstimate(col("text")).as("tokens_est"))),

    // context-window chunking: stride split of every doc into ≤64-token
    // chunks sharing 8 overlap tokens; identity-hashed for the compare
    "q_chunk" -> ((s, dir) =>
      graft.operators.pack.Chunker.chunk(docs(s, dir), "doc_id", "text",
          maxTokens = 64, overlap = 8)
        .select(col("doc_id"), col("chunk_idx"), col("n_tok"),
          md5(col("chunk_text")).as("chunk_md5"))),

    // the full context-window pipeline: stride-chunk every doc, then
    // pack the chunks in (doc, chunk) order into 512-token training
    // windows — Chunker feeding SequencePacking's two-phase prefix sum
    "q_chunk_pack" -> ((s, dir) => {
      import graft.operators.pack.{Chunker, SequencePacking}
      // chunk identity = doc_id * 2^20 + chunk_idx; 2^20 chunks covers
      // ~59M tokens per doc at 64/8 chunking, and the guard turns any
      // overflow into a loud error instead of a silently-corrupt cid
      val mult = 1L << 20
      val ch = Chunker.chunk(docs(s, dir), "doc_id", "text",
          maxTokens = 64, overlap = 8)
        .select(col("doc_id"), col("chunk_idx"), col("n_tok"))
        .withColumn("cid", col("doc_id") * mult +
          when(col("chunk_idx") < mult, col("chunk_idx")).otherwise(
            raise_error(concat(lit("chunk_idx overflows pack id space: "),
              col("chunk_idx")))))
      SequencePacking.pack(ch, "cid", "n_tok",
          windowTokens = 512, shardSize = 512)
        .withColumn("doc_id", expr(s"id div $mult"))
        .withColumn("chunk_idx", pmod(col("id"), lit(mult)))
        .select("doc_id", "chunk_idx", "toks", "start_tok", "window_id",
          "spans_boundary")
    }),

    // curriculum schedule: stage by global token-count percentile (the
    // distinct-score value table ranks, never the corpus), deterministic
    // hash shard/slot; summarized per (stage, shard) cell
    "q_curriculum" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("tok"))
      graft.operators.pack.Curriculum.order(d, "doc_id", "tok",
          stages = 4, shards = 8)
        .groupBy("stage", "shard")
        .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"),
          min("tok").as("min_tok"), max("tok").as("max_tok"))
    }),

    // Rabin–Karp rolling-hash fingerprint (one-pass native expression) +
    // dup grouping on it — the order-sensitive cousin of q_doc_fingerprint
    "q_rolling_fp" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          graft.expressions.Sketches.rollingHash64(col("text")).as("fp"))
        .groupBy("fp")
        .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))),

    // the SQL-callable surface: the same native expressions, but driven
    // from a raw spark.sql string through the session FunctionRegistry
    // (GraftFunctions.registerAll) — gates the REGISTRATION path the
    // Column-API queries never touch. Witnesses are oracle-portable:
    // md5 of the normalized text, the full-text window count + a
    // 64-char-head md5 for char 3-grams, sorted-distinct word
    // 2-shingles md5, and the Mersenne-61 rolling fingerprint
    "q_sql_surface" -> ((s, dir) => {
      graft.expressions.GraftFunctions.registerAll(s)
      docs(s, dir).createOrReplaceTempView("graft_sql_docs")
      s.sql("""
        SELECT doc_id,
          md5(normalize_text(text)) AS norm_md5,
          CAST(size(char_ngrams(text, 3)) AS BIGINT) AS trigram_windows,
          md5(array_join(char_ngrams(substring(text, 1, 64), 3), '|'))
            AS head_trigrams_md5,
          md5(array_join(array_sort(
            word_shingles(split(trim(text), '\\s+'), 2)), '|'))
            AS shingles2_md5,
          rolling_hash64(text) AS fp
        FROM graft_sql_docs""")
    }),

    // corpus vocabulary: exact top-20 tokens by frequency
    "q_vocab_top" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .where(length(col("tok")) > 0)
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("tok")).limit(20)),

    // tokenizer induction (one BPE merge step): most frequent ADJACENT
    // token pairs corpus-wide — word 2-shingles reuse the one-pass native
    // shingle expression (set semantics per doc, like the dedup family)
    "q_bigram_top" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(graft.expressions.Sketches.wordShingles(
          TextAnalysis.tokens(col("text")), 2)).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("pair")).limit(10)),

    // corpus profile (the data-card rollup): per-source doc counts, token
    // totals, and mean document length in integer per-mille
    "q_corpus_profile" -> ((s, dir) =>
      docs(s, dir)
        .select(col("source"), col("n_chars"),
          TextAnalysis.tokenEstimate(col("text")).as("toks"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("total_toks"),
          sum("n_chars").as("total_chars"))
        .withColumn("mean_chars_e3",
          expr("total_chars * 1000 div n_docs"))),

    "q_lang_id" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.langGuess(col("text")).as("lang_guess"))),

    // the skew guard is on at EVERY ngramJaccard entry in this file
    // (q_dedup_ngram, q_leakage, q_dedup_clusters, q_dedup_purge,
    // q_cluster_sizes, q_source_overlap): cap = max(50, n_docs/10) sits far
    // above any honest shingle's document frequency (so the exact oracle is
    // unchanged) yet bounds the pair join against boilerplate hot
    // shingles — see OperatorsSpec "df-cap prunes a planted hot shingle"
    "q_dedup_ngram" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.ngramJaccard(d, "doc_id", "text", threshold = 0.5,
        maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count())))
    }),

    // df-cap cost frontier: the EXACT candidate-pair volume every cap
    // value would admit, priced from the shingle df histogram — how the
    // cap is chosen at 100 TB (largest cap within the cluster's pair
    // budget) instead of guessed from corpus shape
    "q_df_cap_plan" -> ((s, dir) =>
      Dedup.dfCapFrontier(docs(s, dir), "doc_id", "text")),

    // end-to-end corpus pipeline: quality gate → exact-dup keeper → split
    // counts — the composition a training-data run executes
    "q_corpus_pipeline" -> ((s, dir) => {
      val d = docs(s, dir)
      val (keep, _) = TextAnalysis.qualityVerdict(col("text"))
      val keepers = Dedup.exact(d, "doc_id", "text").select(col("keeper").as("doc_id"))
      d.join(keepers, Seq("doc_id"), "left_semi")
        .where(keep)
        .select(TextAnalysis.splitLabel(col("text")).as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"))
    }),

    // exact-substring scrub (the rewriting companion of q_dup_span):
    // tokens under a corpus-duplicated 8-gram are removed keep-first —
    // the pass that cuts lifted passages out of otherwise-original docs
    "q_span_scrub" -> ((s, dir) =>
      TextAnalysis.scrubDupSpans(docs(s, dir), "doc_id", "text", n = 8)
        .select(col("id").as("doc_id"),
          md5(col("clean_text")).as("clean_md5"),
          col("kept_toks"), col("removed_toks"))),

    // boilerplate SCRUB (the rewriting companion of q_sentence_dedup):
    // sentences in > 3 distinct docs are removed and the remainder
    // reassembled in order — the CCNet-style line-level cleanup pass
    "q_boiler_scrub" -> ((s, dir) =>
      TextAnalysis.scrubBoilerplate(docs(s, dir), "doc_id", "text", maxDf = 3)
        .select(col("id").as("doc_id"),
          md5(col("clean_text")).as("clean_md5"),
          length(col("clean_text")).cast("long").as("clean_len"),
          col("kept_sents"), col("dropped_sents"))),

    // asymmetric containment near-dup: catches a short doc quoted inside
    // a long one (near-1 containment, tiny Jaccard)
    "q_containment" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.containment(d, "doc_id", "text", threshold = 0.8,
        maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count())))
    }),

    // per-source adaptive quality cutoffs: exact rank-based p10/p90 of
    // doc length per source + how many docs the band keeps
    "q_adaptive_cutoff" -> ((s, dir) =>
      TextAnalysis.adaptiveCutoffs(docs(s, dir), "source", "n_chars",
        lowPct = 10, highPct = 90)),

    // boilerplate detection: sentences repeated across documents (the
    // paragraph/sentence-level companion of document-level dedup).
    // Sentence boundaries come from the deterministic segmenter — a
    // period boundary when present, else every 10 tokens (the CCNet
    // line-dedup move for unpunctuated corpora; the synthetic documents
    // carry no punctuation, so a '. '-only split would degenerate to one
    // whole-text sentence per doc and verify nothing at the gate)
    "q_sentence_dedup" -> ((s, dir) => {
      val toks = split(trim(regexp_replace(col("text"), "\\. ", " ")), "\\s+")
      docs(s, dir)
        .select(col("doc_id"),
          explode(transform(
            sequence(lit(0), floor((size(toks) - 1) / lit(10)).cast("int")),
            i => array_join(slice(toks, i * 10 + 1, lit(10)), " "))).as("sent"))
        .where(length(col("sent")) > 0)
        .groupBy(sha2(col("sent"), 256).as("sent_hash"))
        .agg(count(lit(1)).as("n"), min("doc_id").as("first_doc"))
        .where(col("n") > 1)
    }),

    "q_quality_filter" -> ((s, dir) => {
      val (keep, reason) = TextAnalysis.qualityVerdict(col("text"))
      docs(s, dir).select(col("doc_id"), keep.as("keep"), reason.as("reason"))
    }),

    "q_train_split" -> ((s, dir) =>
      docs(s, dir)
        .select(TextAnalysis.splitLabel(col("text")).as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"))),

    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashLsh(docs(s, dir), "doc_id", "text", threshold = 0.5)),

    // the SAME MinHash+LSH pipeline with an engine-portable base hash —
    // the variant a DuckDB oracle can replicate end to end (signatures,
    // banding, candidate pairs, verification)
    "q_dedup_minhash_port" -> ((s, dir) =>
      Dedup.minhashLshPortable(docs(s, dir), "doc_id", "text",
        threshold = 0.5, k = 32, bands = 8, seed = 42L)),

    // REAL image decode, end to end: solid-color PNGs are ENCODED on the
    // executors from doc_id-derived parameters (javax.imageio, lossless),
    // three corruption classes are planted deterministically, and
    // Multimodal.decodeImages REALLY decodes the rest — true dimensions,
    // format, and mean luminance, each arithmetically predictable by the
    // oracle because PNG round-trips solid colors exactly. Corrupt rows
    // route per-cause (no_reader / decode_failed / empty), never drop.
    "q_image_decode" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select(col("doc_id")).as[Long]
      val media = fixtureMedia(s, dir, "image_decode")(d.mapPartitions { it =>
        it.map { id =>
          val payload =
            if (id % 20 == 0) Array.fill(16)(0x55.toByte) // no codec claims it
            else if (id % 10 == 0) // PNG signature, then truncation
              Multimodal.encodeSolidPng(8, 8, 1, 2, 3).take(16)
            else if (id % 10 == 5) Array.emptyByteArray
            else Multimodal.encodeSolidPng(
              8 + (id % 16).toInt, 8 + ((id / 16) % 16).toInt,
              (id % 256).toInt, ((id / 3) % 256).toInt, ((id / 7) % 256).toInt)
          Multimodal.MediaRow(id, "image", payload, "synth")
        }
      })
      Multimodal.decodeImages(media)
        .select(col("media_id"), col("cause"), col("format"),
          col("width"), col("height"), col("mean_rgb_milli"))
    }),

    // REAL image resize, end to end: the q_image_decode fixture (solid
    // PNGs + three planted corruption classes) through
    // Multimodal.resizeImages — Graphics2D bilinear into an 8×8 box.
    // Solid color survives interpolation exactly (luma arithmetic
    // unchanged), and the fit-within dims are integer math the oracle
    // replicates; corrupt rows route per-cause exactly as the decode
    "q_image_resize" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select(col("doc_id")).as[Long]
      val media = fixtureMedia(s, dir, "image_resize")(d.mapPartitions { it =>
        it.map { id =>
          val payload =
            if (id % 20 == 0) Array.fill(16)(0x55.toByte)
            else if (id % 10 == 0)
              Multimodal.encodeSolidPng(8, 8, 1, 2, 3).take(16)
            else if (id % 10 == 5) Array.emptyByteArray
            else Multimodal.encodeSolidPng(
              8 + (id % 16).toInt, 8 + ((id / 16) % 16).toInt,
              (id % 256).toInt, ((id / 3) % 256).toInt, ((id / 7) % 256).toInt)
          Multimodal.MediaRow(id, "image", payload, "synth")
        }
      })
      Multimodal.resizeImages(media, targetW = 8, targetH = 8)
        .select(col("media_id"), col("cause"),
          col("src_width"), col("src_height"),
          col("width"), col("height"), col("mean_rgb_milli"))
    }),

    // REAL image near-dup, end to end: 9×8 "path" PNGs whose dHash is
    // exactly an md5-derived 63-bit key (4-doc groups at controlled
    // Hamming 0/1/3/8 from the group base) are ENCODED on executors,
    // Multimodal.imageDHash decodes them back through the real ImageIO
    // + luma path, and Dedup.hammingPairs blocks (4×16-bit chunks) and
    // verifies (bit_count ≤ 3). The oracle replicates key arithmetic,
    // chunk blocking AND verification, so this row gates the decode
    // round trip, the dHash bit layout, and the banded join's exact-
    // recall pigeonhole at once. doc_id % 97 rows are planted empty to
    // exercise the cause routing in the pair path
    "q_image_neardup" -> ((s, dir) =>
      Dedup.hammingPairs(neardupHashes(s, dir), maxHamming = 3)),

    // the same verified pair set through the shared distributed CC —
    // one cluster per planted group, exactly as text dedup clusters
    "q_image_clusters" -> ((s, dir) =>
      Dedup.connectedComponents(
        Dedup.hammingPairs(neardupHashes(s, dir), maxHamming = 3))),

    // the MEDIA-STORE lifecycle, gated end to end: the q_image_neardup
    // fingerprint corpus arrives as two id-sliced batches into a
    // MediaStore under a scratch dir (real PNG decode → dHash per
    // batch, marker-guarded appends, accepted-id sidecars), compact()
    // fires MID-STREAM, and the pair set serves from STORED state —
    // batch×stored hammingJoin + batch self-join accumulate to exactly
    // the from-scratch hammingPairs pair set (union completeness: each
    // pair is generated by its later member's batch), so the composed
    // q_image_neardup oracle applies verbatim
    // PAIRS gate of the media family — the q_embed_store sharing shape
    "q_media_store" -> ((s, dir) =>
      reuseFamStore[graft.operators.dedup.MediaStore]("media", s, dir)
        .getOrElse {
          val sc = famScratchDir(s)
          publishFamStore("media", s, dir, sc,
            mediaStoreDrive(s, dir, foldPerBatch = true,
              scratch = Some(sc)))
        }
        .pairs
        .select(col("id_a"), col("id_b"), col("hamming"))),

    // the store's INCREMENTALLY-maintained cluster labels (per-batch
    // star-edge folds, the productsCached discipline) must equal the
    // from-scratch CC over the same pairs — the q_image_clusters oracle
    "q_media_clusters" -> ((s, dir) => {
      val sc = famScratchDir(s)
      val store = publishFamStore("media", s, dir, sc,
        mediaStoreDrive(s, dir, foldPerBatch = true, scratch = Some(sc)))
      store.clusters()
    }),

    // KIND SAFETY, gated end to end: a MIXED image/audio/video corpus
    // with PLANTED cross-kind 64-bit hash collisions (see
    // mixedKindHashes — every key group holds ≤3-Hamming relations
    // ACROSS kinds) drives the same 2-batch store lifecycle; pairs must
    // form only within a modality (`kind` in the blocking equi-key),
    // and the oracle replays the key arithmetic, the kind assignment,
    // the kind-blocked banding and the bit_count verification
    "q_media_store_mixed" -> ((s, dir) =>
      mediaStoreDrive(s, dir,
        hashesOverride = Some(mixedKindHashes(s, dir)))
        .pairs
        .select(col("id_a"), col("id_b"), col("hamming"), col("kind"))),

    // REAL video near-dup, end to end: 3-frame path AVIs (majority clip
    // fingerprint == the md5-derived pathKey; see videoClipHashes) are
    // ENCODED on executors, Multimodal.videoDHash REALLY container-
    // parses + raster-decodes every frame through the shared dHash
    // core and majority-votes the clip hash, and Dedup.hammingPairs
    // blocks (4×16-bit chunks) and verifies (bit_count ≤ 3). Same
    // planted 0/1/3/8 group structure as q_image_neardup; one row gates
    // the AVI frame walk, the per-frame dHash, the majority vote AND
    // the banded join's recall theorem
    "q_video_neardup" -> ((s, dir) =>
      Dedup.hammingPairs(videoClipHashes(s, dir), maxHamming = 3)),

    // CROSS-MODAL near-dup, end to end: the image corpus's real dHash
    // table joined two-sided (Dedup.hammingJoin) against the clips'
    // per-frame hashes — "which crawl images appear inside which
    // clips". Group-rep docs carry a 3-frame clip whose outer frames
    // are the group key and whose middle frame is 32 bits away (an
    // unrelated interstitial the per-frame granularity must NOT match);
    // images at planted Hamming 0/1/3 from the key match, the 8-flip
    // member does not. The oracle replicates the frame construction,
    // the chunk blocking on BOTH sides and the verification
    "q_frame_image_match" -> ((s, dir) => {
      import s.implicits._
      val images = neardupHashes(s, dir)
      val vids = docs(s, dir)
        .where(pmod(col("doc_id"), lit(4)) === 0 &&
          pmod(col("doc_id"), lit(97)) =!= 0)
        .select(col("doc_id")).as[Long]
      val media = fixtureMedia(s, dir, "frame_image_match")(
        vids.mapPartitions(_.map { id =>
          val k = pathKey(id)
          Multimodal.MediaRow(id, "video",
            Multimodal.encodePathAvi(Seq(k, k ^ 0x5555555555555555L, k)),
            "synth")
        }))
      val frames = graft.ScratchCache.persist(
        Multimodal.videoDHash(media)
          .where(col("cause") === "ok")
          .select(col("media_id"),
            posexplode(col("frame_dhash")).as(Seq("frame_idx", "sh")))
          .select((col("media_id") * 100 + col("frame_idx")).as("id"),
            col("sh")).toDF())
      Dedup.hammingJoin(images, frames, maxHamming = 3)
        .select(col("id_a").as("image_id"),
          expr("id_b div 100").as("video_id"),
          pmod(col("id_b"), lit(100)).as("frame_idx"),
          col("hamming"))
    }),

    // SUB-CLIP detection, end to end: even docs carry a 4-frame clip
    // with md5-derived frame keys, their odd sibling carries frames
    // 1..2 of it — a cut-out re-post. Multimodal.videoDHash REALLY
    // decodes every frame, clipAlignment finds the diagonal: the short
    // clip is 1000-contained in the long one at offset +1, the long
    // 500-contained at -1. The oracle rebuilds the frame keys and
    // replays the diagonal/argmax arithmetic (maxHamming = 0: frame
    // matching degrades to hash equality on both sides)
    "q_clip_align" -> ((s, dir) =>
      Multimodal.clipAlignment(clipAlignFrames(s, dir), maxHamming = 0)),

    // the SAME planted cut-out re-posts driven into a RELEASE decision:
    // clipContainmentPurge pairs each ≥800‰-contained clip with its
    // container, clusters through the shared CC, and keeps ONE clip per
    // cluster by quality (frame count — the full upload wins over its
    // cut-out, ties by id). The oracle replays the frame keys, the
    // diagonal argmax, the containment threshold AND the keeper rule
    "q_clip_purge" -> ((s, dir) => {
      val frames = clipAlignFrames(s, dir)
      val quality = frames.groupBy(col("id"))
        .agg(count(lit(1)).cast("long").as("q"))
      Multimodal.clipContainmentPurge(
        docs(s, dir).select(col("doc_id")), "doc_id",
        frames, quality, thresholdPm = 800)
    }),

    // the INCREMENTAL twin of q_clip_purge: the full clips (even ids)
    // ingest as batch 0 of a MediaStore's CLIP plane, compact() fires
    // mid-stream, and the cut-out re-posts (odd ids) arrive as batch 1
    // — aligned batch×stored against the compacted state, never
    // re-aligning the corpus. purgeClips serves the release decision
    // from accumulated DIRECTED alignment rows; delta completeness
    // (every frame match of a clip pair sits in its later clip's
    // ingest) makes the composed q_clip_purge oracle apply verbatim
    "q_clip_store" -> ((s, dir) => {
      val store = new graft.operators.dedup.MediaStore(s,
        storeScratchDir(s))
      val frames = clipAlignFrames(s, dir)
        .withColumn("kind", lit("video"))
      (0L until 2L).foreach { b =>
        store.ingestClips(frames.where(pmod(col("id"), lit(2)) === b),
          batchId = Some(b))
        if (b == 0L) store.compact(targetFileBytes = 8L * 1024 * 1024)
      }
      val quality = frames.groupBy(col("id"))
        .agg(count(lit(1)).cast("long").as("q"))
      store.purgeClips(docs(s, dir).select(col("doc_id")), "doc_id",
        quality, thresholdPm = 800)
    }),

    // SHOT-BOUNDARY detection, end to end: clips whose frames hold one
    // md5-derived key except a planted 24-bit-away middle section —
    // Multimodal.videoDHash REALLY decodes every frame and videoScenes
    // surfaces exactly the two cuts at their indices with delta 24
    // (any decode or dHash drift would perturb it); %7 docs are
    // single-shot clips (no rows), %97 empty (cause-routed out)
    "q_video_scenes" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select(col("doc_id")).as[Long]
      val media = fixtureMedia(s, dir, "video_scenes")(
        d.mapPartitions(_.map { id =>
          val kA = h48(s"v0_$id")
          val kB = kA ^ 0x0000ffffff000000L
          val payload =
            if (id % 97 == 0) Array.emptyByteArray
            else if (id % 7 == 0)
              Multimodal.encodePathAvi(Seq(kA, kA, kA))
            else Multimodal.encodePathAvi(Seq(kA, kA, kB, kA))
          Multimodal.MediaRow(id, "video", payload, "synth")
        }))
      Multimodal.videoScenes(Multimodal.videoDHash(media),
        minHamming = 16)
    }),

    // KEYFRAME-per-shot extraction, end to end: the q_video_scenes
    // fixture driven through videoKeyframes — frame 0 plus each
    // planted 24-bit cut must surface as a 9×8 pass-through thumbnail
    // (the PNG bytes are spec-pinned lossless; the gate pins the shot
    // structure and the resize dim contract through the real decode)
    "q_video_keyframes" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select(col("doc_id")).as[Long]
      val media = fixtureMedia(s, dir, "video_keyframes")(
        d.mapPartitions(_.map { id =>
          val kA = h48(s"v0_$id")
          val kB = kA ^ 0x0000ffffff000000L
          val payload =
            if (id % 97 == 0) Array.emptyByteArray
            else if (id % 7 == 0)
              Multimodal.encodePathAvi(Seq(kA, kA, kA))
            else Multimodal.encodePathAvi(Seq(kA, kA, kB, kA))
          Multimodal.MediaRow(id, "video", payload, "synth")
        }))
      Multimodal.videoKeyframes(media, minHamming = 16)
        .where(col("cause") === "ok")
        .select(col("media_id"), col("frame_idx"),
          col("width"), col("height"))
    }),

    // ACOUSTIC scene cuts, end to end: the generic hashCuts detector
    // over real per-segment envelope hashes — a planted 24-bit-away
    // second segment must surface as cuts at segments 1 and 2 with
    // exact deltas; %7 docs are single-tone (no rows), %97 empty
    "q_audio_scenes" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select(col("doc_id")).as[Long]
      val media = fixtureMedia(s, dir, "audio_scenes")(
        d.mapPartitions(_.map { id =>
          val k = h48(s"as0_$id")
          val kB = k ^ 0x0000ffffff000000L
          val payload =
            if (id % 97 == 0) Array.emptyByteArray
            else if (id % 7 == 0)
              Multimodal.encodeSegmentsWav(Seq(k, k, k))
            else Multimodal.encodeSegmentsWav(Seq(k, kB, k, k))
          Multimodal.MediaRow(id, "audio", payload, "synth")
        }))
      Multimodal.hashCuts(
        Multimodal.audioSegments(media, segFrames = 260)
          .where(col("cause") === "ok")
          .select(col("media_id").as("id"),
            col("seg_idx").as("frame_idx"), col("dhash").as("sh")),
        minHamming = 16)
        .select(col("id").as("media_id"),
          col("frame_idx").as("seg_idx"), col("hamming_delta"))
    }),

    // JOINT A/V fingerprint, end to end: ONE container carries a path
    // video stream (majority clip key) AND an interleaved PCM audio
    // stream (envelope key) — videoDHash and demuxAudio→audioDHash
    // each recover their planted key from the same payload, joined on
    // media_id. The cross-modal signature a re-encode-robust video
    // dedup pipeline pairs on
    "q_av_fingerprint" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select(col("doc_id")).as[Long]
      // fixtureMedia also plays the persist role here: both modality
      // passes read the materialized parquet, never re-encode
      val media = fixtureMedia(s, dir, "av_fingerprint")(
        d.mapPartitions(_.map { id =>
          val kV = pathKey(id)
          val noise = (id * 0x9e3779b97f4a7c15L) | 1L
          val payload =
            if (id % 97 == 0) Array.emptyByteArray
            else Multimodal.encodePathAvi(Seq(kV, kV ^ noise, kV),
              audioChunks = Multimodal.stepPcm(Seq(h48(s"av0_$id")))
                .grouped(130).toIndexedSeq)
          Multimodal.MediaRow(id, "video", payload, "synth")
        }))
      val v = Multimodal.videoDHash(media)
        .where(col("cause") === "ok")
        .select(col("media_id"), col("clip_dhash"))
      val tracks = Multimodal.demuxAudio(media)
        .filter(t => t.cause == "ok" && t.wav.isDefined)
        .map(t => Multimodal.MediaRow(t.media_id, "audio", t.wav.get,
          "demux"))
      val a = Multimodal.audioDHash(tracks)
        .where(col("cause") === "ok")
        .select(col("media_id"), col("dhash").as("audio_dhash"))
      v.join(a, "media_id")
    }),

    // AUDIO-TRACK DEMUX, end to end: AVIs carry their pathKey envelope
    // pattern as interleaved 16-bit PCM "00wb" chunks; demuxAudio
    // reassembles the stream into a canonical WAV and audioDHash
    // recovers the key — container demux composed with the whole audio
    // family in one row. %7 docs carry no auds stream, %97 are empty
    // (both cause-routed out)
    "q_demux_audio" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select(col("doc_id")).as[Long]
      val media = fixtureMedia(s, dir, "demux_audio")(
        d.mapPartitions(_.map { id =>
          val payload =
            if (id % 97 == 0) Array.emptyByteArray
            else if (id % 7 == 0)
              Multimodal.encodeSolidAvi(4, 2, 2, 10, 1, 2, 3)
            else Multimodal.encodeSolidAvi(4, 2, 2, 10, 1, 2, 3,
              audioFirst = true,
              audioChunks = Multimodal.stepPcm(Seq(pathKey(id)))
                .grouped(130).toIndexedSeq)
          Multimodal.MediaRow(id, "video", payload, "synth")
        }))
      val tracks = Multimodal.demuxAudio(media)
        .filter(t => t.cause == "ok" && t.wav.isDefined)
        .map(t => Multimodal.MediaRow(t.media_id, "audio", t.wav.get,
          "demux"))
      Multimodal.audioDHash(tracks)
        .select(col("media_id"), col("sample_rate"), col("channels"),
          col("n_frames"), col("dhash"))
    }),

    // SUB-RECORDING detection, end to end: even docs carry a 4-segment
    // WAV (md5-derived per-segment envelope keys), their odd sibling
    // carries segments 1..2 of it. Multimodal.audioSegments REALLY
    // decodes the PCM into per-segment fingerprints and the SAME
    // clipAlignment diagonal argmax finds the offset — the operator is
    // media-agnostic by construction. % 89 even docs are CUT mid
    // segment 4: the three complete segments must survive (the
    // truncation-must-not-hide-intact-content contract), shrinking
    // that pair's even-side containment from 500 to 666 permille of 3
    "q_audio_align" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
        .where(pmod(col("doc_id"), lit(97)) =!= 0)
        .select(col("doc_id")).as[Long]
      val segBytes = 65 * 4 * 2
      val media = fixtureMedia(s, dir, "audio_align")(
        d.mapPartitions(_.map { id =>
          val gid = id / 2
          def sk(i: Int): Long = h48(s"a${i}_$gid")
          val payload =
            if (id % 2 == 1)
              Multimodal.encodeSegmentsWav(Seq(sk(1), sk(2)))
            else {
              val full = Multimodal.encodeSegmentsWav(
                Seq(sk(0), sk(1), sk(2), sk(3)))
              if (id % 89 == 0) full.take(44 + 3 * segBytes + 100) else full
            }
          Multimodal.MediaRow(id, "audio", payload, "synth")
        }))
      val segs = graft.ScratchCache.persist(
        Multimodal.audioSegments(media, segFrames = 260)
          .where(col("cause") === "ok")
          .select(col("media_id").as("id"),
            col("seg_idx").as("frame_idx"), col("dhash").as("sh")))
      Multimodal.clipAlignment(segs, maxHamming = 0)
    }),

    // REAL audio near-dup, end to end: stepped-envelope WAVs (energy
    // difference hash == the md5-derived pathKey, per-doc gain varied —
    // see audioClipHashes) are ENCODED on executors, Multimodal
    // .audioDHash REALLY decodes the PCM and hashes the energy
    // envelope, and Dedup.hammingPairs blocks + verifies. Same planted
    // 0/1/3/8 group structure; one row gates the WAV round trip, the
    // envelope hash, its gain invariance AND the banded join
    "q_audio_neardup" -> ((s, dir) =>
      Dedup.hammingPairs(audioClipHashes(s, dir), maxHamming = 3)),

    // REAL audio decode, end to end: constant-amplitude 16-bit mono PCM
    // WAVs are ENCODED on the executors from doc_id-derived parameters
    // (javax.sound.sampled, lossless), three corruption classes are
    // planted deterministically, and Multimodal.decodeAudio REALLY
    // decodes the rest — header-true rate/channels/bits plus streamed
    // RMS/peak, each arithmetically predictable because constant
    // amplitude makes RMS = peak = |amplitude| exactly. Corrupt rows
    // route per-cause (no_reader / truncated / empty), never drop.
    "q_audio_decode" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select(col("doc_id")).as[Long]
      val media = fixtureMedia(s, dir, "audio_decode")(d.mapPartitions { it =>
        it.map { id =>
          val payload =
            if (id % 20 == 0) Array.fill(16)(0x55.toByte) // no provider claims it
            else if (id % 10 == 0) // intact WAV header, then truncation
              Multimodal.encodeConstWav(8000, 64, 1000).take(50)
            else if (id % 10 == 5) Array.emptyByteArray
            else {
              val amp = (100 + id % 12000).toInt
              Multimodal.encodeConstWav(
                8000 + (id % 8).toInt * 1000, 64 + (id % 100).toInt,
                (if (id % 2 == 1) -amp else amp).toShort)
            }
          Multimodal.MediaRow(id, "audio", payload, "synth")
        }
      })
      Multimodal.decodeAudio(media)
        .select(col("media_id"), col("cause"), col("format"),
          col("sample_rate"), col("channels"), col("bits"),
          col("n_frames"), col("rms"), col("peak"))
    }),

    // REAL video decode, end to end: solid-color BI_RGB AVI clips are
    // ENCODED on the executors from doc_id-derived parameters (the
    // RIFF/AVI container written byte-by-byte, raw DIB frames —
    // lossless), four corruption/routing classes are planted
    // deterministically, and Multimodal.decodeVideo REALLY parses the
    // container and raster-decodes the frames — dimensions, frame
    // counts, fps, duration and mean luminance all arithmetically
    // predictable. Corrupt rows route per-cause (no_reader / truncated /
    // empty / unsupported_codec), never drop.
    "q_video_decode" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select(col("doc_id")).as[Long]
      val media = fixtureMedia(s, dir, "video_decode")(d.mapPartitions { it =>
        it.map { id =>
          val payload =
            if (id % 20 == 0) Array.fill(16)(0x55.toByte) // not RIFF
            else if (id % 10 == 0) // intact header, movi cut mid-chunk:
              // 224-byte fixed header + one full 32-byte frame chunk +
              // the next chunk's 8-byte header with no data
              Multimodal.encodeSolidAvi(4, 2, 4, 10, 9, 9, 9).take(264)
            else if (id % 10 == 5) Array.emptyByteArray
            else if (id % 10 == 3) // inter-frame codec the JDK lacks
              Multimodal.encodeSolidAvi(6, 4, 2, 8, 1, 2, 3, "xvid")
            else Multimodal.encodeSolidAvi(
              4 + (id % 13).toInt, 2 + ((id / 13) % 11).toInt,
              1 + (id % 7).toInt, 5 + (id % 25).toInt,
              (id % 256).toInt, ((id / 3) % 256).toInt, ((id / 7) % 256).toInt)
          Multimodal.MediaRow(id, "video", payload, "synth")
        }
      })
      Multimodal.decodeVideo(media)
        .select(col("media_id"), col("cause"), col("codec"),
          col("width"), col("height"), col("n_frames"),
          col("declared_frames"), col("fps_milli"), col("duration_ms"),
          col("sampled_frames"), col("mean_rgb_milli"))
    }),

    "q_dedup_clusters" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.connectedComponents(
        Dedup.ngramJaccard(d, "doc_id", "text", threshold = 0.5,
          maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count()))))
    }),

    // LSH band-shape audit: precision/recall of the banded-MinHash
    // candidate set against exact-Jaccard ground truth — the tuning
    // number that decides (k, bands) before an LSH-only full-corpus run
    "q_lsh_audit" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.lshAudit(d, "doc_id", "text", threshold = 0.5,
        k = 32, bands = 8, seed = 42L,
        maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count())))
    }),

    // containment-front audit: the rarest-prefix candidate set against
    // exact containment ground truth. recall_pm = 1000 BY THEOREM (the
    // prefix-subset bound) — keeping it measured turns the proof into a
    // standing regression gate; precision_pm is the live tuning number
    // (probe fuel verification throws away)
    "q_contain_audit" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.containmentAudit(d, "doc_id", "text", threshold = 0.8,
        maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count())))
    }),

    // candidate-front COST plan: the exact pre-distinct pair volume of
    // each front (index self-join / banding / containment prefix) from
    // counting aggregations alone — the front-selection twin of
    // q_df_cap_plan, priced without materializing a single candidate.
    // UNCAPPED here so the oracle equality is unconditional (no bet on
    // the cap never binding at the gate SFs); the capped pricing is the
    // API's production knob, and the cap's own economics already have
    // their priced gate in q_df_cap_plan
    "q_front_plan" -> ((s, dir) =>
      Dedup.lshFrontCostPlan(docs(s, dir), "doc_id", "text",
        containThreshold = 0.8, maxShingleDf = None,
        k = 32, bands = 16, seed = 42L)),

    // quality-aware purge keepers: per near-dup cluster, keep the
    // LONGEST member (ties → min id) instead of the arbitrary min-id —
    // what a curation pipeline actually ships
    "q_cluster_keeper" -> ((s, dir) => {
      val d = docs(s, dir)
      val clusters = Dedup.connectedComponents(
        Dedup.ngramJaccard(d, "doc_id", "text", threshold = 0.5,
          maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count()))))
      Dedup.clusterKeepers(clusters,
        d.select(col("doc_id").as("id"), col("n_chars").as("q")))
    }),

    // end-to-end near-dup purge: cluster the ngram pairs, drop every
    // non-keeper (id != cluster min), count survivors per language — the
    // step that actually shrinks a corpus after dedup analysis
    "q_dedup_purge" -> ((s, dir) => {
      val d = docs(s, dir)
      val clusters = Dedup.connectedComponents(
        Dedup.ngramJaccard(d, "doc_id", "text", threshold = 0.5,
          maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count()))))
      val losers = clusters.where(col("id") =!= col("cluster"))
        .select(col("id").as("doc_id"))
      d.join(losers, Seq("doc_id"), "left_anti")
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    }),

    // incremental near-dup: a new batch (source src0) deduped against
    // the already-settled corpus + itself — corpus never self-joins.
    // Result ≡ the full pair join filtered to batch-involved pairs,
    // which is exactly what the oracle computes
    "q_incr_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.incrementalNearDup(d, "doc_id", "text",
        isBatch = col("source") === "src0", threshold = 0.3,
        maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count())))
    }),

    // dup-cluster size histogram (data-card signal: how much of the
    // corpus sits in 2-clusters vs. larger copy families)
    "q_cluster_sizes" -> ((s, dir) => {
      val d = docs(s, dir)
      val clusters = Dedup.connectedComponents(
        Dedup.ngramJaccard(d, "doc_id", "text", threshold = 0.5,
          maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count()))))
      clusters.groupBy("cluster").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_clusters"))
    }),

    // the one-pass dedup RELEASE: all eight ngram-family products
    // (scored pairs verified as Jaccard near-dups AND as asymmetric
    // containment, clusters, keepers, size histogram, purge survivors,
    // leakage-safe split, cross-source overlap matrix) from a SINGLE
    // scored-pair materialization + one CC run — the composition a real
    // release executes instead of paying the pair join eight times.
    // Long format (product, row_md5): each product's rows hash the same
    // canonical string its standalone oracle derives, so one CORRECTNESS
    // row verifies every product at once.
    "q_dedup_release" -> ((s, dir) => {
      val d = docs(s, dir)
      val r = Dedup.releasePipeline(d, "doc_id", "text", threshold = 0.5,
        maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count())),
        quality = d.select(col("doc_id").as("id"), col("n_chars").as("q")))
      releaseTags(r)
    }),

    // the LSH-FRONTED release: identical eight products, but candidate
    // generation is banded MinHash (Jaccard) + rarest-first prefix
    // filtering (containment) instead of the inverted-index self-join —
    // the 100 TB shape where the index join's Σ df² candidate volume is
    // unpayable. Portable variant (48-bit md5 base hash, slice-equality
    // banding) so the oracle replicates candidates AND products exactly;
    // band shape k=32/bands=16 keeps per-pair recall ≥99% at the 0.5
    // release threshold (r=2), and the hash-space scoring matches the
    // oracle's hv-based counts bit-for-bit
    "q_release_lsh" -> ((s, dir) => {
      val d = docs(s, dir)
      val r = Dedup.releasePipelineLsh(d, "doc_id", "text", threshold = 0.5,
        maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count())),
        quality = d.select(col("doc_id").as("id"), col("n_chars").as("q")),
        k = 32, bands = 16, seed = 42L, portable = true)
      releaseTags(r)
    }),

    // the exact-duplicate COLLAPSE front: identical shingle sets are
    // grouped before candidate generation, banding + prefix probing +
    // verification run on one representative per group, and scored rep
    // pairs expand back to member pairs. Products are identical to the
    // uncollapsed LSH release (identical sets score identically against
    // everything), so the same composed oracle gates it — this is the
    // crawl-corpus default where exact dups amplify candidate fuel by
    // group-size² while the true work grows not at all
    "q_release_collapse" -> ((s, dir) => {
      val d = docs(s, dir)
      val r = Dedup.releasePipelineLsh(d, "doc_id", "text", threshold = 0.5,
        maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count())),
        quality = d.select(col("doc_id").as("id"), col("n_chars").as("q")),
        k = 32, bands = 16, seed = 42L, portable = true,
        collapseExact = true)
      releaseTags(r)
    }),

    // the PLANNER-DISPATCHED release: frontDecisions prices both fronts
    // from one counting plan and picks the pipeline. At the gate SFs the
    // margin math picks the EXACT front (ReleaseSpec pins the dispatch
    // both ways on planted fixtures), so the composed q_dedup_release
    // oracle applies verbatim — the gate proves the dispatcher's chosen
    // pipeline still lands oracle-identical products, not just that a
    // branch ran
    "q_release_auto" -> ((s, dir) => {
      val d = docs(s, dir)
      val r = Dedup.releaseAuto(d, "doc_id", "text", threshold = 0.5,
        maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count())),
        quality = d.select(col("doc_id").as("id"), col("n_chars").as("q")))
      releaseTags(r)
    }),

    // the RELEASE-STORE lifecycle, gated end to end against the same
    // composed oracle: the corpus arrives as three id-sliced batches
    // into an exact-front store under a scratch dir (marker-guarded
    // appends, accepted-id sidecars), compact() fires MID-STREAM after
    // the second batch, and the eight products derive from the STORED
    // scored set — ingest replay discipline, compaction and the
    // products read path all sit inside the oracle equality. Exact
    // front: its recall needs no banding bet, so store == from-scratch
    // holds unconditionally (the LSH/collapse store is pinned equal to
    // the oracle-gated releasePipelineLsh by ReleaseStoreSpec). The
    // store is uncapped; the gate-SF corpora never bind the cap, so the
    // uncapped scored set equals the capped from-scratch one.
    "q_store_release" -> ((s, dir) => {
      val store = new graft.operators.dedup.ReleaseStore(
        s, storeScratchDir(s), "doc_id", "text")
      releaseTags(storeDrive(s, docs(s, dir), store))
    }),

    // the SAME lifecycle with the exact-front sidecar dispatch forced
    // ON (exactSidecarMinRows = 1): every ingest maintains the docids
    // sidecar + per-doc shingle state, the id guards consult the
    // sidecar through the footer-count proof, and the scored deltas
    // come from STORED state via the counting index join — the
    // dispatch-on half of the exact front, which the gate SFs' small
    // corpora (default threshold 50k) would otherwise never reach
    // under the oracle. Stored-state scoring is exactly the recompute
    // delta's pair set (ReleaseStoreSpec pins it across replay and
    // compaction), so the same composed oracle applies verbatim.
    "q_store_release_state" -> ((s, dir) => {
      val store = new graft.operators.dedup.ReleaseStore(
        s, storeScratchDir(s), "doc_id", "text",
        exactSidecarMinRows = 1L)
      releaseTags(storeDrive(s, docs(s, dir), store))
    }),

    // the COLLAPSE-FRONT store, gated end to end: id-sliced batches
    // with a mid-stream compact(), but state keyed by distinct shingle
    // set, rep-level stored pairs expanded on read, and the PORTABLE
    // hash family so the accumulated release lands in the
    // q_release_lsh oracle's hash space. The accumulated increments
    // equal the one-shot pipeline by the same union-completeness
    // argument q_incr_release_lsh rides, and collapse == uncollapsed by
    // expandCollapsedScored's exactness (ReleaseStoreSpec pins both) —
    // so the composed q_release_lsh oracle applies with the same
    // half-corpus restriction (the gate cap never binds at gate SFs,
    // exactly as q_store_release vs the capped q_dedup_release oracle).
    // GATE ECONOMY: the portable md5 LSH front is ~an order costlier
    // per shingle than production's xxhash64, and the full-corpus
    // 3-batch drive cost 26 s at the bench SF — a deterministic half
    // corpus in 2 batches (still increments + ingest-after-compact +
    // replay view) keeps every code path under gate while paying
    // bench-proportionate wall; ReleaseStoreSpec owns the exhaustive
    // lifecycle matrix
    "q_store_collapse" -> ((s, dir) => {
      val store = new graft.operators.dedup.ReleaseStore(
        s, storeScratchDir(s), "doc_id", "text", lshFront = true,
        k = 32, bands = 16, portable = true, collapseFront = true)
      // slice by doc_id/2: the even-id filter collapses pmod(doc_id, 2)
      // to one residue class, which would leave batch 1 EMPTY and the
      // increment path un-gated
      releaseTags(storeDrive(s,
        docs(s, dir).where(pmod(col("doc_id"), lit(2)) === 0),
        store, batches = 2,
        sliceCol = (col("doc_id") / 2).cast("long")))
    }),

    // the incremental release, gated end to end: a prior release over
    // the non-src0 corpus, then src0 arrives as the increment —
    // batch×corpus probe + batch×batch only, never corpus×corpus — and
    // the re-derived products must equal a from-scratch release over
    // the combined corpus (the same composed oracle as q_dedup_release:
    // at gate SFs the df-cap never binds, so incremental == from-scratch
    // exactly; the capped drift contract is ReleaseSpec territory)
    "q_incr_release" -> ((s, dir) => {
      val d = docs(s, dir)
      val isBatch = col("source") === "src0"
      val prior = d.where(!isBatch)
      val cap = Some(Dedup.defaultShingleDfCap(d.count()))
      val r0 = Dedup.releasePipeline(prior, "doc_id", "text",
        threshold = 0.5, maxShingleDf = cap,
        quality = prior.select(col("doc_id").as("id"), col("n_chars").as("q")))
      val r = Dedup.incrementalRelease(d, "doc_id", "text", isBatch,
        priorScored = r0.scored, threshold = 0.5, maxShingleDf = cap,
        quality = d.select(col("doc_id").as("id"), col("n_chars").as("q")))
      releaseTags(r)
    }),

    // the fully LSH-fronted INCREMENT cadence: a prior LSH release over
    // the non-src0 corpus, then src0 arrives and the delta is generated
    // by incrementalLshScoredPairs — banded batch×all + one-side-batch
    // prefix probes; neither the Σ df² index join nor a corpus×corpus
    // banding pass ever runs. Products must equal the from-scratch LSH
    // release over the combined corpus (same composed oracle as
    // q_release_lsh: sub-threshold scored rows may differ between the
    // two pipelines, but every product row is ≥-threshold and identical)
    "q_incr_release_lsh" -> ((s, dir) => {
      val d = docs(s, dir)
      val isBatch = col("source") === "src0"
      val prior = d.where(!isBatch)
      val cap = Some(Dedup.defaultShingleDfCap(d.count()))
      val r0 = Dedup.releasePipelineLsh(prior, "doc_id", "text",
        threshold = 0.5, maxShingleDf = cap,
        quality = prior.select(col("doc_id").as("id"), col("n_chars").as("q")),
        k = 32, bands = 16, seed = 42L, portable = true)
      val r = Dedup.incrementalReleaseLsh(d, "doc_id", "text", isBatch,
        priorScored = r0.scored, threshold = 0.5, maxShingleDf = cap,
        quality = d.select(col("doc_id").as("id"), col("n_chars").as("q")),
        k = 32, bands = 16, seed = 42L, portable = true)
      releaseTags(r)
    }),

    // cross-source duplication matrix: near-dup pairs bucketed by the
    // (source_a, source_b) of their documents — which sources copy from
    // each other (mirrors, scrapes, syndication)
    "q_source_overlap" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.sourceOverlap(
        Dedup.ngramJaccard(d, "doc_id", "text", threshold = 0.5,
          maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count()))),
        d.select(col("doc_id"), col("source")))
    }),

    // embedding-side purge: exact-cosine pairs → connected components →
    // drop non-keepers (the vector twin of q_dedup_purge; LSH pairs are
    // the 100 TB retrieval path, exact pairs the oracle-able ground truth)
    "q_embed_purge" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id").as("id"), col("embedding"))
      val clusters = Dedup.connectedComponents(
        CosineSearch.exactPairs(e, thresholdE6 = 400000L))
      val losers = clusters.where(col("id") =!= col("cluster"))
        .select(col("id").as("vec_id"))
      embs(s, dir).join(losers, Seq("vec_id"), "left_anti")
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n"))
    }),

    "q_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3)),

    // SimHash with the engine-portable base hash — sketch, chunk
    // blocking, and Hamming verification all oracle-replicated
    "q_dedup_simhash_port" -> ((s, dir) =>
      Dedup.simhashPairsPortable(docs(s, dir), "doc_id", "text",
        maxHamming = 3)),

    "q_embed_quant" -> ((s, dir) => {
      import graft.operators.similarity.Embeddings
      val v = col("embedding").cast("array<double>")
      embs(s, dir)
        .select(col("vec_id"), v.as("v"), Embeddings.int8Scale(v).as("scale"))
        .where(col("scale") > 0)
        .select(col("vec_id"),
          round(Embeddings.reconstructionError(col("v"), col("scale")) * 1e6)
            .cast("long").as("err_e6"))
    }),

    "q_stratified" -> ((s, dir) => {
      import graft.operators.similarity.Sampling
      val d = docs(s, dir)
      val lang = TextAnalysis.langGuess(col("text"))
      d.select(lang.as("lang"), col("text"))
        .where(Sampling.stratifiedKeep(col("text"), col("lang"),
          Map("en" -> 4), defaultRate16 = 16))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"))
    }),

    // balanced subsample: 20 docs per language, hash-ordered (deterministic
    // reservoir), then per-language survivor count + checksum
    "q_reservoir" -> ((s, dir) => {
      import graft.operators.similarity.Sampling
      Sampling.reservoirPerGroup(docs(s, dir), col("lang"), col("text"), 20)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), min(md5(col("text"))).as("min_hash"))
    }),

    // deterministic shuffle-shard export layout: stable (shard, pos) per
    // document from a salted content hash — the epoch-reshufflable global
    // training order that needs no global sort
    "q_corpus_shuffle" -> ((s, dir) => {
      import graft.operators.similarity.Sampling
      Sampling.shuffleShards(docs(s, dir), col("doc_id"), salt = "s42", hexChars = 2)
        .select(col("doc_id"), col("shard"), col("pos"))
    }),

    // temperature-scaled mixture shares (τ = 2): source weights ∝ √n —
    // the mT5/XLM-R sampling-temperature recipe, head flattened, tail
    // boosted; budget = 10k documents
    "q_temp_mix" -> ((s, dir) =>
      graft.operators.similarity.Sampling.temperatureShares(
        docs(s, dir), col("source"), budget = 10000L)),

    // winnowing fingerprints (MOSS): per-window minimum gram hash —
    // the sparse overlap index with the ≥ w+k−1 shared-run guarantee
    "q_winnow" -> ((s, dir) =>
      TextAnalysis.winnow(docs(s, dir), "doc_id", "text", k = 3, w = 4)
        .select(col("id").as("doc_id"), col("pos"), col("fp"))),

    // KMV distinct sketch: per-lang distinct n_chars estimates PLUS the
    // merged __union estimate computed from the per-group sketches alone
    // (never rescanning the data) — the mergeable-rollup distinct-count
    // path (ClickHouse uniqCombined analog). k=32 puts sf>=0.01 groups in
    // the estimator regime and tiny-SF groups in the exact regime.
    "q_kmv_distinct" -> ((s, dir) =>
      graft.operators.sketch.Kmv.groupedWithUnion(
        docs(s, dir), "lang", "n_chars", k = 32)),

    // sketched vocabulary-overlap matrix: per-lang token-set Jaccard from
    // bottom-k sketches alone — the corpus-scale twin of q_source_overlap
    // (one corpus scan to sketch; the GxG matrix reads G*k sketch rows)
    "q_kmv_overlap" -> ((s, dir) => {
      import graft.operators.sketch.Kmv
      val toks = docs(s, dir).select(col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .where(length(col("tok")) > 0)
      Kmv.pairwiseJaccard(Kmv.sketch(toks, "lang", "tok", k = 128), k = 128)
    }),

    // hierarchical sketch rollup: per-(event_type, hour) user sketches
    // re-truncated to per-type estimates reading ONLY the hourly sketch
    // rows — the incremental distinct-users-per-type rollup (ClickHouse
    // uniqCombined -State/-Merge analog) over the events stream table
    "q_kmv_rollup" -> ((s, dir) => {
      import graft.operators.sketch.Kmv
      val ev = Tables.load(s, dir, "events").select(
        concat_ws("|", col("event_type"),
          expr("CAST(unix_timestamp(ts) AS BIGINT) div 3600")).as("gk"),
        col("user_id"))
      val hourly = Kmv.sketch(ev, "gk", "user_id", k = 32)
      Kmv.estimate(
        Kmv.regroup(hourly, substring_index(col("g"), "|", 1), 32), 32)
    }),

    // per-source distinct-length domain quantiles from the bottom-k value
    // sample (exact below k, the hash-sampled estimator above) — the
    // mergeable-rollup form of q_length_pct's exact percentiles
    "q_kmv_quantile" -> ((s, dir) =>
      graft.operators.sketch.Kmv.domainQuantiles(
        graft.operators.sketch.Kmv.sketchWithValues(
          docs(s, dir), "source", "n_chars", k = 64),
        Seq(50, 90))),

    // per-document top-3 tf-idf terms (integer-exact linear idf)
    "q_tfidf_top" -> ((s, dir) =>
      TextAnalysis.tfidfTop(docs(s, dir), "doc_id", "text", k = 3)),

    // DSIR importance weights (hashed unigram+bigram likelihood ratio vs
    // the src0/src1 target domain, integer-bit quantized) — the published
    // "find more data like my curated set" selection signal
    "q_dsir_weights" -> ((s, dir) =>
      Dsir.importanceWeights(docs(s, dir), "doc_id", "text",
        col("source").isin("src0", "src1"), buckets = 4096)),

    // the selection step: top-100 most target-like raw-pool documents
    "q_dsir_select" -> ((s, dir) =>
      Dsir.selectTopK(docs(s, dir), "doc_id", "text",
        col("source").isin("src0", "src1"), k = 100, buckets = 4096)),

    // deterministic mixture weighting (data mixing): src0 down-sampled
    // 0.5×, src1 up-sampled 2.3×, everything else kept — per-source input
    // and weighted-output counts
    "q_mix_sample" -> ((s, dir) => {
      import graft.operators.similarity.Sampling
      val copies = Sampling.mixtureCopies(col("doc_id"), col("source"),
        Map("src0" -> 500000L, "src1" -> 2300000L),
        defaultPpm = 1000000L, salt = "m1")
      docs(s, dir).select(col("source"), copies.as("copies"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_in"), sum("copies").as("n_out"))
    }),

    // corpus-duplicate 3-gram fraction per document (cross-document
    // repetition signal; within-document is q_repetition)
    "q_dup_ngram_frac" -> ((s, dir) =>
      TextAnalysis.dupNgramStats(docs(s, dir), "doc_id", "text")),

    // exact per-language length percentiles (corpus profiling); ×1000
    // fixed-point keeps the interpolated quantiles engine-comparable
    "q_length_pct" -> ((s, dir) =>
      docs(s, dir).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(n_chars, array(0.5D, 0.9D, 0.99D))").as("ps"))
        .select(col("lang"), col("n_docs"),
          round(element_at(col("ps"), 1) * 1000).cast("long").as("p50_e3"),
          round(element_at(col("ps"), 2) * 1000).cast("long").as("p90_e3"),
          round(element_at(col("ps"), 3) * 1000).cast("long").as("p99_e3"))),

    "q_sim_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      CosineSearch.bruteForce(
        e.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding")),
        e.select(col("vec_id").as("id"), col("embedding")), k = 5)
    }),

    // diversity coreset: greedy farthest-point selection over the corpus
    // embeddings — the subset sampler a training-data pipeline uses to
    // maximize coverage per labeling/compute budget
    "q_kcenter" -> ((s, dir) =>
      CosineSearch.kCenterCoreset(embs(s, dir), k = 6, idCol = "vec_id")),

    // MMR selection: top-5 vectors most similar to the vec_id-0 query
    // while penalizing redundancy among the picks (lambda = 0.7) — the
    // relevance-aware sibling of q_kcenter
    "q_mmr_select" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.where(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      CosineSearch.mmrSelect(
        e.where(col("vec_id") =!= 0)
          .select(col("vec_id").as("id"), col("embedding")),
        q, k = 5, lamPpm = 700000L)
    }),

    "q_sim_lsh" -> ((s, dir) => {
      val e = embs(s, dir)
      CosineSearch.lshTopK(
        e.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding")),
        e.select(col("vec_id").as("id"), col("embedding")), k = 5)
    }),

    // k-means assignment step (the IVF codebook path): 8 deterministic
    // seed centroids, cosine argmax, occupancy per cell
    "q_kmeans_assign" -> ((s, dir) => {
      import graft.operators.similarity.KMeans
      val e = embs(s, dir).select(col("vec_id").as("id"), col("embedding"))
      KMeans.assign(e, KMeans.seedCentroids(e, 8))
        .groupBy("cell").agg(count(lit(1)).as("n"))
    }),

    // per-label centroid outliers: the 5 vectors least similar to their
    // own label's centroid — mislabel/noise audit, the inverse of
    // SemDeDup's too-close pruning
    "q_embed_outlier" -> ((s, dir) =>
      CosineSearch.centroidOutliers(
        embs(s, dir).select(col("vec_id").as("id"), col("embedding"),
          col("label")), k = 5)),

    // SemDeDup: k-means cells bound the pair join (Σ cellsize² work, not
    // n²) — the embedding-space twin of LSH banding. Same 8 deterministic
    // seed centroids as q_kmeans_assign, same 0.40 threshold as the exact
    // ground truth, so recall vs q_sim_pairs is directly inspectable.
    "q_semdedup" -> ((s, dir) => {
      import graft.operators.similarity.{KMeans, SemDedup}
      val e = embs(s, dir).select(col("vec_id").as("id"), col("embedding"))
      SemDedup.dupCandidates(e, KMeans.seedCentroids(e, 8),
        thresholdE6 = 400000L)
    }),

    // threshold 0.40 matches q_sim_pairs' exact ground truth, so the
    // LSH subset relationship is visible in the outputs AND the
    // oracle-checked result is non-empty at every SF (0.90 found nothing
    // in the synthetic vectors — a 0-row hash-match exercises nothing)
    "q_sim_neardup" -> ((s, dir) =>
      CosineSearch.nearDupPairs(
        embs(s, dir).select(col("vec_id").as("id"), col("embedding")),
        thresholdE6 = 400000L)),

    // the EMBED-STORE lifecycle, gated end to end: the embeddings
    // corpus arrives as two vec_id-sliced batches into an EmbedStore
    // under a scratch dir (vector projections + sign-LSH postings +
    // verified pairs, marker-guarded), compact() fires MID-STREAM, and
    // the pair set serves from STORED state — batch×stored postings
    // join + batch self-join accumulate to exactly the from-scratch
    // nearDupPairs set (union completeness: signatures are
    // data-independent, so a pair is generated by its later member's
    // batch), so the composed q_sim_neardup oracle applies verbatim
    // PAIRS gate of the embed family: reuses the latest published
    // drive (see famStores — the oracle comparison stays independent);
    // standalone runs drive-and-publish their own
    "q_embed_store" -> ((s, dir) =>
      reuseFamStore[graft.operators.dedup.EmbedStore]("embed", s, dir)
        .getOrElse {
          val sc = famScratchDir(s)
          publishFamStore("embed", s, dir, sc,
            embedStoreDrive(s, dir, foldPerBatch = true,
              scratch = Some(sc)))
        }
        .pairs
        .select(col("id_a"), col("id_b"), col("sim_e6"))),

    // the embed store's INCREMENTALLY-maintained cluster labels
    // (per-batch star-edge folds through the shared
    // DurableStore.foldClusterLabels) must equal the from-scratch CC
    // over the same verified pair set — the q_media_clusters shape on
    // the vector plane, against a composed recursive-CTE oracle over
    // the q_sim_neardup pair SQL
    "q_embed_clusters" -> ((s, dir) => {
      // the family's LIFECYCLE gate: always drives fresh (the
      // incremental fold path is what it prices and pins), publishes
      // for the pairs gate
      val sc = famScratchDir(s)
      val store = publishFamStore("embed", s, dir, sc,
        embedStoreDrive(s, dir, foldPerBatch = true, scratch = Some(sc)))
      store.clusters()
    }),

    // exact all-pairs cosine ≥ 0.4 — the oracle-checked ground truth the
    // approximate near-dup paths are audited against
    "q_sim_pairs" -> ((s, dir) =>
      CosineSearch.exactPairs(
        embs(s, dir).select(col("vec_id").as("id"), col("embedding")),
        thresholdE6 = 400000L)),

    // PII scrub: the testdata corpus carries no natural PII, so synthetic
    // contact strings are appended deterministically (same construction in
    // the oracle) — the detection/redaction regexes are what's under test
    "q_pii_scrub" -> ((s, dir) => {
      val aug = concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or +1 555 "),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      val cols = TextAnalysis.piiColumns(aug)
      docs(s, dir).select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
    }),

    "q_repetition" -> ((s, dir) => {
      val cols = TextAnalysis.ngramRepetition(col("text"), n = 3)
      docs(s, dir).select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
    }),

    // decontamination: every ~97th document plays the benchmark set
    "q_decontam" -> ((s, dir) => {
      val d = docs(s, dir)
      Decontamination.overlap(
        d.where(col("doc_id") % 97 =!= 0),
        d.where(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3)
        .withColumnRenamed("id", "doc_id")
    }),

    "q_seq_pack" -> ((s, dir) => {
      import graft.operators.pack.SequencePacking
      val d = docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenEstimate(col("text")).as("toks"))
      SequencePacking.pack(d, "doc_id", "toks",
        windowTokens = 2048, shardSize = 512)
        .withColumnRenamed("id", "doc_id")
    }),

    // MIXED-MODALITY real decode, end to end: doc_id % 3 picks the
    // kind, executors encode one real payload per row (solid PNG /
    // constant-amplitude WAV / solid BI_RGB AVI — each lossless, so
    // every decoded feature is encode-parameter arithmetic), % 10 == 5
    // rows are planted empty, and Multimodal.decodeMedia dispatches the
    // table across the three REAL decoders onto one feature schema.
    // One row gates the dispatch routing, the per-kind null contract
    // AND each decoder's feature arithmetic at once.
    "q_multimodal" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select(col("doc_id")).as[Long]
      val media = fixtureMedia(s, dir, "multimodal")(d.mapPartitions { it =>
        it.map { id =>
          val kind = (id % 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          val payload =
            if (id % 10 == 5) Array.emptyByteArray
            else (id % 3) match {
              case 0 => Multimodal.encodeSolidPng(
                8 + (id % 16).toInt, 8 + ((id / 16) % 16).toInt,
                (id % 256).toInt, ((id / 3) % 256).toInt,
                ((id / 7) % 256).toInt)
              case 1 =>
                val amp = (100 + id % 12000).toInt
                Multimodal.encodeConstWav(
                  8000 + (id % 8).toInt * 1000, 64 + (id % 100).toInt,
                  (if (id % 2 == 1) -amp else amp).toShort)
              case _ => Multimodal.encodeSolidAvi(
                4 + (id % 13).toInt, 2 + ((id / 13) % 11).toInt,
                1 + (id % 7).toInt, 5 + (id % 25).toInt,
                (id % 256).toInt, ((id / 3) % 256).toInt,
                ((id / 7) % 256).toInt)
            }
          Multimodal.MediaRow(id, kind, payload, "synth")
        }
      })
      Multimodal.decodeMedia(media)
    }),

    "q_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.fromDocuments(s, docs(s, dir)), frameBytes = 64, stride = 4)
        .select(col("media_id"), col("frame_idx"),
          md5(col("frame")).as("frame_md5"))),

    // rare-character-trigram ratio: corpus trigram counts broadcast back
    // over the occurrence stream — a gibberish signal word-level quality
    // heuristics miss
    "q_rare_trigram" -> ((s, dir) =>
      TextAnalysis.rareTrigramStats(docs(s, dir), "doc_id", "text",
        maxCount = 2L)),

    // quality-weighted deterministic Bernoulli sampling: keep probability
    // rises with estimated token count (capped at 1), every keep decision
    // a pure integer hash comparison
    "q_weighted_sample" -> ((s, dir) => {
      import graft.operators.similarity.Sampling
      val wppm = least(lit(1000000L),
        TextAnalysis.tokenEstimate(col("text")).cast("long") * 2000L)
      docs(s, dir)
        .withColumn("weight_ppm", wppm)
        .where(Sampling.weightedKeep(col("doc_id"), col("weight_ppm"), "e1"))
        .select(col("doc_id"), col("weight_ppm"))
    }),

    // per-source exact-duplicate rate (dedup reporting): a doc is a dup
    // when an earlier doc_id carries identical content
    "q_dup_rate" -> ((s, dir) => {
      val keeper = docs(s, dir)
        .select(sha2(col("text"), 256).as("h"), col("doc_id"))
        .groupBy("h").agg(min("doc_id").as("keeper"))
      docs(s, dir)
        .select(col("source"), sha2(col("text"), 256).as("h"), col("doc_id"))
        .join(keeper, "h")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") =!= col("keeper"), 1L).otherwise(0L))
            .as("n_dups"))
        .withColumn("dup_ppm", expr("n_dups * 1000000 div n_docs"))
    }),

    // distributed BPE tokenizer training, step-0 statistics: corpus-wide
    // adjacent character-pair counts over the distinct-word frequency
    // table (pairs never cross word boundaries — the published
    // pre-tokenization)
    "q_bpe_pairs" -> ((s, dir) =>
      Bpe.pairCounts(Bpe.wordTable(docs(s, dir), "text"))
        .orderBy(desc("n"), asc("lhs"), asc("rhs")).limit(20)),

    // the full training loop: 4 iterations of count-argmax-merge over
    // the word table; ties break (n DESC, lhs, rhs) so the learned
    // merge sequence is bit-reproducible
    "q_bpe_learn" -> ((s, dir) => {
      import s.implicits._
      Bpe.learnMerges(docs(s, dir), "text", 4).toDF()
    }),

    // hard-negative mining (contrastive training): for each query, the
    // 3 most-similar vectors with a DIFFERENT label — the near-misses a
    // metric model trains its boundary on
    "q_hard_negatives" -> ((s, dir) => {
      val e = embs(s, dir)
      CosineSearch.hardNegatives(
        e.where(col("vec_id") < 10).select(col("vec_id").as("qid"),
          col("embedding"), col("label").cast("long").as("label")),
        e.select(col("vec_id").as("id"), col("embedding"),
          col("label").cast("long").as("label")),
        k = 3)
    }),

    // class-balanced resampling to exact parity: every lang replicates
    // to the majority-lang count (integer copies + hash-ordered
    // remainder), the minority-oversampling step of classifier sets
    "q_class_balance" -> ((s, dir) => {
      import graft.operators.similarity.Sampling
      Sampling.classBalance(docs(s, dir), col("lang"), col("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_after"),
          countDistinct(col("doc_id")).as("n_src"))
    }),

    // IVF tuning gate: recall@5 of the IVF candidates vs exact
    // brute-force ground truth per query — the (nlist, nprobe) knob
    // audit before an IVF-only corpus run; sibling of q_lsh_audit
    "q_ivf_recall" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val c = e.select(col("vec_id").as("id"), col("embedding"))
      val exact = CosineSearch.bruteForce(q, c, k = 5)
        .select(col("qid"), col("id"))
      val approx = CosineSearch.ivfTopK(q, c, k = 5)
        .select(col("qid"), col("id"), lit(1L).as("hit"))
      exact.join(approx, Seq("qid", "id"), "left")
        .groupBy("qid")
        .agg(count(lit(1)).as("k"), sum(coalesce(col("hit"), lit(0L))).as("found"))
        .select(col("qid"), col("found"), expr("found * 1000 div k").as("recall_pm"))
    }),

    // sharded-export manifest: deterministic portable-hash shard
    // assignment + per-shard count/bytes/id-range/order-insensitive
    // checksum — the verification record a release consumer re-derives
    "q_export_manifest" -> ((s, dir) =>
      graft.operators.pack.ExportManifest.manifest(
        docs(s, dir), "doc_id", "text", nShards = 16)),

    // leakage-safe train/eval split: every member of a near-dup cluster
    // inherits the split of its cluster root, so near-duplicates can
    // never straddle train and eval (the flaw q_leakage audits for)
    "q_cluster_split" -> ((s, dir) => {
      val d = docs(s, dir)
      val clusters = Dedup.connectedComponents(
        Dedup.ngramJaccard(d, "doc_id", "text", threshold = 0.5,
          maxShingleDf = Some(Dedup.defaultShingleDfCap(d.count()))))
      d.select(col("doc_id"))
        .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .withColumn("root", coalesce(col("cluster"), col("doc_id")))
        .select(col("doc_id"),
          when(substring(md5(col("root").cast("string")), 1, 1) < "d", "train")
            .otherwise("eval").as("split"))
    }),

    // corpus snapshot diff (dataset versioning): v2 synthesized from the
    // documents table — 10% removed, every 7th rewritten, every 13th
    // re-added under a shifted id — classified per doc by content hash
    "q_corpus_diff" -> ((s, dir) => {
      val v1 = docs(s, dir)
      val v2 = docs(s, dir)
        .where(col("doc_id") % 10 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
        .unionByName(docs(s, dir).where(col("doc_id") % 13 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      graft.operators.text.CorpusDiff.diff(v1, v2, "doc_id", "text")
    }),

    // incremental-release planner: which shards must a new release
    // rewrite — the shard-level rollup of q_corpus_diff's v2 mutation
    "q_release_delta" -> ((s, dir) => {
      val v1 = docs(s, dir)
      val v2 = docs(s, dir)
        .where(col("doc_id") % 10 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
        .unionByName(docs(s, dir).where(col("doc_id") % 13 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      graft.operators.pack.ExportManifest.releaseDelta(
        v1, v2, "doc_id", "text", nShards = 16)
    }),

    // the inference side: per-document post-BPE token counts under the
    // vocabulary learned above (exploded words broadcast-joined against
    // the vocab-sized segmented word table)
    "q_bpe_tokenize" -> ((s, dir) => {
      val (_, seg) = Bpe.learnSegmented(docs(s, dir), "text", 4)
      Bpe.tokenCounts(docs(s, dir), "doc_id", "text", seg)
    })
  )

  /** Shared recursive-CTE scaffold for the connected-components oracles:
    * given a CTE named `pairs(id_a, id_b)`, `edges` mirrors it undirected
    * and `reach(node, root)` closes it transitively — min(root) per node
    * is the component keeper. Interpolated into every CC oracle so the
    * traversal logic cannot drift between them.
    */
  /** Shared CTE chain of the sign-LSH near-dup oracles
    * (`q_sim_neardup`, `q_embed_clusters`): the normalized-cast vector
    * table `c0`, the table index `tb` and the per-(vec, table) bucket
    * assignment `cb`, with the seeded hyperplanes rendered as DuckDB
    * literals — the plane arithmetic cannot drift between the pair
    * oracle and its CC composition.
    */
  private lazy val simNeardupCtes: String = {
    val planes = graft.operators.similarity.CosineSearch.lshPlanes(
      dim = 64, bits = 8, tables = 4, seed = 7L)
    def bucketExpr(vec: String, tp: Array[Array[Double]]): String =
      tp.zipWithIndex.map { case (p, i) =>
        s"CASE WHEN list_dot_product($vec, ${p.mkString("[", ", ", "]")}) >= 0 " +
          s"THEN ${1L << i} ELSE 0 END"
      }.mkString("(", " + ", ")")
    val tblCase =
      planes.zipWithIndex.map { case (tp, l) =>
        s"WHEN $l THEN ${bucketExpr("cv", tp)}"
      }.mkString("CASE tbl ", " ", " END")
    s"""c0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings),
       |tb AS (SELECT * FROM (VALUES (0),(1),(2),(3)) t(tbl)),
       |cb AS (SELECT id, cv, tbl, $tblCase AS bucket FROM c0, tb)"""
      .stripMargin
  }

  private val reachCte: String =
    """edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach(node, root) AS (
      |  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
      |  UNION
      |  SELECT g.dst, r.root FROM reach r JOIN edges g ON g.src = r.node)""".stripMargin

  // Shared CTE chain for the two DSIR oracles: the portable 48-bit md5
  // feature hash, the unigram+bigram occurrence stream, per-bucket
  // target/raw model counts and Laplace-smoothed totals (buckets = 4096,
  // target domain = src0/src1) — mirrors Dsir.importanceWeights exactly.
  /** DuckDB rendering of the engine-portable 48-bit hash (first 12 hex
    * digits of md5 as a BIGINT) of SQL expression `e` — the oracle twin
    * of `conv(substring(md5(e), 1, 12), 16, 10)`.
    */
  /** The q_image_neardup fixture key: a 63-bit md5-derived base per
    * 4-doc group, with members at Hamming 0 / 1 / 3 / 8 from it. The
    * 8-flip member spreads two bits into every 16-bit chunk, keeping
    * every cross-member distance involving it ≥ 5 — firmly outside the
    * gate's maxHamming — while 0/1/3 sit inside. Runs on executors
    * (plain JVM md5, no Spark expressions), and the oracle rebuilds the
    * identical value from `hex48` arithmetic.
    */
  /** The q_image_neardup / q_image_clusters hash table: executors
    * encode one 9×8 path-gradient PNG per doc (dHash == [[pathKey]] by
    * construction, `% 97` rows planted empty to exercise the cause
    * routing), REAL-decode via [[Multimodal.imageDHash]], and the
    * result persists — `hammingPairs` self-joins its input, and an
    * unpersisted lineage would re-run the PNG encode + ImageIO decode
    * per side (the simhashPairs hoisting pattern).
    */
  private def neardupHashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir).select(col("doc_id")).as[Long]
    val media = fixtureMedia(s, dir, "neardup_png")(d.mapPartitions { it =>
      it.map { id =>
        val payload =
          if (id % 97 == 0) Array.emptyByteArray
          else Multimodal.encodePathPng(pathKey(id))
        Multimodal.MediaRow(id, "image", payload, "synth")
      }
    })
    graft.ScratchCache.persist(
      Multimodal.imageDHash(media)
        .where(col("cause") === "ok")
        .select(col("media_id").as("id"), col("dhash").as("sh")).toDF())
  }

  /** The q_video_neardup hash table: executors encode one 3-frame path
    * AVI per doc (frames carry [[pathKey]] twice around a deterministic
    * divergent middle frame — an "inserted card" the strict-majority
    * vote must absorb, so `clip_dhash == pathKey` by the 2-of-3
    * majority), [[Multimodal.videoDHash]] REALLY parses the container
    * and raster-decodes every frame back through the shared dHash core,
    * and the result persists for the pair self-join. `% 97` rows are
    * planted empty and `% 89` rows truncated to exercise the cause
    * routing in the pair path.
    */
  private def videoClipHashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir).select(col("doc_id")).as[Long]
    val media = fixtureMedia(s, dir, "neardup_avi")(d.mapPartitions { it =>
      it.map { id =>
        val k = pathKey(id)
        val noise = (id * 0x9e3779b97f4a7c15L) | 1L
        val payload =
          if (id % 97 == 0) Array.emptyByteArray
          else if (id % 89 == 0)
            Multimodal.encodePathAvi(Seq(k, k, k)).dropRight(10)
          else Multimodal.encodePathAvi(Seq(k, k ^ noise, k))
        Multimodal.MediaRow(id, "video", payload, "synth")
      }
    })
    graft.ScratchCache.persist(
      Multimodal.videoDHash(media)
        .where(col("cause") === "ok")
        .select(col("media_id").as("id"), col("clip_dhash").as("sh")).toDF())
  }

  /** The q_audio_neardup hash table: executors encode one
    * stepped-envelope WAV per doc whose [[Multimodal.audioDHash]] is
    * exactly [[pathKey]] (the energy-envelope difference hash of the
    * amplitude walk), with per-doc GAIN varied by the id so the gate
    * also witnesses gain invariance — the hash must come from the
    * envelope comparisons, not the amplitudes. `% 97` rows empty,
    * `% 83` rows too-short exercise the cause routing in the pair path.
    */
  private def audioClipHashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir).select(col("doc_id")).as[Long]
    val media = fixtureMedia(s, dir, "neardup_wav")(d.mapPartitions { it =>
      it.map { id =>
        val payload =
          if (id % 97 == 0) Array.emptyByteArray
          else if (id % 83 == 0)
            Multimodal.encodeConstWav(8000, 32, 500)
          else {
            val g = 1 + (id % 3).toInt // per-doc uniform gain
            Multimodal.encodeStepWav(pathKey(id),
              base = 2000 * g, step = 16 * g)
          }
        Multimodal.MediaRow(id, "audio", payload, "synth")
      }
    })
    graft.ScratchCache.persist(
      Multimodal.audioDHash(media)
        .where(col("cause") === "ok")
        .select(col("media_id").as("id"), col("dhash").as("sh")).toDF())
  }

  /** JVM twin of the engine-portable 48-bit hash (first 12 hex digits
    * of md5) — fixture arithmetic executors share with the hex48
    * oracle rendering.
    */
  private[graft] def h48(s: String): Long = java.lang.Long.parseLong(
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 12), 16)

  private[graft] def pathKey(id: Long): Long = {
    val gid = id / 4
    val base = ((h48("h" + gid) % 32768) << 48) | h48("l" + gid)
    val b1 = (gid % 62).toInt
    val b2 = ((gid + 21) % 62).toInt
    val b3 = ((gid + 42) % 62).toInt
    val mask = (id % 4) match {
      case 0 => 0L
      case 1 => 1L << b1
      case 2 => (1L << b1) | (1L << b2) | (1L << b3)
      case _ => 0x0808080808080808L
    }
    base ^ mask
  }

  private def hex48(e: String): String =
    (0 until 12).map { j =>
      val w = math.pow(16, 11 - j).toLong
      s"(strpos('0123456789abcdef', substr(md5($e), ${j + 1}, 1)) - 1) * $w"
    }.mkString(" + ")

  /** Shared CTE chain for the two image-dHash oracles: rebuild each
    * doc's pathKey (the fixture PNG's exact dHash) with hex48
    * arithmetic, then replicate the banded blocking — `k(doc_id, dh)`
    * carries the hashes and `cand(id_a, id_b)` the chunk-collision
    * candidates.
    */
  private def keyCtes(filter: String): String =
    s"""g AS (SELECT doc_id, doc_id // 4 AS gid, doc_id % 4 AS m
      |  FROM documents WHERE $filter),
      |b AS (SELECT doc_id,
      |    ((${hex48("'h' || CAST(gid AS VARCHAR)")}) % 32768)
      |      * 281474976710656
      |      + (${hex48("'l' || CAST(gid AS VARCHAR)")}) AS base,
      |    CASE m WHEN 0 THEN 0
      |      WHEN 1 THEN (1::BIGINT << CAST(gid % 62 AS INT))
      |      WHEN 2 THEN (1::BIGINT << CAST(gid % 62 AS INT)) |
      |        (1::BIGINT << CAST((gid + 21) % 62 AS INT)) |
      |        (1::BIGINT << CAST((gid + 42) % 62 AS INT))
      |      ELSE 578721382704613384 END AS mask
      |  FROM g),
      |k AS (SELECT doc_id, xor(base, mask) AS dh FROM b),
      |c AS (SELECT doc_id, dh, i AS chunk, (dh >> CAST(i * 16 AS INT))
      |      & 65535 AS cv
      |  FROM k, LATERAL (SELECT unnest(range(0, 4)) AS i) r),
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM c a JOIN c b ON a.chunk = b.chunk AND a.cv = b.cv
      |    AND a.doc_id < b.doc_id)""".stripMargin

  private lazy val imageKeyCtes: String = keyCtes("doc_id % 97 != 0")

  /** The mixed-modality variant: same pathKey arithmetic, plus the
    * fixture's kind assignment (m ≤ 1 image, m = 2 audio, m = 3 video)
    * carried into the chunk blocking — candidates must agree on kind,
    * exactly the store's blocked equi-key.
    */
  private lazy val mixedKindCtes: String =
    s"""g AS (SELECT doc_id, doc_id // 4 AS gid, doc_id % 4 AS m
      |  FROM documents WHERE doc_id % 97 != 0),
      |b AS (SELECT doc_id,
      |    CASE WHEN m <= 1 THEN 'image' WHEN m = 2 THEN 'audio'
      |      ELSE 'video' END AS kind,
      |    ((${hex48("'h' || CAST(gid AS VARCHAR)")}) % 32768)
      |      * 281474976710656
      |      + (${hex48("'l' || CAST(gid AS VARCHAR)")}) AS base,
      |    CASE m WHEN 0 THEN 0
      |      WHEN 1 THEN (1::BIGINT << CAST(gid % 62 AS INT))
      |      WHEN 2 THEN (1::BIGINT << CAST(gid % 62 AS INT)) |
      |        (1::BIGINT << CAST((gid + 21) % 62 AS INT)) |
      |        (1::BIGINT << CAST((gid + 42) % 62 AS INT))
      |      ELSE 578721382704613384 END AS mask
      |  FROM g),
      |k AS (SELECT doc_id, kind, xor(base, mask) AS dh FROM b),
      |c AS (SELECT doc_id, kind, dh, i AS chunk,
      |      (dh >> CAST(i * 16 AS INT)) & 65535 AS cv
      |  FROM k, LATERAL (SELECT unnest(range(0, 4)) AS i) r),
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      |    a.kind AS kind
      |  FROM c a JOIN c b ON a.chunk = b.chunk AND a.cv = b.cv
      |    AND a.kind = b.kind AND a.doc_id < b.doc_id)""".stripMargin

  /** The video-clip variant: the `% 89` rows are planted TRUNCATED
    * clips (routed out of the pair path by cause, like the `% 97`
    * empties), so the oracle's corpus filter excludes both.
    */
  private lazy val videoKeyCtes: String =
    keyCtes("doc_id % 97 != 0 AND doc_id % 89 != 0")

  /** The audio-clip variant: `% 83` rows are planted TOO-SHORT clips
    * (and `% 97` empties), both routed out of the pair path by cause.
    */
  private lazy val audioKeyCtes: String =
    keyCtes("doc_id % 97 != 0 AND doc_id % 83 != 0")

  /** The demux variant: `% 7` rows carry no auds stream, `% 97` are
    * empty — both cause-routed out before hashing.
    */
  private lazy val demuxKeyCtes: String =
    keyCtes("doc_id % 97 != 0 AND doc_id % 7 != 0")

  private val dsirCore: String = {
    val hexpr = hex48("f")
    s"""base AS (SELECT doc_id, source IN ('src0', 'src1') AS is_t,
       |    list_filter(string_split_regex(trim(text), '\\s+'),
       |      t -> length(t) > 0) AS w
       |  FROM documents),
       |f0 AS (
       |  SELECT doc_id, is_t, w[i] AS f
       |    FROM base, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) r
       |  UNION ALL
       |  SELECT doc_id, is_t, w[i] || ' ' || w[i+1] AS f
       |    FROM base, LATERAL (SELECT unnest(range(1, len(w))) AS i) r),
       |feats AS (SELECT doc_id, is_t, ($hexpr) % 4096 AS b FROM f0),
       |c AS (SELECT b,
       |    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |    CAST(sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cr
       |  FROM feats GROUP BY 1),
       |tot AS (SELECT CAST(sum(ct) + 4096 AS BIGINT) AS nt_s,
       |    CAST(sum(cr) + 4096 AS BIGINT) AS nr_s FROM c)""".stripMargin
  }

  /** DuckDB replay of the BPE training loop as a CTE chain. `w0` is the
    * distinct-word frequency table; `d0` brackets each word's character
    * segmentation as `\x02sym\x03\x02sym\x03…` so one non-overlapping
    * left-to-right `replace` per step applies a merge with exact
    * boundary anchoring (provably equal to `Bpe.applyMerge`'s greedy
    * fold — both consume the merged symbol, neither re-merges it within
    * the pass). Each step `i` adds `b$i` (the argmax pair under the same
    * (n DESC, lhs, rhs) total order as the Scala loop) and `d$i` (the
    * re-segmented words). Docs are pure ASCII (no \x01-\x03), so the
    * markers and the \x01 pair separator cannot collide with content.
    */
  private def bpeCtes(k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH w0 AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS wn FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents) u WHERE w <> '' GROUP BY 1),
        |d0 AS (SELECT word, wn,
        |  chr(2) || array_to_string(string_split_regex(word, ''),
        |    chr(3) || chr(2)) || chr(3) AS t
        |  FROM w0)""".stripMargin)
    for (i <- 1 to k) {
      sb.append(s""",
        |b$i AS (SELECT lhs, rhs, n FROM (
        |  SELECT split_part(p, chr(1), 1) AS lhs,
        |         split_part(p, chr(1), 2) AS rhs,
        |         CAST(sum(wn) AS BIGINT) AS n
        |  FROM (SELECT wn, unnest(list_transform(range(1, len(s)),
        |          j -> s[j] || chr(1) || s[j+1])) AS p
        |        FROM (SELECT wn, string_split(substr(t, 2, length(t) - 2),
        |                chr(3) || chr(2)) AS s FROM d${i - 1}) q1) q2
        |  GROUP BY 1, 2) q3 ORDER BY n DESC, lhs ASC, rhs ASC LIMIT 1),
        |d$i AS (SELECT word, wn,
        |  replace(t, chr(2) || lhs || chr(3) || chr(2) || rhs || chr(3),
        |          chr(2) || lhs || rhs || chr(3)) AS t
        |  FROM d${i - 1} CROSS JOIN b$i)""".stripMargin)
    }
    sb.toString
  }

  // the incremental release is oracle-IDENTICAL to the from-scratch one:
  // at gate SFs the df-cap never binds, so extending the prior scored
  // set with the batch delta reproduces the union's pair set exactly
  // (ReleaseSpec pins the uncapped equivalence; the capped drift
  // contract is documented on incrementalRelease)
  val oracles: Map[String, String] = oraclesBase +
    ("q_incr_release" -> oraclesBase("q_dedup_release")) +
    // the planner picks the exact front at gate SFs (ReleaseSpec pins
    // the dispatch), and the store's accumulated exact scored set
    // equals a from-scratch release's — both ride the composed oracle
    ("q_release_auto" -> oraclesBase("q_dedup_release")) +
    ("q_store_release" -> oraclesBase("q_dedup_release")) +
    ("q_store_release_state" -> oraclesBase("q_dedup_release")) +
    // the media store's accumulated pair set == from-scratch
    // hammingPairs over the accumulated prints (union completeness:
    // every ≤-maxHamming pair is generated exactly once, by its later
    // member's batch), so the image near-dup oracles apply verbatim
    ("q_media_store" -> oraclesBase("q_image_neardup")) +
    ("q_media_clusters" -> oraclesBase("q_image_clusters")) +
    // the clip plane's accumulated alignment == from-scratch
    // clipAlignment (delta completeness: every frame match of a clip
    // pair sits in its later clip's ingest), so the purge decision —
    // and the composed q_clip_purge oracle — apply verbatim to the
    // 2-batch store drive
    ("q_clip_store" -> oraclesBase("q_clip_purge")) +
    // the embed store's accumulated pair set == from-scratch
    // nearDupPairs over the accumulated vectors (data-independent
    // signatures + union completeness), so the q_sim_neardup oracle —
    // which replicates the hyperplanes, the bucketing and the exact
    // verification — applies verbatim to the 2-batch store drive
    ("q_embed_store" -> oraclesBase("q_sim_neardup")) +
    // incremental-LSH products == from-scratch-LSH products: the union
    // of the prior LSH release's scored set with the batch-touching
    // delta covers every ≥-threshold pair with identical scores
    // (containment is pair-intrinsic; banding is per-doc), so the same
    // composed oracle applies
    ("q_incr_release_lsh" -> oraclesBase("q_release_lsh")) +
    // collapse-front products == uncollapsed LSH products (identical
    // shingle sets score identically against everything; the fronts'
    // recall theorems apply to representatives exactly as to members)
    ("q_release_collapse" -> oraclesBase("q_release_lsh")) +
    // the collapse store's accumulated portable release: increments
    // union-complete (q_incr_release_lsh's argument), collapse exact
    // (q_release_collapse's), so the same composed oracle applies —
    // over the gate's deterministic half corpus (every `documents`
    // reference rewritten to the filtered CTE; see the query's GATE
    // ECONOMY note)
    ("q_store_collapse" -> oraclesBase("q_release_lsh")
      .replaceAll("(FROM|JOIN) documents\\b", "$1 docs_f")
      .replaceFirst("WITH RECURSIVE ",
        "WITH RECURSIVE docs_f AS (SELECT * FROM documents " +
        "WHERE doc_id % 2 = 0),\n"))

  private lazy val oraclesBase: Map[String, String] = Map(
    "q_bpe_pairs" ->
      """WITH w0 AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS wn FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents) u WHERE w <> '' GROUP BY 1)
        |SELECT split_part(p, chr(1), 1) AS lhs,
        |  split_part(p, chr(1), 2) AS rhs, CAST(sum(wn) AS BIGINT) AS n
        |FROM (SELECT wn, unnest(list_transform(range(1, len(s)),
        |        j -> s[j] || chr(1) || s[j+1])) AS p
        |      FROM (SELECT wn, string_split_regex(word, '') AS s FROM w0) q1) q2
        |GROUP BY 1, 2 ORDER BY n DESC, lhs ASC, rhs ASC LIMIT 20""".stripMargin,
    "q_bpe_learn" -> (bpeCtes(4) + "\n" +
      """SELECT * FROM (
        |  SELECT CAST(1 AS INTEGER) AS step, lhs, rhs, n FROM b1
        |  UNION ALL SELECT CAST(2 AS INTEGER), lhs, rhs, n FROM b2
        |  UNION ALL SELECT CAST(3 AS INTEGER), lhs, rhs, n FROM b3
        |  UNION ALL SELECT CAST(4 AS INTEGER), lhs, rhs, n FROM b4) m
        |ORDER BY step""".stripMargin),
    "q_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
        |    CAST(label AS BIGINT) AS qlabel
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS cv,
        |    CAST(label AS BIGINT) AS clabel FROM embeddings),
        |sims AS (SELECT qid, id,
        |    CAST(round(list_cosine_similarity(qv, cv) * 1000000) AS BIGINT)
        |      AS sim_e6
        |  FROM q, c WHERE qid != id AND qlabel != clabel)
        |SELECT qid, CAST(rank AS INT) AS rank, id, sim_e6 FROM (
        |  SELECT qid, id, sim_e6, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim_e6 DESC, id) AS rank
        |  FROM sims) WHERE rank <= 3""".stripMargin,
    "q_class_balance" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |m AS (SELECT max(n) AS mx FROM c),
        |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents),
        |x AS (SELECT doc_id, lang,
        |    (mx // n) + CASE WHEN rk <= mx % n THEN 1 ELSE 0 END AS copies
        |  FROM r JOIN c USING (lang) CROSS JOIN m)
        |SELECT lang, CAST(sum(copies) AS BIGINT) AS n_after,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_src
        |FROM x GROUP BY 1""".stripMargin,
    // IVF recall gate: the q_sim_ivf candidate pipeline joined against
    // the q_sim_topk exact ground truth (both replicated verbatim)
    "q_ivf_recall" ->
      """WITH c0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings),
        |q0 AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 10),
        |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
        |    CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings ORDER BY vec_id LIMIT 16),
        |ca AS (SELECT id, cell FROM (
        |  SELECT id, cell, row_number() OVER (PARTITION BY id
        |    ORDER BY -list_dot_product(cv, e) / sqrt(list_dot_product(e, e)),
        |      cell) AS rn
        |  FROM c0, cent) WHERE rn = 1),
        |qa AS (SELECT qid, cell FROM (
        |  SELECT qid, cell, row_number() OVER (PARTITION BY qid
        |    ORDER BY -list_dot_product(qv, e) / sqrt(list_dot_product(e, e)),
        |      cell) AS rn
        |  FROM q0, cent) WHERE rn <= 4),
        |isims AS (SELECT DISTINCT qid, id,
        |    CAST(round(list_cosine_similarity(qv, cv) * 1000000) AS BIGINT)
        |      AS sim_e6
        |  FROM ca JOIN c0 USING (id) JOIN qa USING (cell) JOIN q0 USING (qid)
        |  WHERE qid != id),
        |ivf AS (SELECT qid, id FROM (
        |  SELECT qid, id, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim_e6 DESC, id) AS rank
        |  FROM isims) WHERE rank <= 5),
        |bsims AS (SELECT qid, id,
        |    CAST(round(list_cosine_similarity(qv, cv) * 1000000) AS BIGINT)
        |      AS sim_e6
        |  FROM q0, c0 WHERE qid != id),
        |brute AS (SELECT qid, id FROM (
        |  SELECT qid, id, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim_e6 DESC, id) AS rank
        |  FROM bsims) WHERE rank <= 5)
        |SELECT b.qid,
        |  CAST(sum(CASE WHEN i.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS found,
        |  CAST(sum(CASE WHEN i.id IS NOT NULL THEN 1 ELSE 0 END) * 1000
        |    // count(*) AS BIGINT) AS recall_pm
        |FROM brute b LEFT JOIN ivf i ON b.qid = i.qid AND b.id = i.id
        |GROUP BY 1""".stripMargin,
    "q_export_manifest" ->
      s"""WITH s AS (SELECT doc_id, text,
        |  CAST((${hex48("CAST(doc_id AS VARCHAR)")}) % 16 AS INTEGER) AS shard,
        |  CAST(${hex48("text")} AS BIGINT) AS h
        |  FROM documents)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  min(doc_id) AS id_min, max(doc_id) AS id_max,
        |  CAST(sum(h) AS BIGINT) AS checksum
        |FROM s GROUP BY 1""".stripMargin,
    "q_cluster_split" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |n AS (SELECT doc_id, count(*) AS cnt FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
        |  WHERE common * 1.0 / (na.cnt + nb.cnt - common) >= 0.5),
        |$reachCte,
        |clusters AS (SELECT node AS id, min(root) AS cluster FROM reach GROUP BY 1),
        |r AS (SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS root
        |  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.id)
        |SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(root AS VARCHAR)), 1, 1) < 'd'
        |       THEN 'train' ELSE 'eval' END AS split
        |FROM r""".stripMargin,
    "q_release_delta" ->
      s"""WITH v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 10 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 13 = 0),
        |m1 AS (SELECT CAST((${hex48("CAST(doc_id AS VARCHAR)")}) % 16 AS INTEGER) AS shard,
        |    CAST(count(*) AS BIGINT) AS n_v1,
        |    CAST(sum(${hex48("text")}) AS BIGINT) AS ck_v1
        |  FROM documents GROUP BY 1),
        |m2 AS (SELECT CAST((${hex48("CAST(doc_id AS VARCHAR)")}) % 16 AS INTEGER) AS shard,
        |    CAST(count(*) AS BIGINT) AS n_v2,
        |    CAST(sum(${hex48("text")}) AS BIGINT) AS ck_v2
        |  FROM v2 GROUP BY 1)
        |SELECT shard, n_v1, ck_v1, n_v2, ck_v2,
        |  CASE WHEN ck_v1 IS NULL THEN 'new'
        |       WHEN ck_v2 IS NULL THEN 'removed'
        |       WHEN ck_v1 = ck_v2 AND n_v1 = n_v2 THEN 'unchanged'
        |       ELSE 'rewrite' END AS status
        |FROM m1 FULL OUTER JOIN m2 USING (shard)""".stripMargin,
    "q_corpus_diff" ->
      """WITH v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 10 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 13 = 0),
        |a AS (SELECT doc_id AS id, sha256(text) AS h1 FROM documents),
        |b AS (SELECT doc_id AS id, sha256(text) AS h2 FROM v2)
        |SELECT id,
        |  CASE WHEN h1 IS NULL THEN 'added'
        |       WHEN h2 IS NULL THEN 'removed'
        |       WHEN h1 = h2 THEN 'unchanged'
        |       ELSE 'changed' END AS change
        |FROM a FULL OUTER JOIN b USING (id)""".stripMargin,
    "q_bpe_tokenize" -> (bpeCtes(4) + "\n" +
      """SELECT doc_id, CAST(sum(len(string_split(
        |    substr(t, 2, length(t) - 2), chr(3) || chr(2)))) AS BIGINT)
        |  AS n_tok
        |FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |      FROM documents) j
        |JOIN d4 ON j.w = d4.word
        |GROUP BY doc_id""".stripMargin),
    // PQ is fully SQL-replicable: the codebook derives from the table
    // (lowest-16 vec_ids, sliced into 4 sub-spaces), encoding compares
    // e6-quantized L2 surrogates with the lower-code tiebreak, and the
    // ADC score is a sum of integer LUT terms (order-insensitive)
    "q_sim_pq" ->
      """WITH c0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |q0 AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 10),
        |js AS (SELECT unnest(range(4)) AS j),
        |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
        |    CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings ORDER BY vec_id LIMIT 16),
        |subn AS (SELECT j, c, list_slice(cb.v, j*16+1, j*16+16) AS sv,
        |    list_dot_product(list_slice(cb.v, j*16+1, j*16+16),
        |                     list_slice(cb.v, j*16+1, j*16+16)) AS cc
        |  FROM cb, js),
        |enc AS (SELECT id, j, c AS code FROM (
        |  SELECT c0.id, s.j, s.c, row_number() OVER (PARTITION BY c0.id, s.j
        |      ORDER BY CAST(round((s.cc - 2 * list_dot_product(
        |        list_slice(c0.v, s.j*16+1, s.j*16+16), s.sv)) * 1000000)
        |        AS BIGINT), s.c) AS rn
        |  FROM c0, subn s) WHERE rn = 1),
        |lut AS (SELECT q0.qid, s.j, s.c,
        |    CAST(round(list_dot_product(
        |      list_slice(q0.v, s.j*16+1, s.j*16+16), s.sv) * 1000000)
        |      AS BIGINT) AS w
        |  FROM q0, subn s),
        |sc AS (SELECT l.qid, e.id, CAST(sum(l.w) AS BIGINT) AS adc_e6
        |  FROM enc e JOIN lut l ON l.j = e.j AND l.c = e.code
        |  WHERE l.qid != e.id GROUP BY 1, 2),
        |cand AS (SELECT qid, id FROM (
        |  SELECT qid, id, row_number() OVER (
        |    PARTITION BY qid ORDER BY adc_e6 DESC, id) AS arank
        |  FROM sc) WHERE arank <= 50),
        |rr AS (SELECT c.qid, c.id,
        |    CAST(round(list_cosine_similarity(q0.v, c0.v) * 1000000) AS BIGINT)
        |      AS sim_e6
        |  FROM cand c JOIN q0 ON q0.qid = c.qid JOIN c0 ON c0.id = c.id)
        |SELECT qid, CAST(rank AS INT) AS rank, id, sim_e6 FROM (
        |  SELECT qid, id, sim_e6, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim_e6 DESC, id) AS rank
        |  FROM rr) WHERE rank <= 5""".stripMargin,
    // cell stats reuse q_sim_ivf's cent/ca assignment CTEs
    "q_ivf_cells" ->
      """WITH c0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
        |    CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings ORDER BY vec_id LIMIT 16),
        |ca AS (SELECT id, cell FROM (
        |  SELECT id, cell, row_number() OVER (PARTITION BY id
        |    ORDER BY -list_dot_product(v, e) / sqrt(list_dot_product(e, e)),
        |      cell) AS rn
        |  FROM c0, cent) WHERE rn = 1),
        |occ AS (SELECT cell, CAST(count(*) AS BIGINT) AS n FROM ca GROUP BY 1)
        |SELECT CAST(cell AS INT) AS cell, n,
        |  CAST(n * 1000 // (SELECT sum(n) FROM occ) AS BIGINT) AS share_pm
        |FROM occ""".stripMargin,
    // IVF-PQ composes the q_sim_ivf cell CTEs with the q_sim_pq code
    // CTEs: the ADC aggregation is restricted to candidates whose cell
    // is among the query's probed cells, everything else is identical
    "q_sim_ivfpq" ->
      """WITH c0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |q0 AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 10),
        |js AS (SELECT unnest(range(4)) AS j),
        |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
        |    CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings ORDER BY vec_id LIMIT 16),
        |subn AS (SELECT j, c, list_slice(cb.v, j*16+1, j*16+16) AS sv,
        |    list_dot_product(list_slice(cb.v, j*16+1, j*16+16),
        |                     list_slice(cb.v, j*16+1, j*16+16)) AS cc
        |  FROM cb, js),
        |enc AS (SELECT id, j, c AS code FROM (
        |  SELECT c0.id, s.j, s.c, row_number() OVER (PARTITION BY c0.id, s.j
        |      ORDER BY CAST(round((s.cc - 2 * list_dot_product(
        |        list_slice(c0.v, s.j*16+1, s.j*16+16), s.sv)) * 1000000)
        |        AS BIGINT), s.c) AS rn
        |  FROM c0, subn s) WHERE rn = 1),
        |lut AS (SELECT q0.qid, s.j, s.c,
        |    CAST(round(list_dot_product(
        |      list_slice(q0.v, s.j*16+1, s.j*16+16), s.sv) * 1000000)
        |      AS BIGINT) AS w
        |  FROM q0, subn s),
        |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
        |    CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings ORDER BY vec_id LIMIT 16),
        |ca AS (SELECT id, cell FROM (
        |  SELECT id, cell, row_number() OVER (PARTITION BY id
        |    ORDER BY -list_dot_product(v, e) / sqrt(list_dot_product(e, e)),
        |      cell) AS rn
        |  FROM c0, cent) WHERE rn = 1),
        |qa AS (SELECT qid, cell FROM (
        |  SELECT qid, cell, row_number() OVER (PARTITION BY qid
        |    ORDER BY -list_dot_product(v, e) / sqrt(list_dot_product(e, e)),
        |      cell) AS rn
        |  FROM q0, cent) WHERE rn <= 4),
        |sc AS (SELECT l.qid, e.id, CAST(sum(l.w) AS BIGINT) AS adc_e6
        |  FROM enc e
        |  JOIN ca ON ca.id = e.id
        |  JOIN qa ON qa.cell = ca.cell
        |  JOIN lut l ON l.qid = qa.qid AND l.j = e.j AND l.c = e.code
        |  WHERE l.qid != e.id GROUP BY 1, 2),
        |cand AS (SELECT qid, id FROM (
        |  SELECT qid, id, row_number() OVER (
        |    PARTITION BY qid ORDER BY adc_e6 DESC, id) AS arank
        |  FROM sc) WHERE arank <= 50),
        |rr AS (SELECT c.qid, c.id,
        |    CAST(round(list_cosine_similarity(q0.v, c0.v) * 1000000) AS BIGINT)
        |      AS sim_e6
        |  FROM cand c JOIN q0 ON q0.qid = c.qid JOIN c0 ON c0.id = c.id)
        |SELECT qid, CAST(rank AS INT) AS rank, id, sim_e6 FROM (
        |  SELECT qid, id, sim_e6, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim_e6 DESC, id) AS rank
        |  FROM rr) WHERE rank <= 5""".stripMargin,
    "q_knn_classify" ->
      """WITH c0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS cv,
        |    CAST(label AS BIGINT) AS lbl
        |  FROM embeddings WHERE vec_id >= 50),
        |q0 AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 50),
        |sims AS (SELECT qid, id, lbl,
        |    CAST(round(list_cosine_similarity(qv, cv) * 1000000) AS BIGINT)
        |      AS sim_e6
        |  FROM q0, c0 WHERE qid != id),
        |nn AS (SELECT qid, lbl, sim_e6 FROM (
        |  SELECT qid, lbl, sim_e6, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim_e6 DESC, id) AS rnk
        |  FROM sims) WHERE rnk <= 5),
        |v AS (SELECT qid, lbl AS pred_label, CAST(count(*) AS BIGINT) AS votes,
        |    max(sim_e6) AS best_sim_e6
        |  FROM nn GROUP BY 1, 2)
        |SELECT qid, pred_label, votes, best_sim_e6 FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid
        |    ORDER BY votes DESC, best_sim_e6 DESC, pred_label) AS rn
        |  FROM v) WHERE rn = 1""".stripMargin,
    "q_token_budget" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, source, toks,
        |    CAST(sum(toks) OVER (PARTITION BY source
        |      ORDER BY md5(doc_id::VARCHAR || 'tb1'), doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks
        |  FROM d)
        |SELECT doc_id, source, toks, cum_toks FROM c
        |WHERE cum_toks - toks < 1500""".stripMargin,
    "q_dup_span" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |g AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_toks, i AS pos,
        |    array_to_string(w[i:i+7], ' ') AS gs
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 6)) AS i) r
        |  WHERE len(w) >= 8),
        |occ AS (SELECT gs, count(*) AS occ FROM g GROUP BY 1),
        |f AS (SELECT doc_id, n_toks, pos, occ > 1 AS dup
        |  FROM g JOIN occ USING (gs)),
        |runs AS (SELECT doc_id, max(run) AS max_run FROM (
        |  SELECT doc_id, grp, count(*) AS run FROM (
        |    SELECT doc_id, pos, pos - row_number() OVER (
        |      PARTITION BY doc_id ORDER BY pos) AS grp
        |    FROM f WHERE dup) GROUP BY 1, 2) GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS grams,
        |  CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams,
        |  CAST(coalesce(max(max_run), 0) AS BIGINT) AS max_run,
        |  CAST(CASE WHEN coalesce(max(max_run), 0) = 0 THEN 0
        |    ELSE least(max(max_run) + 7, max(n_toks)) * 1000000 // max(n_toks)
        |    END AS BIGINT) AS dup_span_ppm
        |FROM f LEFT JOIN runs USING (doc_id)
        |GROUP BY 1""".stripMargin,
    "q_bigram_surprisal" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |p0 AS (SELECT doc_id, w[i] AS prev, w[i+1] AS next
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
        |  WHERE len(w) >= 2),
        |p AS (SELECT doc_id, prev, next FROM p0
        |  WHERE length(prev) > 0 AND length(next) > 0),
        |pc AS (SELECT prev, next, CAST(count(*) AS BIGINT) AS cp
        |  FROM p GROUP BY 1, 2),
        |cc AS (SELECT prev, CAST(count(*) AS BIGINT) AS cc
        |  FROM p GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trans,
        |  CAST(sum(length(bin(cc)) - length(bin(cp))) AS BIGINT) AS sum_bits,
        |  CAST(sum(length(bin(cc)) - length(bin(cp))) * 1000 // count(*)
        |    AS BIGINT) AS mean_bits_e3
        |FROM p JOIN pc USING (prev, next) JOIN cc USING (prev)
        |GROUP BY 1""".stripMargin,
    "q_oov" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |tt AS (SELECT doc_id, tok FROM t WHERE length(tok) > 0),
        |v AS (SELECT tok FROM (
        |  SELECT tok, count(*) AS c FROM tt GROUP BY 1
        |  ORDER BY c DESC, tok LIMIT 500))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS oov_toks,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS oov_ppm
        |FROM tt LEFT JOIN v ON tt.tok = v.tok
        |GROUP BY 1""".stripMargin,
    "q_leakage" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |n AS (SELECT doc_id, count(*) AS cnt FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |j AS (SELECT id_a, id_b,
        |    CAST(round(common * 1.0 / (na.cnt + nb.cnt - common) * 1000)
        |      AS BIGINT) AS jaccard_pm
        |  FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
        |  WHERE common * 1.0 / (na.cnt + nb.cnt - common) >= 0.3),
        |sp AS (SELECT doc_id, CASE WHEN substr(md5(text), 1, 1) < 'd'
        |    THEN 'train' ELSE 'eval' END AS split FROM documents)
        |SELECT CASE WHEN a.split = 'train' THEN id_a ELSE id_b END AS train_id,
        |  CASE WHEN a.split = 'train' THEN id_b ELSE id_a END AS eval_id,
        |  jaccard_pm
        |FROM j JOIN sp a ON id_a = a.doc_id JOIN sp b ON id_b = b.doc_id
        |WHERE a.split != b.split""".stripMargin,
    "q_novelty" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |fs AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS grams,
        |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS novel_grams,
        |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS novelty_ppm
        |FROM sh JOIN fs USING (s) GROUP BY 1""".stripMargin,
    "q_source_drift" ->
      """WITH tk AS (SELECT source,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |tt AS (SELECT source, tok FROM tk WHERE length(tok) > 0),
        |st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS o
        |  FROM tt GROUP BY 1, 2),
        |t AS (SELECT tok, CAST(count(*) AS BIGINT) AS tot FROM tt GROUP BY 1),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM tt GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tt),
        |ap AS (SELECT CAST(sum(tot * 1000000 // n) AS BIGINT) AS sum_p_ppm
        |  FROM t CROSS JOIN n),
        |pres AS (SELECT st.source, max(s.n_s) AS n_toks,
        |    CAST(sum(abs(o * 1000000 // n_s - tot * 1000000 // n)
        |      - tot * 1000000 // n) AS BIGINT) AS present_term
        |  FROM st JOIN t USING (tok) JOIN s USING (source) CROSS JOIN n
        |  GROUP BY 1)
        |SELECT source, n_toks,
        |  CAST((present_term + sum_p_ppm) // 2 AS BIGINT) AS tv_ppm
        |FROM pres CROSS JOIN ap""".stripMargin,
    "q_normalize" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(nfc_normalize(text)),
        |    '[\t\n\f\r ]+', ' ', 'g'))) AS norm_md5,
        |  CAST(length(trim(regexp_replace(lower(nfc_normalize(text)),
        |    '[\t\n\f\r ]+', ' ', 'g'))) AS BIGINT) AS norm_chars
        |FROM documents""".stripMargin,
    "q_surprisal" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |tt AS (SELECT doc_id, tok FROM t WHERE length(tok) > 0),
        |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tt GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tt)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(length(bin(total)) - length(bin(c))) AS BIGINT) AS sum_bits,
        |  CAST(sum(length(bin(total)) - length(bin(c))) * 1000 // count(*)
        |    AS BIGINT) AS mean_bits_e3
        |FROM tt JOIN c USING (tok) CROSS JOIN tot
        |GROUP BY 1""".stripMargin,
    "q_dedup_exact" ->
      """SELECT sha256(text) AS content_hash, CAST(count(*) AS BIGINT) AS dup_count,
        |  min(doc_id) AS keeper
        |FROM documents GROUP BY 1""".stripMargin,
    "q_doc_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(
        |    string_split_regex(trim(text), '\s+'))), ' ')) AS fp,
        |  CAST(count(*) AS BIGINT) AS n, min(doc_id) AS keeper
        |FROM documents GROUP BY 1""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS token_count,
        |  CAST(length(text) AS BIGINT) AS char_count,
        |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS punct_count,
        |  CAST(length(replace(trim(text), ' ', '')) * 1000
        |    // len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS avg_word_len_k,
        |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |    t -> t IN ('the', 'and', 'of'))) * 1000
        |    // len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS stopword_pm
        |FROM documents""".stripMargin,
    "q_token_estimate" ->
      """SELECT doc_id,
        |  CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
        |    t -> 1 + length(t) // 6)) AS BIGINT) AS tokens_est
        |FROM documents""".stripMargin,
    "q_chunk" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |c AS (SELECT doc_id, len(w) AS n, w, CAST(r.s AS BIGINT) AS s
        |  FROM t, LATERAL (SELECT
        |    unnest(range(0, greatest(len(w) - 9, 0) + 1, 56)) AS s) r)
        |SELECT doc_id, CAST(s // 56 AS BIGINT) AS chunk_idx,
        |  CAST(least(64, n - s) AS BIGINT) AS n_tok,
        |  md5(array_to_string(list_slice(w, s + 1, least(s + 64, n)), ' '))
        |    AS chunk_md5
        |FROM c""".stripMargin,
    "q_chunk_pack" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |c AS (SELECT doc_id, CAST(r.s AS BIGINT) AS s, len(w) AS n
        |  FROM t, LATERAL (SELECT
        |    unnest(range(0, greatest(len(w) - 9, 0) + 1, 56)) AS s) r),
        |u AS (SELECT doc_id, CAST(s // 56 AS BIGINT) AS chunk_idx,
        |    CAST(least(64, n - s) AS BIGINT) AS toks FROM c),
        |p AS (SELECT doc_id, chunk_idx, toks,
        |    CAST(sum(toks) OVER (ORDER BY doc_id, chunk_idx) - toks AS BIGINT)
        |      AS start_tok
        |  FROM u)
        |SELECT doc_id, chunk_idx, toks, start_tok,
        |  CAST(start_tok // 512 AS BIGINT) AS window_id,
        |  ((start_tok + toks - 1) // 512) != (start_tok // 512)
        |    AS spans_boundary
        |FROM p""".stripMargin,
    "q_curriculum" ->
      s"""WITH d AS (SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok
        |  FROM documents),
        |v AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1),
        |m AS (SELECT tok, sum(c) OVER (ORDER BY tok) - c AS cumb FROM v),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        |s AS (SELECT d.doc_id, d.tok,
        |    CAST((m.cumb * 4) // n.n AS BIGINT) AS stage
        |  FROM d JOIN m USING (tok) CROSS JOIN n),
        |h AS (SELECT doc_id, tok, stage,
        |    CAST((${hex48("CAST(doc_id AS VARCHAR)")}) % 8 AS BIGINT) AS shard
        |  FROM s)
        |SELECT stage, shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  min(tok) AS min_tok, max(tok) AS max_tok
        |FROM h GROUP BY 1, 2""".stripMargin,
    "q_bigram_top" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |p AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS pair
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
        |  WHERE len(w) >= 2)
        |SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p
        |GROUP BY 1 ORDER BY n DESC, pair LIMIT 10""".stripMargin,
    "q_corpus_profile" ->
      """WITH d AS (SELECT source, n_chars,
        |  CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
        |    t -> 1 + length(t) // 6)) AS BIGINT) AS toks FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS total_toks,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(n_chars) * 1000 // count(*) AS BIGINT) AS mean_chars_e3
        |FROM d GROUP BY 1""".stripMargin,
    // Byte-exact oracle: folds over hex(encode(text)) byte pairs so the
    // DuckDB side hashes the same UTF-8 bytes as the Spark expression
    // (a per-character ord() fold would diverge on non-ASCII text), with
    // HUGEINT arithmetic carrying the 61-bit-modulus intermediates.
    "q_rolling_fp" ->
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
        |f AS (SELECT doc_id,
        |  CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
        |    [CAST((strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16
        |          + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS HUGEINT)
        |     for i in range(1, length(hx)//2 + 1)]),
        |    (acc, c) -> (acc * 131 + c) % 2305843009213693951) AS BIGINT) AS fp
        |  FROM h)
        |SELECT fp, CAST(count(*) AS BIGINT) AS n, min(doc_id) AS keeper
        |FROM f GROUP BY 1""".stripMargin,
    "q_sql_surface" ->
      """WITH base AS (SELECT doc_id, text,
        |    substr(text, 1, 64) AS head,
        |    string_split_regex(trim(text), '\s+') AS w,
        |    hex(encode(text)) AS hx
        |  FROM documents)
        |SELECT doc_id,
        |  md5(trim(regexp_replace(lower(nfc_normalize(text)),
        |    '[\t\n\f\r ]+', ' ', 'g'))) AS norm_md5,
        |  CAST(greatest(length(text) - 2, 0) AS BIGINT) AS trigram_windows,
        |  md5(array_to_string(
        |    [substr(head, i, 3) for i in range(1, greatest(length(head) - 1, 1))],
        |    '|')) AS head_trigrams_md5,
        |  md5(array_to_string(list_sort(list_distinct(
        |    [w[i] || ' ' || w[i + 1] for i in range(1, len(w))])),
        |    '|')) AS shingles2_md5,
        |  CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
        |    [CAST((strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16
        |          + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS HUGEINT)
        |     for i in range(1, length(hx)//2 + 1)]),
        |    (acc, c) -> (acc * 131 + c) % 2305843009213693951) AS BIGINT) AS fp
        |FROM base""".stripMargin,
    "q_vocab_top" ->
      """WITH t AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents)
        |SELECT tok, CAST(count(*) AS BIGINT) AS n FROM t
        |WHERE length(tok) > 0
        |GROUP BY 1 ORDER BY n DESC, tok LIMIT 20""".stripMargin,
    "q_corpus_shuffle" ->
      """WITH h AS (SELECT doc_id, md5(doc_id::VARCHAR || 's42') AS h FROM documents),
        |s AS (SELECT doc_id, h,
        |  CAST((strpos('0123456789abcdef', substr(h,1,1))-1)*16
        |     + (strpos('0123456789abcdef', substr(h,2,1))-1) AS BIGINT) AS shard FROM h)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM s""".stripMargin,
    "q_tfidf_top" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM t
        |       WHERE length(tok) > 0 GROUP BY 1, 2),
        |d AS (SELECT tok, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
        |s AS (SELECT doc_id, tf.tok, tf, df_t,
        |        CAST(tf * n_docs * 1000000 // df_t AS BIGINT) AS score_ppm
        |      FROM tf, d, n WHERE tf.tok = d.tok)
        |SELECT doc_id, tok, tf, df_t, score_ppm, CAST(rnk AS BIGINT) AS rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score_ppm DESC, tok) AS rnk FROM s)
        |WHERE rnk <= 3""".stripMargin,
    "q_dsir_weights" ->
      s"""WITH $dsirCore
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |  CAST(sum(length(bin(ct + 1)) - length(bin(cr + 1)))
         |    + count(*) * (length(bin(nr_s)) - length(bin(nt_s)))
         |    AS BIGINT) AS logw_bits
         |FROM feats JOIN c USING (b) CROSS JOIN tot
         |GROUP BY doc_id, nt_s, nr_s""".stripMargin,
    "q_dsir_select" ->
      s"""WITH $dsirCore,
         |wts AS (SELECT doc_id, CAST(sum(length(bin(ct + 1)) - length(bin(cr + 1)))
         |    + count(*) * (length(bin(nr_s)) - length(bin(nt_s)))
         |    AS BIGINT) AS logw_bits
         |  FROM feats JOIN c USING (b) CROSS JOIN tot
         |  GROUP BY doc_id, nt_s, nr_s)
         |SELECT w.doc_id, logw_bits
         |FROM wts w JOIN documents d ON w.doc_id = d.doc_id
         |WHERE NOT coalesce(d.source IN ('src0', 'src1'), false)
         |ORDER BY logw_bits DESC, w.doc_id LIMIT 100""".stripMargin,
    "q_mix_sample" ->
      """WITH h AS (SELECT source,
        |    md5(CAST(doc_id AS VARCHAR) || 'm1') AS h FROM documents),
        |v AS (SELECT source,
        |    CAST((strpos('0123456789abcdef', substr(h,1,1))-1)*1048576
        |      + (strpos('0123456789abcdef', substr(h,2,1))-1)*65536
        |      + (strpos('0123456789abcdef', substr(h,3,1))-1)*4096
        |      + (strpos('0123456789abcdef', substr(h,4,1))-1)*256
        |      + (strpos('0123456789abcdef', substr(h,5,1))-1)*16
        |      + (strpos('0123456789abcdef', substr(h,6,1))-1) AS BIGINT) AS hv,
        |    CAST(CASE source WHEN 'src0' THEN 500000 WHEN 'src1' THEN 2300000
        |      ELSE 1000000 END AS BIGINT) AS w
        |  FROM h)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_in,
        |  CAST(sum(w // 1000000 +
        |    CASE WHEN hv * 1000000 < (w % 1000000) * 16777216 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_out
        |FROM v GROUP BY 1""".stripMargin,
    "q_dup_ngram_frac" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |df AS (SELECT s, count(*) AS df_docs FROM sh GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS grams,
        |  CAST(sum(CASE WHEN df_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams,
        |  CAST(sum(CASE WHEN df_docs > 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
        |    AS BIGINT) AS dup_frac_ppm
        |FROM sh JOIN df USING (s) GROUP BY 1""".stripMargin,
    "q_length_pct" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(round(quantile_cont(n_chars, 0.5) * 1000) AS BIGINT) AS p50_e3,
        |  CAST(round(quantile_cont(n_chars, 0.9) * 1000) AS BIGINT) AS p90_e3,
        |  CAST(round(quantile_cont(n_chars, 0.99) * 1000) AS BIGINT) AS p99_e3
        |FROM documents GROUP BY 1""".stripMargin,
    "q_lang_id" ->
      """WITH s AS (SELECT doc_id,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |    t -> t IN ('the', 'and', 'of'))) AS en,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |    t -> t IN ('der', 'und', 'das'))) AS de,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |    t -> t IN ('le', 'et', 'les'))) AS fr,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |    t -> t IN ('el', 'los', 'por'))) AS es
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN en >= de AND en >= fr AND en >= es THEN 'en'
        |       WHEN de >= fr AND de >= es THEN 'de'
        |       WHEN fr >= es THEN 'fr' ELSE 'es' END AS lang_guess
        |FROM s""".stripMargin,
    "q_dedup_ngram" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |n AS (SELECT doc_id, count(*) AS cnt FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(common AS BIGINT) AS common,
        |  CAST(round(common * 1.0 / (na.cnt + nb.cnt - common) * 1000) AS BIGINT) AS jaccard_pm
        |FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
        |WHERE common * 1.0 / (na.cnt + nb.cnt - common) >= 0.5""".stripMargin,
    // df histogram → cumulative pair fuel: same shingles as q_dedup_ngram,
    // integer math mirrors the Spark side (df·(df−1) is even, // is exact)
    "q_df_cap_plan" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |d AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
        |h AS (SELECT df AS df_cap, CAST(count(*) AS BIGINT) AS n_shingles
        |  FROM d GROUP BY 1)
        |SELECT df_cap, n_shingles,
        |  CAST(sum(n_shingles * (df_cap * (df_cap - 1) // 2))
        |    OVER (ORDER BY df_cap) AS BIGINT) AS est_pairs,
        |  CAST(sum(n_shingles) OVER (ORDER BY df_cap) AS BIGINT) AS shingles_kept,
        |  CAST(sum(n_shingles) OVER ()
        |    - sum(n_shingles) OVER (ORDER BY df_cap) AS BIGINT) AS shingles_dropped
        |FROM h""".stripMargin,
    "q_incr_dedup" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |n AS (SELECT doc_id, count(*) AS cnt FROM sh GROUP BY 1),
        |b AS (SELECT doc_id FROM documents WHERE source = 'src0'),
        |p AS (SELECT a.doc_id AS id_a, b2.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b2 ON a.s = b2.s AND a.doc_id < b2.doc_id
        |  WHERE a.doc_id IN (SELECT doc_id FROM b)
        |     OR b2.doc_id IN (SELECT doc_id FROM b)
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(common AS BIGINT) AS common,
        |  CAST(round(common * 1.0 / (na.cnt + nb.cnt - common) * 1000) AS BIGINT)
        |    AS jaccard_pm
        |FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
        |WHERE common * 1.0 / (na.cnt + nb.cnt - common) >= 0.3""".stripMargin,
    "q_temp_mix" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_in
        |  FROM documents GROUP BY 1),
        |w AS (SELECT source, n_in, CAST(floor(sqrt(n_in)) AS BIGINT) AS w FROM c),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w)
        |SELECT source, n_in, w,
        |  CAST(w * 1000000 // tw AS BIGINT) AS share_ppm,
        |  CAST(w * 10000 // tw AS BIGINT) AS n_budget
        |FROM w CROSS JOIN t""".stripMargin,
    "q_winnow" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |g AS (SELECT doc_id, len(w) - 2 AS ng, i AS pos,
         |    CAST(${hex48("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")} AS BIGINT) AS h
         |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
         |  WHERE len(w) >= 3),
         |wm AS (SELECT doc_id, ng, pos AS wstart,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
         |  FROM g),
         |st AS (SELECT doc_id, wstart, mh FROM wm
         |  WHERE wstart <= greatest(ng - 3, 1)),
         |sel AS (SELECT s.doc_id, min(g.pos) AS pos, s.mh AS fp
         |  FROM st s JOIN g ON g.doc_id = s.doc_id
         |    AND g.pos BETWEEN s.wstart AND s.wstart + 3 AND g.h = s.mh
         |  GROUP BY s.doc_id, s.wstart, s.mh)
         |SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos,
         |  CAST(fp AS BIGINT) AS fp
         |FROM sel""".stripMargin,
    // Generated oracle: KMV sketch with the same 48-bit md5-slice hash;
    // the __union row re-truncates the union of per-group sketches to k,
    // and the estimator is exact integer division — bit-for-bit portable.
    "q_kmv_distinct" ->
      s"""WITH hv AS (SELECT DISTINCT CAST(lang AS VARCHAR) AS g,
         |    CAST(${hex48("CAST(n_chars AS VARCHAR)")} AS BIGINT) AS h
         |  FROM documents WHERE n_chars IS NOT NULL),
         |sk AS (SELECT g, h FROM (SELECT g, h,
         |    row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM hv)
         |  WHERE rk <= 32),
         |un AS (SELECT g, h FROM (SELECT '__union' AS g, h,
         |    row_number() OVER (ORDER BY h) AS rk
         |    FROM (SELECT DISTINCT h FROM sk))
         |  WHERE rk <= 32),
         |allk AS (SELECT * FROM sk UNION ALL SELECT * FROM un)
         |SELECT g, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(CASE WHEN count(*) < 32 THEN count(*)
         |    ELSE (31 * 281474976710656) // max(h) END AS BIGINT)
         |    AS est_distinct
         |FROM allk GROUP BY g""".stripMargin,
    // Generated oracle: bottom-k pairwise Jaccard — per-lang token
    // sketches, per-pair union re-truncated to k, common = hashes present
    // in both sketches.
    "q_kmv_overlap" ->
      s"""WITH t AS (SELECT CAST(lang AS VARCHAR) AS g,
         |    unnest(list_filter(string_split_regex(trim(text), '\\s+'),
         |      x -> length(x) > 0)) AS tok
         |  FROM documents),
         |hv AS (SELECT DISTINCT g, CAST(${hex48("tok")} AS BIGINT) AS h FROM t),
         |sk AS (SELECT g, h FROM (SELECT g, h,
         |    row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM hv)
         |  WHERE rk <= 128),
         |gs AS (SELECT DISTINCT g FROM sk),
         |pr AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
         |un AS (SELECT ga, gb, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
         |    SELECT ga, gb, s.h, 1 AS in_a, 0 AS in_b FROM pr
         |      JOIN sk s ON s.g = pr.ga
         |    UNION ALL SELECT ga, gb, s.h, 0, 1 FROM pr
         |      JOIN sk s ON s.g = pr.gb) u
         |  GROUP BY 1, 2, 3),
         |rk2 AS (SELECT *, row_number() OVER (PARTITION BY ga, gb
         |    ORDER BY h) AS rk FROM un)
         |SELECT ga, gb, CAST(count(*) AS BIGINT) AS n_union_kept,
         |  CAST(sum(in_a * in_b) AS BIGINT) AS common,
         |  CAST(sum(in_a * in_b) * 1000 // count(*) AS BIGINT) AS jaccard_pm
         |FROM rk2 WHERE rk <= 128 GROUP BY ga, gb""".stripMargin,
    // Generated oracle: hierarchical KMV rollup — hourly sketches
    // re-keyed to event_type and re-truncated, never rescanning events.
    "q_kmv_rollup" ->
      s"""WITH e AS (SELECT event_type || '|' ||
         |      CAST(epoch(date_trunc('second', ts)) // 3600 AS VARCHAR)
         |      AS gk, user_id
         |  FROM events),
         |hv AS (SELECT DISTINCT gk,
         |    CAST(${hex48("CAST(user_id AS VARCHAR)")} AS BIGINT) AS h
         |  FROM e WHERE user_id IS NOT NULL),
         |sk AS (SELECT gk, h FROM (SELECT gk, h,
         |    row_number() OVER (PARTITION BY gk ORDER BY h) AS rk FROM hv)
         |  WHERE rk <= 32),
         |re AS (SELECT DISTINCT split_part(gk, '|', 1) AS g, h FROM sk),
         |rk2 AS (SELECT g, h FROM (SELECT g, h,
         |    row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM re)
         |  WHERE rk <= 32)
         |SELECT g, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(CASE WHEN count(*) < 32 THEN count(*)
         |    ELSE (31 * 281474976710656) // max(h) END AS BIGINT)
         |    AS est_distinct
         |FROM rk2 GROUP BY g""".stripMargin,
    // Generated oracle: bottom-k domain quantiles — hash-sampled distinct
    // values, exact integer ceil-ranks.
    "q_kmv_quantile" ->
      s"""WITH hv AS (SELECT DISTINCT CAST(source AS VARCHAR) AS g,
         |    CAST(n_chars AS BIGINT) AS v,
         |    CAST(${hex48("CAST(n_chars AS VARCHAR)")} AS BIGINT) AS h
         |  FROM documents WHERE n_chars IS NOT NULL),
         |sk AS (SELECT g, v FROM (SELECT g, v, h,
         |    row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM hv)
         |  WHERE rk <= 64),
         |r AS (SELECT g, v,
         |    row_number() OVER (PARTITION BY g ORDER BY v) AS vr,
         |    count(*) OVER (PARTITION BY g) AS n FROM sk)
         |SELECT g, CAST(max(n) AS BIGINT) AS n_sampled,
         |  CAST(max(CASE WHEN vr = (n * 50 + 99) // 100 THEN v END)
         |    AS BIGINT) AS p50,
         |  CAST(max(CASE WHEN vr = (n * 90 + 99) // 100 THEN v END)
         |    AS BIGINT) AS p90
         |FROM r GROUP BY g""".stripMargin,
    "q_corpus_pipeline" ->
      """WITH keepers AS (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
        |m AS (SELECT doc_id, text,
        |  len(string_split_regex(trim(text), '\s+')) AS tc,
        |  length(replace(trim(text), ' ', '')) AS letters,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |    t -> t IN ('the', 'and', 'of'))) AS stops
        |  FROM documents WHERE doc_id IN (SELECT doc_id FROM keepers)),
        |kept AS (SELECT text FROM m
        |  WHERE tc >= 5 AND tc <= 100000
        |    AND letters * 1000 // tc >= 2000 AND letters * 1000 // tc <= 12000
        |    AND stops > 0)
        |SELECT CASE WHEN substr(md5(text), 1, 1) < 'd' THEN 'train'
        |  ELSE 'eval' END AS split,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM kept GROUP BY 1""".stripMargin,
    "q_span_scrub" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |g AS (SELECT doc_id, i AS pos, array_to_string(w[i:i+7], ' ') AS gs
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 6)) AS i) r
        |  WHERE len(w) >= 8),
        |o AS (SELECT doc_id, pos, row_number() OVER (
        |    PARTITION BY gs ORDER BY doc_id, pos) AS rn FROM g),
        |cov AS (SELECT DISTINCT doc_id, pos + j AS tp
        |  FROM (SELECT doc_id, pos FROM o WHERE rn > 1) d,
        |       LATERAL (SELECT unnest(range(0, 8)) AS j) r),
        |tok AS (SELECT doc_id, i AS tp, w[i] AS tok
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) r
        |  WHERE length(w[i]) > 0),
        |k AS (SELECT tok.doc_id, tok.tp, tok.tok FROM tok
        |  ANTI JOIN cov USING (doc_id, tp)),
        |c AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tp) AS clean,
        |    count(*) AS kept FROM k GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS total FROM tok GROUP BY 1)
        |SELECT tot.doc_id, md5(coalesce(c.clean, '')) AS clean_md5,
        |  CAST(coalesce(c.kept, 0) AS BIGINT) AS kept_toks,
        |  CAST(tot.total - coalesce(c.kept, 0) AS BIGINT) AS removed_toks
        |FROM tot LEFT JOIN c USING (doc_id)""".stripMargin,
    "q_boiler_scrub" ->
      """WITH s0 AS (SELECT doc_id, i AS pos, trim(l[i]) AS sent
        |  FROM (SELECT doc_id, string_split(text, '. ') AS l FROM documents) t,
        |       LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i) r
        |  WHERE length(trim(l[i])) > 0),
        |hot AS (SELECT sent FROM (SELECT DISTINCT doc_id, sent FROM s0)
        |  GROUP BY sent HAVING count(*) > 3),
        |k AS (SELECT s0.doc_id, s0.pos, s0.sent FROM s0
        |  ANTI JOIN hot USING (sent)),
        |c AS (SELECT doc_id, string_agg(sent, '. ' ORDER BY pos) AS clean,
        |    count(*) AS kept FROM k GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS total FROM s0 GROUP BY 1)
        |SELECT t.doc_id, md5(coalesce(c.clean, '')) AS clean_md5,
        |  CAST(length(coalesce(c.clean, '')) AS BIGINT) AS clean_len,
        |  CAST(coalesce(c.kept, 0) AS BIGINT) AS kept_sents,
        |  CAST(t.total - coalesce(c.kept, 0) AS BIGINT) AS dropped_sents
        |FROM tot t LEFT JOIN c USING (doc_id)""".stripMargin,
    "q_containment" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |n AS (SELECT doc_id, count(*) AS cnt FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(common AS BIGINT) AS common,
        |  CAST(round(common * 1.0 / na.cnt * 1000) AS BIGINT) AS cont_a_pm,
        |  CAST(round(common * 1.0 / nb.cnt * 1000) AS BIGINT) AS cont_b_pm
        |FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
        |WHERE common * 1.0 / na.cnt >= 0.8
        |   OR common * 1.0 / nb.cnt >= 0.8""".stripMargin,
    "q_adaptive_cutoff" ->
      """WITH t AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS m
        |  FROM documents),
        |r AS (SELECT g, m, row_number() OVER (PARTITION BY g ORDER BY m) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n FROM t),
        |c AS (SELECT g, max(n) AS n,
        |    min(CASE WHEN rn = (n * 10 + 99) // 100 THEN m END) AS p_low,
        |    min(CASE WHEN rn = (n * 90 + 99) // 100 THEN m END) AS p_high
        |  FROM r GROUP BY 1)
        |SELECT c.g AS source, CAST(c.n AS BIGINT) AS n,
        |  CAST(c.p_low AS BIGINT) AS p_low, CAST(c.p_high AS BIGINT) AS p_high,
        |  CAST(count(CASE WHEN t.m BETWEEN c.p_low AND c.p_high
        |    THEN 1 END) AS BIGINT) AS kept
        |FROM c JOIN t USING (g) GROUP BY 1, 2, 3, 4""".stripMargin,
    "q_sentence_dedup" ->
      """WITH t AS (SELECT doc_id, string_split_regex(
        |    trim(replace(text, '. ', ' ')), '\s+') AS w FROM documents),
        |s AS (SELECT doc_id,
        |    array_to_string(list_slice(w, i*10+1, i*10+10), ' ') AS sent
        |  FROM t, LATERAL (
        |    SELECT unnest(range(0, (len(w)-1)//10 + 1)) AS i) r
        |  WHERE length(array_to_string(list_slice(w, i*10+1, i*10+10), ' ')) > 0)
        |SELECT sha256(sent) AS sent_hash, CAST(count(*) AS BIGINT) AS n,
        |  min(doc_id) AS first_doc
        |FROM s GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "q_embed_quant" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |  list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e)
        |SELECT vec_id,
        |  CAST(round(list_sum(list_transform(v,
        |    x -> abs(x - round(x / scale) * scale))) * 1000000) AS BIGINT) AS err_e6
        |FROM s WHERE scale > 0""".stripMargin,
    "q_stratified" ->
      """WITH s AS (SELECT text,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |    t -> t IN ('the', 'and', 'of'))) AS en,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |    t -> t IN ('der', 'und', 'das'))) AS de,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |    t -> t IN ('le', 'et', 'les'))) AS fr,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |    t -> t IN ('el', 'los', 'por'))) AS es
        |  FROM documents),
        |l AS (SELECT text,
        |  CASE WHEN en >= de AND en >= fr AND en >= es THEN 'en'
        |       WHEN de >= fr AND de >= es THEN 'de'
        |       WHEN fr >= es THEN 'fr' ELSE 'es' END AS lang
        |  FROM s)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n FROM l
        |WHERE CASE WHEN lang = 'en' THEN substr(md5(text), 1, 1) < '4'
        |      ELSE TRUE END
        |GROUP BY 1""".stripMargin,
    "q_quality_filter" ->
      """WITH m AS (SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS tc,
        |  length(replace(trim(text), ' ', '')) AS letters,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |    t -> t IN ('the', 'and', 'of'))) AS stops
        |  FROM documents),
        |v AS (SELECT doc_id,
        |  CASE WHEN tc < 5 THEN 'too_short'
        |       WHEN tc > 100000 THEN 'too_long'
        |       WHEN letters * 1000 // tc < 2000 THEN 'words_too_short'
        |       WHEN letters * 1000 // tc > 12000 THEN 'words_too_long'
        |       WHEN stops = 0 THEN 'no_stopwords'
        |       ELSE 'ok' END AS reason
        |  FROM m)
        |SELECT doc_id, reason = 'ok' AS keep, reason FROM v""".stripMargin,
    "q_train_split" ->
      """SELECT CASE WHEN substr(md5(text), 1, 1) < 'd' THEN 'train'
        |  ELSE 'eval' END AS split,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM documents GROUP BY 1""".stripMargin,
    // connected components over the exact ngram pairs; DuckDB recursive CTE
    // computes min-reachable-id per node over the same edge set
    "q_cluster_sizes" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |n AS (SELECT doc_id, count(*) AS cnt FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
        |  WHERE common * 1.0 / (na.cnt + nb.cnt - common) >= 0.5),
        |$reachCte,
        |clusters AS (SELECT node AS id, min(root) AS cluster FROM reach GROUP BY 1),
        |cs AS (SELECT cluster, CAST(count(*) AS BIGINT) AS size
        |  FROM clusters GROUP BY 1)
        |SELECT size, CAST(count(*) AS BIGINT) AS n_clusters
        |FROM cs GROUP BY 1""".stripMargin,
    // same cluster derivation, then the quality-aware keeper: longest
    // member per cluster, ties to the smaller id
    "q_cluster_keeper" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |n AS (SELECT doc_id, count(*) AS cnt FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
        |  WHERE common * 1.0 / (na.cnt + nb.cnt - common) >= 0.5),
        |$reachCte,
        |clusters AS (SELECT node AS id, min(root) AS cluster FROM reach GROUP BY 1),
        |q AS (SELECT c.cluster, c.id, d.n_chars AS q
        |  FROM clusters c JOIN documents d ON c.id = d.doc_id),
        |r AS (SELECT cluster, id, q,
        |    row_number() OVER (PARTITION BY cluster ORDER BY q DESC, id) AS rn,
        |    count(*) OVER (PARTITION BY cluster) AS size
        |  FROM q)
        |SELECT cluster, id AS keeper_id, q AS quality,
        |  CAST(size AS BIGINT) AS size
        |FROM r WHERE rn = 1""".stripMargin,
    "q_source_overlap" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |n AS (SELECT doc_id, count(*) AS cnt FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
        |  WHERE common * 1.0 / (na.cnt + nb.cnt - common) >= 0.5)
        |SELECT least(da.source, db.source) AS source_a,
        |  greatest(da.source, db.source) AS source_b,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM pairs JOIN documents da ON id_a = da.doc_id
        |  JOIN documents db ON id_b = db.doc_id
        |GROUP BY 1, 2""".stripMargin,
    "q_embed_purge" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    label FROM embeddings),
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM e a, e b WHERE a.vec_id < b.vec_id
        |    AND CAST(round(list_cosine_similarity(a.v, b.v) * 1000000)
        |      AS BIGINT) >= 400000),
        |$reachCte,
        |losers AS (SELECT node AS vec_id FROM reach
        |  GROUP BY 1 HAVING node != min(root))
        |SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n
        |FROM e LEFT JOIN losers USING (vec_id)
        |WHERE losers.vec_id IS NULL
        |GROUP BY 1""".stripMargin,
    // connected components over the exact ngram pairs: min-reachable-id
    // per node over the same edge set the Spark operator uses
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |n AS (SELECT doc_id, count(*) AS cnt FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
        |  WHERE common * 1.0 / (na.cnt + nb.cnt - common) >= 0.5),
        |$reachCte
        |SELECT node AS id, min(root) AS cluster FROM reach GROUP BY 1""".stripMargin,
    // the composed release: ONE pair/CC derivation, six tagged product
    // branches — each branch's canonical string mirrors its standalone
    // oracle's output columns exactly
    "q_dedup_release" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |n AS (SELECT doc_id, count(*) AS cnt FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pj AS (
        |  SELECT id_a, id_b, CAST(common AS BIGINT) AS common,
        |    CAST(round(common * 1.0 / (na.cnt + nb.cnt - common) * 1000) AS BIGINT)
        |      AS jaccard_pm
        |  FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
        |  WHERE common * 1.0 / (na.cnt + nb.cnt - common) >= 0.5),
        |pairs AS (SELECT id_a, id_b FROM pj),
        |$reachCte,
        |clusters AS (SELECT node AS id, min(root) AS cluster FROM reach GROUP BY 1),
        |kq AS (SELECT c.cluster, c.id, d.n_chars AS q
        |  FROM clusters c JOIN documents d ON c.id = d.doc_id),
        |kr AS (SELECT cluster, id, q,
        |    row_number() OVER (PARTITION BY cluster ORDER BY q DESC, id) AS rn,
        |    count(*) OVER (PARTITION BY cluster) AS size
        |  FROM kq),
        |cs AS (SELECT cluster, CAST(count(*) AS BIGINT) AS size
        |  FROM clusters GROUP BY 1),
        |szh AS (SELECT size, CAST(count(*) AS BIGINT) AS n_clusters
        |  FROM cs GROUP BY 1),
        |losers AS (SELECT id FROM clusters WHERE id != cluster),
        |pg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents
        |  WHERE doc_id NOT IN (SELECT id FROM losers) GROUP BY 1),
        |spl AS (SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS root
        |  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.id),
        |ov AS (SELECT least(da.source, db.source) AS source_a,
        |    greatest(da.source, db.source) AS source_b,
        |    CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM pairs JOIN documents da ON id_a = da.doc_id
        |    JOIN documents db ON id_b = db.doc_id
        |  GROUP BY 1, 2),
        |cj AS (SELECT id_a, id_b, CAST(common AS BIGINT) AS common,
        |    CAST(round(common * 1.0 / na.cnt * 1000) AS BIGINT) AS cont_a_pm,
        |    CAST(round(common * 1.0 / nb.cnt * 1000) AS BIGINT) AS cont_b_pm
        |  FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
        |  WHERE common * 1.0 / na.cnt >= 0.8
        |     OR common * 1.0 / nb.cnt >= 0.8)
        |SELECT 'pairs' AS product, md5(concat_ws('|', CAST(id_a AS VARCHAR),
        |    CAST(id_b AS VARCHAR), CAST(common AS VARCHAR),
        |    CAST(jaccard_pm AS VARCHAR))) AS row_md5 FROM pj
        |UNION ALL
        |SELECT 'clusters', md5(concat_ws('|', CAST(id AS VARCHAR),
        |    CAST(cluster AS VARCHAR))) FROM clusters
        |UNION ALL
        |SELECT 'keepers', md5(concat_ws('|', CAST(cluster AS VARCHAR),
        |    CAST(id AS VARCHAR), CAST(q AS VARCHAR),
        |    CAST(CAST(size AS BIGINT) AS VARCHAR))) FROM kr WHERE rn = 1
        |UNION ALL
        |SELECT 'sizes', md5(concat_ws('|', CAST(size AS VARCHAR),
        |    CAST(n_clusters AS VARCHAR))) FROM szh
        |UNION ALL
        |SELECT 'purge', md5(concat_ws('|', lang, CAST(n AS VARCHAR))) FROM pg
        |UNION ALL
        |SELECT 'split', md5(concat_ws('|', CAST(doc_id AS VARCHAR),
        |    CASE WHEN substr(md5(CAST(root AS VARCHAR)), 1, 1) < 'd'
        |         THEN 'train' ELSE 'eval' END)) FROM spl
        |UNION ALL
        |SELECT 'overlap', md5(concat_ws('|', source_a, source_b,
        |    CAST(n_pairs AS VARCHAR))) FROM ov
        |UNION ALL
        |SELECT 'containment', md5(concat_ws('|', CAST(id_a AS VARCHAR),
        |    CAST(id_b AS VARCHAR), CAST(common AS VARCHAR),
        |    CAST(cont_a_pm AS VARCHAR), CAST(cont_b_pm AS VARCHAR)))
        |  FROM cj""".stripMargin,
    // Generated oracle: the LSH-FRONTED release — candidates from banded
    // portable MinHash (the q_dedup_minhash_port family, 2 rows/band)
    // UNIONed with the rarest-first containment prefix filter, scored in
    // 48-bit hash space, then the identical eight product branches as
    // q_dedup_release. The Spark side's df-cap is hash-neutral at gate
    // SFs (cap >> max honest df), so the oracle omits it — the same
    // contract as q_lsh_audit.
    "q_release_lsh" -> {
      val (pa, pb) = Dedup.minhashParams(32, 42L)
      val params = pa.zip(pb).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      s"""WITH RECURSIVE t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        |  FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |hv AS (SELECT DISTINCT doc_id, (${hex48("s")}) AS h FROM sh0),
        |n AS (SELECT doc_id, count(*) AS cnt FROM hv GROUP BY 1),
        |params AS (SELECT * FROM (VALUES $params) AS pr(i, a, b)),
        |sig AS (SELECT doc_id, i,
        |    min((a * (h % 2147483647) + b) % 2147483647) AS m
        |  FROM hv CROSS JOIN params GROUP BY 1, 2),
        |band AS (SELECT doc_id, i // 2 AS band,
        |    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bkey
        |  FROM sig GROUP BY 1, 2),
        |candj AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM band a JOIN band b ON a.band = b.band AND a.bkey = b.bkey
        |    AND a.doc_id < b.doc_id),
        |dfs AS (SELECT h, count(*) AS df FROM hv GROUP BY 1),
        |rk AS (SELECT hv.doc_id, hv.h,
        |    row_number() OVER (PARTITION BY hv.doc_id ORDER BY d.df, hv.h) AS rn
        |  FROM hv JOIN dfs d ON hv.h = d.h),
        |pref AS (SELECT rk.doc_id, rk.h FROM rk JOIN n ON rk.doc_id = n.doc_id
        |  WHERE rn <= n.cnt - ((n.cnt * 800 + 999) // 1000) + 1),
        |candc AS (SELECT DISTINCT least(pf.doc_id, f.doc_id) AS id_a,
        |    greatest(pf.doc_id, f.doc_id) AS id_b
        |  FROM pref pf JOIN hv f ON pf.h = f.h AND pf.doc_id != f.doc_id),
        |cand AS (SELECT DISTINCT id_a, id_b FROM (
        |  SELECT id_a, id_b FROM candj
        |  UNION ALL SELECT id_a, id_b FROM candc) u),
        |p AS (SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS common FROM cand
        |  JOIN hv ha ON ha.doc_id = id_a
        |  JOIN hv hb ON hb.doc_id = id_b AND ha.h = hb.h
        |  GROUP BY 1, 2),
        |pj AS (SELECT id_a, id_b, common,
        |    CAST(round(common * 1.0 / (na.cnt + nb.cnt - common) * 1000) AS BIGINT)
        |      AS jaccard_pm
        |  FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
        |  WHERE common * 1.0 / (na.cnt + nb.cnt - common) >= 0.5),
        |pairs AS (SELECT id_a, id_b FROM pj),
        |$reachCte,
        |clusters AS (SELECT node AS id, min(root) AS cluster FROM reach GROUP BY 1),
        |kq AS (SELECT c.cluster, c.id, d.n_chars AS q
        |  FROM clusters c JOIN documents d ON c.id = d.doc_id),
        |kr AS (SELECT cluster, id, q,
        |    row_number() OVER (PARTITION BY cluster ORDER BY q DESC, id) AS rn,
        |    count(*) OVER (PARTITION BY cluster) AS size
        |  FROM kq),
        |cs AS (SELECT cluster, CAST(count(*) AS BIGINT) AS size
        |  FROM clusters GROUP BY 1),
        |szh AS (SELECT size, CAST(count(*) AS BIGINT) AS n_clusters
        |  FROM cs GROUP BY 1),
        |losers AS (SELECT id FROM clusters WHERE id != cluster),
        |pg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents
        |  WHERE doc_id NOT IN (SELECT id FROM losers) GROUP BY 1),
        |spl AS (SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS root
        |  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.id),
        |ov AS (SELECT least(da.source, db.source) AS source_a,
        |    greatest(da.source, db.source) AS source_b,
        |    CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM pairs JOIN documents da ON id_a = da.doc_id
        |    JOIN documents db ON id_b = db.doc_id
        |  GROUP BY 1, 2),
        |cj AS (SELECT id_a, id_b, common,
        |    CAST(round(common * 1.0 / na.cnt * 1000) AS BIGINT) AS cont_a_pm,
        |    CAST(round(common * 1.0 / nb.cnt * 1000) AS BIGINT) AS cont_b_pm
        |  FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
        |  WHERE common * 1.0 / na.cnt >= 0.8
        |     OR common * 1.0 / nb.cnt >= 0.8)
        |SELECT 'pairs' AS product, md5(concat_ws('|', CAST(id_a AS VARCHAR),
        |    CAST(id_b AS VARCHAR), CAST(common AS VARCHAR),
        |    CAST(jaccard_pm AS VARCHAR))) AS row_md5 FROM pj
        |UNION ALL
        |SELECT 'clusters', md5(concat_ws('|', CAST(id AS VARCHAR),
        |    CAST(cluster AS VARCHAR))) FROM clusters
        |UNION ALL
        |SELECT 'keepers', md5(concat_ws('|', CAST(cluster AS VARCHAR),
        |    CAST(id AS VARCHAR), CAST(q AS VARCHAR),
        |    CAST(CAST(size AS BIGINT) AS VARCHAR))) FROM kr WHERE rn = 1
        |UNION ALL
        |SELECT 'sizes', md5(concat_ws('|', CAST(size AS VARCHAR),
        |    CAST(n_clusters AS VARCHAR))) FROM szh
        |UNION ALL
        |SELECT 'purge', md5(concat_ws('|', lang, CAST(n AS VARCHAR))) FROM pg
        |UNION ALL
        |SELECT 'split', md5(concat_ws('|', CAST(doc_id AS VARCHAR),
        |    CASE WHEN substr(md5(CAST(root AS VARCHAR)), 1, 1) < 'd'
        |         THEN 'train' ELSE 'eval' END)) FROM spl
        |UNION ALL
        |SELECT 'overlap', md5(concat_ws('|', source_a, source_b,
        |    CAST(n_pairs AS VARCHAR))) FROM ov
        |UNION ALL
        |SELECT 'containment', md5(concat_ws('|', CAST(id_a AS VARCHAR),
        |    CAST(id_b AS VARCHAR), CAST(common AS VARCHAR),
        |    CAST(cont_a_pm AS VARCHAR), CAST(cont_b_pm AS VARCHAR)))
        |  FROM cj""".stripMargin
    },
    "q_dedup_purge" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |n AS (SELECT doc_id, count(*) AS cnt FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
        |  WHERE common * 1.0 / (na.cnt + nb.cnt - common) >= 0.5),
        |$reachCte,
        |clusters AS (SELECT node AS id, min(root) AS cluster FROM reach GROUP BY 1),
        |losers AS (SELECT id FROM clusters WHERE id != cluster)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM losers) GROUP BY 1""".stripMargin,
    "q_sim_topk" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |sims AS (SELECT qid, id,
        |    CAST(round(list_cosine_similarity(qv, cv) * 1000000) AS BIGINT) AS sim_e6
        |  FROM q, c WHERE qid != id)
        |SELECT qid, CAST(rank AS INT) AS rank, id, sim_e6 FROM (
        |  SELECT qid, id, sim_e6,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim_e6 DESC, id) AS rank
        |  FROM sims) WHERE rank <= 5""".stripMargin,
    // Generated oracle: the greedy farthest-point selection unrolled as
    // one CTE stage per pick — distances fold with least() against the
    // newest center exactly like the Spark loop's running `mind` column.
    "q_kcenter" -> {
      val k = 6
      val stages = (1 until k).map { r =>
        val distStage =
          if (r == 1)
            s"""d1 AS (SELECT e.id, e.v,
               |  1000000 - CAST(round(list_cosine_similarity(e.v, c0.v) * 1000000) AS BIGINT) AS mind
               |  FROM e, c0 WHERE e.id != c0.id)""".stripMargin
          else
            s"""d$r AS (SELECT d.id, d.v, least(d.mind,
               |  1000000 - CAST(round(list_cosine_similarity(d.v, c.v) * 1000000) AS BIGINT)) AS mind
               |  FROM d${r - 1} d, c${r - 1} c WHERE d.id != c.id)""".stripMargin
        val pickStage =
          s"c$r AS (SELECT id, v, mind FROM d$r ORDER BY mind DESC, id LIMIT 1)"
        s"$distStage,\n$pickStage"
      }.mkString(",\n")
      val unions = (1 until k)
        .map(r => s"UNION ALL SELECT $r AS rank, id, mind AS dist_e6 FROM c$r")
        .mkString("\n")
      s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |c0 AS (SELECT id, v FROM e ORDER BY id LIMIT 1),
         |$stages
         |SELECT 0 AS rank, id, 2000000 AS dist_e6 FROM c0
         |$unions""".stripMargin
    },
    // Generated oracle: the MMR greedy unrolled into k staged CTEs (the
    // q_kcenter construction) — all-integer scaled scores, no division.
    "q_mmr_select" -> {
      val k = 5
      val lam = 700000L
      val om = 1000000L - lam
      val stages = (1 until k).map { r =>
        val msExpr =
          if (r == 1)
            "CAST(round(list_cosine_similarity(d.v, c.v) * 1000000) AS BIGINT)"
          else
            "greatest(d.ms, CAST(round(list_cosine_similarity(d.v, c.v) * 1000000) AS BIGINT))"
        val dSrc = if (r == 1) "rel0" else s"d${r - 1}"
        s"""d$r AS (SELECT d.id, d.v, d.rel, $msExpr AS ms
           |  FROM $dSrc d, c${r - 1} c WHERE d.id != c.id),
           |c$r AS (SELECT id, v, rel, ms, $lam * rel - $om * ms AS score
           |  FROM d$r ORDER BY score DESC, id LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val unions = (1 until k).map(r =>
        s"UNION ALL SELECT $r AS rank, id, rel AS rel_e6, score FROM c$r")
        .mkString("\n")
      s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings WHERE vec_id != 0),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |  WHERE vec_id = 0),
         |rel0 AS (SELECT e.id, e.v,
         |    CAST(round(list_cosine_similarity(e.v, q.v) * 1000000) AS BIGINT)
         |      AS rel
         |  FROM e, q),
         |c0 AS (SELECT id, v, rel FROM rel0 ORDER BY rel DESC, id LIMIT 1),
         |$stages
         |SELECT 0 AS rank, id, rel AS rel_e6, $lam * rel AS score FROM c0
         |$unions""".stripMargin
    },
    // Generated oracle: replicates the portable MinHash+LSH pipeline with
    // the SAME seeded hash family (params embedded as literals), 48-bit
    // md5-slice base hash decoded nibble-by-nibble, banding via ordered
    // signature-slice keys, and exact-Jaccard verification.
    "q_dedup_minhash_port" -> {
      val (pa, pb) = Dedup.minhashParams(32, 42L)
      val params = pa.zip(pb).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      val hexpr = (0 until 12).map { j =>
        val w = math.pow(16, 11 - j).toLong
        s"(strpos('0123456789abcdef', substr(md5(s), ${j + 1}, 1)) - 1) * $w"
      }.mkString(" + ")
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
         |  WHERE len(w) >= 3),
         |hv AS (SELECT DISTINCT doc_id, ($hexpr) AS h FROM sh0),
         |n AS (SELECT doc_id, count(*) AS cnt FROM hv GROUP BY 1),
         |params AS (SELECT * FROM (VALUES $params) AS p(i, a, b)),
         |sig AS (SELECT doc_id, i,
         |    min((a * (h % 2147483647) + b) % 2147483647) AS m
         |  FROM hv CROSS JOIN params GROUP BY 1, 2),
         |band AS (SELECT doc_id, i // 4 AS band,
         |    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bkey
         |  FROM sig GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM band a JOIN band b ON a.band = b.band AND a.bkey = b.bkey
         |    AND a.doc_id < b.doc_id),
         |cm AS (SELECT id_a, id_b, count(*) AS c FROM cand
         |  JOIN hv ha ON ha.doc_id = id_a
         |  JOIN hv hb ON hb.doc_id = id_b AND ha.h = hb.h
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  CAST(round(c * 1.0 / (na.cnt + nb.cnt - c) * 1000) AS BIGINT)
         |    AS jaccard_pm
         |FROM cm JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
         |WHERE c * 1.0 / (na.cnt + nb.cnt - c) >= 0.5""".stripMargin
    },
    // Generated oracle: portable-MinHash band candidates (same seeded
    // family as q_dedup_minhash_port) FULL OUTER JOINed against the exact
    // 48-bit-hashed-shingle Jaccard ground truth, classified into
    // precision/recall counts. The Spark side's df-cap is hash-neutral at
    // gate SFs (cap >> max honest df, PLANS.md), so the oracle omits it.
    "q_lsh_audit" -> {
      val (pa, pb) = Dedup.minhashParams(32, 42L)
      val params = pa.zip(pb).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
         |  WHERE len(w) >= 3),
         |hv AS (SELECT DISTINCT doc_id, (${hex48("s")}) AS h FROM sh0),
         |n AS (SELECT doc_id, count(*) AS cnt FROM hv GROUP BY 1),
         |params AS (SELECT * FROM (VALUES $params) AS p(i, a, b)),
         |sig AS (SELECT doc_id, i,
         |    min((a * (h % 2147483647) + b) % 2147483647) AS m
         |  FROM hv CROSS JOIN params GROUP BY 1, 2),
         |band AS (SELECT doc_id, i // 4 AS band,
         |    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bkey
         |  FROM sig GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM band a JOIN band b ON a.band = b.band AND a.bkey = b.bkey
         |    AND a.doc_id < b.doc_id),
         |ex AS (SELECT ha.doc_id AS id_a, hb.doc_id AS id_b, count(*) AS c
         |  FROM hv ha JOIN hv hb ON ha.h = hb.h AND ha.doc_id < hb.doc_id
         |  GROUP BY 1, 2),
         |exact AS (SELECT id_a, id_b
         |  FROM ex JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
         |  WHERE c * 1.0 / (na.cnt + nb.cnt - c) >= 0.5),
         |j AS (SELECT c.id_a IS NOT NULL AS is_cand, e.id_a IS NOT NULL AS is_true
         |  FROM cand c FULL OUTER JOIN exact e
         |    ON c.id_a = e.id_a AND c.id_b = e.id_b),
         |agg AS (SELECT
         |    CAST(count(*) FILTER (is_cand) AS BIGINT) AS candidates,
         |    CAST(count(*) FILTER (is_cand AND is_true) AS BIGINT) AS true_pos,
         |    CAST(count(*) FILTER (is_cand AND NOT is_true) AS BIGINT) AS false_pos,
         |    CAST(count(*) FILTER (is_true AND NOT is_cand) AS BIGINT) AS missed
         |  FROM j)
         |SELECT candidates, true_pos, false_pos, missed,
         |  CAST(true_pos * 1000 // greatest(candidates, 1) AS BIGINT) AS precision_pm,
         |  CAST(true_pos * 1000 // greatest(true_pos + missed, 1) AS BIGINT) AS recall_pm
         |FROM agg""".stripMargin
    },
    // Generated oracle: the three front volumes as counting sums over
    // the hash-space index histogram, the banded-signature buckets
    // (same seeded family, 2 rows/band), and the rarest-first prefix
    // rows — no candidate pair materialized on either engine.
    "q_front_plan" -> {
      val (pa, pb) = Dedup.minhashParams(32, 42L)
      val params = pa.zip(pb).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
         |  WHERE len(w) >= 3),
         |hv AS (SELECT DISTINCT doc_id, (${hex48("s")}) AS h FROM sh0),
         |n AS (SELECT doc_id, count(*) AS cnt FROM hv GROUP BY 1),
         |dfs AS (SELECT h, count(*) AS df FROM hv GROUP BY 1),
         |ex AS (SELECT CAST(sum(df * (df - 1) // 2) AS BIGINT) AS exact_pairs
         |  FROM dfs),
         |params AS (SELECT * FROM (VALUES $params) AS pr(i, a, b)),
         |sig AS (SELECT doc_id, i,
         |    min((a * (h % 2147483647) + b) % 2147483647) AS m
         |  FROM hv CROSS JOIN params GROUP BY 1, 2),
         |band AS (SELECT doc_id, i // 2 AS band,
         |    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bkey
         |  FROM sig GROUP BY 1, 2),
         |bk AS (SELECT band, bkey, count(*) AS c FROM band GROUP BY 1, 2),
         |bp AS (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS band_pairs
         |  FROM bk),
         |rk AS (SELECT hv.doc_id, hv.h,
         |    row_number() OVER (PARTITION BY hv.doc_id ORDER BY d.df, hv.h) AS rn
         |  FROM hv JOIN dfs d ON hv.h = d.h),
         |pref AS (SELECT rk.doc_id, rk.h FROM rk JOIN n ON rk.doc_id = n.doc_id
         |  WHERE rn <= n.cnt - ((n.cnt * 800 + 999) // 1000) + 3),
         |pp AS (SELECT CAST(sum(d.df - 1) AS BIGINT) AS prefix_pairs
         |  FROM pref JOIN dfs d ON pref.h = d.h),
         |ir AS (SELECT CAST(count(*) AS BIGINT) AS index_rows FROM hv),
         |grp AS (SELECT doc_id, list_sort(list(h)) AS st FROM hv GROUP BY 1),
         |gc AS (SELECT st, count(*) AS g FROM grp GROUP BY 1),
         |cp AS (SELECT CAST(coalesce(sum(g - 1), 0) AS BIGINT) AS collapsed_docs,
         |    CAST(coalesce(sum(g * (g - 1) // 2), 0) AS BIGINT) AS dup_group_pairs
         |  FROM gc),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM n)
         |SELECT exact_pairs, band_pairs, prefix_pairs, index_rows,
         |  collapsed_docs, dup_group_pairs, n_docs
         |FROM ex CROSS JOIN bp CROSS JOIN pp CROSS JOIN ir
         |  CROSS JOIN cp CROSS JOIN nd""".stripMargin
    },
    // Generated oracle: the rarest-first prefix containment candidates
    // (integer prefix length, (df, h) ordering, PPJoin-style positional
    // bound at each directed pair's minimal shared prefix shingle PLUS
    // the count bound sc + nf − jmax PLUS the extended-prefix min-shared
    // filter sc ≥ min(3, ⌈t·np⌉) — all replicated here so the
    // recall_pm = 1000 gate keeps gating what ships)
    // FULL OUTER JOINed against exact-containment ground truth in
    // 48-bit hash space. The Spark side's df-cap is hash-neutral at
    // gate SFs (cap >> max honest df), so the oracle omits it — the
    // q_lsh_audit contract.
    "q_contain_audit" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
         |  WHERE len(w) >= 3),
         |hv AS (SELECT DISTINCT doc_id, (${hex48("s")}) AS h FROM sh0),
         |n AS (SELECT doc_id, count(*) AS cnt FROM hv GROUP BY 1),
         |dfs AS (SELECT h, count(*) AS df FROM hv GROUP BY 1),
         |rk AS (SELECT hv.doc_id, hv.h, n.cnt,
         |    row_number() OVER (PARTITION BY hv.doc_id ORDER BY d.df, hv.h) AS rn
         |  FROM hv JOIN dfs d ON hv.h = d.h JOIN n ON hv.doc_id = n.doc_id),
         |pref AS (SELECT * FROM rk
         |  WHERE rn <= cnt - ((cnt * 800 + 999) // 1000) + 3),
         |probe AS (SELECT p.doc_id AS pid, f.doc_id AS fid,
         |    min(p.rn) AS i, arg_min(f.rn, p.rn) AS j,
         |    min(p.cnt) AS np, min(f.cnt) AS nf,
         |    max(f.rn) AS jmax, count(*) AS sc
         |  FROM pref p JOIN rk f ON p.h = f.h AND p.doc_id != f.doc_id
         |  GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT least(pid, fid) AS id_a,
         |    greatest(pid, fid) AS id_b
         |  FROM probe
         |  WHERE 1 + least(np - i, nf - j) >= (np * 800 + 999) // 1000
         |    AND sc + nf - jmax >= (np * 800 + 999) // 1000
         |    AND sc >= least(3, (np * 800 + 999) // 1000)),
         |ex AS (SELECT ha.doc_id AS id_a, hb.doc_id AS id_b, count(*) AS c
         |  FROM hv ha JOIN hv hb ON ha.h = hb.h AND ha.doc_id < hb.doc_id
         |  GROUP BY 1, 2),
         |exact AS (SELECT id_a, id_b
         |  FROM ex JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
         |  WHERE c * 1.0 / na.cnt >= 0.8 OR c * 1.0 / nb.cnt >= 0.8),
         |j AS (SELECT c.id_a IS NOT NULL AS is_cand, e.id_a IS NOT NULL AS is_true
         |  FROM cand c FULL OUTER JOIN exact e
         |    ON c.id_a = e.id_a AND c.id_b = e.id_b),
         |agg AS (SELECT
         |    CAST(count(*) FILTER (is_cand) AS BIGINT) AS candidates,
         |    CAST(count(*) FILTER (is_cand AND is_true) AS BIGINT) AS true_pos,
         |    CAST(count(*) FILTER (is_cand AND NOT is_true) AS BIGINT) AS false_pos,
         |    CAST(count(*) FILTER (is_true AND NOT is_cand) AS BIGINT) AS missed
         |  FROM j)
         |SELECT candidates, true_pos, false_pos, missed,
         |  CAST(true_pos * 1000 // greatest(candidates, 1) AS BIGINT) AS precision_pm,
         |  CAST(true_pos * 1000 // greatest(true_pos + missed, 1) AS BIGINT) AS recall_pm
         |FROM agg""".stripMargin,
    // Generated oracle: the portable SimHash sketch (bit j of the sketch
    // set iff the per-bit +1/−1 vote over the doc's 48-bit gram hashes is
    // strictly positive), 16-bit chunk blocking, Hamming verification.
    "q_dedup_simhash_port" -> {
      val hexpr = (0 until 12).map { j =>
        val w = math.pow(16, 11 - j).toLong
        s"(strpos('0123456789abcdef', substr(md5(s), ${j + 1}, 1)) - 1) * $w"
      }.mkString(" + ")
      val shexpr = (0 until 48).map { j =>
        val w = 1L << j
        s"CASE WHEN sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN $w ELSE 0 END"
      }.mkString(" + ")
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
         |  WHERE len(w) >= 3),
         |hv AS (SELECT DISTINCT doc_id, ($hexpr) AS h FROM sh0),
         |bits AS (SELECT doc_id, ($shexpr) AS sh FROM hv GROUP BY doc_id),
         |chunks AS (SELECT doc_id, sh, c, (sh >> (c * 16)) & 65535 AS cv
         |  FROM bits, (VALUES (0), (1), (2)) ch(c))
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
         |FROM chunks a JOIN chunks b
         |  ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 3""".stripMargin
    },
    // Generated oracle for the hyperplane-LSH top-k: the seeded plane
    // family is embedded as double literals (Double.toString round-trips
    // exactly), sign sketches and bucket joins replicate the Spark
    // pipeline, and the re-rank matches q_sim_topk's cosine form.
    "q_sim_lsh" -> {
      val planes = CosineSearch.lshPlanes(dim = 64, bits = 4, tables = 8,
        seed = 7L)
      def bucketExpr(vec: String, tp: Array[Array[Double]]): String =
        tp.zipWithIndex.map { case (p, i) =>
          s"CASE WHEN list_dot_product($vec, ${p.mkString("[", ", ", "]")}) >= 0 " +
            s"THEN ${1L << i} ELSE 0 END"
        }.mkString("(", " + ", ")")
      def tblCase(vec: String): String =
        planes.zipWithIndex.map { case (tp, l) =>
          s"WHEN $l THEN ${bucketExpr(vec, tp)}"
        }.mkString("CASE tbl ", " ", " END")
      s"""WITH q0 AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < 10),
         |c0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings),
         |tb AS (SELECT * FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) t(tbl)),
         |cb AS (SELECT id, cv, tbl, ${tblCase("cv")} AS bucket FROM c0, tb),
         |qb AS (SELECT qid, qv, tbl, ${tblCase("qv")} AS bucket FROM q0, tb),
         |sims AS (SELECT DISTINCT qid, id,
         |    CAST(round(list_cosine_similarity(qv, cv) * 1000000) AS BIGINT)
         |      AS sim_e6
         |  FROM cb JOIN qb USING (tbl, bucket) WHERE qid != id)
         |SELECT qid, CAST(rank AS INT) AS rank, id, sim_e6 FROM (
         |  SELECT qid, id, sim_e6, row_number() OVER (
         |    PARTITION BY qid ORDER BY sim_e6 DESC, id) AS rank
         |  FROM sims) WHERE rank <= 5""".stripMargin
    },
    // Generated oracle for the LSH near-dup pairs (same plane-literal
    // technique; 8-bit sketches, 4 tables, threshold on the quantized
    // cosine)
    "q_sim_neardup" ->
      s"""WITH $simNeardupCtes
         |SELECT id_a, id_b, sim_e6 FROM (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |    CAST(round(list_cosine_similarity(a.cv, b.cv) * 1000000) AS BIGINT)
         |      AS sim_e6
         |  FROM cb a JOIN cb b
         |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id < b.id)
         |WHERE sim_e6 >= 400000""".stripMargin,

    // the same verified pair set through connected components — the
    // embed store's incrementally-folded labels must land on the
    // min-id component roots exactly as a from-scratch CC does
    "q_embed_clusters" ->
      s"""WITH RECURSIVE $simNeardupCtes,
         |pairs AS (SELECT id_a, id_b FROM (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |    CAST(round(list_cosine_similarity(a.cv, b.cv) * 1000000) AS BIGINT)
         |      AS sim_e6
         |  FROM cb a JOIN cb b
         |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id < b.id)
         |  WHERE sim_e6 >= 400000),
         |$reachCte
         |SELECT node AS id, min(root) AS cluster FROM reach GROUP BY 1"""
        .stripMargin,
    "q_sim_pairs" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(round(list_cosine_similarity(a.v, b.v) * 1000000) AS BIGINT)
        |    AS sim_e6
        |FROM c a, c b WHERE a.vec_id < b.vec_id
        |  AND CAST(round(list_cosine_similarity(a.v, b.v) * 1000000) AS BIGINT)
        |    >= 400000""".stripMargin,
    "q_reservoir" ->
      """WITH r AS (SELECT lang, text, row_number() OVER (
        |    PARTITION BY lang ORDER BY md5(text), text) AS rk
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n, min(md5(text)) AS min_hash
        |FROM r WHERE rk <= 20 GROUP BY 1""".stripMargin,
    // Mirrors centroidOutliers' integer-exact pipeline: quantize to the
    // 1e-6 grid, per-label integer-sum centroid (cosine is scale-
    // invariant so the unnormalized sum IS the centroid), exact integer
    // dot/norms, one float divide at the end — identical in any IEEE
    // engine; rank on the quantized sim with id tie-break.
    "q_embed_outlier" ->
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ev
        |  FROM embeddings),
        |x AS (SELECT vec_id, label, i AS pos,
        |    CAST(round(ev[i] * 1000000) AS BIGINT) AS x
        |  FROM v, LATERAL (SELECT unnest(range(1, len(ev) + 1)) AS i) r),
        |cent AS (SELECT label, pos, sum(x) AS s FROM x GROUP BY 1, 2),
        |pv AS (SELECT x.vec_id, x.label, sum(x.x * c.s) AS dot,
        |    sum(x.x * x.x) AS nv
        |  FROM x JOIN cent c ON x.label = c.label AND x.pos = c.pos
        |  GROUP BY 1, 2),
        |ns AS (SELECT label, sum(CAST(s AS DECIMAL(38,0)) * s) AS ns
        |  FROM cent GROUP BY 1),
        |sim AS (SELECT pv.label, pv.vec_id,
        |    CAST(round(CAST(dot AS DOUBLE) /
        |      (sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST(ns AS DOUBLE)))
        |      * 1000000) AS BIGINT) AS sim_e6
        |  FROM pv JOIN ns USING (label)),
        |r AS (SELECT label, vec_id, sim_e6,
        |    row_number() OVER (PARTITION BY label ORDER BY sim_e6, vec_id)
        |      AS rnk
        |  FROM sim)
        |SELECT label, vec_id, sim_e6, CAST(rnk AS INT) AS rnk
        |FROM r WHERE rnk <= 5""".stripMargin,
    "q_semdedup" ->
      """WITH c AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
        |s AS (SELECT vec_id, cell,
        |  CAST(round(list_cosine_similarity(ev, cv) * 1000000) AS BIGINT) AS sim
        |  FROM v, c),
        |r AS (SELECT vec_id, cell,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        |  FROM s),
        |asg AS (SELECT v.vec_id, r.cell, v.ev
        |  FROM r JOIN v USING (vec_id) WHERE rn = 1),
        |p AS (SELECT b.vec_id AS dup_id, a.cell, a.vec_id AS id_a,
        |    CAST(round(list_cosine_similarity(a.ev, b.ev) * 1000000) AS BIGINT)
        |      AS sim_e6
        |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE CAST(round(list_cosine_similarity(a.ev, b.ev) * 1000000)
        |    AS BIGINT) >= 400000),
        |k AS (SELECT dup_id, cell, id_a, sim_e6,
        |    row_number() OVER (PARTITION BY dup_id ORDER BY id_a) AS rn FROM p)
        |SELECT dup_id, CAST(cell AS INT) AS cell, id_a AS near_id, sim_e6
        |FROM k WHERE rn = 1""".stripMargin,
    "q_kmeans_assign" ->
      """WITH c AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
        |s AS (SELECT vec_id, cell,
        |  CAST(round(list_cosine_similarity(ev, cv) * 1000000) AS BIGINT) AS sim
        |  FROM v, c),
        |r AS (SELECT vec_id, cell,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        |  FROM s)
        |SELECT CAST(cell AS INT) AS cell, CAST(count(*) AS BIGINT) AS n
        |FROM r WHERE rn = 1 GROUP BY 1""".stripMargin,
    "q_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
        |  octet_length(encode(text)) AS len FROM documents
        |  WHERE octet_length(encode(text)) > 0),
        |f AS (SELECT media_id, CAST(i*4 AS INT) AS frame_idx,
        |    substr(text, CAST(i*4*64 + 1 AS INT), 64) AS frame
        |  FROM m, LATERAL (SELECT unnest(range(0,
        |    greatest(len // 64 // 4, 1))) AS i) r)
        |SELECT media_id, frame_idx, md5(frame) AS frame_md5 FROM f""".stripMargin,
    "q_pii_scrub" ->
      """WITH aug AS (SELECT doc_id, text || CASE WHEN doc_id % 7 = 0
        |    THEN ' contact user' || doc_id || '@example.com or +1 555 '
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    ELSE '' END AS t FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS emails,
        |  CAST(len(regexp_extract_all(t, '\+1 555 [0-9]{4}')) AS BIGINT) AS phones,
        |  md5(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\+1 555 [0-9]{4}', '[PHONE]', 'g')) AS redacted_md5
        |FROM aug""".stripMargin,
    "q_repetition" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |m AS (SELECT doc_id, greatest(len(w) - 2, 0) AS total,
        |  len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |    for i in range(1, len(w) - 1)])) AS dist
        |  FROM t)
        |SELECT doc_id, CAST(total AS BIGINT) AS gram_total,
        |  CAST(dist AS BIGINT) AS gram_distinct,
        |  CAST(CASE WHEN total > 0 THEN (total - dist) * 1000 // total
        |       ELSE 0 END AS BIGINT) AS dup_pm
        |FROM m""".stripMargin,
    "q_decontam" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |g AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        |  WHERE len(w) >= 3),
        |bench AS (SELECT DISTINCT doc_id AS bench_id, s FROM g WHERE doc_id % 97 = 0),
        |corp AS (SELECT doc_id, s FROM g WHERE doc_id % 97 != 0)
        |SELECT doc_id, CAST(count(DISTINCT bench_id) AS BIGINT) AS hit_docs,
        |  CAST(count(DISTINCT s) AS BIGINT) AS hit_ngrams
        |FROM corp JOIN bench USING (s) GROUP BY 1""".stripMargin,
    "q_seq_pack" ->
      """WITH t AS (SELECT doc_id,
        |  list_sum(list_transform(string_split_regex(trim(text), '\s+'),
        |    t -> 1 + length(t) // 6)) AS toks FROM documents),
        |c AS (SELECT doc_id, toks,
        |  sum(toks) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks AS start_tok
        |  FROM t)
        |SELECT doc_id, CAST(toks AS BIGINT) AS toks,
        |  CAST(start_tok AS BIGINT) AS start_tok,
        |  CAST(start_tok // 2048 AS BIGINT) AS window_id,
        |  (start_tok + toks - 1) // 2048 != start_tok // 2048 AS spans_boundary
        |FROM c""".stripMargin,
    // Arithmetic oracle for the mixed-modality dispatch: every decoded
    // feature is pure encode-parameter arithmetic (the three per-kind
    // decode oracles' CASE arms composed over doc_id % 3), plus the
    // per-kind null contract and the planted-empty routing
    "q_multimodal" ->
      """SELECT doc_id AS media_id,
        |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |  CASE WHEN doc_id % 10 = 5 THEN 'empty' ELSE 'ok' END AS cause,
        |  CASE WHEN doc_id % 10 = 5 THEN NULL
        |       WHEN doc_id % 3 = 0 THEN 'png'
        |       WHEN doc_id % 3 = 1 THEN 'pcm_signed'
        |       ELSE 'raw' END AS format,
        |  CAST(CASE WHEN doc_id % 10 = 5 OR doc_id % 3 = 1 THEN NULL
        |       WHEN doc_id % 3 = 0 THEN 8 + doc_id % 16
        |       ELSE 4 + doc_id % 13 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 10 = 5 OR doc_id % 3 = 1 THEN NULL
        |       WHEN doc_id % 3 = 0 THEN 8 + (doc_id // 16) % 16
        |       ELSE 2 + (doc_id // 13) % 11 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 10 = 5 THEN NULL
        |       WHEN doc_id % 3 = 0 THEN 1
        |       WHEN doc_id % 3 = 1 THEN 64 + doc_id % 100
        |       ELSE 1 + doc_id % 7 END AS BIGINT) AS n_frames,
        |  CAST(CASE WHEN doc_id % 10 = 5 OR doc_id % 3 != 1 THEN NULL
        |       ELSE 8000 + (doc_id % 8) * 1000 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 10 = 5 OR doc_id % 3 != 1 THEN NULL
        |       ELSE 100 + doc_id % 12000 END AS BIGINT) AS rms,
        |  CAST(CASE WHEN doc_id % 10 = 5 OR doc_id % 3 = 1 THEN NULL
        |       ELSE ((doc_id % 256) + ((doc_id // 3) % 256)
        |             + ((doc_id // 7) % 256)) * 1000 // 3 END AS BIGINT)
        |    AS mean_rgb_milli
        |FROM documents""".stripMargin,
    // Arithmetic oracle for the REAL image decode: PNG is lossless, so a
    // solid-color (r,g,b) w×h image decodes back to exactly those
    // parameters — width/height/mean-luma are pure doc_id arithmetic;
    // the three planted corruption classes route to their causes.
    "q_image_decode" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 20 = 0 THEN 'no_reader'
        |       WHEN doc_id % 10 = 0 THEN 'decode_failed'
        |       WHEN doc_id % 10 = 5 THEN 'empty'
        |       ELSE 'ok' END AS cause,
        |  CASE WHEN doc_id % 10 IN (0, 5) THEN NULL ELSE 'png' END AS format,
        |  CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
        |       ELSE 8 + doc_id % 16 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
        |       ELSE 8 + (doc_id // 16) % 16 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
        |       ELSE ((doc_id % 256) + ((doc_id // 3) % 256)
        |             + ((doc_id // 7) % 256)) * 1000 // 3
        |       END AS BIGINT) AS mean_rgb_milli
        |FROM documents""".stripMargin,
    // Arithmetic oracle for the REAL image resize: fit-within dims are
    // the operator's integer contract ((w,h) pass through iff both fit;
    // else the box edge matching the wider aspect pins, the other
    // floors); solid color makes the resized luma the source luma.
    "q_image_resize" ->
      """WITH f AS (SELECT doc_id,
        |    CAST(8 + doc_id % 16 AS BIGINT) AS w,
        |    CAST(8 + (doc_id // 16) % 16 AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 20 = 0 THEN 'no_reader'
        |       WHEN doc_id % 10 = 0 THEN 'decode_failed'
        |       WHEN doc_id % 10 = 5 THEN 'empty'
        |       ELSE 'ok' END AS cause,
        |  CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN NULL ELSE w END
        |       AS INT) AS src_width,
        |  CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN NULL ELSE h END
        |       AS INT) AS src_height,
        |  CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
        |       WHEN w <= 8 AND h <= 8 THEN w
        |       WHEN w >= h THEN 8
        |       ELSE greatest(1, (w * 8) // h) END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
        |       WHEN w <= 8 AND h <= 8 THEN h
        |       WHEN w >= h THEN greatest(1, (h * 8) // w)
        |       ELSE 8 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
        |       ELSE ((doc_id % 256) + ((doc_id // 3) % 256)
        |             + ((doc_id // 7) % 256)) * 1000 // 3
        |       END AS BIGINT) AS mean_rgb_milli
        |FROM f""".stripMargin,

    // Arithmetic oracle for the image-dHash near-dup gate: the fixture
    // PNG is constructed so its dHash equals the md5-derived pathKey
    // exactly (r=g=b path pixels — luma is the channel value, 9×8 skips
    // the resampler), so the oracle rebuilds the key with hex48
    // arithmetic and replicates the banded blocking (4×16-bit chunks,
    // pigeonhole-exact for hamming ≤ 3) and the bit_count verification
    "q_image_neardup" ->
      s"""WITH RECURSIVE $imageKeyCtes
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(da.dh, db.dh)) AS BIGINT) AS hamming
        |FROM cand JOIN k da ON id_a = da.doc_id
        |  JOIN k db ON id_b = db.doc_id
        |WHERE bit_count(xor(da.dh, db.dh)) <= 3""".stripMargin,

    // the mixed-modality store-safety gate: the same key arithmetic
    // with the fixture's kind assignment joined into the chunk
    // blocking — pairs exist only within a modality, so the planted
    // cross-kind ≤3-Hamming relations (m 0↔2 at 3, 1↔2 at 2) are
    // ABSENT and the one in-kind relation (m 0↔1 at 1) survives
    "q_media_store_mixed" ->
      s"""WITH RECURSIVE $mixedKindCtes
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(da.dh, db.dh)) AS BIGINT) AS hamming,
        |  cand.kind AS kind
        |FROM cand JOIN k da ON id_a = da.doc_id
        |  JOIN k db ON id_b = db.doc_id
        |WHERE bit_count(xor(da.dh, db.dh)) <= 3""".stripMargin,

    // the same verified pair set through connected components — one
    // cluster per planted 0/1/3-hamming group
    "q_image_clusters" ->
      s"""WITH RECURSIVE $imageKeyCtes,
        |pairs AS (SELECT id_a, id_b
        |  FROM cand JOIN k da ON id_a = da.doc_id
        |    JOIN k db ON id_b = db.doc_id
        |  WHERE bit_count(xor(da.dh, db.dh)) <= 3),
        |$reachCte
        |SELECT node AS id, min(root) AS cluster FROM reach GROUP BY 1"""
        .stripMargin,

    // Arithmetic oracle for the video-clip near-dup gate: the fixture
    // clip's strict-majority fingerprint equals the pathKey exactly
    // (2-of-3 frames carry it; the divergent middle frame loses every
    // vote), so the oracle is the image gate's key arithmetic + banded
    // blocking + bit_count verification over the clip-filtered corpus
    "q_video_neardup" ->
      s"""WITH RECURSIVE $videoKeyCtes
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(da.dh, db.dh)) AS BIGINT) AS hamming
        |FROM cand JOIN k da ON id_a = da.doc_id
        |  JOIN k db ON id_b = db.doc_id
        |WHERE bit_count(xor(da.dh, db.dh)) <= 3""".stripMargin,

    // Arithmetic oracle for the cross-modal frame↔image match: image
    // keys from the shared arithmetic, video frames rebuilt per rep doc
    // (outer frames = the key, middle frame xor'd with the 32-bit
    // 0x5555… interstitial mask), chunk blocking replicated on BOTH
    // sides, bit_count verification
    "q_frame_image_match" ->
      s"""WITH RECURSIVE $imageKeyCtes,
        |vf AS (SELECT doc_id AS video_id, CAST(i AS BIGINT) AS frame_idx,
        |    CASE WHEN i = 1 THEN xor(dh, 6148914691236517205)
        |      ELSE dh END AS fh
        |  FROM k, LATERAL (SELECT unnest(range(0, 3)) AS i) r
        |  WHERE doc_id % 4 = 0),
        |vc AS (SELECT video_id, frame_idx, fh, i AS chunk,
        |    (fh >> CAST(i * 16 AS INT)) & 65535 AS cv
        |  FROM vf, LATERAL (SELECT unnest(range(0, 4)) AS i) r),
        |mc AS (SELECT DISTINCT c.doc_id AS image_id, vc.video_id,
        |    vc.frame_idx, c.dh, vc.fh
        |  FROM c JOIN vc ON c.chunk = vc.chunk AND c.cv = vc.cv)
        |SELECT image_id, video_id, frame_idx,
        |  CAST(bit_count(xor(dh, fh)) AS BIGINT) AS hamming
        |FROM mc WHERE bit_count(xor(dh, fh)) <= 3""".stripMargin,

    // Arithmetic oracle for sub-clip alignment: frame keys rebuilt with
    // hex48 arithmetic (even docs frames 0..3, odd docs frames 1..2 of
    // the same gid), equality matches across distinct docs, per-
    // diagonal counts, argmax with the (count DESC, offset ASC) tie
    // rule, containment in permille of a's frame count
    "q_clip_align" -> {
      val fk = hex48("'f' || CAST(i AS VARCHAR) || '_' || " +
        "CAST(gid AS VARCHAR)")
      s"""WITH d2 AS (SELECT doc_id, doc_id // 2 AS gid, doc_id % 2 AS par
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |      CAST($fk AS BIGINT) AS fh
        |    FROM d2, LATERAL (SELECT unnest(range(0, 4)) AS i) r
        |    WHERE par = 0
        |  UNION ALL
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS frame_idx,
        |      CAST($fk AS BIGINT) AS fh
        |    FROM d2, LATERAL (SELECT unnest(range(1, 3)) AS i) r
        |    WHERE par = 1),
        |m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    b.frame_idx - a.frame_idx AS diag
        |  FROM fr a JOIN fr b ON a.fh = b.fh AND a.doc_id != b.doc_id),
        |byd AS (SELECT id_a, id_b, diag, CAST(count(*) AS BIGINT) AS cnt
        |  FROM m GROUP BY 1, 2, 3),
        |best AS (SELECT id_a, id_b, diag, cnt, row_number() OVER (
        |    PARTITION BY id_a, id_b ORDER BY cnt DESC, diag ASC) AS rn
        |  FROM byd),
        |na AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS frames_a
        |  FROM fr GROUP BY 1)
        |SELECT id_a, id_b, frames_a, cnt AS aligned, diag AS offset,
        |  cnt * 1000 // frames_a AS containment_pm
        |FROM best JOIN na ON id_a = doc_id WHERE rn = 1""".stripMargin
    },

    // The clip-align chain extended into the purge decision: the same
    // key/diagonal/argmax arithmetic, then the ≥800‰ containment edge
    // set, CC via the shared reach CTE, and the keeper rule (max frame
    // count, ties → smallest id) — survivors are everything minus the
    // clusters' non-keepers
    "q_clip_purge" -> {
      val fk = hex48("'f' || CAST(i AS VARCHAR) || '_' || " +
        "CAST(gid AS VARCHAR)")
      s"""WITH RECURSIVE d2 AS (SELECT doc_id, doc_id // 2 AS gid,
        |    doc_id % 2 AS par
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |      CAST($fk AS BIGINT) AS fh
        |    FROM d2, LATERAL (SELECT unnest(range(0, 4)) AS i) r
        |    WHERE par = 0
        |  UNION ALL
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS frame_idx,
        |      CAST($fk AS BIGINT) AS fh
        |    FROM d2, LATERAL (SELECT unnest(range(1, 3)) AS i) r
        |    WHERE par = 1),
        |m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    b.frame_idx - a.frame_idx AS diag
        |  FROM fr a JOIN fr b ON a.fh = b.fh AND a.doc_id != b.doc_id),
        |byd AS (SELECT id_a, id_b, diag, CAST(count(*) AS BIGINT) AS cnt
        |  FROM m GROUP BY 1, 2, 3),
        |best AS (SELECT id_a, id_b, diag, cnt, row_number() OVER (
        |    PARTITION BY id_a, id_b ORDER BY cnt DESC, diag ASC) AS rn
        |  FROM byd),
        |na AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS frames_a
        |  FROM fr GROUP BY 1),
        |pairs AS (SELECT DISTINCT least(id_a, id_b) AS id_a,
        |    greatest(id_a, id_b) AS id_b
        |  FROM best JOIN na ON best.id_a = na.doc_id
        |  WHERE rn = 1 AND cnt * 1000 // frames_a >= 800),
        |$reachCte,
        |memb AS (SELECT node AS id, min(root) AS cluster
        |  FROM reach GROUP BY 1),
        |rk AS (SELECT id, row_number() OVER (PARTITION BY cluster
        |    ORDER BY q DESC, id ASC) AS krn
        |  FROM memb JOIN (SELECT doc_id AS id, frames_a AS q FROM na) nq
        |    USING (id))
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM rk WHERE krn > 1)"""
        .stripMargin
    },

    // Arithmetic oracle for shot boundaries: the planted cut structure
    // is fully determined — frames [k, k, k^m24, k] yield boundaries at
    // indices 2 and 3 with delta bit_count(m24) = 24, single-shot and
    // empty docs yield nothing
    "q_video_scenes" ->
      """SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx,
        |  CAST(24 AS BIGINT) AS hamming_delta
        |FROM documents, LATERAL (SELECT unnest([2, 3]) AS i) r
        |WHERE doc_id % 97 != 0 AND doc_id % 7 != 0""".stripMargin,

    // Arithmetic oracle for keyframe extraction: every clip's shot
    // structure is planted (frame 0 always; cuts at 2 and 3 except
    // single-shot %7 docs), and 9×8 frames pass the fit-within resize
    // through unchanged
    "q_video_keyframes" ->
      """SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx,
        |  CAST(9 AS INT) AS width, CAST(8 AS INT) AS height
        |FROM documents, LATERAL (SELECT unnest(
        |    CASE WHEN doc_id % 7 = 0 THEN [0] ELSE [0, 2, 3] END) AS i) r
        |WHERE doc_id % 97 != 0""".stripMargin,

    // Arithmetic oracle for acoustic cuts: the planted structure is
    // fully determined — segments [k, k^m24, k, k] cut at 1 and 2 with
    // delta 24; single-tone and empty docs yield nothing
    "q_audio_scenes" ->
      """SELECT doc_id AS media_id, CAST(i AS INT) AS seg_idx,
        |  CAST(24 AS BIGINT) AS hamming_delta
        |FROM documents, LATERAL (SELECT unnest([1, 2]) AS i) r
        |WHERE doc_id % 97 != 0 AND doc_id % 7 != 0""".stripMargin,

    // Arithmetic oracle for the joint A/V fingerprint: the video key is
    // the shared pathKey arithmetic, the audio key its own md5 slice —
    // both recovered from ONE container by the engine
    "q_av_fingerprint" ->
      s"""WITH RECURSIVE $imageKeyCtes
        |SELECT doc_id AS media_id, dh AS clip_dhash,
        |  CAST((${hex48("'av0_' || CAST(doc_id AS VARCHAR)")})
        |    AS BIGINT) AS audio_dhash
        |FROM k""".stripMargin,

    // Arithmetic oracle for audio demux: the reassembled track's
    // envelope hash is the shared pathKey arithmetic; rate/channels/
    // frames are the fixed fixture parameters (one 260-frame segment)
    "q_demux_audio" ->
      s"""WITH RECURSIVE $demuxKeyCtes
        |SELECT doc_id AS media_id, CAST(8000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels, CAST(260 AS BIGINT) AS n_frames,
        |  dh AS dhash
        |FROM k""".stripMargin,

    // Arithmetic oracle for sub-recording alignment: per-segment keys
    // rebuilt with hex48 (even docs 4 segments — 3 when % 89 cuts the
    // fourth — odd docs segments 1..2), then the q_clip_align diagonal/
    // argmax arithmetic verbatim
    "q_audio_align" -> {
      val sk = hex48("'a' || CAST(i AS VARCHAR) || '_' || " +
        "CAST(gid AS VARCHAR)")
      s"""WITH d2 AS (SELECT doc_id, doc_id // 2 AS gid, doc_id % 2 AS par
        |  FROM documents WHERE doc_id % 97 != 0),
        |fr AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |      CAST($sk AS BIGINT) AS fh
        |    FROM d2, LATERAL (SELECT unnest(range(0, 4)) AS i) r
        |    WHERE par = 0 AND (doc_id % 89 != 0 OR i < 3)
        |  UNION ALL
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS frame_idx,
        |      CAST($sk AS BIGINT) AS fh
        |    FROM d2, LATERAL (SELECT unnest(range(1, 3)) AS i) r
        |    WHERE par = 1),
        |m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    b.frame_idx - a.frame_idx AS diag
        |  FROM fr a JOIN fr b ON a.fh = b.fh AND a.doc_id != b.doc_id),
        |byd AS (SELECT id_a, id_b, diag, CAST(count(*) AS BIGINT) AS cnt
        |  FROM m GROUP BY 1, 2, 3),
        |best AS (SELECT id_a, id_b, diag, cnt, row_number() OVER (
        |    PARTITION BY id_a, id_b ORDER BY cnt DESC, diag ASC) AS rn
        |  FROM byd),
        |na AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS frames_a
        |  FROM fr GROUP BY 1)
        |SELECT id_a, id_b, frames_a, cnt AS aligned, diag AS offset,
        |  cnt * 1000 // frames_a AS containment_pm
        |FROM best JOIN na ON id_a = doc_id WHERE rn = 1""".stripMargin
    },

    // Arithmetic oracle for the audio-clip near-dup gate: the stepped
    // envelope makes the energy difference hash equal the pathKey for
    // ANY uniform gain, so the oracle is the shared key arithmetic +
    // banded blocking + bit_count verification over the audio-filtered
    // corpus
    "q_audio_neardup" ->
      s"""WITH RECURSIVE $audioKeyCtes
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(da.dh, db.dh)) AS BIGINT) AS hamming
        |FROM cand JOIN k da ON id_a = da.doc_id
        |  JOIN k db ON id_b = db.doc_id
        |WHERE bit_count(xor(da.dh, db.dh)) <= 3""".stripMargin,

    // Arithmetic oracle for the REAL audio decode: WAV is lossless PCM,
    // so a constant-amplitude a clip decodes back to rms = peak = |a|
    // exactly; rate/channels/bits/frames are the encode parameters; the
    // planted truncation leaves exactly (50 − 44-byte header) / 2 = 3
    // readable frames of the 64 the header declares.
    "q_audio_decode" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 20 = 0 THEN 'no_reader'
        |       WHEN doc_id % 10 = 0 THEN 'truncated'
        |       WHEN doc_id % 10 = 5 THEN 'empty'
        |       ELSE 'ok' END AS cause,
        |  CASE WHEN doc_id % 20 = 0 OR doc_id % 10 = 5 THEN NULL
        |       ELSE 'pcm_signed' END AS format,
        |  CAST(CASE WHEN doc_id % 20 = 0 OR doc_id % 10 = 5 THEN NULL
        |       WHEN doc_id % 10 = 0 THEN 8000
        |       ELSE 8000 + (doc_id % 8) * 1000 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 20 = 0 OR doc_id % 10 = 5 THEN NULL
        |       ELSE 1 END AS INT) AS channels,
        |  CAST(CASE WHEN doc_id % 20 = 0 OR doc_id % 10 = 5 THEN NULL
        |       ELSE 16 END AS INT) AS bits,
        |  CAST(CASE WHEN doc_id % 20 = 0 OR doc_id % 10 = 5 THEN NULL
        |       WHEN doc_id % 10 = 0 THEN 3
        |       ELSE 64 + doc_id % 100 END AS BIGINT) AS n_frames,
        |  CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
        |       ELSE 100 + doc_id % 12000 END AS BIGINT) AS rms,
        |  CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
        |       ELSE 100 + doc_id % 12000 END AS BIGINT) AS peak
        |FROM documents""".stripMargin,
    // Arithmetic oracle for the REAL video decode: BI_RGB AVI frames are
    // lossless, so every decoded feature is pure encode-parameter
    // arithmetic. The truncation fixture (4×2, 4 frames @10fps, cut at
    // byte 264) leaves exactly 1 complete frame chunk; duration_ms uses
    // the avih integer µs-per-frame (1000000 // fps), matching the
    // decoder's header math.
    "q_video_decode" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 20 = 0 THEN 'no_reader'
        |       WHEN doc_id % 10 = 0 THEN 'truncated'
        |       WHEN doc_id % 10 = 5 THEN 'empty'
        |       WHEN doc_id % 10 = 3 THEN 'unsupported_codec'
        |       ELSE 'ok' END AS cause,
        |  CASE WHEN doc_id % 20 = 0 OR doc_id % 10 = 5 THEN NULL
        |       WHEN doc_id % 10 = 3 THEN 'xvid'
        |       ELSE 'raw' END AS codec,
        |  CAST(CASE WHEN doc_id % 20 = 0 OR doc_id % 10 = 5 THEN NULL
        |       WHEN doc_id % 10 = 0 THEN 4
        |       WHEN doc_id % 10 = 3 THEN 6
        |       ELSE 4 + doc_id % 13 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 20 = 0 OR doc_id % 10 = 5 THEN NULL
        |       WHEN doc_id % 10 = 0 THEN 2
        |       WHEN doc_id % 10 = 3 THEN 4
        |       ELSE 2 + (doc_id // 13) % 11 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 10 = 0 AND doc_id % 20 != 0 THEN 1
        |       WHEN doc_id % 20 = 0 OR doc_id % 10 IN (3, 5) THEN NULL
        |       ELSE 1 + doc_id % 7 END AS BIGINT) AS n_frames,
        |  CAST(CASE WHEN doc_id % 20 = 0 OR doc_id % 10 = 5 THEN NULL
        |       WHEN doc_id % 10 = 0 THEN 4
        |       WHEN doc_id % 10 = 3 THEN 2
        |       ELSE 1 + doc_id % 7 END AS BIGINT) AS declared_frames,
        |  CAST(CASE WHEN doc_id % 20 = 0 OR doc_id % 10 = 5 THEN NULL
        |       WHEN doc_id % 10 = 0 THEN 10000
        |       WHEN doc_id % 10 = 3 THEN 8000
        |       ELSE (5 + doc_id % 25) * 1000 END AS BIGINT) AS fps_milli,
        |  CAST(CASE WHEN doc_id % 20 = 0 OR doc_id % 10 = 5 THEN NULL
        |       WHEN doc_id % 10 = 0 THEN 400
        |       WHEN doc_id % 10 = 3 THEN 250
        |       ELSE (1 + doc_id % 7) * (1000000 // (5 + doc_id % 25)) // 1000
        |       END AS BIGINT) AS duration_ms,
        |  CAST(CASE WHEN doc_id % 20 = 0 OR doc_id % 10 IN (0, 3, 5) THEN NULL
        |       ELSE 1 + doc_id % 7 END AS INT) AS sampled_frames,
        |  CAST(CASE WHEN doc_id % 20 = 0 OR doc_id % 10 IN (0, 3, 5) THEN NULL
        |       ELSE ((doc_id % 256) + ((doc_id // 3) % 256)
        |             + ((doc_id // 7) % 256)) * 1000 // 3
        |       END AS BIGINT) AS mean_rgb_milli
        |FROM documents""".stripMargin,
    "q_rare_trigram" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
        |tri AS (SELECT doc_id,
        |    unnest([substr(t, i, 3)
        |            for i in range(1, greatest(length(t) - 2, 0) + 1)]) AS g
        |  FROM d),
        |cnt AS (SELECT g, count(*) AS c FROM tri GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS total_tris,
        |  CAST(sum(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS rare_tris,
        |  CAST(sum(CASE WHEN c <= 2 THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS rare_ppm
        |FROM tri JOIN cnt USING (g)
        |GROUP BY 1""".stripMargin,
    "q_weighted_sample" ->
      """WITH d AS (SELECT doc_id,
        |    least(1000000, CAST(list_sum(list_transform(
        |      string_split_regex(trim(text), '\s+'),
        |      t -> 1 + length(t) // 6)) AS BIGINT) * 2000) AS weight_ppm,
        |    md5(CAST(doc_id AS VARCHAR) || 'e1') AS h
        |  FROM documents),
        |v AS (SELECT doc_id, weight_ppm,
        |    CAST((strpos('0123456789abcdef', substr(h,1,1))-1)*1048576
        |      + (strpos('0123456789abcdef', substr(h,2,1))-1)*65536
        |      + (strpos('0123456789abcdef', substr(h,3,1))-1)*4096
        |      + (strpos('0123456789abcdef', substr(h,4,1))-1)*256
        |      + (strpos('0123456789abcdef', substr(h,5,1))-1)*16
        |      + (strpos('0123456789abcdef', substr(h,6,1))-1) AS BIGINT) AS hv
        |  FROM d)
        |SELECT doc_id, weight_ppm FROM v
        |WHERE hv * 1000000 < weight_ppm * 16777216""".stripMargin,
    "q_dup_rate" ->
      """WITH c AS (SELECT source, doc_id, sha256(text) AS ch FROM documents),
        |k AS (SELECT ch, min(doc_id) AS keeper FROM c GROUP BY 1)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dups,
        |  CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS dup_ppm
        |FROM c JOIN k USING (ch)
        |GROUP BY 1""".stripMargin
  )
}
