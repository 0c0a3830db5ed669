package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** One LSH band-bucket occupancy row: the composite band key
  * ("<band>:<md5-of-row-values>") and the doc id carrying it. */
final case class BandHit(bkey: String, doc_id: Long)

/** Per-bucket verdict for one doc in one micro-batch: `matched` =
  * a strictly-lower id (this batch or any earlier one) occupies the
  * bucket. */
final case class BandFlag(doc_id: Long, matched: Boolean)

/** A near-dup survivor. */
final case class Survivor(doc_id: Long)

/** Per-doc audit verdict: emitted once in the doc's first-seen
  * batch, kept = survived near-dedup. */
final case class Verdict(doc_id: Long, kept: Boolean)

/** LLM-extension: cross-batch streaming NEAR-deduplication.
  *
  * [[IncrementalDedup]] suppresses byte-duplicates across
  * micro-batches; a continuously ingesting corpus also re-crawls
  * *near*-duplicates — boilerplate rewraps, timestamp-patched
  * mirrors — that no exact fingerprint catches. The batch answer is
  * MinHash/LSH ([[graft.text.DedupOps.minhashCandidatePairs]]); the
  * streaming answer keyed the same way: a doc is dropped iff ANY of
  * its LSH band keys is already occupied by a lower-id doc — the
  * pay-as-you-go form of the batch band join, with the bucket
  * occupancy living in the checkpointed state store.
  *
  * Two chained `flatMapGroupsWithState` stages, both Append (Spark
  * permits multiple flatMapGroupsWithStates when all are in append
  * mode — `UnsupportedOperationChecker` only rejects mixed modes):
  *
  *  1. keyed by band key ([[bucketClaim]]): state = smallest doc id
  *     ever seen in the bucket; each doc row gets a per-bucket
  *     `matched` verdict (id strictly above the running min).
  *  2. keyed by doc id ([[docEmit]]): a doc survives iff NO bucket
  *     matched; state = one marker per *emitted* doc so a
  *     byte-identical re-send (same id — all its buckets report
  *     unmatched, because it IS their min) emits nothing. Dropped
  *     docs need no marker: whatever bucket out-ranked them is
  *     persisted in stage-1 state and out-ranks them again on every
  *     re-send.
  *
  * Determinism contract (mirrors [[IncrementalDedup]] and makes the
  * operator oracle-checkable): ingestion ids are nondecreasing
  * across batches, so "first ingested wins" equals "smallest id
  * wins" and the drained result equals the global batch semantics —
  * survivor set = docs sharing no band with any lower-id doc — which
  * is plain SQL over the banded table. Within a batch the smallest
  * id claims the bucket (not a partition race).
  *
  * Scale: stage-1 state is ONE long per distinct band bucket —
  * bounded by bands x distinct-signature docs but typically far
  * smaller (that is the LSH point: near-dup families collapse to
  * shared buckets). Stage-2 state is one marker per survivor.
  * Compare exact dedup's one marker per distinct fingerprint: the
  * near-dup store is `bands` rows per *distinct* doc vs one row per
  * doc, so at a 4-band setting and a realistic 30-50% dup rate the
  * two stores are the same order of magnitude — and the same
  * 100 TB arithmetic applies: ~100 B/key in UnsafeRow terms, so a
  * 2.5e10-doc corpus wants the RocksDB provider (off-heap SST per
  * partition), selected via `stateStoreProvider` exactly as in
  * [[IncrementalDedup.dedupRun]].
  *
  * Reference semantics: MinHash banding per Broder 1997 / Leskovec
  * MMDS ch.3, identical family and band construction to the batch
  * operator (`DedupOps.minhashCandidatePairs`) so batch and stream
  * agree bucket-for-bucket.
  */
object IncrementalNearDup {

  /** Stage 1 — pure per-group transition (unit-testable): update the
    * bucket's running min id, flag every doc of the batch that sits
    * strictly above it.
    *
    * The batch group buffers its ids (one long each) because every
    * row's verdict depends on the batch min — a lazy single-pass
    * emit would make verdicts iteration-order-dependent. The buffer
    * is bounded by the bucket's row count WITHIN ONE TRIGGER, so a
    * viral bucket (boilerplate near-dup family) is capped by the
    * trigger size, not the corpus: size triggers via
    * `maxFilesPerTrigger` ([[nearDedupRun]]'s `maxFilesPerTrigger`)
    * on backfills. */
  def bucketClaim(bkey: String, rows: Iterator[BandHit],
      state: GroupState[Long]): Iterator[BandFlag] = {
    val ids = rows.map(_.doc_id).toArray
    var effMin = state.getOption.getOrElse(Long.MaxValue)
    var i = 0
    while (i < ids.length) { if (ids(i) < effMin) effMin = ids(i); i += 1 }
    state.update(effMin)
    val m = effMin
    ids.iterator.map(id => BandFlag(id, id > m))
  }

  /** Stage 2 — pure per-group transition: emit the doc once iff no
    * bucket matched and it was never emitted before. */
  def docEmit(id: Long, flags: Iterator[BandFlag],
      state: GroupState[Boolean]): Iterator[Survivor] =
    if (state.exists || flags.exists(_.matched)) Iterator.empty
    else { state.update(true); Iterator.single(Survivor(id)) }

  /** Stage 2, audit form — pure per-group transition: every doc gets
    * ONE verdict row in its first-seen batch (kept = no bucket
    * matched); re-sends emit nothing. Unlike [[docEmit]], dropped
    * docs are visible — the per-doc marker therefore covers EVERY
    * seen doc, so audit state is exact-dedup-sized (one marker per
    * distinct doc) on top of the bucket store. */
  def docVerdict(id: Long, flags: Iterator[BandFlag],
      state: GroupState[Boolean]): Iterator[Verdict] =
    if (state.exists) Iterator.empty
    else {
      state.update(true)
      Iterator.single(Verdict(id, !flags.exists(_.matched)))
    }

  private def flagged(bands: Dataset[BandHit]): Dataset[BandFlag] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(_.bkey)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (k: String, it: Iterator[BandHit], st: GroupState[Long]) =>
          bucketClaim(k, it, st))
  }

  /** Survivors of a (possibly streaming) banded dataset. */
  def nearDedup(bands: Dataset[BandHit]): Dataset[Survivor] = {
    import bands.sparkSession.implicits._
    flagged(bands).groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (id: Long, it: Iterator[BandFlag], st: GroupState[Boolean]) =>
          docEmit(id, it, st))
  }

  /** Audit stream: one (doc_id, kept) verdict per doc, dropped docs
    * included — the streaming counterpart of the batch keep-flag
    * convention ([[graft.text.DedupOps.fuzzyDedupDocs]]). */
  def nearDedupAudit(bands: Dataset[BandHit]): Dataset[Verdict] = {
    import bands.sparkSession.implicits._
    flagged(bands).groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (id: Long, it: Iterator[BandFlag], st: GroupState[Boolean]) =>
          docVerdict(id, it, st))
  }

  /** Band-key rows of a document frame — the [[graft.text.DedupOps]]
    * banding verbatim (fused [[graft.functions.MinhashKernel]]
    * signature in the scan projection; `bands x rows` hashes; band
    * key = md5 of the comma-joined row values, prefixed with the
    * band index), so stream buckets equal batch buckets and the
    * DuckDB oracle construction carries over unchanged. Tokenless
    * docs yield no rows (null signature), matching the batch
    * operator's absence semantics. */
  def bandHits(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int, bands: Int, rows: Int): Dataset[BandHit] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).as("doc_id"),
        graft.text.TextOps.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 1)
      .select(col("doc_id"),
        graft.functions.MinhashKernel.signature(col("__tk"), k, bands * rows)
          .as("__sig"))
      .select(col("doc_id"), explode(array(
        (0 until bands).map { b =>
          concat_ws(":", lit(b),
            md5(concat_ws(",", (0 until rows).map(r =>
              col("__sig").getItem(b * rows + r).cast("string")): _*)))
        }: _*)).as("bkey"))
      .select(col("bkey"), col("doc_id")).as[BandHit]
  }

  /** Band-key rows of an IMAGE frame (VERDICT r19 ask #4 — the
    * crawl-time image analogue of [[bandHits]]): dHash-64 over the
    * REAL decoder ([[graft.multimodal.MediaDedup.withDhash]] — one
    * decode per row, payload bytes never shuffled; only the 8-byte
    * signature leaves the scan), then the SAME 4×16-bit rotated-word
    * band scheme the batch pair stage uses
    * ([[graft.multimodal.MediaDedup.nearDupPairs]], Manku WWW'07):
    * bkey = "<band>:<16-bit word>". A pair within Hamming radius ≤ 3
    * agrees exactly on ≥ 1 word (pigeonhole), so bucket occupancy in
    * the state store suppresses re-crawled re-encodes, uniform
    * resizes and unclamped brightness remasters across batches
    * exactly as the text tier does — stream buckets equal batch
    * bands, so the DuckDB oracle restatement carries over.
    * Undecodable images yield no rows (the batch pair stage's
    * null-filter absence semantics); count them upstream via the
    * hash-null rate if the crawl needs its decode-failure rate.
    * State arithmetic: 4 buckets × one long per DISTINCT signature —
    * a billion distinct images ≈ tens of GB across the RocksDB
    * provider's partitioned SSTs, and dup-heavy crawls (the point of
    * the operator) collapse far below that. */
  def imageBandHits(df: org.apache.spark.sql.DataFrame, idCol: String,
      payloadCol: String): Dataset[BandHit] =
    hash64BandHits(graft.multimodal.MediaDedup.withDhash(
      df.select(col(idCol).as("doc_id"), col(payloadCol).as("payload"))),
      "dhash")

  /** Band-key rows of an AUDIO frame — [[imageBandHits]] with the
    * [[graft.multimodal.MediaDedup.audioHash64]] energy-gradient
    * fingerprint in place of dHash: the amplitude-scaling invariance
    * (|k·s| cancels in the cross-multiplication, spec-pinned) means
    * a re-crawled loudness remaster lands in its original's buckets
    * and drops, the audio analogue of the image re-encode class.
    * Same 4×16-bit band scheme as the batch pair stage (q157), same
    * absence semantics for undecodable/short payloads. */
  def audioBandHits(df: org.apache.spark.sql.DataFrame, idCol: String,
      payloadCol: String): Dataset[BandHit] =
    hash64BandHits(graft.multimodal.MediaDedup.withAudioHash(
      df.select(col(idCol).as("doc_id"), col(payloadCol).as("payload"))),
      "audio_hash")

  /** The 4×16-bit rotated-word band explosion over any 64-bit
    * perceptual hash column — ONE definition for the image and audio
    * streaming tiers, matching the batch pair stage's band scheme
    * ([[graft.multimodal.MediaDedup.nearDupPairs]]) so stream
    * buckets equal batch bands. Null hashes yield no rows. */
  private def hash64BandHits(hashed: org.apache.spark.sql.DataFrame,
      hashCol: String): Dataset[BandHit] = {
    import hashed.sparkSession.implicits._
    hashed
      .filter(col(hashCol).isNotNull)
      .select(col("doc_id"), explode(array((0 until 4).map(b =>
        concat_ws(":", lit(b),
          shiftrightunsigned(col(hashCol), b * 16)
            .bitwiseAND(lit(0xFFFFL)).cast("string"))): _*)).as("bkey"))
      .select(col("bkey"), col("doc_id")).as[BandHit]
  }

  /** Cron-style run over an IMAGE corpus: drain new parquet files
    * (schema: doc_id, payload binary, ...) from `inDir`, append
    * newly-seen near-dup survivors to `outDir` — [[nearDedupRun]]
    * with [[imageBandHits]] in place of the MinHash banding; state
    * semantics, precedence contract and backends are identical. */
  def imageNearDedupRun(spark: SparkSession, inDir: String,
      outDir: String, checkpoint: String,
      schema: org.apache.spark.sql.types.StructType,
      stateStoreProvider: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None,
      audit: Boolean = false): Unit =
    runDrain(spark, inDir, outDir, checkpoint, schema,
      stateStoreProvider, maxFilesPerTrigger, audit,
      in => imageBandHits(in, "doc_id", "payload"))

  /** Cron-style run over an AUDIO corpus — [[imageNearDedupRun]]
    * with [[audioBandHits]]; drain skeleton, state semantics and
    * backends identical. */
  def audioNearDedupRun(spark: SparkSession, inDir: String,
      outDir: String, checkpoint: String,
      schema: org.apache.spark.sql.types.StructType,
      stateStoreProvider: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None,
      audit: Boolean = false): Unit =
    runDrain(spark, inDir, outDir, checkpoint, schema,
      stateStoreProvider, maxFilesPerTrigger, audit,
      in => audioBandHits(in, "doc_id", "payload"))

  /** Cron-style run: drain new parquet document files from `inDir`
    * (schema: doc_id, text, ...), append newly-seen near-dup
    * survivors (doc_id) to `outDir`. Bucket occupancy and the
    * emitted-set live in the checkpoint and carry across runs.
    * `stateStoreProvider` selects the state backend for a NEW
    * checkpoint (pinned into the checkpoint at first start), as in
    * [[IncrementalDedup.dedupRun]]. */
  def nearDedupRun(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String, schema: org.apache.spark.sql.types.StructType,
      k: Int = 3, bands: Int = 4, rows: Int = 2,
      stateStoreProvider: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None,
      audit: Boolean = false): Unit =
    runDrain(spark, inDir, outDir, checkpoint, schema,
      stateStoreProvider, maxFilesPerTrigger, audit,
      in => bandHits(in, "doc_id", "text", k, bands, rows))

  /** Shared drain skeleton for the text and image runners: the
    * banding is the ONLY modality-specific stage — bucket claim,
    * doc emit/verdict, trigger and state semantics are one code
    * path. */
  private def runDrain(spark: SparkSession, inDir: String,
      outDir: String, checkpoint: String,
      schema: org.apache.spark.sql.types.StructType,
      stateStoreProvider: Option[String],
      maxFilesPerTrigger: Option[Int], audit: Boolean,
      banding: org.apache.spark.sql.DataFrame => Dataset[BandHit])
      : Unit = {
    val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(ProviderConf)
    stateStoreProvider.foreach(spark.conf.set(ProviderConf, _))
    try {
      // AvailableNow honors maxFilesPerTrigger by draining the
      // backlog as a SEQUENCE of bounded triggers — the knob that
      // keeps per-trigger state-update groups (and shuffle blocks)
      // memory-sized on a backfill. The file source feeds triggers
      // in modification-time order, so the ids-nondecreasing
      // precedence contract holds per-trigger exactly when files
      // land in ingestion order (true for append-style producers).
      val reader = spark.readStream.schema(schema)
      maxFilesPerTrigger.foreach(n =>
        reader.option("maxFilesPerTrigger", n))
      val in = reader.parquet(inDir)
      val hits = banding(in)
      val outDs: org.apache.spark.sql.DataFrame =
        if (audit) nearDedupAudit(hits).toDF() else nearDedup(hits).toDF()
      val q = outDs
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally if (stateStoreProvider.isDefined) {
      saved match {
        case Some(v) => spark.conf.set(ProviderConf, v)
        case None    => spark.conf.unset(ProviderConf)
      }
    }
  }
}
