package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** A fingerprinted document reference flowing through the dedup
  * stream: the 128-bit content fingerprint and the doc's id. */
final case class FpDoc(fp: String, doc_id: Long)

/** §2.9 + LLM-extension: cross-batch streaming exact deduplication.
  *
  * Batch exact dedup ([[graft.text.DedupOps.exactDupGroups]]) answers
  * "which docs duplicate each other IN THIS FRAME"; a continuously
  * ingesting corpus needs "is this doc new relative to EVERYTHING
  * ever ingested" — across micro-batches and across cron-style runs.
  * That is keyed state over the content fingerprint:
  * `flatMapGroupsWithState` carries one marker per distinct
  * fingerprint in the checkpointed state store, so a re-crawled or
  * re-shipped document is suppressed even when its duplicate arrived
  * in a previous run (`Trigger.AvailableNow` + restart).
  *
  * Within a batch the emitted survivor is DETERMINISTIC: the
  * smallest doc id of the fingerprint's first-ever batch — not
  * "whichever partition won the race", which is what streaming
  * `dropDuplicates` gives. Determinism is what makes the operator
  * oracle-checkable and re-runs byte-identical.
  *
  * Scale: state is one empty-payload key per distinct fingerprint —
  * the irreducible cost of EXACT streaming dedup (a TTL would
  * re-admit old duplicates; near-dup variants belong to the batch
  * LSH operators). State-size arithmetic: a key is the 32-hex-char
  * fingerprint (32 B payload in UnsafeRow, ~60 B with row overhead;
  * the Boolean value adds ~20 B) — call it ~100 B/key in the store.
  * 100 TB of ~4 KB docs ≈ 2.5e10 distinct fingerprints ≈ 2.5 TB of
  * raw state: far beyond the default HDFSBackedStateStoreProvider,
  * which keeps EVERY key of a partition's version map on-heap.
  * That is exactly the workload the RocksDB backend exists for
  * (state lives off-heap/on-disk per partition with block-cache
  * reads, changelog checkpointing ships deltas): at 512 shuffle
  * partitions, ~5 GB of SST files per partition — routine for
  * RocksDB, impossible on-heap. [[dedupRun]] takes the provider as a
  * parameter; the dataflow — one shuffle on the fingerprint per
  * micro-batch — is identical under either provider, and the
  * provider choice is pinned into the checkpoint's offset-log
  * metadata at first start (carried across restarts).
  */
object IncrementalDedup {

  /** `spark.sql.streaming.stateStore.providerClass` value for the
    * RocksDB backend (spark-sql built-in; rocksdbjni ships with the
    * distribution). */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"

  /** Pure per-group transition (unit-testable): first sighting of a
    * fingerprint emits its smallest doc id and marks the key seen;
    * every later sighting — same batch duplicates included via the
    * min — emits nothing. */
  def firstSight(fp: String, rows: Iterator[FpDoc],
      state: GroupState[Boolean]): Iterator[FpDoc] =
    if (state.exists) Iterator.empty
    else {
      state.update(true)
      Iterator.single(FpDoc(fp, rows.map(_.doc_id).min))
    }

  /** Survivors of a (possibly streaming) fingerprinted dataset. */
  def dedup(docs: Dataset[FpDoc]): Dataset[FpDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (fp: String, it: Iterator[FpDoc], st: GroupState[Boolean]) =>
          firstSight(fp, it, st))
  }

  /** Cron-style run: drain new parquet document files from `inDir`
    * (schema: doc_id, text, ...), append newly-seen (fp, doc_id)
    * survivors to `outDir`. The seen-fingerprint set lives in the
    * checkpoint and carries across runs — a byte-duplicate re-send
    * of an entire input file appends nothing.
    *
    * `stateStoreProvider` (e.g. [[RocksDbProvider]]) selects the
    * state backend for a NEW checkpoint; Spark pins the provider
    * into the checkpoint's offset-log metadata at first start, so
    * later runs against the same checkpoint keep the original
    * backend regardless of this argument. The session conf is
    * save/restored around the start — the query captures it at
    * start-time, so the restore can't affect the running drain. */
  def dedupRun(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String, schema: org.apache.spark.sql.types.StructType,
      stateStoreProvider: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    import spark.implicits._
    val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(ProviderConf)
    stateStoreProvider.foreach(spark.conf.set(ProviderConf, _))
    try {
      // AvailableNow + maxFilesPerTrigger drains the backlog as a
      // sequence of bounded triggers (backfill-sized ingests must
      // not be one micro-batch); precedence follows trigger order,
      // which the file source feeds in modification-time order.
      val reader = spark.readStream.schema(schema)
      maxFilesPerTrigger.foreach(n =>
        reader.option("maxFilesPerTrigger", n))
      val in = reader.parquet(inDir)
        .select(graft.text.TextOps.fingerprint(col("text")).as("fp"),
          col("doc_id"))
        .as[FpDoc]
      val q = dedup(in).writeStream
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
