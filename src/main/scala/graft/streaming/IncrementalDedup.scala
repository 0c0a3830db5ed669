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
  * LSH operators). At 100 TB this is exactly the workload the
  * RocksDB state store backend exists for
  * (`spark.sql.streaming.stateStore.providerClass`); the dataflow —
  * one shuffle on the fingerprint per micro-batch — is unchanged.
  */
object IncrementalDedup {

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
    * of an entire input file appends nothing. */
  def dedupRun(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String, schema: org.apache.spark.sql.types.StructType)
      : Unit = {
    import spark.implicits._
    val in = spark.readStream.schema(schema).parquet(inDir)
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
  }
}
