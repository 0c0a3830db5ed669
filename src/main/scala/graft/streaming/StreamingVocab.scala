package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** A tokenized document entering the vocabulary stream. */
final case class VocabDoc(stratum: String, doc_id: Long,
    toks: Seq[String])

/** A Misra–Gries candidate snapshot row: the counter's lower-bound
  * count and the stratum's tokens-seen watermark at emission (the
  * final snapshot per stratum = rows at the max `n_seen`). */
final case class VocabCand(stratum: String, token: String, lb: Long,
    n_seen: Long)

/** Keyed MG state: the bounded counter map + tokens seen so far. */
final case class VocabState(counters: Map[String, Long], nSeen: Long)

/** §2.9 + LLM-extension: STREAMING heavy-hitter vocabulary — the
  * continuous-ingest counterpart of
  * [[graft.text.VocabOps.heavyHitters]], completing the vocabulary
  * family's streaming tier (VERDICT r16 ask #8).
  *
  * The batch operator runs one Misra–Gries summary per partition and
  * recounts the k·P candidates exactly. A continuously ingesting
  * corpus instead carries ONE bounded MG counter map per stratum in
  * the state store (`flatMapGroupsWithState` — the
  * [[StreamingBudget]]/[[BloomDedup]] keyed-state shape): each
  * trigger folds its documents (doc_id order, so drains are
  * deterministic) into the stratum's counters with the classic
  * k-counter update — increment a held token, admit to a free slot,
  * else decrement ALL counters and drop zeros. After every trigger
  * the stratum emits its full candidate snapshot stamped with the
  * tokens-seen watermark; the FINAL snapshot (max `n_seen` per
  * stratum) is the candidate superset for the exact-recount
  * close-out, exactly as in the batch two-pass.
  *
  * Guarantee carried over from the batch operator: with
  * k = ⌈den/num⌉ counters, any token whose true stratum count
  * satisfies n·den > N·num has undercount ≤ N/(k+1) < n, so it is
  * STILL HELD when the stream closes — the recount-then-threshold
  * close-out therefore returns exactly the true heavy hitters, no
  * matter how the stream was sliced into drains.
  *
  * Scale: state is ≤ k entries per stratum (k·|strata| short strings
  * + longs — e.g. φ = 1/100 over 5 languages is ≤ 500 entries
  * total), constant in corpus size; the heavy token stream never
  * shuffles (tokens fold into the state store at the stratum key).
  * The snapshot emission is k rows per stratum per trigger — audit
  * volume, not data volume.
  *
  * Reference scope: the reference pipeline has no streaming
  * vocabulary operator; extends the engine's curation family per
  * the build brief's training-data mandate. */
object StreamingVocab {

  /** The per-stratum MG transition, pure and unit-testable. */
  def summarize(stratum: String, rows: Iterator[VocabDoc],
      state: GroupState[VocabState], k: Int): Iterator[VocabCand] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    var nSeen = 0L
    state.getOption.foreach { s =>
      counts ++= s.counters; nSeen = s.nSeen
    }
    rows.toArray.sortBy(_.doc_id).foreach { d =>
      val it = Option(d.toks).getOrElse(Seq.empty).iterator
      while (it.hasNext) {
        val t = it.next()
        nSeen += 1
        counts.get(t) match {
          case Some(v) => counts(t) = v + 1
          case None if counts.size < k => counts(t) = 1L
          case None =>
            val dead = List.newBuilder[String]
            counts.foreach { case (key, v) =>
              if (v == 1L) dead += key else counts(key) = v - 1 }
            dead.result().foreach(counts.remove)
        }
      }
    }
    state.update(VocabState(counts.toMap, nSeen))
    val watermark = nSeen
    counts.iterator.map { case (t, c) =>
      VocabCand(stratum, t, c, watermark)
    }.toArray.iterator
  }

  /** Fold a (possibly streaming) tokenized dataset into per-stratum
    * MG summaries; emits the full candidate snapshot per stratum per
    * trigger. `k` counters per stratum — callers wanting heavy
    * hitters at φ = num/den pass k = ⌈den/num⌉ (the
    * [[graft.text.VocabOps.heavyHitters]] arithmetic). */
  def summaries(docs: Dataset[VocabDoc], k: Int)
      : Dataset[VocabCand] = {
    require(k >= 1 && k <= 10_000_000,
      s"StreamingVocab: k=$k counters per stratum outside [1, 1e7]")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (s: String, it: Iterator[VocabDoc], st: GroupState[VocabState]) =>
          summarize(s, it, st, k))
  }

  /** Cron-style run: drain new parquet document files from `inDir`
    * (schema must include `stratumCol`, long `doc_id`, and a
    * `toks` array<string> column), append candidate snapshots to
    * `outDir`. MG counters live in the checkpoint and carry across
    * runs. Provider selection as [[IncrementalDedup.dedupRun]]. */
  def summariesRun(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String, schema: org.apache.spark.sql.types.StructType,
      stratumCol: String, toksCol: String, k: Int,
      stateStoreProvider: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    import spark.implicits._
    val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(ProviderConf)
    stateStoreProvider.foreach(spark.conf.set(ProviderConf, _))
    try {
      val reader = spark.readStream.schema(schema)
      maxFilesPerTrigger.foreach(n =>
        reader.option("maxFilesPerTrigger", n))
      val in = reader.parquet(inDir)
        .select(coalesce(col(stratumCol).cast("string"), lit(""))
          .as("stratum"), col("doc_id").cast("long").as("doc_id"),
          coalesce(col(toksCol), array()).as("toks"))
        .as[VocabDoc]
      val q = summaries(in, k)
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
