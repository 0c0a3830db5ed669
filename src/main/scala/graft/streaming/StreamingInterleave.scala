package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** A document reference entering the mixture stream. */
final case class StratumDoc(stratum: String, doc_id: Long)

/** A stride-scheduled document: per-stratum rank and the quantized
  * virtual time ([[graft.text.InterleaveOps]]'s mix_k / mix_key). */
final case class MixDoc(stratum: String, doc_id: Long, mix_k: Long,
    mix_key: Long)

/** A sized document reference (token-weighted variant). */
final case class SizedDoc(stratum: String, doc_id: Long, size: Long)

/** A WFQ-scheduled sized document. */
final case class MixSizedDoc(stratum: String, doc_id: Long, size: Long,
    mix_k: Long, mix_key: Long)

/** §2.9 + LLM-extension: STREAMING proportional mixture interleave —
  * the continuous-ingest counterpart of
  * [[graft.text.InterleaveOps.proportionalInterleave]], closing the
  * mixing family's streaming tier (VERDICT r14 ask #8).
  *
  * Batch interleave ranks each stratum over the whole corpus; a
  * continuously ingesting corpus needs each arriving document's
  * schedule position relative to EVERYTHING already ingested — across
  * micro-batches and cron-style runs. That is one Long of keyed state
  * per stratum (`flatMapGroupsWithState`): the last rank handed out.
  * Each batch's group sorts its documents by id (deterministic within
  * the trigger), continues the rank from state, and stamps the stride
  * key `mix_key = floor((2k−1)·M / (2·w_s))` (Waldspurger & Weihl
  * 1995) with the SAME integer arithmetic as the batch operator — a
  * stream drained in id order produces bit-identical (mix_k, mix_key)
  * to the batch run, which is exactly what q123 pins against q121's
  * replay. The training order over the accumulated output lake is
  * `ORDER BY (mix_key, stratum, mix_k)`; the global `seq` is a
  * read-side presentation (a total rank cannot be assigned
  * mid-stream — later arrivals interleave before earlier ones by
  * design, that is the whole point of the virtual-time key).
  *
  * Scale: state is ONE Long per stratum — constant in corpus size,
  * parameter-bounded by the recipe (the cheapest state shape in the
  * streaming tier; cf. [[IncrementalDedup]]'s per-fingerprint keys).
  * Per-trigger memory is the batch's largest stratum slice (the
  * group sort) — bound it with `maxFilesPerTrigger`. Overflow
  * discipline (the r14 batch finding, applied here from day one):
  * ranks are unbounded in a stream, so the resolution M is capped
  * up-front against `maxDocsPerStratum` and the transition FAILS
  * LOUDLY (named stratum) if a stratum ever exceeds that bound —
  * a silently wrapped mix_key corrupts the training order forever.
  *
  * Reference scope: the reference pipeline has no streaming mixture
  * operator; extends the engine's curation family per the build
  * brief's training-data mandate. */
object StreamingInterleave {

  /** floor(x·m/den) without an x·m product — the
    * [[graft.text.MixOps.mulDivFloor]] identity on scalars. Safe for
    * x ≤ maxDocs·2 and m ≤ Long.MaxValue/(2·max(maxDocs, w)). */
  private def mulDivFloor(x: Long, m: Long, den: Long): Long =
    (x / den) * m + ((x % den) * m) / den

  /** The per-stratum transition, pure and unit-testable: continue
    * the rank from state over the batch's id-sorted docs. */
  def stamp(stratum: String, rows: Iterator[StratumDoc],
      state: GroupState[Long], weights: Map[String, Long], m: Long,
      maxDocsPerStratum: Long): Iterator[MixDoc] =
    weights.get(stratum) match {
      case None => Iterator.empty // weight-0 strata drop, as batch
      case Some(w) =>
        var k = state.getOption.getOrElse(0L)
        val out = rows.toArray.sortBy(_.doc_id).iterator.map { d =>
          k += 1L
          if (k > maxDocsPerStratum) throw new IllegalStateException(
            s"StreamingInterleave: stratum '$stratum' exceeded " +
              s"maxDocsPerStratum=$maxDocsPerStratum — raise the bound " +
              "(the resolution cap derives from it)")
          MixDoc(stratum, d.doc_id, k,
            mulDivFloor(2L * k - 1L, m, 2L * w))
        }.toArray
        state.update(k)
        out.iterator
    }

  /** Stamp a (possibly streaming) dataset with the stride schedule.
    * `weights` as the batch operator (positive parts, reduced by
    * their gcd; absent strata DROP). `resolution` 0 derives the
    * exact lcm of the 2·w_s capped at 2^42; if that (or an explicit
    * `resolution`) exceeds the overflow-safe bound
    * Long.MaxValue/(2·max(maxDocsPerStratum, w_max)) the call FAILS
    * (see [[resolveM]] — clipping would silently break batch
    * parity). */
  def interleave(docs: Dataset[StratumDoc], weights: Map[String, Long],
      maxDocsPerStratum: Long = 1L << 40,
      resolution: Long = 0L): Dataset[MixDoc] = {
    require(weights.nonEmpty && weights.valuesIterator.forall(_ > 0),
      "StreamingInterleave: weights must be positive")
    require(maxDocsPerStratum >= 1, "maxDocsPerStratum must be >= 1")
    import docs.sparkSession.implicits._
    val g = weights.valuesIterator.reduce((a, b) => gcd(a, b))
    val red = weights.map { case (s, w) => (s, w / g) }
    val wMax = red.valuesIterator.max
    val mSafe = resolveM(resolution,
      red.values.map(2L * _).toSeq.distinct.sorted, wMax,
      maxDocsPerStratum, "maxDocsPerStratum")
    docs.groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (s: String, it: Iterator[StratumDoc], st: GroupState[Long]) =>
          stamp(s, it, st, red, mSafe, maxDocsPerStratum))
  }

  private def gcd(a: Long, b: Long): Long = {
    var x = a; var y = b
    while (y != 0) { val t = x % y; x = y; y = t }
    math.max(x, 1L)
  }

  /** Resolve the quantization step M against the a-priori overflow
    * bound Long.MaxValue/(2·max(maxPerStratum, wMax)) — and FAIL
    * LOUDLY instead of clipping. The batch operator caps M by the
    * ACTUAL per-stratum totals (known after its rank pass); a stream
    * only has the a-priori bound, so silently clipping here would
    * make stream and batch compute different mix_key values for
    * weight sets whose lcm(2·w) exceeds the bound (e.g. weights
    * 1..20 at the default maxDocsPerStratum) even when drained in id
    * order — breaking the documented bit-parity contract without any
    * symptom. The caller must either lower maxPerStratum (raising
    * the bound) or pass the SAME explicit `resolution` ≤ bound to
    * both operators. */
  private def resolveM(resolution: Long, dens: Seq[Long], wMax: Long,
      maxPerStratum: Long, boundName: String): Long = {
    val bound = Long.MaxValue / (2L * math.max(maxPerStratum, wMax))
    val want =
      if (resolution > 0L) resolution
      else graft.text.InterleaveOps.commonResolution(dens, 1L << 42)
    if (want > bound) throw new IllegalArgumentException(
      s"StreamingInterleave: resolution $want exceeds the overflow-" +
        s"safe bound $bound = Long.MaxValue/(2*max($boundName=" +
        s"$maxPerStratum, wMax=$wMax)). Clipping would silently " +
        "diverge from the batch operator (which caps by ACTUAL " +
        s"per-stratum totals). Lower $boundName, or pass the same " +
        s"explicit resolution <= $bound to BOTH operators.")
    math.max(1L, want)
  }

  /** Token-weighted transition ([[graft.text.InterleaveOps
    * .proportionalInterleaveByTokens]]'s WFQ key): state is the
    * (rank, cumulative-token) pair; each doc's key is the midpoint
    * of its token interval on the stratum's weighted clock. Negative
    * sizes and token totals past the bound fail loudly. */
  def stampSized(stratum: String, rows: Iterator[SizedDoc],
      state: GroupState[(Long, Long)], weights: Map[String, Long],
      m: Long, maxTokensPerStratum: Long): Iterator[MixSizedDoc] =
    weights.get(stratum) match {
      case None => Iterator.empty
      case Some(w) =>
        var (k, cum) = state.getOption.getOrElse((0L, 0L))
        val out = rows.toArray.sortBy(_.doc_id).iterator.map { d =>
          if (d.size < 0L) throw new IllegalArgumentException(
            s"StreamingInterleave: negative size ${d.size} in " +
              s"stratum '$stratum'")
          k += 1L
          val key = mulDivFloor(2L * cum + d.size, m, 2L * w)
          cum += d.size
          if (cum > maxTokensPerStratum) throw new IllegalStateException(
            s"StreamingInterleave: stratum '$stratum' exceeded " +
              s"maxTokensPerStratum=$maxTokensPerStratum — raise the " +
              "bound (the resolution cap derives from it)")
          MixSizedDoc(stratum, d.doc_id, d.size, k, key)
        }.toArray
        state.update((k, cum))
        out.iterator
    }

  /** Token-weighted streaming interleave: the [[interleave]]
    * contract with each doc occupying its `size` tokens on the
    * stratum clock — bit-identical to
    * [[graft.text.InterleaveOps.proportionalInterleaveByTokens]]
    * when drained in id order. State: TWO Longs per stratum. */
  def interleaveByTokens(docs: Dataset[SizedDoc],
      weights: Map[String, Long],
      maxTokensPerStratum: Long = 1L << 44,
      resolution: Long = 0L): Dataset[MixSizedDoc] = {
    require(weights.nonEmpty && weights.valuesIterator.forall(_ > 0),
      "StreamingInterleave: weights must be positive")
    require(maxTokensPerStratum >= 1, "maxTokensPerStratum must be >= 1")
    import docs.sparkSession.implicits._
    val g = weights.valuesIterator.reduce((a, b) => gcd(a, b))
    val red = weights.map { case (s, w) => (s, w / g) }
    val wMax = red.valuesIterator.max
    val mSafe = resolveM(resolution,
      red.values.map(2L * _).toSeq.distinct.sorted, wMax,
      maxTokensPerStratum, "maxTokensPerStratum")
    docs.groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (s: String, it: Iterator[SizedDoc],
            st: GroupState[(Long, Long)]) =>
          stampSized(s, it, st, red, mSafe, maxTokensPerStratum))
  }

  /** Cron-style run for the token-weighted variant: `sizeCol` must
    * be a non-negative integral column. Everything else as
    * [[interleaveRun]]. */
  def interleaveByTokensRun(spark: SparkSession, inDir: String,
      outDir: String, checkpoint: String,
      schema: org.apache.spark.sql.types.StructType,
      stratumCol: String, sizeCol: String, weights: Map[String, Long],
      maxTokensPerStratum: Long = 1L << 44, resolution: Long = 0L,
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
          col(sizeCol).cast("long").as("size"))
        .as[SizedDoc]
      val q = interleaveByTokens(in, weights, maxTokensPerStratum,
          resolution)
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

  /** Cron-style run: drain new parquet document files from `inDir`
    * (schema must include `stratumCol` and long `doc_id`), append
    * stamped (stratum, doc_id, mix_k, mix_key) rows to `outDir`.
    * Per-stratum ranks live in the checkpoint and carry across runs.
    * Provider selection as [[IncrementalDedup.dedupRun]]. */
  def interleaveRun(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String, schema: org.apache.spark.sql.types.StructType,
      stratumCol: String, weights: Map[String, Long],
      maxDocsPerStratum: Long = 1L << 40, resolution: Long = 0L,
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
          .as("stratum"), col("doc_id").cast("long").as("doc_id"))
        .as[StratumDoc]
      val q = interleave(in, weights, maxDocsPerStratum, resolution)
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
