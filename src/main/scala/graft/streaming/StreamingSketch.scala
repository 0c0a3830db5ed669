package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** A tokenized document entering a sketch stream (the [[VocabDoc]]
  * shape, keyed by sketch group instead of vocabulary stratum). */
final case class SketchDoc(group: String, doc_id: Long,
    toks: Seq[String])

/** One HLL register snapshot row: the per-bucket max rank and the
  * group's tokens-seen watermark at emission (final snapshot per
  * group = rows at the max `n_seen`). */
final case class HllReg(group: String, bucket: Long, max_rho: Int,
    n_seen: Long)

/** Keyed HLL state: bucket → max rank, plus tokens seen so far. */
final case class HllState(regs: Map[Long, Int], nSeen: Long)

/** One CM cell snapshot row: the exact cell count and the group's
  * tokens-seen watermark at emission. */
final case class CmCellRow(group: String, row: Int, col: Long, n: Long,
    n_seen: Long)

/** Keyed CM state: packed (row, col) → count, plus tokens seen.
  * Keys pack as `row << 32 | col` (col < 16⁴ by construction). */
final case class CmState(cells: Map[Long, Long], nSeen: Long)

/** A valued record entering the rank-sketch stream (one nonnegative
  * measurement per row — token count, byte size, …). */
final case class ValueDoc(group: String, doc_id: Long, v: Long)

/** One rank-sketch cell snapshot row: the exact bucket count and the
  * group's values-seen watermark at emission. */
final case class RankCellRow(group: String, digits: Int, lead: Long,
    n: Long, n_seen: Long)

/** Keyed rank-sketch state: packed (digits, lead) → count, plus
  * values seen. Keys pack as `digits << 32 | lead` (lead < 10⁴). */
final case class RankState(cells: Map[Long, Long], nSeen: Long)

/** §2.9 + LLM-extension: STREAMING sketch tier — HyperLogLog
  * registers and count-min cells as keyed streaming state, the
  * continuous-ingest counterparts of
  * [[graft.text.SketchOps.hllTokenRegisters]] /
  * [[graft.text.SketchOps.cmTokenCells]] (VERDICT r17 ask #4),
  * completing the sketch family's streaming story the way
  * [[StreamingVocab]] completed the vocabulary's.
  *
  * The close-out proof is one line per operator because the state
  * transition IS the operator's own merge: HLL registers combine by
  * per-bucket MAX and CM cells by per-cell SUM — both associative,
  * commutative, and insensitive to how the stream was sliced into
  * drains — so the state after the last trigger equals the batch
  * sketch of the concatenated corpus REGISTER-FOR-REGISTER /
  * CELL-FOR-CELL (spec-pinned; the oracle queries replay the batch
  * arithmetic against the final snapshot).
  *
  * Hashing is the batch operators' md5 arithmetic verbatim, computed
  * JVM-side on the same UTF-8 bytes Spark's `md5()` digests: bucket =
  * first `bucketHexDigits` hex digits, ρ = 1 + leading zero bits of
  * the next 12 hex digits; CM column = first `colHexDigits` hex
  * digits of md5("row:token"). Bit-identical by construction — the
  * DuckDB replay of the batch operator is therefore also the oracle
  * for the stream's final snapshot.
  *
  * State-size arithmetic (the scale contract): HLL holds ≤ m =
  * 16^bucketHexDigits register entries per group (m = 4096 at the
  * default: ≤ ~48 KB per group as boxed map entries, ~12 B logical);
  * CM holds ≤ rows·16^colHexDigits cells per group (4·4096 = 16384
  * entries ≈ 256 KB boxed at the default). Both are CONSTANT in
  * corpus size — a year of ingest holds the same state as a day —
  * and the token stream never shuffles: tokens fold into the state
  * store at the group key, exactly the [[StreamingVocab]] shape.
  * Snapshot emission is ≤ state-size rows per group per trigger —
  * audit volume, not data volume.
  *
  * Reference scope: the reference pipeline has no sketching; extends
  * the engine's reporting family per the build brief's training-data
  * mandate. */
object StreamingSketch {

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** (bucket, ρ) of one token — [[graft.text.SketchOps]]'s hex-string
    * arithmetic verbatim: ρ = 49 on an all-zero 12-digit tail, else
    * 4·(leading zero hex digits) + {0,1,2,3 by the first nonzero
    * digit's high bits} + 1. */
  private[graft] def hllBucketRho(token: String,
      bucketHexDigits: Int): (Long, Int) = {
    val h = md5hex(token)
    val bucket = java.lang.Long.parseLong(
      h.substring(0, bucketHexDigits), 16)
    val tail = h.substring(bucketHexDigits, bucketHexDigits + 12)
    var z = 0
    while (z < 12 && tail.charAt(z) == '0') z += 1
    val r =
      if (z == 12) 49
      else {
        val fd = Character.digit(tail.charAt(z), 16)
        val lz = if (fd >= 8) 0 else if (fd >= 4) 1
          else if (fd >= 2) 2 else 3
        z * 4 + lz + 1
      }
    (bucket, r)
  }

  /** CM column of one token in hash row `row`. */
  private[graft] def cmCol(token: String, row: Int,
      colHexDigits: Int): Long =
    java.lang.Long.parseLong(
      md5hex(s"$row:$token").substring(0, colHexDigits), 16)

  /** The per-group HLL transition, pure and unit-testable. */
  def hllSummarize(group: String, docs: Iterator[SketchDoc],
      state: GroupState[HllState], bucketHexDigits: Int)
      : Iterator[HllReg] = {
    val regs = scala.collection.mutable.HashMap.empty[Long, Int]
    var nSeen = 0L
    state.getOption.foreach { s => regs ++= s.regs; nSeen = s.nSeen }
    docs.foreach { d =>
      val it = Option(d.toks).getOrElse(Seq.empty).iterator
      while (it.hasNext) {
        val (b, r) = hllBucketRho(it.next(), bucketHexDigits)
        nSeen += 1
        if (r > regs.getOrElse(b, 0)) regs(b) = r
      }
    }
    state.update(HllState(regs.toMap, nSeen))
    val watermark = nSeen
    regs.iterator.map { case (b, r) => HllReg(group, b, r, watermark) }
      .toArray.iterator
  }

  /** The per-group CM transition, pure and unit-testable. */
  def cmSummarize(group: String, docs: Iterator[SketchDoc],
      state: GroupState[CmState], rows: Int, colHexDigits: Int)
      : Iterator[CmCellRow] = {
    val cells = scala.collection.mutable.HashMap.empty[Long, Long]
    var nSeen = 0L
    state.getOption.foreach { s => cells ++= s.cells; nSeen = s.nSeen }
    docs.foreach { d =>
      val it = Option(d.toks).getOrElse(Seq.empty).iterator
      while (it.hasNext) {
        val t = it.next()
        nSeen += 1
        var r = 0
        while (r < rows) {
          val key = (r.toLong << 32) | cmCol(t, r, colHexDigits)
          cells(key) = cells.getOrElse(key, 0L) + 1L
          r += 1
        }
      }
    }
    state.update(CmState(cells.toMap, nSeen))
    val watermark = nSeen
    cells.iterator.map { case (key, n) =>
      CmCellRow(group, (key >> 32).toInt, key & 0xffffffffL, n, watermark)
    }.toArray.iterator
  }

  /** The per-group rank-sketch transition
    * ([[graft.operators.StatsOps.rankSketchCells]]'s decimal-bucket
    * arithmetic JVM-side — `digits` = decimal length, `lead` = first
    * `sigDigits` digits; sum-merge, so the close-out argument is the
    * [[cmSummarize]] one verbatim). Negative values throw — same
    * domain contract as the batch operator. */
  def rankSummarize(group: String, docs: Iterator[ValueDoc],
      state: GroupState[RankState], sigDigits: Int)
      : Iterator[RankCellRow] = {
    val cells = scala.collection.mutable.HashMap.empty[Long, Long]
    var nSeen = 0L
    state.getOption.foreach { s => cells ++= s.cells; nSeen = s.nSeen }
    docs.foreach { d =>
      require(d.v >= 0L,
        s"rankSummarize($group): negative value ${d.v} at doc ${d.doc_id}")
      val s = java.lang.Long.toString(d.v)
      val key = (s.length.toLong << 32) |
        java.lang.Long.parseLong(s.substring(0, math.min(sigDigits,
          s.length)))
      cells(key) = cells.getOrElse(key, 0L) + 1L
      nSeen += 1L
    }
    state.update(RankState(cells.toMap, nSeen))
    val watermark = nSeen
    cells.iterator.map { case (key, n) =>
      RankCellRow(group, (key >> 32).toInt, key & 0xffffffffL, n,
        watermark)
    }.toArray.iterator
  }

  /** Fold a (possibly streaming) valued dataset into per-group rank
    * sketches; emits the full cell snapshot per group per trigger.
    * State ≤ 19·10^sigDigits entries per group. */
  def rankCells(docs: Dataset[ValueDoc], sigDigits: Int = 2)
      : Dataset[RankCellRow] = {
    require(sigDigits >= 1 && sigDigits <= 4, s"sigDigits=$sigDigits")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (g: String, it: Iterator[ValueDoc], st: GroupState[RankState]) =>
          rankSummarize(g, it, st, sigDigits))
  }

  /** Fold a (possibly streaming) tokenized dataset into per-group HLL
    * registers; emits the full register snapshot per group per
    * trigger. */
  def hllRegisters(docs: Dataset[SketchDoc], bucketHexDigits: Int = 3)
      : Dataset[HllReg] = {
    require(bucketHexDigits >= 1 && bucketHexDigits <= 4,
      s"bucketHexDigits=$bucketHexDigits outside [1, 4]")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (g: String, it: Iterator[SketchDoc], st: GroupState[HllState]) =>
          hllSummarize(g, it, st, bucketHexDigits))
  }

  /** Fold a (possibly streaming) tokenized dataset into per-group CM
    * cells; emits the full cell snapshot per group per trigger. */
  def cmCells(docs: Dataset[SketchDoc], rows: Int = 4,
      colHexDigits: Int = 3): Dataset[CmCellRow] = {
    require(rows >= 1 && rows <= 16, s"rows=$rows outside [1, 16]")
    require(colHexDigits >= 1 && colHexDigits <= 4,
      s"colHexDigits=$colHexDigits outside [1, 4]")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (g: String, it: Iterator[SketchDoc], st: GroupState[CmState]) =>
          cmSummarize(g, it, st, rows, colHexDigits))
  }

  /** Cron-style run for the rank sketch: drain new parquet files
    * (schema must include `groupCol`, long `doc_id`, and a long
    * `valueCol`), append cell snapshots to `outDir`. Same checkpoint
    * / provider contract as [[sketchRun]]. NULL values drop reader-
    * side (the batch operator's convention). */
  def rankCellsRun(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String, schema: org.apache.spark.sql.types.StructType,
      groupCol: String, valueCol: String, sigDigits: Int = 2,
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
        .filter(col(valueCol).isNotNull)
        .select(coalesce(col(groupCol).cast("string"), lit(""))
          .as("group"), col("doc_id").cast("long").as("doc_id"),
          col(valueCol).cast("long").as("v"))
        .as[ValueDoc]
      val q = rankCells(in, sigDigits).toDF().writeStream
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
    * (schema must include `groupCol`, long `doc_id`, and a `toks`
    * array<string> column), append sketch snapshots to `outDir`.
    * `sketch` ∈ {"hll", "cm"}. Registers/cells live in the checkpoint
    * and carry across runs; provider selection as
    * [[IncrementalDedup.dedupRun]]. */
  def sketchRun(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String, schema: org.apache.spark.sql.types.StructType,
      groupCol: String, toksCol: String, sketch: String,
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
        .select(coalesce(col(groupCol).cast("string"), lit(""))
          .as("group"), col("doc_id").cast("long").as("doc_id"),
          coalesce(col(toksCol), array()).as("toks"))
        .as[SketchDoc]
      val out = sketch match {
        case "hll" => hllRegisters(in).toDF()
        case "cm"  => cmCells(in).toDF()
        case other => throw new IllegalArgumentException(
          s"sketchRun: unknown sketch '$other' (want hll|cm)")
      }
      val q = out.writeStream
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
