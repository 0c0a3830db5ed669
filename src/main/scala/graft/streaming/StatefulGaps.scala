package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** One observation of a site's stream (schema contract of the gap
  * monitor: a key column + event time). */
final case class SiteObs(site: String, DATETIME: Timestamp)

/** Streaming state per site: the last observation's epoch millis.
  * Bounded: one long per key, regardless of stream length. */
final case class GapState(lastMs: Long)

final case class GapRecord(site: String, gap_start: Timestamp,
    gap_end: Timestamp, gap_seconds: Long)

/** §2.9 stateful gap detection across micro-batches.
  *
  * The batch gap operators ([[graft.operators.TimeSeriesOps.gaps]])
  * need the whole frame; a monitor watching live site streams must
  * detect a gap that SPANS batches (last file ended 03:00, next file
  * starts 09:00). That is exactly `flatMapGroupsWithState`: per-site
  * state carries the last-seen timestamp forward — checkpointed, so a
  * cron-style `Trigger.AvailableNow` run detects gaps against the
  * PREVIOUS run's tail, surviving restarts (reference behavior:
  * network_status staleness vs last record, SURVEY §2.9/E3).
  *
  * Scale: state is one long per site (~30 sites in the reference
  * network; bounded at any fleet size), and groups are hash-
  * distributed by site — no global state, no shuffle beyond the
  * groupByKey.
  */
object StatefulGaps {

  /** Pure per-group transition (unit-testable): merge the carried
    * last-seen timestamp with the batch's observations, emit every
    * consecutive delta above `thresholdSec`, advance state. Events at
    * or before the carried timestamp (late replays) are ignored. */
  def detect(site: String, rows: Iterator[SiteObs],
      state: GroupState[GapState], thresholdSec: Long): Iterator[GapRecord] = {
    val prev = state.getOption.map(_.lastMs)
    val fresh = rows.map(_.DATETIME.getTime).toArray.sorted
      .filter(t => prev.forall(_ < t))
    if (fresh.isEmpty) return Iterator.empty
    val seq = prev.toArray ++ fresh
    state.update(GapState(seq.last))
    seq.iterator.sliding(2).withPartial(false).collect {
      case scala.collection.Seq(a, b) if b - a > thresholdSec * 1000L =>
        GapRecord(site, new Timestamp(a), new Timestamp(b), (b - a) / 1000L)
    }
  }

  /** Gap records for a (possibly streaming) SiteObs dataset. */
  def gaps(obs: Dataset[SiteObs], thresholdSec: Long): Dataset[GapRecord] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.site)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (site: String, it: Iterator[SiteObs], st: GroupState[GapState]) =>
          detect(site, it, st, thresholdSec))
  }

  /** Cron-style run: drain new parquet files from `inDir`, append gap
    * records to `outDir`. State (per-site last timestamp) lives in the
    * checkpoint and carries across runs. */
  def gapRun(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String, schema: org.apache.spark.sql.types.StructType,
      thresholdSec: Long): Unit = {
    import spark.implicits._
    val in = spark.readStream.schema(schema).parquet(inDir)
      .select("site", "DATETIME").as[SiteObs]
    val q = gaps(in, thresholdSec).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
