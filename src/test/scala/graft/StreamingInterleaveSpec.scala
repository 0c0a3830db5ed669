package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{MixDoc, StratumDoc, StreamingInterleave}

/** Specs for the streaming stride-schedule stamp: the pure transition
  * (rank continuation, weight-0 drop, overflow guard), and cross-run
  * end-to-end parity with the batch
  * [[graft.text.InterleaveOps.proportionalInterleave]] keys. */
class StreamingInterleaveSpec extends SparkSpec {
  import spark.implicits._

  private def state0 = new TestGroupState[Long]

  test("stamp continues ranks across batches and sorts within") {
    val w = Map("a" -> 3L)
    val st = state0
    val b1 = StreamingInterleave.stamp("a",
      Iterator(StratumDoc("a", 5L), StratumDoc("a", 2L)), st, w,
      m = 6L, maxDocsPerStratum = 100L).toSeq
    // ranks by ascending id; key = floor((2k-1)*6/6) = 2k-1 div ... :
    // w=3 -> den 6, M=6: k=1 -> floor(6/6)=1, k=2 -> floor(18/6)=3
    assert(b1 == Seq(MixDoc("a", 2L, 1L, 1L), MixDoc("a", 5L, 2L, 3L)))
    assert(st.value == 2L)
    val b2 = StreamingInterleave.stamp("a",
      Iterator(StratumDoc("a", 9L)), st, w, 6L, 100L).toSeq
    assert(b2 == Seq(MixDoc("a", 9L, 3L, 5L)))
  }

  test("stamp drops weightless strata and fails loudly past the bound") {
    val st = state0
    assert(StreamingInterleave.stamp("zz", Iterator(
      StratumDoc("zz", 1L)), st, Map("a" -> 1L), 2L, 10L).isEmpty)
    assert(!st.updated)
    val st2 = state0
    val ex = intercept[IllegalStateException] {
      StreamingInterleave.stamp("a",
        (1L to 11L).iterator.map(StratumDoc("a", _)), st2,
        Map("a" -> 1L), 2L, maxDocsPerStratum = 10L).toSeq
    }
    assert(ex.getMessage.contains("'a'"))
  }

  test("stampSized continues (rank, cum) state and matches the WFQ " +
      "key; negative sizes and bound crossings fail loudly") {
    import graft.streaming.{MixSizedDoc, SizedDoc}
    val w = Map("a" -> 1L)
    val st = new TestGroupState[(Long, Long)]
    // M = 2: key = floor((2cum+size)*2/2) = 2cum+size
    val b1 = StreamingInterleave.stampSized("a",
      Iterator(SizedDoc("a", 5L, 3L), SizedDoc("a", 2L, 2L)), st, w,
      m = 2L, maxTokensPerStratum = 100L).toSeq
    assert(b1 == Seq(MixSizedDoc("a", 2L, 2L, 1L, 2L),
      MixSizedDoc("a", 5L, 3L, 2L, 7L)))
    assert(st.value == (2L, 5L))
    val b2 = StreamingInterleave.stampSized("a",
      Iterator(SizedDoc("a", 9L, 4L)), st, w, 2L, 100L).toSeq
    assert(b2 == Seq(MixSizedDoc("a", 9L, 4L, 3L, 14L)))
    intercept[IllegalArgumentException] {
      StreamingInterleave.stampSized("a",
        Iterator(SizedDoc("a", 1L, -2L)), new TestGroupState, w,
        2L, 100L).toSeq
    }
    intercept[IllegalStateException] {
      StreamingInterleave.stampSized("a",
        Iterator(SizedDoc("a", 1L, 101L)), new TestGroupState, w,
        2L, 100L).toSeq
    }
  }

  test("large-lcm weight sets fail loudly instead of silently " +
      "clipping the resolution (batch-parity guard)") {
    // lcm(2w for w in 1..20) = 465585120 > Long.MaxValue/2^41 ~ 4.19e6
    val w = (1L to 20L).map(i => s"s$i" -> i).toMap
    val docs = spark.emptyDataset[StratumDoc]
    val ex = intercept[IllegalArgumentException] {
      StreamingInterleave.interleave(docs, w)
    }
    assert(ex.getMessage.contains("overflow-safe bound"))
    assert(ex.getMessage.contains("maxDocsPerStratum"))
    // an explicit under-bound resolution is accepted (no throw at
    // plan build), as is a lowered per-stratum bound
    StreamingInterleave.interleave(docs, w, resolution = 1L << 20)
    StreamingInterleave.interleave(docs, w,
      maxDocsPerStratum = 1L << 20)
    // the sized variant enforces the same guard
    val sized = spark.emptyDataset[graft.streaming.SizedDoc]
    val ex2 = intercept[IllegalArgumentException] {
      StreamingInterleave.interleaveByTokens(sized, w,
        maxTokensPerStratum = 1L << 44)
    }
    assert(ex2.getMessage.contains("maxTokensPerStratum"))
  }

  test("token-weighted cron drains are bit-identical to the batch " +
      "proportionalInterleaveByTokens keys") {
    val docs = (0L until 90L).map(i =>
      (i, Seq("en", "de", "fr")(((i % 7) % 3).toInt), 1L + i % 13))
      .toDF("doc_id", "lang", "n_tok")
    val w = Map("en" -> 3L, "de" -> 2L, "fr" -> 1L)
    val batch = graft.text.InterleaveOps.proportionalInterleaveByTokens(
        docs, "lang", "doc_id", "n_tok", w)
      .select("doc_id", "mix_k", "mix_key")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val in = Files.createTempDirectory("ilt_in").toString
    val out = Files.createTempDirectory("ilt_out").toString
    val ckpt = Files.createTempDirectory("ilt_ckpt").toString
    docs.filter(col("doc_id") < 40).coalesce(1).write
      .mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def drain(): Unit = StreamingInterleave.interleaveByTokensRun(
      spark, in, out, ckpt, schema, "lang", "n_tok", w)
    drain()
    docs.filter(col("doc_id") >= 40).coalesce(1).write
      .mode("append").parquet(in)
    drain()
    val streamed = spark.read.parquet(out)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("mix_k"), r.getAs[Long]("mix_key"))).toMap
    assert(streamed == batch)
  }

  test("cron drains in id order are bit-identical to the batch " +
      "interleave keys (ranks carried across runs and providers)") {
    val docs = (0L until 90L).map(i =>
      (i, Seq("en", "de", "fr")(((i % 7) % 3).toInt)))
      .toDF("doc_id", "lang")
    val w = Map("en" -> 3L, "de" -> 2L, "fr" -> 1L)
    val batch = graft.text.InterleaveOps.proportionalInterleave(
        docs, "lang", "doc_id", w)
      .select("doc_id", "mix_k", "mix_key")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

    Seq(None, Some(graft.streaming.IncrementalDedup.RocksDbProvider))
      .foreach { provider =>
        val in = Files.createTempDirectory("il_in").toString
        val out = Files.createTempDirectory("il_out").toString
        val ckpt = Files.createTempDirectory("il_ckpt").toString
        docs.filter(col("doc_id") < 30).coalesce(1).write
          .mode("append").parquet(in)
        val schema = spark.read.parquet(in).schema
        def drain(): Unit = StreamingInterleave.interleaveRun(spark,
          in, out, ckpt, schema, "lang", w,
          stateStoreProvider = provider)
        drain()
        docs.filter(col("doc_id") >= 30 && col("doc_id") < 60)
          .coalesce(1).write.mode("append").parquet(in)
        drain()
        docs.filter(col("doc_id") >= 60).coalesce(1).write
          .mode("append").parquet(in)
        drain()
        val streamed = spark.read.parquet(out)
          .collect().map(r => r.getAs[Long]("doc_id") ->
            (r.getAs[Long]("mix_k"), r.getAs[Long]("mix_key"))).toMap
        assert(streamed == batch, s"provider=$provider")
      }
  }
}

/** Minimal in-memory GroupState for unit-testing transitions. */
final class TestGroupState[T] extends
    org.apache.spark.sql.streaming.GroupState[T] {
  private var v: Option[T] = None
  var updated = false
  override def exists: Boolean = v.isDefined
  override def get: T = v.get
  override def getOption: Option[T] = v
  override def update(newValue: T): Unit = { v = Some(newValue); updated = true }
  override def remove(): Unit = v = None
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
  def value: T = v.get
}
