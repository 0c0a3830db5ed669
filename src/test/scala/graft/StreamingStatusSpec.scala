package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.pipeline.Status
import graft.streaming.IncrementalAppend

class StreamingStatusSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("J6 incremental append drains new files per run and dedups") {
    val in = Files.createTempDirectory("stream_in").toString
    val out = Files.createTempDirectory("stream_out").toString
    val ckpt = Files.createTempDirectory("stream_ckpt").toString
    val schema = Seq((ts("2024-01-01 00:30:00"), "s1", 1.0))
      .toDF("DATETIME", "site", "v").schema

    def addBatch(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("b").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(java.nio.file.Path.of(tmp)).iterator()
      var moved = false
      while (part.hasNext && !moved) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          Files.move(p, java.nio.file.Path.of(s"$in/$name.parquet"))
          moved = true
        }
      }
      assert(moved, "no parquet part file produced")
    }

    addBatch(Seq((ts("2024-01-01 00:30:00"), "s1", 1.0),
        (ts("2024-01-01 00:30:00"), "s1", 1.0),  // dup within batch
        (ts("2024-01-01 01:00:00"), "s1", 2.0))
      .toDF("DATETIME", "site", "v"), "batch1")
    IncrementalAppend.appendRun(spark, in, out, ckpt, schema,
      "DATETIME", Seq("site"))
    assert(spark.read.parquet(out).count() == 2)

    // second run: only the new file is ingested
    addBatch(Seq((ts("2024-01-01 01:30:00"), "s1", 3.0))
      .toDF("DATETIME", "site", "v"), "batch2")
    IncrementalAppend.appendRun(spark, in, out, ckpt, schema,
      "DATETIME", Seq("site"))
    val rows = spark.read.parquet(out)
    assert(rows.count() == 3)
    assert(rows.agg(max("DATETIME")).head().getTimestamp(0)
      == ts("2024-01-01 01:30:00"))
  }

  test("stateful gap detection spans runs via checkpointed state") {
    import graft.streaming.StatefulGaps
    val in = Files.createTempDirectory("gap_in").toString
    val out = Files.createTempDirectory("gap_out").toString
    val ckpt = Files.createTempDirectory("gap_ckpt").toString
    val schema = Seq((ts("2024-01-01 00:00:00"), "s1", 0.0))
      .toDF("DATETIME", "site", "v").schema

    def addFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("gb").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(java.nio.file.Path.of(tmp)).iterator()
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet"))
          Files.move(p, java.nio.file.Path.of(s"$in/$name.parquet"))
      }
    }

    // run 1: within-batch gap 01:00 -> 03:30 (> 1h threshold)
    addFile(Seq(
      (ts("2024-01-01 00:30:00"), "s1", 1.0),
      (ts("2024-01-01 01:00:00"), "s1", 2.0),
      (ts("2024-01-01 03:30:00"), "s1", 3.0),
      (ts("2024-01-01 00:30:00"), "s2", 1.0))
      .toDF("DATETIME", "site", "v"), "b1")
    StatefulGaps.gapRun(spark, in, out, ckpt, schema, 3600L)
    val r1 = spark.read.parquet(out).collect()
    assert(r1.length == 1)
    assert(r1.head.getAs[String]("site") == "s1")
    assert(r1.head.getAs[Long]("gap_seconds") == 9000L)

    // run 2: s2 resumes after 6h — the gap SPANS the two runs and is
    // only detectable through the checkpointed per-site state
    addFile(Seq((ts("2024-01-01 06:30:00"), "s2", 2.0))
      .toDF("DATETIME", "site", "v"), "b2")
    StatefulGaps.gapRun(spark, in, out, ckpt, schema, 3600L)
    val r2 = spark.read.parquet(out)
      .filter(col("site") === "s2").collect()
    assert(r2.length == 1)
    assert(r2.head.getTimestamp(1) == ts("2024-01-01 00:30:00"))
    assert(r2.head.getTimestamp(2) == ts("2024-01-01 06:30:00"))
    assert(r2.head.getAs[Long]("gap_seconds") == 21600L)
  }

  test("streaming dedup suppresses cross-run duplicates, survivor is min id") {
    import graft.streaming.{FpDoc, IncrementalDedup}
    import org.apache.spark.sql.streaming.TestGroupState

    // pure transition: unseen fp emits min id and marks state; seen
    // fp emits nothing
    val st = TestGroupState.create[Boolean](
      optionalState = org.apache.spark.api.java.Optional.empty[Boolean](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val first = IncrementalDedup.firstSight("f1",
      Iterator(FpDoc("f1", 9L), FpDoc("f1", 4L), FpDoc("f1", 7L)), st)
    assert(first.toSeq == Seq(FpDoc("f1", 4L)))
    assert(st.get)
    assert(IncrementalDedup.firstSight("f1",
      Iterator(FpDoc("f1", 1L)), st).isEmpty)

    // end-to-end across runs: duplicate text in run 2 is suppressed
    // by checkpointed state; re-sending run 2 appends nothing
    val in = Files.createTempDirectory("dd_in").toString
    val out = Files.createTempDirectory("dd_out").toString
    val ckpt = Files.createTempDirectory("dd_ckpt").toString
    val b1 = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha beta"))
      .toDF("doc_id", "text")
    val b2 = Seq((10L, "alpha beta"), (11L, "epsilon zeta"))
      .toDF("doc_id", "text")
    val schema = b1.schema
    b1.write.mode("append").parquet(in)
    IncrementalDedup.dedupRun(spark, in, out, ckpt, schema)
    val r1 = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(r1.values.toSet == Set(1L, 2L)) // 3 deduped within run 1
    b2.write.mode("append").parquet(in)
    IncrementalDedup.dedupRun(spark, in, out, ckpt, schema)
    val r2 = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(r2.values.toSet == Set(1L, 2L, 11L)) // 10 suppressed by state
    b2.write.mode("append").parquet(in)
    IncrementalDedup.dedupRun(spark, in, out, ckpt, schema)
    assert(spark.read.parquet(out).count() == 3) // byte re-send: nothing
  }

  test("streaming dedup drains identically on the RocksDB state store") {
    import graft.streaming.IncrementalDedup
    // Same cross-run scenario as above, state backend = RocksDB (the
    // 100 TB-scale provider — see IncrementalDedup's state-size
    // arithmetic). Cross-run suppression must be byte-identical.
    val in = Files.createTempDirectory("ddr_in").toString
    val out = Files.createTempDirectory("ddr_out").toString
    val ckpt = Files.createTempDirectory("ddr_ckpt").toString
    val b1 = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha beta"))
      .toDF("doc_id", "text")
    val b2 = Seq((10L, "alpha beta"), (11L, "epsilon zeta"))
      .toDF("doc_id", "text")
    val schema = b1.schema
    val rocks = Some(IncrementalDedup.RocksDbProvider)
    b1.write.mode("append").parquet(in)
    IncrementalDedup.dedupRun(spark, in, out, ckpt, schema, rocks)
    b2.write.mode("append").parquet(in)
    IncrementalDedup.dedupRun(spark, in, out, ckpt, schema, rocks)
    b2.write.mode("append").parquet(in)
    IncrementalDedup.dedupRun(spark, in, out, ckpt, schema, rocks)
    val r = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(r.values.toSet == Set(1L, 2L, 11L))
    // The provider choice is pinned in the checkpoint's offset-log
    // metadata (first-start capture) — prove RocksDB actually ran.
    val off = java.nio.file.Paths.get(ckpt, "offsets", "0")
    assert(new String(Files.readAllBytes(off), "UTF-8")
      .contains("RocksDBStateStoreProvider"))
    // And the save/restore contract held: the session is NOT left on
    // RocksDB. (getOption surfaces the conf's DEFAULT — the HDFS
    // provider — even when never set, so "not RocksDB" is the
    // observable restore contract.)
    assert(spark.conf
      .get("spark.sql.streaming.stateStore.providerClass")
      != IncrementalDedup.RocksDbProvider)
  }

  test("streaming near-dedup transitions: bucket claim and doc emit") {
    import graft.streaming.{BandFlag, BandHit, IncrementalNearDup, Survivor}
    import org.apache.spark.sql.streaming.TestGroupState

    def longState(v: Option[Long]) = TestGroupState.create[Long](
      optionalState = v.fold(
        org.apache.spark.api.java.Optional.empty[Long]())(
        x => org.apache.spark.api.java.Optional.of(x)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)

    // fresh bucket: smallest batch id wins, higher ids matched
    val st = longState(None)
    val flags = IncrementalNearDup.bucketClaim("0:k",
      Iterator(BandHit("0:k", 9L), BandHit("0:k", 4L), BandHit("0:k", 7L)),
      st).toSeq
    assert(flags.toSet ==
      Set(BandFlag(9L, true), BandFlag(4L, false), BandFlag(7L, true)))
    assert(st.get == 4L)
    // occupied bucket: state min out-ranks the whole batch; a
    // byte-identical re-send of the winner is NOT matched (it IS
    // the min — the doc-emit marker suppresses the re-emit instead)
    val again = IncrementalNearDup.bucketClaim("0:k",
      Iterator(BandHit("0:k", 4L), BandHit("0:k", 12L)), st).toSeq
    assert(again.toSet == Set(BandFlag(4L, false), BandFlag(12L, true)))
    assert(st.get == 4L)

    def boolState = TestGroupState.create[Boolean](
      optionalState = org.apache.spark.api.java.Optional.empty[Boolean](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    // all buckets clean -> emit once, marker set; re-send suppressed
    val es = boolState
    assert(IncrementalNearDup.docEmit(4L,
      Iterator(BandFlag(4L, false), BandFlag(4L, false)), es).toSeq ==
      Seq(Survivor(4L)))
    assert(es.get)
    assert(IncrementalNearDup.docEmit(4L,
      Iterator(BandFlag(4L, false)), es).isEmpty)
    // any matched bucket -> dropped, no marker needed
    val ds = boolState
    assert(IncrementalNearDup.docEmit(9L,
      Iterator(BandFlag(9L, false), BandFlag(9L, true)), ds).isEmpty)
    assert(!ds.exists)
  }

  test("streaming near-dedup equals global batch LSH semantics across runs") {
    import graft.streaming.IncrementalNearDup
    // Low-id batch first, then the high-id batch, then a
    // byte-identical re-send (appends nothing) — the q95 drive.
    // Survivor set must equal the batch restatement: docs sharing
    // no band key with any lower-id doc.
    val in = Files.createTempDirectory("nd_in").toString
    val out = Files.createTempDirectory("nd_out").toString
    val ckpt = Files.createTempDirectory("nd_ckpt").toString
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "entirely different words about streaming state stores"),
      (3L, "the quick brown fox jumps over the lazy dog today")) // dup of 1
      .toDF("doc_id", "text")
    val b2 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"), // dup of 1
      (11L, "fresh unrelated content with zero shared shingles here"),
      (12L, "entirely different words about streaming state stores")) // dup of 2
      .toDF("doc_id", "text")
    val schema = b1.schema
    b1.write.mode("append").parquet(in)
    IncrementalNearDup.nearDedupRun(spark, in, out, ckpt, schema)
    b2.write.mode("append").parquet(in)
    IncrementalNearDup.nearDedupRun(spark, in, out, ckpt, schema)
    b2.write.mode("append").parquet(in)
    IncrementalNearDup.nearDedupRun(spark, in, out, ckpt, schema)
    val streamed = spark.read.parquet(out)
      .collect().map(_.getLong(0)).toSet

    // batch restatement over the SAME banding: survivors = banded
    // docs never appearing as the higher id of a candidate pair
    val all = b1.union(b2).dropDuplicates("doc_id")
    val matched = graft.text.DedupOps
      .minhashCandidatePairs(all, "doc_id", "text", 3, 4, 2)
      .select("id_b").collect().map(_.getLong(0)).toSet
    val banded = IncrementalNearDup
      .bandHits(all, "doc_id", "text", 3, 4, 2)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(streamed == banded -- matched)
    assert(streamed == Set(1L, 2L, 11L))
  }

  test("streaming IMAGE near-dedup equals batch dHash band semantics; " +
      "re-encoded re-send suppressed; undecodable rows yield nothing") {
    import graft.multimodal.{MediaDedup, Multimodal}
    import graft.streaming.IncrementalNearDup
    def img(seed: Int, bright: Boolean): Array[Byte] =
      Multimodal.SyntheticMedia.bmp24(18, 16) { (x, y) =>
        def c(a: Int, b: Int, cc: Int): Int = {
          val v = (seed * a + x * b + y * cc) % 248
          if (bright) v + 7 else v // unclamped: dHash-invariant
        }
        (c(3, 7, 11), c(5, 11, 3), c(7, 3, 13))
      }
    val in = Files.createTempDirectory("ind_in").toString
    val out = Files.createTempDirectory("ind_out").toString
    val ckpt = Files.createTempDirectory("ind_ckpt").toString
    val b1 = Seq(
      (1L, img(17, bright = false)),
      (2L, img(99, bright = false)),
      (3L, img(17, bright = true))) // brightness remaster of 1
      .toDF("doc_id", "payload")
    val b2 = Seq(
      (10L, MediaDedup.pngReencode(img(17, bright = false))), // re-encode of 1
      (11L, img(200, bright = false)),                        // fresh
      (12L, Array[Byte](1, 2, 3)),                            // undecodable
      (13L, img(99, bright = true)))                          // remaster of 2
      .toDF("doc_id", "payload")
    val schema = b1.schema
    b1.write.mode("append").parquet(in)
    IncrementalNearDup.imageNearDedupRun(spark, in, out, ckpt, schema)
    b2.write.mode("append").parquet(in)
    IncrementalNearDup.imageNearDedupRun(spark, in, out, ckpt, schema)
    b2.write.mode("append").parquet(in) // byte-identical re-send
    IncrementalNearDup.imageNearDedupRun(spark, in, out, ckpt, schema)
    val streamed = spark.read.parquet(out)
      .collect().map(_.getLong(0)).toSet

    // batch restatement over the SAME banding: survivors = banded
    // docs sharing no band word with any lower-id doc (undecodable
    // payloads produce no band rows on either side)
    val all = b1.union(b2).dropDuplicates("doc_id")
    val hits = IncrementalNearDup
      .imageBandHits(all, "doc_id", "payload").toDF()
      .localCheckpoint(true)
    val matched = hits.as("a").join(hits.as("b"),
        col("a.bkey") === col("b.bkey") &&
        col("b.doc_id") < col("a.doc_id"))
      .select(col("a.doc_id")).collect().map(_.getLong(0)).toSet
    val banded = hits.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(streamed == banded -- matched)
    assert(streamed == Set(1L, 2L, 11L))
    assert(!banded.contains(12L)) // undecodable: absent, not poison
  }

  test("streaming AUDIO near-dedup: a gain-doubled loudness remaster " +
      "is suppressed cross-batch; stream equals the batch band " +
      "restatement") {
    import graft.multimodal.Multimodal
    import graft.streaming.IncrementalNearDup
    def wav(seed: Int, gain: Int): Array[Byte] =
      Multimodal.SyntheticMedia.wavPcm16(8000, 256) { i =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$seed:$i".getBytes("UTF-8"))
        ((((d(0) & 0xff) << 8) | (d(1) & 0xff)) % 32768 - 16384) * gain
      }
    val in = Files.createTempDirectory("and_in").toString
    val out = Files.createTempDirectory("and_out").toString
    val ckpt = Files.createTempDirectory("and_ckpt").toString
    val b1 = Seq((1L, wav(17, 1)), (2L, wav(99, 1)))
      .toDF("doc_id", "payload")
    val b2 = Seq(
      (10L, wav(17, 2)),            // loudness remaster of 1
      (11L, wav(200, 1)),           // fresh
      (12L, Array[Byte](1, 2, 3)))  // undecodable: no band rows
      .toDF("doc_id", "payload")
    val schema = b1.schema
    b1.write.mode("append").parquet(in)
    IncrementalNearDup.audioNearDedupRun(spark, in, out, ckpt, schema)
    b2.write.mode("append").parquet(in)
    IncrementalNearDup.audioNearDedupRun(spark, in, out, ckpt, schema)
    b2.write.mode("append").parquet(in) // byte-identical re-send
    IncrementalNearDup.audioNearDedupRun(spark, in, out, ckpt, schema)
    val streamed = spark.read.parquet(out)
      .collect().map(_.getLong(0)).toSet
    val all = b1.union(b2).dropDuplicates("doc_id")
    val hits = IncrementalNearDup
      .audioBandHits(all, "doc_id", "payload").toDF()
      .localCheckpoint(true)
    val matched = hits.as("a").join(hits.as("b"),
        col("a.bkey") === col("b.bkey") &&
        col("b.doc_id") < col("a.doc_id"))
      .select(col("a.doc_id")).collect().map(_.getLong(0)).toSet
    val banded = hits.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(streamed == banded -- matched)
    assert(streamed == Set(1L, 2L, 11L))
    assert(!banded.contains(12L))
  }

  test("near-dedup backlog split into bounded triggers matches one-shot drain") {
    import graft.streaming.IncrementalNearDup
    // A backfill drained under maxFilesPerTrigger=1 (one file per
    // trigger, modification-time order) must produce the same
    // survivor set as the run-per-batch drive: precedence follows
    // trigger order, and the files land in id order.
    val in = Files.createTempDirectory("ndt_in").toString
    val out = Files.createTempDirectory("ndt_out").toString
    val ckpt = Files.createTempDirectory("ndt_ckpt").toString
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "entirely different words about streaming state stores"),
      (3L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val b2 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "fresh unrelated content with zero shared shingles here"),
      (12L, "entirely different words about streaming state stores"))
      .toDF("doc_id", "text")
    b1.coalesce(1).write.mode("append").parquet(in)
    b2.coalesce(1).write.mode("append").parquet(in)
    IncrementalNearDup.nearDedupRun(spark, in, out, ckpt, b1.schema,
      maxFilesPerTrigger = Some(1))
    assert(spark.read.parquet(out).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 11L))
  }

  test("near-dedup audit emits one verdict per doc, dropped docs visible") {
    import graft.streaming.{BandFlag, IncrementalNearDup, Verdict}
    import org.apache.spark.sql.streaming.TestGroupState
    def boolState = TestGroupState.create[Boolean](
      optionalState = org.apache.spark.api.java.Optional.empty[Boolean](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    // dropped doc: verdict kept=false, marker set, re-send silent
    val ds = boolState
    assert(IncrementalNearDup.docVerdict(9L,
      Iterator(BandFlag(9L, false), BandFlag(9L, true)), ds).toSeq ==
      Seq(Verdict(9L, kept = false)))
    assert(ds.get)
    assert(IncrementalNearDup.docVerdict(9L,
      Iterator(BandFlag(9L, true)), ds).isEmpty)

    // end-to-end: audit drive produces one row per doc with the
    // batch keep semantics
    val in = Files.createTempDirectory("nda_in").toString
    val out = Files.createTempDirectory("nda_out").toString
    val ckpt = Files.createTempDirectory("nda_ckpt").toString
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "entirely different words about streaming state stores"),
      (3L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val b2 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "fresh unrelated content with zero shared shingles here"))
      .toDF("doc_id", "text")
    b1.write.mode("append").parquet(in)
    IncrementalNearDup.nearDedupRun(spark, in, out, ckpt, b1.schema,
      audit = true)
    b2.write.mode("append").parquet(in)
    IncrementalNearDup.nearDedupRun(spark, in, out, ckpt, b1.schema,
      audit = true)
    b2.write.mode("append").parquet(in)
    IncrementalNearDup.nearDedupRun(spark, in, out, ckpt, b1.schema,
      audit = true)
    val verdicts = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(verdicts == Map(1L -> true, 2L -> true, 3L -> false,
      10L -> false, 11L -> true))
  }

  test("streaming near-dedup transitions equal global semantics (property)") {
    import graft.streaming.{BandFlag, BandHit, IncrementalNearDup}
    import org.apache.spark.sql.streaming.TestGroupState
    import org.scalacheck.{Gen, Prop, Test => SCTest}

    // Random doc->bucket assignments split into id-ordered batches
    // (plus a re-send of the final batch), driven through the pure
    // bucketClaim/docEmit transitions with persistent TestGroupState
    // per key — must equal the global model: survivor iff no bucket
    // shared with a lower-id doc, each survivor emitted exactly once.
    val genCorpus: Gen[List[(Long, List[String])]] =
      Gen.choose(1, 14).flatMap(n =>
        Gen.sequence[List[(Long, List[String])], (Long, List[String])](
          (1 to n).map(id => Gen.choose(1, 3).flatMap(b =>
            Gen.listOfN(b, Gen.oneOf("a", "b", "c", "d", "e"))
              .map(bs => (id.toLong, bs.distinct))))))

    def freshLong = TestGroupState.create[Long](
      optionalState = org.apache.spark.api.java.Optional.empty[Long](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    def freshBool = TestGroupState.create[Boolean](
      optionalState = org.apache.spark.api.java.Optional.empty[Boolean](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)

    val p = Prop.forAll(genCorpus, Gen.choose(1, 3)) { (corpus, nBatches) =>
      val slices = corpus.grouped(
        math.max(1, (corpus.size + nBatches - 1) / nBatches)).toList
      val batches = slices :+ slices.last // byte-identical re-send
      val bucketState = scala.collection.mutable.Map
        .empty[String, TestGroupState[Long]]
      val docState = scala.collection.mutable.Map
        .empty[Long, TestGroupState[Boolean]]
      val emitted = scala.collection.mutable.ListBuffer.empty[Long]
      batches.foreach { batch =>
        val hits = batch.flatMap { case (id, bs) =>
          bs.map(b => BandHit(b, id)) }
        val flags = hits.groupBy(_.bkey).toList.flatMap { case (bk, hs) =>
          IncrementalNearDup.bucketClaim(bk, hs.iterator,
            bucketState.getOrElseUpdate(bk, freshLong)).toList
        }
        flags.groupBy(_.doc_id).foreach { case (id, fs) =>
          IncrementalNearDup.docEmit(id, fs.iterator,
            docState.getOrElseUpdate(id, freshBool))
            .foreach(s => emitted += s.doc_id)
        }
      }
      val model = corpus.collect { case (id, bs)
        if !corpus.exists { case (o, obs) =>
          o < id && obs.exists(bs.contains) } => id }
      emitted.sorted == model.sorted && emitted.distinct == emitted.toList
    }
    assert(SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(300), p).passed)
  }

  test("bloom dedup transition matches the closed form, state bounded") {
    import graft.streaming.{BloomDedup, FpDoc}
    import org.apache.spark.sql.streaming.TestGroupState
    def bloomState = TestGroupState.create[Array[Byte]](
      optionalState = org.apache.spark.api.java.Optional.empty[Array[Byte]](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)

    // Tiny filter (32 bits, k=2) over 20 distinct fps: collisions are
    // certain, and the emitted set must equal the closed form — doc
    // suppressed iff all its positions are covered by a lower-id doc.
    val bits = 32; val k = 2
    val docs = (1L to 20L).map(i => FpDoc(f"fp$i%02d", i))
    val expect = docs.filterNot { d =>
      val pos = (0 until k).map(j => BloomDedup.position(d.fp, j, bits))
      pos.forall(p => docs.exists(e => e.doc_id < d.doc_id &&
        (0 until k).exists(j => BloomDedup.position(e.fp, j, bits) == p)))
    }.map(_.doc_id)
    val st = bloomState
    val half = docs.partition(_.doc_id <= 10L)
    val got1 = BloomDedup.bloomSight(0, half._1.iterator, st, bits, k)
      .map(_.doc_id).toSeq
    val got2 = BloomDedup.bloomSight(0, half._2.iterator, st, bits, k)
      .map(_.doc_id).toSeq
    assert((got1 ++ got2) == expect) // cross-batch carry included
    assert(expect.size < docs.size)  // the tiny filter really collides
    assert(st.get.length == bits / 8) // state is the parameter bound
    // a byte-identical re-send emits nothing (true dups one-sided)
    assert(BloomDedup.bloomSight(0, docs.iterator, st, bits, k).isEmpty)

    // end-to-end drive: production-sized filter, tiny corpus — no
    // collisions, so survivors equal exact first-per-fingerprint
    val in = Files.createTempDirectory("bd_in").toString
    val out = Files.createTempDirectory("bd_out").toString
    val ckpt = Files.createTempDirectory("bd_ckpt").toString
    val b1 = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha beta"))
      .toDF("doc_id", "text")
    val b2 = Seq((10L, "alpha beta"), (11L, "epsilon zeta"))
      .toDF("doc_id", "text")
    b1.write.mode("append").parquet(in)
    BloomDedup.bloomDedupRun(spark, in, out, ckpt, b1.schema)
    b2.write.mode("append").parquet(in)
    BloomDedup.bloomDedupRun(spark, in, out, ckpt, b1.schema)
    b2.write.mode("append").parquet(in)
    BloomDedup.bloomDedupRun(spark, in, out, ckpt, b1.schema)
    assert(spark.read.parquet(out).collect()
      .map(_.getLong(1)).toSet == Set(1L, 2L, 11L))
  }

  test("bloom transition equals the closed form (property)") {
    import graft.streaming.{BloomDedup, FpDoc}
    import org.apache.spark.sql.streaming.TestGroupState
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def bloomState = TestGroupState.create[Array[Byte]](
      optionalState = org.apache.spark.api.java.Optional.empty[Array[Byte]](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    // Random fingerprints (duplicates included), random batch count,
    // tiny filters (8..64 bits) so collisions and the byte-boundary
    // bit arithmetic are both exercised; must equal the closed form:
    // suppressed iff all k positions covered by a lower-id doc.
    val genFps: Gen[List[String]] = Gen.choose(1, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf((0 until 12).map(i => f"fp$i%02x"))))
    val p = Prop.forAll(genFps, Gen.oneOf(8, 16, 24, 64),
        Gen.choose(1, 4), Gen.choose(1, 3)) { (fps, bits, k, nb) =>
      val docs = fps.zipWithIndex.map { case (f, i) => FpDoc(f, i + 1L) }
      val expect = docs.filterNot { d =>
        val pos = (0 until k).map(j => BloomDedup.position(d.fp, j, bits))
        pos.forall(p => docs.exists(e => e.doc_id < d.doc_id &&
          (0 until k).exists(j =>
            BloomDedup.position(e.fp, j, bits) == p)))
      }.map(_.doc_id)
      val st = bloomState
      val got = docs.grouped(
        math.max(1, (docs.size + nb - 1) / nb)).toList.flatMap(b =>
        BloomDedup.bloomSight(0, b.iterator, st, bits, k)
          .map(_.doc_id).toList)
      got == expect
    }
    assert(SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(300), p).passed)
  }

  test("K7/K8 status sinks render geojson and JSON array") {
    val df = Seq(
      ("SiteA", -34.0, 140.5, 0.4, "ok"),
      ("SiteB", -35.1, 141.0, 9.9, "stale_7_plus"))
      .toDF("site", "lat", "lon", "days_since_last", "bucket")
    val dir = Files.createTempDirectory("status")
    Status.writeGeojson(df, s"$dir/status.geojson", "site", "lat", "lon")
    val gj = Files.readString(java.nio.file.Path.of(s"$dir/status.geojson"))
    assert(gj.contains("\"FeatureCollection\""))
    assert(gj.contains("[140.5, -34.0]"))
    assert(gj.contains("\"site\": \"SiteA\""))

    Status.writeJsonArray(df, s"$dir/details.json")
    val ja = Files.readString(java.nio.file.Path.of(s"$dir/details.json"))
    assert(ja.startsWith("[") && ja.contains("\"days_since_last\": 9.9"))
    // both parse as JSON
    assert(ujsonParses(gj) && ujsonParses(ja))
  }

  test("clockStatus flags drift and offline loggers") {
    val ref = ts("2024-06-01 00:00:00")  // UTC reference instant
    val df = Seq(
      // site-local 10:00 at +10h == 00:00 UTC -> drift 0
      ("s1", Some(ts("2024-06-01 10:00:00")), 10.0),
      // reports 09:49 local -> 11 min slow
      ("s2", Some(ts("2024-06-01 09:49:00")), 10.0),
      ("s3", None, 9.5))                 // no response
      .toDF("site", "reported_ts", "utc_offset_hours")
    val out = graft.pipeline.Status.clockStatus(df, ref)
      .orderBy("site").collect()
    assert(out(0).getAs[Boolean]("online")
      && out(0).getAs[Double]("drift_seconds") == 0.0
      && out(0).getAs[Boolean]("clock_ok"))
    assert(out(1).getAs[Double]("drift_seconds") == 660.0
      && !out(1).getAs[Boolean]("clock_ok"))
    assert(!out(2).getAs[Boolean]("online") && out(2).isNullAt(
      out(2).fieldIndex("clock_ok")))
  }

  test("fileHashConflicts reports same-name different-content files") {
    val files = Seq(
      ("TOB3_a.dat", "samecontent"), ("TOB3_a.dat", "samecontent"),
      ("TOB3_b.dat", "v1"), ("TOB3_b.dat", "v2"),
      ("TOB3_c.dat", "only"))
      .map { case (n, c) => (n, c.getBytes("UTF-8")) }
      .toDF("fileName", "content")
    val conflicts = graft.pipeline.FastData.fileHashConflicts(files)
      .collect()
    assert(conflicts.length == 1)
    assert(conflicts.head.getAs[String]("file_name") == "TOB3_b.dat")
    assert(conflicts.head.getAs[Long]("n_files") == 2L)
  }

  private def ujsonParses(s: String): Boolean =
    try {
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
      true
    } catch { case _: Exception => false }

  test("S14 logger HTTP adapter: command grammar + payload wrangle") {
    import graft.sources.LoggerHttp
    import graft.sources.LoggerHttp._
    val payload = """{
      "head": {"fields": [
        {"name": "Ta", "type": "xsd:float", "units": "degC",
         "process": "Smp", "settable": false},
        {"name": "RH", "type": "xsd:float", "units": "percent",
         "process": "Smp", "settable": false}]},
      "data": [
        {"time": "2024-06-01T10:00:00", "no": 41, "vals": [21.5, 55.0]},
        {"time": "2024-06-01T10:30:00", "no": 42, "vals": [22.0, null]}]}"""
    val url = "http://10.0.0.1/?command=dataquery&uri=dl:met.Ta" +
      "&mode=date-range&p1=2024-06-01T00:00:00&p2=2024-06-02T00:00:00" +
      "&format=json"
    // exact-URL fixture: a grammar drift fails the lookup loudly
    val transport = FixtureTransport(Map(url -> payload))
    val df = LoggerHttp.getDataByDateRange(spark, transport, "10.0.0.1",
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-06-02 00:00:00"),
      "met", Some("Ta"))
    assert(df.columns.toSeq == Seq("TIMESTAMP", "RECORD", "Ta", "RH"))
    val rows = df.orderBy("RECORD").collect()
    assert(rows.length == 2)
    assert(rows(0).getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2024-06-01 10:00:00"))
    assert(rows(0).getLong(1) == 41 && rows(0).getDouble(2) == 21.5)
    assert(rows(1).isNullAt(3)) // null val survives as null
    // since-time and most-recent grammars
    val sinceUrl = "http://10.0.0.1/?command=dataquery&uri=dl:met" +
      "&mode=since-time&p1=2024-06-01T00:00:00&format=json"
    val recentUrl = "http://10.0.0.1/?command=dataquery&uri=dl:met" +
      "&mode=most-recent&p1=3&format=json"
    val t2 = FixtureTransport(Map(sinceUrl -> payload, recentUrl -> payload))
    assert(LoggerHttp.getDataSinceDate(spark, t2, "10.0.0.1",
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), "met")
      .count() == 2)
    assert(LoggerHttp.getDataNRecordsBack(spark, t2, "10.0.0.1", "met",
      recsBack = 3).count() == 2)
    // clock check
    val clock = LoggerHttp.clockCheck(spark,
      FixtureTransport(Map("http://10.0.0.1/?command=ClockCheck&format=json"
        -> """{"time": "2024-06-01T10:00:05"}""")), "10.0.0.1")
      .head()
    assert(clock.getTimestamp(1) ==
      java.sql.Timestamp.valueOf("2024-06-01 10:00:05"))
    // fleet poll fans out and carries payloads back per IP
    val fleet = LoggerHttp.pollFleet(spark,
      FixtureTransport(Map(
        "http://10.0.0.1/?command=ClockCheck&format=json" -> "a",
        "http://10.0.0.2/?command=ClockCheck&format=json" -> "b")),
      Seq("10.0.0.1", "10.0.0.2"), "ClockCheck")
      .orderBy("ip_addr").collect()
    assert(fleet.map(_.getString(1)).toSeq == Seq("a", "b"))
    // invalid format rejected like the reference
    intercept[IllegalArgumentException] {
      LoggerHttp.buildCmdStr("10.0.0.1", "x", Some("csv"))
    }
    // zero enabled loggers -> empty frame, not a repartition(0) crash
    val none = LoggerHttp.pollFleet(spark,
      FixtureTransport(Map.empty), Nil, "ClockCheck")
    assert(none.count() == 0
      && none.columns.toSeq == Seq("ip_addr", "payload"))
  }

  test("K6 status workbook: sheets, run line, staleness fills, widths") {
    import graft.pipeline.{Status, Xlsx}
    import java.util.zip.ZipFile
    val files = Seq(
      ("SiteA", "met.dat", 0.5), ("SiteA", "flux.dat", 8.0)
    ).toDF("site", "file_name", "days_since_last_record")
    val siteA = Seq(
      ("Ta", 0.2), ("Fco2", 4.0)
    ).toDF("variable", "days_since_last_valid_record")
    val dir = java.nio.file.Files.createTempDirectory("xlsx")
    val path = dir.resolve("network_status.xlsx").toString
    Status.writeStatusWorkbook(path, files, Seq("SiteA" -> siteA),
      java.sql.Timestamp.valueOf("2026-08-12 10:00:00"))

    val zf = new ZipFile(path)
    def read(name: String): String = {
      val in = zf.getInputStream(zf.getEntry(name))
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    }
    try {
      val wb = read("xl/workbook.xml")
      assert(wb.contains("\"File_status\"") && wb.contains("\"SiteA\"")
        && wb.contains("\"Key\""))
      val s1 = read("xl/worksheets/sheet1.xml")
      assert(s1.contains("RUN date/time: 2026-08-12 10:00"))
      assert(s1.contains("days_since_last_record"))
      // 0.5 days -> green (style 1); 8.0 days -> red (style 5)
      assert(s1.contains("""<c r="C3" s="1"><v>0.5</v></c>"""))
      assert(s1.contains("""<c r="C4" s="5"><v>8.0</v></c>"""))
      assert(s1.contains("customWidth"))
      val s2 = read("xl/worksheets/sheet2.xml")
      // 4.0 days -> magenta (style 3) in the site data sheet
      assert(s2.contains("""s="3""""))
      val styles = read("xl/styles.xml")
      Status.StatusFills.foreach(c => assert(styles.contains(c)))
      val key = read("xl/worksheets/sheet3.xml")
      assert(key.contains("magenta") && key.contains("days &gt;= 7"))
      // column letters
      assert(Xlsx.colLetter(0) == "A" && Xlsx.colLetter(25) == "Z"
        && Xlsx.colLetter(26) == "AA" && Xlsx.colLetter(27 * 26) == "AAA")
    } finally zf.close()
  }

  test("S12 xlsx read: writer roundtrip, header row, usecols, typing") {
    import graft.pipeline.Xlsx
    val dir = java.nio.file.Files.createTempDirectory("xlsxr")
    val path = dir.resolve("config.xlsx").toString
    Xlsx.write(path, Seq(Xlsx.Sheet("Sites", Seq(
      Seq(Xlsx.Cell("Site"), Xlsx.Cell("latitude"), Xlsx.Cell("active")),
      Seq(Xlsx.Cell("Calperum"), Xlsx.Cell(-34.003), Xlsx.Cell(true)),
      Seq(Xlsx.Cell("Boyagin"), Xlsx.Cell(-32.477), Xlsx.Cell(false))))),
      Nil)
    val df = Xlsx.readSheet(spark, path, "Sites")
    assert(df.columns.toSeq == Seq("Site", "latitude", "active"))
    assert(df.schema("latitude").dataType ==
      org.apache.spark.sql.types.DoubleType)
    val rows = df.orderBy("Site").collect()
    assert(rows(0).getString(0) == "Boyagin"
      && rows(0).getDouble(1) == -32.477
      && rows(0).getString(2) == "false")
    // usecols projection
    val slim = Xlsx.readSheet(spark, path, "Sites",
      usecols = Seq("Site", "active"))
    assert(slim.columns.toSeq == Seq("Site", "active"))
    intercept[NoSuchElementException] {
      Xlsx.readSheet(spark, path, "Nope")
    }
    // external-workbook shape: shared strings + unquoted cell order
    val ext = dir.resolve("external.xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(ext))
    def part(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    part("xl/workbook.xml",
      """<workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<Relationships><Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>""")
    part("xl/sharedStrings.xml",
      """<sst><si><t>name</t></si><si><t>v</t></si><si><t>tower A</t></si></sst>""")
    part("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row><row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>7.5</v></c></row></sheetData></worksheet>""")
    zos.close()
    val edf = Xlsx.readSheet(spark, ext, "S")
    val er = edf.head()
    assert(edf.columns.toSeq == Seq("name", "v"))
    assert(er.getString(0) == "tower A" && er.getDouble(1) == 7.5)
    // omitted empty row must NOT shift later rows up (row r attr)
    val gap = dir.resolve("gap.xlsx").toString
    val z2 = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(gap))
    def part2(name: String, body: String): Unit = {
      z2.putNextEntry(new java.util.zip.ZipEntry(name))
      z2.write(body.getBytes("UTF-8")); z2.closeEntry()
    }
    part2("xl/workbook.xml",
      """<workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    part2("xl/_rels/workbook.xml.rels",
      """<Relationships><Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>""")
    part2("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row><row r="3"><c r="A3"><v>9.5</v></c></row></sheetData></worksheet>""")
    z2.close()
    val graw = Xlsx.readRaw(gap, "S")
    assert(graw.length == 3 && graw(1).isEmpty)
    assert(graw(2)(0).contains(9.5))
    // NaN numeric cells write as blank (valid xlsx), read back absent
    val nanPath = dir.resolve("nan.xlsx").toString
    Xlsx.write(nanPath, Seq(Xlsx.Sheet("N", Seq(
      Seq(Xlsx.Cell("d")), Seq(Xlsx.Cell(Double.NaN, fill = 0))))), Nil)
    val nraw = Xlsx.readRaw(nanPath, "N")
    assert(nraw(1).forall(_.isEmpty))
  }

  test("F32 staleness buckets") {
    val out = Seq(0.5, 2.0, 4.0, 6.0, 10.0).toDF("d")
      .select(Status.stalenessBucket(col("d"))).as[String].collect()
    assert(out.toSeq == Seq("ok", "warning_1_3", "warning_3_5",
      "warning_5_7", "stale_7_plus"))
  }

  test("multimodal feature extraction batch shape") {
    import graft.multimodal.Multimodal
    val media = Seq((1L, "utf8", "hello".getBytes),
        (2L, "utf8", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "format", "payload")
    val out = Multimodal.extractFeatures(media,
      Multimodal.MediaDecoder.Deterministic(4)).orderBy("media_id").collect()
    assert(out(0).getInt(out(0).fieldIndex("payload_bytes")) == 5)
    assert(out(0).getSeq[Float](out(0).fieldIndex("features")).length == 4)
    assert(out(1).isNullAt(out(1).fieldIndex("features"))) // null payload
  }

  test("synthetic BMP round-trips pixel-exactly through javax.imageio") {
    import graft.multimodal.Multimodal.SyntheticMedia
    val seed = 4242L
    val bytes = SyntheticMedia.docBmp(seed, 8, 8)
    assert(bytes.length == 246) // 54-byte header + 8 rows * 24 bytes
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == 8 && img.getHeight == 8)
    val s = (seed % 256).toInt
    for (x <- 0 until 8; y <- 0 until 8) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == (s * 3 + x * 7 + y * 11) % 256)
      assert(((rgb >> 8) & 0xff) == (s * 5 + x * 11 + y * 3) % 256)
      assert((rgb & 0xff) == (s * 7 + x * 3 + y * 13) % 256)
    }
  }

  test("ImageIo decoder: real features, PNG parity, poison fallback") {
    import graft.multimodal.Multimodal
    import Multimodal.{MediaDecoder, SyntheticMedia}
    val dec = MediaDecoder.ImageIo()
    // Constant-color 4x2 image: means are exact, 3/4 of rows bright.
    val flat = SyntheticMedia.bmp24(4, 2)((x, _) =>
      if (x == 0) (10, 20, 30) else (200, 150, 100))
    val f = dec.decodeToFeatures("bmp", flat)
    assert(f(0) == 4.0f && f(1) == 2.0f)
    assert(f(2) == (10 * 2 + 200 * 6) / 8.0f)
    assert(f(3) == (20 * 2 + 150 * 6) / 8.0f)
    assert(f(4) == (30 * 2 + 100 * 6) / 8.0f)
    assert(f(5) == 6 / 8.0f) // 200+150+100 = 450 >= 384; 60 < 384
    // Same pixels through the PNG codec give identical features.
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(flat))
    val png = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", png)
    assert(dec.decodeToFeatures("png", png.toByteArray).toSeq == f.toSeq)
    // Undecodable payload: null without fallback, stub with one.
    assert(dec.decodeToFeatures("bmp", Array[Byte](1, 2, 3)) == null)
    val withFb = MediaDecoder.ImageIo(Some(MediaDecoder.Deterministic(6)))
    assert(withFb.decodeToFeatures("bmp", Array[Byte](1, 2, 3)).length == 6)
  }

  test("AudioIo decoder: WAV round-trip features, poison fallback") {
    import graft.multimodal.Multimodal
    import Multimodal.{MediaDecoder, SyntheticMedia}
    val dec = MediaDecoder.AudioIo()
    // Known four-sample signal: features are exact by hand.
    val wav = SyntheticMedia.wavPcm16(16000, 4)(
      Seq(100, -200, 0, 300))
    val f = dec.decodeToFeatures("wav", wav)
    assert(f(0) == 16000.0f && f(1) == 4.0f)
    assert(f(2) == (100 + 200 + 0 + 300) / 4.0f)         // mean |s|
    assert(f(3) == math.sqrt((100.0 * 100 + 200 * 200 + 300 * 300) / 4.0)
      .toFloat)                                           // rms
    assert(f(4) == 3 / 4.0f)                              // nonneg frac
    assert(f(5) == 300.0f)                                // max |s|
    // The doc generator round-trips through the real parser.
    val doc = dec.decodeToFeatures("wav", SyntheticMedia.docWav(7L))
    assert(doc(0) == 8000.0f && doc(1) == 256.0f)
    val s0 = ((7 % 1009) * 131 + 0 * 997) % 65536 - 32768
    assert(doc(5) >= math.abs(s0).toFloat) // max covers sample 0
    // Undecodable payload: null without fallback, stub with one.
    assert(dec.decodeToFeatures("wav", Array[Byte](9, 9, 9)) == null)
    val withFb = MediaDecoder.AudioIo(Some(MediaDecoder.Deterministic(6)))
    assert(withFb.decodeToFeatures("wav", Array[Byte](9, 9, 9)).length == 6)
  }

  test("AviDib decoder: AVI/DIB round-trip features, stride, poison") {
    import graft.multimodal.Multimodal
    import Multimodal.{MediaDecoder, SyntheticMedia}
    // 2x2, 3 frames, constant per-frame colors: features exact by hand.
    val colors = Seq((10, 20, 30), (200, 200, 0), (90, 91, 92))
    val avi = SyntheticMedia.aviDib(2, 2, 3)((f, _, _) => colors(f))
    val all = MediaDecoder.AviDib().decodeToFeatures("avi", avi)
    assert(all(0) == 2.0f && all(1) == 2.0f)      // width, height
    assert(all(2) == 3.0f && all(3) == 3.0f)      // frames, sampled
    assert(all(4) == (10 + 200 + 90) / 3.0f)      // mean R
    assert(all(5) == (20 + 200 + 91) / 3.0f)      // mean G
    assert(all(6) == (30 + 0 + 92) / 3.0f)        // mean B
    assert(all(7) == 1 / 3.0f)                    // only frame 1 bright (400)
    // Stride 2 samples frames 0 and 2 only.
    val s2 = MediaDecoder.AviDib(frameStride = 2).decodeToFeatures("avi", avi)
    assert(s2(2) == 3.0f && s2(3) == 2.0f)
    assert(s2(4) == (10 + 90) / 2.0f && s2(6) == (30 + 92) / 2.0f)
    // The doc generator round-trips through the real parser.
    val doc = MediaDecoder.AviDib().decodeToFeatures(
      "avi", SyntheticMedia.docAvi(5L))
    assert(doc(0) == 8.0f && doc(1) == 6.0f && doc(2) == 6.0f)
    // Poison: null without fallback, stub features with one.
    assert(MediaDecoder.AviDib().decodeToFeatures(
      "avi", Array[Byte](1, 2, 3)) == null)
    assert(MediaDecoder.AviDib(fallback = Some(MediaDecoder.Deterministic(8)))
      .decodeToFeatures("avi", Array[Byte](1, 2, 3)).length == 8)
  }

  test("AviDib decoder: MJPEG-in-AVI frames decode via ImageIO, " +
      "stride skips decodes, corrupt JPEG falls back") {
    import graft.multimodal.Multimodal
    import Multimodal.{MediaDecoder, SyntheticMedia}
    val (avi, jpegs) = SyntheticMedia.docAviMjpeg(7L, 16, 12, 4)
    // independent expectation: re-decode the SAME JPEG bytes outside
    // the RIFF walker and accumulate the kernel's stats by hand
    def stats(sel: Seq[Array[Byte]]): (Long, Long, Long, Long) = {
      var sr = 0L; var sg = 0L; var sb = 0L; var br = 0L
      sel.foreach { j =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(j))
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          sr += r; sg += g; sb += b
          if (r + g + b >= 384) br += 1
        }
      }
      (sr, sg, sb, br)
    }
    val all = MediaDecoder.AviDib().decodeToFeatures("avi", avi)
    assert(all(0) == 16.0f && all(1) == 12.0f)
    assert(all(2) == 4.0f && all(3) == 4.0f)
    val (sr, sg, sb, br) = stats(jpegs)
    val n = 4L * 16 * 12
    assert(all(4) == (sr.toDouble / n).toFloat)
    assert(all(5) == (sg.toDouble / n).toFloat)
    assert(all(6) == (sb.toDouble / n).toFloat)
    assert(all(7) == (br.toDouble / n).toFloat)
    // stride 2: frames 0 and 2 only — half the decodes
    val s2 = MediaDecoder.AviDib(frameStride = 2)
      .decodeToFeatures("avi", avi)
    val (sr2, _, _, _) = stats(Seq(jpegs(0), jpegs(2)))
    assert(s2(2) == 4.0f && s2(3) == 2.0f)
    assert(s2(4) == (sr2.toDouble / (2L * 16 * 12)).toFloat)
    // corrupt frame payload: MJPEG arm bails -> fallback engages
    val bad = SyntheticMedia.aviMjpeg(16, 12,
      Seq(Array[Byte](1, 2, 3, 4)))
    assert(MediaDecoder.AviDib().decodeToFeatures("avi", bad) == null)
    assert(MediaDecoder.AviDib(
        fallback = Some(MediaDecoder.Deterministic(8)))
      .decodeToFeatures("avi", bad).length == 8)
  }

  test("multimodal payload transform keeps schema, shrinks payload") {
    import graft.multimodal.Multimodal
    val media = Seq((1L, "utf8", "hello world payload".getBytes),
        (2L, "utf8", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "format", "payload")
    val out = Multimodal.transformPayload(media,
        Multimodal.MediaTransform.DownsampleStub(maxBytes = 4))
      .orderBy("media_id").collect()
    assert(out(0).schema.fields.map(f => (f.name, f.dataType)).toSeq
      == media.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val p = out(0).getAs[Array[Byte]]("payload")
    assert(p.toSeq == "hlow".getBytes.toSeq)
    assert(out(1).isNullAt(out(1).fieldIndex("payload")))
  }
}
