package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{StreamingVocab, VocabCand, VocabDoc, VocabState}

/** Specs for the streaming heavy-hitter vocabulary: the pure MG
  * transition (counter carry across batches, eviction, watermark),
  * the bounded-state invariant, and cross-run end-to-end parity of
  * the exact-recount close-out with the batch
  * [[graft.text.VocabOps.heavyHitters]]. */
class StreamingVocabSpec extends SparkSpec {
  import spark.implicits._

  private def doc(st: String, id: Long, ts: String*) =
    VocabDoc(st, id, ts)

  test("summarize carries MG counters across batches; eviction " +
      "decrements all and drops zeros; state stays <= k") {
    val st = new TestGroupState[VocabState]
    // k=2: a,a,b -> {a:2, b:1}
    val b1 = StreamingVocab.summarize("en",
      Iterator(doc("en", 1L, "a", "a", "b")), st, k = 2).toSeq
    assert(b1.toSet == Set(VocabCand("en", "a", 2L, 3L),
      VocabCand("en", "b", 1L, 3L)))
    assert(st.value.nSeen == 3L && st.value.counters.size <= 2)
    // next run: c arrives with the map full -> decrement all:
    // a 2->1, b 1->0 (dropped); c not admitted (classic MG)
    val b2 = StreamingVocab.summarize("en",
      Iterator(doc("en", 2L, "c")), st, k = 2).toSeq
    assert(b2.toSet == Set(VocabCand("en", "a", 1L, 4L)))
    assert(st.value.counters == Map("a" -> 1L))
    // doc_id order inside a batch is the fold order: ids 4 then 7
    val st2 = new TestGroupState[VocabState]
    val b3 = StreamingVocab.summarize("de",
      Iterator(doc("de", 7L, "y"), doc("de", 4L, "x")), st2, k = 1).toSeq
    // k=1: x admitted; y arrives full -> x decrements to 0, dropped
    assert(b3.isEmpty && st2.value.nSeen == 2L)
  }

  test("MG guarantee: every token above the threshold survives " +
      "arbitrary slicing; close-out equals the batch operator") {
    // 60 docs, 3 langs, Zipf-ish token stream with guaranteed-heavy
    // tokens per lang
    val docs = (0L until 60L).map { i =>
      val lang = Seq("en", "de", "fr")((i % 3).toInt)
      val toks = Seq.tabulate(12)(j =>
        if (j < 6) s"hot_$lang" else s"w${(i * 12 + j) % 37}")
      (i, lang, toks.mkString(" "))
    }.toDF("doc_id", "lang", "text")

    // batch truth at phi = 1/10 per lang (exact counts)
    val tok = docs.select(col("lang"),
      explode(graft.text.TextOps.tokens(col("text"))).as("token"))
    val tot = tok.groupBy("lang").agg(count(lit(1)).as("n_total"))
    val want = tok.groupBy("lang", "token").agg(count(lit(1)).as("n_tok"))
      .join(tot, "lang")
      .filter(col("n_tok") * 10 > col("n_total"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(want.nonEmpty)

    // streaming: three drains over id slices, k = 10 counters/stratum
    val root = Files.createTempDirectory("graft_svocab").toString
    val inDir = s"$root/in"; val outDir = s"$root/cand"
    val staged = docs.select(col("doc_id"), col("lang"),
      graft.text.TextOps.tokens(col("text")).as("toks"))
    staged.filter(col("doc_id") < 20).coalesce(1).write.parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    def drain(): Unit = StreamingVocab.summariesRun(spark, inDir,
      outDir, s"$root/ckpt", schema, "lang", "toks", k = 10)
    drain()
    staged.filter(col("doc_id") >= 20 && col("doc_id") < 40)
      .coalesce(1).write.mode("append").parquet(inDir)
    drain()
    staged.filter(col("doc_id") >= 40).coalesce(1).write.mode("append")
      .parquet(inDir)
    drain()

    val snaps = spark.read.parquet(outDir)
    val finalSnap = snaps.join(
      snaps.groupBy("stratum").agg(max("n_seen").as("n_seen")),
      Seq("stratum", "n_seen"))
    // bounded state: every snapshot (not just the final) holds <= k
    // candidates per stratum
    val maxCand = snaps.groupBy("stratum", "n_seen")
      .agg(count(lit(1)).as("n")).agg(max("n")).head().getLong(0)
    assert(maxCand <= 10L)
    // the final watermark equals the exact stratum total (stream
    // counted every token exactly once across drains)
    val wm = finalSnap.select("stratum", "n_seen").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    tot.collect().foreach(r =>
      assert(wm(r.getString(0)) == r.getLong(1)))
    // close-out == batch truth
    val exact = tok.groupBy(col("lang").as("stratum"), col("token"))
      .agg(count(lit(1)).as("n_tok"))
    val got = finalSnap.select("stratum", "token", "n_seen")
      .join(exact, Seq("stratum", "token"))
      .filter(col("n_tok") * 10 > col("n_seen"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(3), r.getLong(2))).toSet
    assert(got == want)
  }
}
