package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{CmState, HllState, SketchDoc, StreamingSketch}

/** Specs for the streaming sketch tier: the pure HLL/CM transitions
  * (register max-merge / cell sum-merge across triggers, bounded
  * state, watermark), JVM-vs-SQL hash arithmetic identity, and the
  * one-line close-out proof — the final streaming snapshot equals the
  * batch sketch of the concatenated corpus register-for-register /
  * cell-for-cell, however the stream was sliced. */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private def doc(g: String, id: Long, ts: String*) =
    SketchDoc(g, id, ts)

  test("hllSummarize max-merges registers across triggers and " +
      "stamps the tokens-seen watermark") {
    val st = new TestGroupState[HllState]
    val b1 = StreamingSketch.hllSummarize("en",
      Iterator(doc("en", 1L, "a", "b", "a")), st, 3).toSeq
    assert(st.value.nSeen == 3L)
    assert(b1.forall(_.n_seen == 3L))
    // 'a' twice must not change its register (max, not sum)
    val regs1 = b1.map(r => r.bucket -> r.max_rho).toMap
    val b2 = StreamingSketch.hllSummarize("en",
      Iterator(doc("en", 2L, "a", "c")), st, 3).toSeq
    assert(st.value.nSeen == 5L)
    val regs2 = b2.map(r => r.bucket -> r.max_rho).toMap
    // old registers survive and never decrease
    assert(regs1.forall { case (b, r) => regs2(b) >= r })
    // bounded state: <= 4096 registers at 3 hex digits
    assert(st.value.regs.size <= 4096)
  }

  test("cmSummarize sum-merges cells across triggers") {
    val st = new TestGroupState[CmState]
    StreamingSketch.cmSummarize("en",
      Iterator(doc("en", 1L, "x", "x", "y")), st, 4, 3).toSeq
    val n1 = st.value.cells.values.sum
    assert(n1 == 3L * 4) // every occurrence lands in all 4 rows
    StreamingSketch.cmSummarize("en",
      Iterator(doc("en", 2L, "x")), st, 4, 3).toSeq
    assert(st.value.cells.values.sum == 4L * 4)
    assert(st.value.nSeen == 4L)
    assert(st.value.cells.size <= 4 * 4096)
  }

  test("JVM-side hash arithmetic matches the batch SQL operators") {
    val df = Seq("alpha beta", "β-unicode mixes", "x Zz9 x")
      .toDF("text").withColumn("lang", lit("g"))
    // the batch tokenizer's own output is the comparison substrate —
    // the JVM side must hash exactly what the SQL side hashed
    val toks = df.select(explode(
        graft.text.TextOps.tokens(col("text"))).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(toks.nonEmpty && toks.toSet.size < toks.size) // has a dupe
    // HLL: batch registers == JVM (bucket, max rho) over the tokens
    val batchHll = graft.text.SketchOps
      .hllTokenRegisters(df, "text", "lang")
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    val jvmHll = toks.map(w => StreamingSketch.hllBucketRho(w, 3))
      .groupBy(_._1).map { case (b, rs) => (b, rs.map(_._2).max) }.toSet
    assert(batchHll == jvmHll)
    // CM: batch cells == JVM column hashes with multiplicity
    val batchCm = graft.text.SketchOps.cmTokenCells(df, "text", "lang")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val jvmCm = (for { w <- toks; r <- 0 until 4 }
        yield (r, StreamingSketch.cmCol(w, r, 3)))
      .groupBy(x => x).map { case ((r, c), hits) =>
        (r, c, hits.size.toLong) }.toSet
    assert(batchCm == jvmCm)
  }

  test("rankSummarize sum-merges decimal buckets across triggers; " +
      "negatives refuse") {
    import graft.streaming.{RankState, ValueDoc}
    val st = new TestGroupState[RankState]
    graft.streaming.StreamingSketch.rankSummarize("g",
      Iterator(ValueDoc("g", 1L, 123L), ValueDoc("g", 2L, 7L)),
      st, 2).toSeq
    // 123 -> (3, 12); 7 -> (1, 7)
    assert(st.value.cells == Map((3L << 32 | 12L) -> 1L,
      (1L << 32 | 7L) -> 1L) && st.value.nSeen == 2L)
    graft.streaming.StreamingSketch.rankSummarize("g",
      Iterator(ValueDoc("g", 3L, 125L)), st, 2).toSeq
    assert(st.value.cells((3L << 32) | 12L) == 2L)
    intercept[IllegalArgumentException] {
      graft.streaming.StreamingSketch.rankSummarize("g",
        Iterator(ValueDoc("g", 4L, -1L)), st, 2).toSeq
    }
  }

  test("rank sketch three-drain close-out equals the batch operator") {
    val docs = (0L until 60L).map { i =>
      (i, Seq("en", "de")((i % 2).toInt), (i * i * 37L) % 4321L)
    }.toDF("doc_id", "lang", "n_tok")
    val want = graft.operators.StatsOps
      .rankSketchCells(docs, "n_tok", "lang")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val root = Files.createTempDirectory("graft_srank").toString
    val inDir = s"$root/in"
    docs.filter(col("doc_id") < 20).coalesce(1).write.parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    def drain(): Unit = graft.streaming.StreamingSketch.rankCellsRun(
      spark, inDir, s"$root/out", s"$root/ckpt", schema, "lang", "n_tok")
    drain()
    docs.filter(col("doc_id") >= 20 && col("doc_id") < 40)
      .coalesce(1).write.mode("append").parquet(inDir)
    drain()
    docs.filter(col("doc_id") >= 40).coalesce(1).write.mode("append")
      .parquet(inDir)
    drain()
    val snaps = spark.read.parquet(s"$root/out")
    val got = snaps.join(
        snaps.groupBy("group").agg(max("n_seen").as("n_seen")),
        Seq("group", "n_seen"))
      .select("group", "digits", "lead", "n").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
  }

  test("close-out parity: three drains == the batch sketch, " +
      "register-for-register and cell-for-cell") {
    val docs = (0L until 60L).map { i =>
      val lang = Seq("en", "de", "fr")((i % 3).toInt)
      val toks = Seq.tabulate(10)(j => s"w${(i * 10 + j) % 83}")
      (i, lang, toks.mkString(" "))
    }.toDF("doc_id", "lang", "text")

    val wantHll = graft.text.SketchOps
      .hllTokenRegisters(docs, "text", "lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .toSet
    val wantCm = graft.text.SketchOps.cmTokenCells(docs, "text", "lang")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet

    val root = Files.createTempDirectory("graft_ssketch").toString
    val inDir = s"$root/in"
    val staged = docs.select(col("doc_id"), col("lang"),
      graft.text.TextOps.tokens(col("text")).as("toks"))
    staged.filter(col("doc_id") < 20).coalesce(1).write.parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    def drain(sketch: String): Unit = StreamingSketch.sketchRun(spark,
      inDir, s"$root/out_$sketch", s"$root/ckpt_$sketch", schema,
      "lang", "toks", sketch)
    def drainBoth(): Unit = { drain("hll"); drain("cm") }
    drainBoth()
    staged.filter(col("doc_id") >= 20 && col("doc_id") < 40)
      .coalesce(1).write.mode("append").parquet(inDir)
    drainBoth()
    staged.filter(col("doc_id") >= 40).coalesce(1).write.mode("append")
      .parquet(inDir)
    drainBoth()

    def finalSnap(dirName: String) = {
      val snaps = spark.read.parquet(s"$root/$dirName")
      snaps.join(snaps.groupBy("group").agg(max("n_seen").as("n_seen")),
        Seq("group", "n_seen"))
    }
    val gotHll = finalSnap("out_hll")
      .select("group", "bucket", "max_rho").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(gotHll == wantHll)
    val gotCm = finalSnap("out_cm")
      .select("group", "row", "col", "n").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(gotCm == wantCm)
    // final watermark == exact token total per lang (each token
    // folded exactly once across drains)
    val tot = docs.select(col("lang"), explode(
        graft.text.TextOps.tokens(col("text"))).as("t"))
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wm = finalSnap("out_hll").select("group", "n_seen").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tot == wm)
  }
}
