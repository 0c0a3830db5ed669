package graft

import org.apache.spark.sql.functions._

import graft.text.SketchOps

/** Specs for the HLL register sketch: literal ρ re-derivation,
  * duplicate insensitivity, union-exact mergeability, and estimate
  * accuracy at the documented m = 4096 error level. */
class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private def regs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getInt(2))).toSet

  test("registers match a literal md5 re-derivation") {
    val docs = Seq(("en", "alpha beta gamma"), ("de", "alpha"))
      .toDF("lang", "text")
    val got = regs(SketchOps.hllTokenRegisters(docs, "text", "lang"))
    def brute(tok: String): (Long, Int) = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(h.substring(0, 3), 16)
      val tail = h.substring(3, 15)
      val st = tail.dropWhile(_ == '0')
      val rho =
        if (st.isEmpty) 49
        else {
          val d = Integer.parseInt(st.substring(0, 1), 16)
          val lz = if (d >= 8) 0 else if (d >= 4) 1 else if (d >= 2) 2 else 3
          (12 - st.length) * 4 + lz + 1
        }
      (bucket, rho)
    }
    val want = Seq("en" -> Seq("alpha", "beta", "gamma"),
      "de" -> Seq("alpha"))
      .flatMap { case (g, ts) => ts.map(t => (g, brute(t))) }
      .groupBy { case (g, (b, _)) => (g, b) }
      .map { case ((g, b), rows) =>
        (g, b, rows.map(_._2._2).max) }.toSet
    assert(got == want)
  }

  test("duplicate occurrences don't move registers") {
    val once = Seq(("x", "foo bar baz")).toDF("lang", "text")
    val many = Seq.fill(7)(("x", "foo bar baz foo foo bar"))
      .toDF("lang", "text")
    assert(regs(SketchOps.hllTokenRegisters(once, "text", "lang")) ==
      regs(SketchOps.hllTokenRegisters(many, "text", "lang")))
  }

  test("merge of half-sketches equals the whole-corpus sketch") {
    val docs = (0 until 400).map(i =>
      ("g", s"tok$i common${i % 7} w${i * 31 % 113}"))
      .toDF("lang", "text")
    val a = SketchOps.hllTokenRegisters(docs.limit(200), "text", "lang")
    val b = SketchOps.hllTokenRegisters(
      docs.exceptAll(docs.limit(200)), "text", "lang")
    val whole = SketchOps.hllTokenRegisters(docs, "text", "lang")
    assert(regs(SketchOps.mergeRegisters(a, b)) == regs(whole))
  }

  test("count-min cells: literal re-derivation; sum-merge; one-sided estimate") {
    val docs = Seq(("en", "a b a"), ("en", "a c"), ("de", "a"))
      .toDF("lang", "text")
    val cells = SketchOps.cmTokenCells(docs, "text", "lang")
    def key3(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    // literal: en has a:3 b:1 c:1, de has a:1; each lands in 4 rows
    def cell(r: Int, tok: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 3), 16)
    }
    val want = (for {
      (g, toks) <- Seq("en" -> Map("a" -> 3L, "b" -> 1L, "c" -> 1L),
        "de" -> Map("a" -> 1L))
      r <- 0 until 4
      grouped = toks.groupBy { case (t, _) => cell(r, t) }
        .map { case (c, m) => (g, r, c, m.values.sum) }
      row <- grouped
    } yield row).toSet
    assert(key3(cells) == want)
    // sum-merge: two halves roll up to the whole
    val whole = SketchOps.cmTokenCells(docs, "text", "lang")
    val h1 = SketchOps.cmTokenCells(docs.limit(1), "text", "lang")
    val h2 = SketchOps.cmTokenCells(docs.exceptAll(docs.limit(1)),
      "text", "lang")
    val merged = SketchOps.mergeCells(h1, h2).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(merged == key3(whole))
    // one-sided estimate: >= truth, == truth absent collisions
    val enCells = cells.filter($"group" === "en").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(SketchOps.cmEstimate(enCells, "a") >= 3L)
    assert(SketchOps.cmEstimate(enCells, "b") >= 1L)
    assert(SketchOps.cmEstimate(enCells, "zzz-absent") >= 0L)
  }

  test("bloom words: literal re-derivation; OR-merge; no false negatives; " +
      "tiny-m false positives exist and are one-sided") {
    // Kirsch-Mitzenmacher: pos_i = (h1 + i*h2) mod m from two 8-hex
    // slices of ONE md5, h2 forced odd (mirrors bloomPositions)
    def brutePos(key: String, i: Int, m: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h1 = java.lang.Long.parseLong(h.substring(0, 8), 16)
      val h2 = java.lang.Long.parseLong(h.substring(8, 16), 16) | 1L
      (h1 + i * h2) % m
    }
    val m = 256 // small on purpose: dense filter => provoked FPs below
    val keys = (0 until 40).map(i => s"key$i")
    val df = keys.toDF("k")
    val words = SketchOps.bloomWords(df, "k", m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = keys.flatMap(k => (0 until 4).map(i => brutePos(k, i, m)))
      .groupBy(_ / 32)
      .map { case (w, ps) =>
        w -> ps.map(p => 1L << (p % 32).toInt).reduce(_ | _) }
    assert(words == want)
    // OR-merge == whole-set build
    val w1 = SketchOps.bloomWords(keys.take(2).toDF("k"), "k", m)
    val w2 = SketchOps.bloomWords(keys.drop(2).toDF("k"), "k", m)
    val merged = SketchOps.mergeBloom(w1, w2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == words)
    // no false negatives: every inserted key tests true
    val probes = (keys ++ (0 until 3000).map(i => s"absent$i")).toDF("k")
    val hits = probes.withColumn("hit",
        SketchOps.bloomMightContain(col("k"), words, m))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(keys.forall(hits(_)))
    // dense filter (160 of 256 bits targeted) + many probes: false
    // positives occur, and they are ONE-SIDED (hits only)
    val fps = hits.count { case (k, h) => h && !keys.contains(k) }
    assert(fps > 0, "expected false positives at m=256 over 3000 probes")
  }

  test("estimate lands within 5% of the true distinct count at m=4096") {
    // 30k distinct tokens (3 per doc over 10k docs)
    val docs = (0 until 10000).map(i =>
      ("g", s"aa$i bb$i cc$i")).toDF("lang", "text")
    val rs = SketchOps.hllTokenRegisters(docs, "text", "lang")
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toSeq
    val est = SketchOps.hllEstimate(rs)
    val truth = 30000.0
    assert(math.abs(est - truth) / truth < 0.05,
      s"estimate $est vs $truth")
  }
}
