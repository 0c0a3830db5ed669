package graft

import org.apache.spark.sql.functions._
import graft.text.{PackOps, QualityOps, ScrubOps}

class PackQualityScrubSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ PackOps

  test("packOffsets: spans tile the stream exactly, in hash order") {
    val docs = (0L until 100L).map(i => (i, 1L + i % 7)).toDF("id", "tok")
    val off = PackOps.packOffsets(docs, "id", "tok", "s1")
      .select("id", "tok", "start_off", "end_off").collect()
    assert(off.length == 100)
    val total = (0L until 100L).map(i => 1L + i % 7).sum
    // spans are disjoint, contiguous, and cover [0, total)
    val sorted = off.sortBy(_.getAs[Long]("start_off"))
    assert(sorted.head.getAs[Long]("start_off") == 0L)
    assert(sorted.last.getAs[Long]("end_off") == total)
    sorted.sliding(2).foreach { w =>
      assert(w(0).getAs[Long]("end_off") == w(1).getAs[Long]("start_off"))
    }
    sorted.foreach { r =>
      assert(r.getAs[Long]("end_off") - r.getAs[Long]("start_off")
        == r.getAs[Long]("tok"))
    }
  }

  test("packOffsets: layout is partition-invariant") {
    val docs = (0L until 60L).map(i => (i, 1L + i % 5)).toDF("id", "tok")
    val a = PackOps.packOffsets(docs.repartition(1), "id", "tok", "z")
      .select("id", "start_off").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PackOps.packOffsets(docs.repartition(13), "id", "tok", "z")
      .select("id", "start_off").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("packOffsets substrates are tracked and releasable") {
    PackOps.releaseSubstrates() // drop whatever earlier tests retained
    assert(PackOps.retainedSubstrates == 0)
    val docs = (0L until 40L).map(i => (i, 1L + i % 3)).toDF("id", "tok")
    val off = PackOps.packOffsets(docs, "id", "tok", "rel")
    assert(PackOps.retainedSubstrates == 1)
    assert(off.count() == 40)
    PackOps.releaseSubstrates()
    assert(PackOps.retainedSubstrates == 0)
  }

  test("packBlocksEager: rows == lazy variant, retains nothing") {
    PackOps.releaseSubstrates()
    assert(PackOps.retainedSubstrates == 0)
    val docs = (0L until 60L).map(i => (i, 1L + i % 7)).toDF("id", "tok")
    val eager = PackOps.packBlocksEager(docs, "id", "tok", 16, "se")
    // the q70 contract (VERDICT_r11 #6): nothing retained after the
    // call returns — the span table is already materialized
    assert(PackOps.retainedSubstrates == 0)
    val lazyRows = PackOps.packBlocks(docs, "id", "tok", 16, "se")
      .collect().map(_.toString).sorted
    PackOps.releaseSubstrates()
    assert(eager.collect().map(_.toString).sorted.toSeq
      == lazyRows.toSeq)
    // and the eager result survives a cache purge (it is a
    // checkpoint, not a view over the released substrate)
    spark.catalog.clearCache()
    assert(eager.count() == lazyRows.length)
  }

  test("packBlocks: block spans partition each doc; boundaries split") {
    val docs = Seq((1L, 10L), (2L, 300L), (3L, 5L)).toDF("id", "tok")
    val blocks = PackOps.packBlocks(docs, "id", "tok", 256, "s2").collect()
    // every doc's block spans sum to its token count
    val byDoc = blocks.groupBy(_.getAs[Long]("id"))
    assert(byDoc(2L).map(_.getAs[Long]("span_tokens")).sum == 300L)
    // the 300-token doc crosses at least one boundary
    assert(byDoc(2L).length >= 2)
    // per-block spans never exceed the block size and starts are sane
    blocks.foreach { r =>
      assert(r.getAs[Long]("span_tokens") > 0)
      assert(r.getAs[Long]("span_tokens") <= 256)
      val sib = r.getAs[Long]("start_in_block")
      assert(sib >= 0 && sib < 256)
    }
    // zero-token docs are dropped
    val withZero = Seq((1L, 0L), (2L, 4L)).toDF("id", "tok")
    val b2 = PackOps.packBlocks(withZero, "id", "tok", 8, "s3").collect()
    assert(b2.map(_.getAs[Long]("id")).toSet == Set(2L))
  }

  test("packedBlocks content equals the chunked deterministic stream") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "f g"), (3L, "h i j k"), (4L, ""),
      (5L, "l m n o p q r")).toDF("doc_id", "text")
    val out = PackOps.packedBlocks(docs, "doc_id", "text", 4, "s9")
      .collect().sortBy(_.getAs[Long]("block_id"))
    // reconstruct the expected stream: docs in hashCoord order,
    // tokens concatenated, chunked every 4
    val ordered = PackOps.packOffsets(
        docs.select(col("doc_id"), col("text"),
          graft.text.TextOps.tokenCount(col("text")).as("tok")),
        "doc_id", "tok", "s9")
      .orderBy("start_off").select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
    val expected = ordered.grouped(4).toSeq
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, chunk) =>
      assert(r.getAs[Long]("block_tokens") == chunk.length)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(chunk.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("content_md5") == md,
        s"block ${r.getAs[Long]("block_id")} content mismatch")
    }
    // total docs represented = non-empty docs, possibly split
    assert(out.map(_.getAs[Long]("n_docs")).sum >= 4)
  }

  test("shard manifest: partition-invariant, tamper-sensitive") {
    import graft.text.SampleOps
    val docs = (0L until 200L).map(i => (i, s"doc number $i body"))
      .toDF("doc_id", "text")
    val a = SampleOps.shardManifest(docs.repartition(1), "doc_id",
      "text", 8, "m1").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = SampleOps.shardManifest(docs.repartition(17), "doc_id",
      "text", 8, "m1").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b)
    assert(a.keySet.subsetOf((0 until 8).toSet) && a.values.map(_._1).sum == 200)
    // altering one row's content flips that shard's xor only
    val tampered = docs.withColumn("text",
      when(col("doc_id") === 7, lit("altered")).otherwise(col("text")))
    val c = SampleOps.shardManifest(tampered, "doc_id", "text", 8, "m1")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val changed = a.keys.filter(k => a(k)._2 != c(k)._2)
    assert(changed.size == 1)
  }

  test("writeShards round-trip: file-layout manifest matches source") {
    import graft.text.SampleOps
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards").toString + "/out"
    val docs = (0L until 120L).map(i => (i, s"payload $i")).toDF("doc_id", "text")
    val written = SampleOps.writeShards(docs, "doc_id", "text", dir, 4, "w1")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val back = SampleOps.manifestOver(
        spark.read.parquet(dir), "shard", "doc_id", "text")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(written.toSeq == back.toSeq)
    assert(written.map(_._2).sum == 120L)
  }

  test("oversample: whole+fractional copies, zero weight drops") {
    import graft.text.SampleOps
    val docs = (0L until 400L)
      .map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("doc_id", "src")
    val out = SampleOps.oversample(docs, "doc_id", "src",
      Map("a" -> 2.5, "b" -> 0.0), defaultWeight = 1.0, salt = "ov")
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("b")) // weight 0 emits nothing
    // 200 'a' docs at 2.5 epochs: 2 whole copies + ~half get a third
    assert(bySrc("a") > 400L && bySrc("a") < 600L)
    // copy indices are contiguous 0..k-1 per doc
    val copies = out.filter(col("src") === "a").groupBy("doc_id")
      .agg(max("copy").as("m"), count(lit(1)).as("c")).collect()
    copies.foreach { r =>
      assert(r.getAs[Long]("m") == r.getAs[Long]("c") - 1)
    }
  }

  // --------------------------------------------------------- QualityOps

  test("tokenLines chunk the token stream; empty doc yields no lines") {
    val lines = Seq("a b c d e").toDF("text")
      .select(QualityOps.tokenLines(col("text"), 2).as("l"))
      .head().getSeq[String](0)
    assert(lines == Seq("a b", "c d", "e"))
    val empty = Seq("  !!  ").toDF("text")
      .select(QualityOps.tokenLines(col("text"), 2).as("l"))
      .head().getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("repetitionStats: fully repeated doc maxes the signals") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"), // 4 identical 2-lines
      (2L, "one two three four five six seven eight"), // all distinct
      (3L, "")).toDF("doc_id", "text")
    val st = QualityOps.repetitionStats(docs, "doc_id", "text",
        lineWidth = 2, ns = Seq(2))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(st(1L).getAs[Long]("n_lines") == 4)
    assert(st(1L).getAs[Double]("dup_line_frac") == 0.75)
    assert(st(1L).getAs[Double]("dup_line_char_frac") == 0.75)
    // "spam spam" occurs 7 times overlapping, 9 chars, stream 39 chars
    assert(math.abs(st(1L).getAs[Double]("top2_char_frac") - 63.0 / 39.0)
      < 1e-12)
    assert(st(2L).getAs[Double]("dup_line_frac") == 0.0)
    assert(st(2L).getAs[Double]("dup_line_char_frac") == 0.0)
    // empty doc: all zeros, no nulls
    assert(st(3L).getAs[Long]("n_lines") == 0)
    assert(st(3L).getAs[Double]("top2_char_frac") == 0.0)
  }

  test("gopherFilter keeps clean prose, drops spam, reports reasons") {
    val clean = ("the quick brown fox jumps over a lazy dog and then " +
      "walks to the river bank where it drinks in the morning light " +
      "before it returns to the den with food for the young ones " +
      "while the sun rises over the quiet field as birds sing their " +
      "first song of the day and the wind moves softly through the " +
      "tall green grass near the old stone wall by the garden gate")
    val spam = Array.fill(60)("buy cheap deals now").mkString(" ")
    val tiny = "too short"
    val docs = Seq((1L, clean), (2L, spam), (3L, tiny))
      .toDF("doc_id", "text")
    val out = QualityOps.gopherFilter(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("keep")) // repetition caps trip
    assert(out(2L).getAs[Double]("top2_char_frac") > 0.2)
    assert(!out(3L).getAs[Boolean]("keep")) // min token floor trips
    assert(out(3L).getAs[Long]("q_tokens") < 50)
  }

  // ----------------------------------------------------------- ScrubOps

  test("redactPii: order prevents partial leaks; counts on raw text") {
    val df = Seq(
      "mail a.b+c@ex-1.org and http://h.io/p?q=1&r=2 from 10.0.0.1 v1.2.3.4.5"
    ).toDF("text").select(
      ScrubOps.countEmails(col("text")).as("e"),
      ScrubOps.countUrls(col("text")).as("u"),
      ScrubOps.countIpv4(col("text")).as("i"),
      ScrubOps.redactPii(col("text")).as("red"))
    val r = df.head()
    assert(r.getAs[Int]("e") == 1)
    assert(r.getAs[Int]("u") == 1)
    assert(r.getAs[Int]("i") == 2) // 10.0.0.1 and the 1.2.3.4 prefix
    val red = r.getAs[String]("red")
    assert(red == "mail <EMAIL> and <URL> from <IP> v<IP>.5")
  }

  test("redaction tokens are inert to later patterns") {
    // a URL containing an IP redacts as one <URL>, not <URL> + <IP>
    val red = Seq("see https://10.1.2.3/path now").toDF("text")
      .select(ScrubOps.redactPii(col("text")).as("r"))
      .head().getString(0)
    assert(red == "see <URL> now")
  }

  // ------------------------------------------------------------- LmOps

  /** Literal single-threaded JM-bigram scorer: same tokenization,
    * same smoothing, same micro-nat floor quantization as LmOps. */
  private def lmBrute(docs: Seq[(Long, String)], refIds: Long => Boolean,
      lam: Double): Map[Long, (Long, Long, Option[Double])] = {
    def toks(s: String): Seq[String] =
      s.toLowerCase.map(c => if (c.isLetterOrDigit && c < 128) c else ' ')
        .split(" +").filter(_.nonEmpty).toSeq
    def pairs(s: String): Seq[(String, String)] = {
      val t = toks(s)
      t.indices.map(i => (if (i == 0) "<s>" else t(i - 1)) -> t(i))
    }
    val refP = docs.filter(d => refIds(d._1)).flatMap(d => pairs(d._2))
    val uni = refP.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    val bi = refP.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val ctx = refP.groupBy(_._1).map { case (v, xs) => v -> xs.size.toLong }
    val t = uni.values.sum.toDouble
    val vsz = uni.size.toDouble
    docs.map { case (id, text) =>
      val pp = pairs(text)
      val nll = pp.map { case (v, w) =>
        val pU = (uni.getOrElse(w, 0L) + 1.0) / (t + vsz + 1.0)
        val p = ctx.get(v) match {
          case Some(cv) =>
            lam * (bi.getOrElse((v, w), 0L).toDouble / cv) + (1.0 - lam) * pU
          case None => pU
        }
        math.floor(-math.log(p) * 1e6 + 0.5).toLong
      }.sum
      val n = pp.size.toLong
      id -> (n, nll,
        if (n > 0) Some(math.floor(math.exp(nll / 1e6 / n) * 1e6 + 0.5) / 1e6)
        else None)
    }.toMap
  }

  test("perplexity matches a literal single-threaded re-derivation") {
    val docs = (0L until 40L).map { i =>
      val words = Seq("the", "cat", "sat", "on", "a", "mat", "dog", "ran")
      i -> (0 until (3 + (i % 9)).toInt)
        .map(j => words(((i * 7 + j * 3) % 8).toInt)).mkString(" ")
    } :+ (40L -> "") :+ (41L -> "zzz qqq zzz") // empty + OOV-heavy
    val df = docs.toDF("doc_id", "text")
    val out = graft.text.LmOps.perplexity(
        df, df.filter(col("doc_id") % 4 === 0), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    val exp = lmBrute(docs, _ % 4 == 0, 0.75)
    assert(out == exp)
    assert(out(40L) == ((0L, 0L, None))) // empty doc: nothing to score
    // OOV doc is scored (unigram smoothing), costlier than in-ref text
    assert(out(41L)._3.get > out(0L)._3.get)
  }

  test("perplexity is partition-layout invariant, no broadcast joins") {
    val docs = (0L until 30L)
      .map(i => i -> s"alpha beta gamma delta tok$i alpha beta")
    val df = docs.toDF("doc_id", "text")
    val ref = df.filter(col("doc_id") < 10)
    val a = graft.text.LmOps.perplexity(df.repartition(1), ref,
      "doc_id", "text").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = graft.text.LmOps.perplexity(df.repartition(11), ref,
      "doc_id", "text").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a == b)
    // model tables are corpus-derived: they must never broadcast
    val plan = graft.text.LmOps.perplexity(df, ref, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"))
  }

  // ----------------------------------------------------------- DsirOps

  /** Literal single-threaded DSIR: same md5 feature hashing, same
    * smoothing, same micro quantization, same Gumbel + total order. */
  private def dsirBrute(docs: Seq[(Long, String)], tgt: Long => Boolean,
      b: Int, seed: Int, k: Int): Map[Long, (Long, Long, Boolean)] = {
    def toks(s: String): Seq[String] =
      s.toLowerCase.map(c => if (c.isLetterOrDigit && c < 128) c else ' ')
        .split(" +").filter(_.nonEmpty).toSeq
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$s".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map(x => f"${x & 0xff}%02x").mkString, 16)
    }
    def feats(s: String): Seq[Long] = {
      val t = toks(s)
      t.indices.flatMap(i =>
        if (i == 0) Seq(h32(t(i)) % b)
        else Seq(h32(t(i)) % b, h32(s"${t(i - 1)} ${t(i)}") % b))
    }
    val dc = docs.map { case (id, s) =>
      id -> feats(s).groupBy(identity).map { case (bk, xs) =>
        bk -> xs.size.toLong }
    }.toMap
    val cp = docs.filter(d => tgt(d._1)).flatMap(d => dc(d._1).toSeq)
      .groupBy(_._1).map { case (bk, xs) => bk -> xs.map(_._2).sum }
    val cq = docs.flatMap(d => dc(d._1).toSeq)
      .groupBy(_._1).map { case (bk, xs) => bk -> xs.map(_._2).sum }
    val (tp, tq) = (cp.values.sum.toDouble, cq.values.sum.toDouble)
    val lam = cq.map { case (bk, q) =>
      bk -> math.floor(math.log(
        ((cp.getOrElse(bk, 0L) + 1.0) / (tp + b)) /
          ((q + 1.0) / (tq + b))) * 1e6 + 0.5).toLong
    }
    val keyed = docs.map { case (id, _) =>
      val lw = dc(id).map { case (bk, n) => n * lam(bk) }.sum
      val u = (h32(s"g:$id") + 0.5) / 4294967296.0
      val g = math.floor(-math.log(-math.log(u)) * 1e6 + 0.5).toLong
      (id, lw, lw + g)
    }
    val sel = keyed.sortBy(t => (-t._3, t._1)).take(k).map(_._1).toSet
    keyed.map { case (id, lw, key) => id -> (lw, key, sel(id)) }.toMap
  }

  test("dsirSelect matches a literal single-threaded re-derivation") {
    val en = Seq("the", "quick", "brown", "fox", "jumps", "over")
    val xx = Seq("zork", "blap", "quux", "fnord", "grue", "plugh")
    val docs = (0L until 50L).map { i =>
      val w = if (i % 3 == 0) en else xx
      i -> (0 until (4 + (i % 5)).toInt)
        .map(j => w(((i * 5 + j) % 6).toInt)).mkString(" ")
    } :+ (50L -> "")
    val df = docs.toDF("doc_id", "text")
    val out = graft.text.DsirOps.dsirSelect(
        df, df.filter(col("doc_id") % 3 === 0), k = 10,
        idCol = "doc_id", textCol = "text", buckets = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("logw_micro"), r.getAs[Long]("key_micro"),
          r.getAs[Boolean]("selected"))).toMap
    val exp = dsirBrute(docs, _ % 3 == 0, 64, 7, 10)
    assert(out == exp)
    assert(out.values.count(_._3) == 10)
    // target-like docs dominate the selection
    assert(out.filter(_._2._3).keys.count(_ % 3 == 0) >= 7)
  }

  test("importanceWeights: reuseCounts=false matches the checkpointed path") {
    // The storage-constrained opt-out (ADVICE_r11 #4) recomputes
    // featurization per consumer instead of checkpointing the
    // corpus-sized counts frame — values must be identical.
    val docs = (0L until 30L).map(i =>
      i -> s"alpha tok${i % 5} beta tok${i % 3} gamma")
    val df = docs.toDF("doc_id", "text")
    val tgt = df.filter(col("doc_id") % 4 === 0)
    def run(reuse: Boolean) = graft.text.DsirOps.importanceWeights(
        df, tgt, "doc_id", "text", buckets = 32, seed = 7,
        reuseCounts = reuse)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_feat"), r.getAs[Long]("logw_micro"))).toMap
    assert(run(reuse = true) == run(reuse = false))
  }

  test("dsirSelect is partition-layout invariant; k > corpus selects all") {
    val docs = (0L until 20L).map(i => i -> s"tok$i alpha beta tok${i % 4}")
    val df = docs.toDF("doc_id", "text")
    val tgt = df.filter(col("doc_id") < 5)
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.text.DsirOps.dsirSelect(d, tgt, k = 8,
        idCol = "doc_id", textCol = "text", buckets = 32)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Long]("key_micro"), r.getAs[Boolean]("selected"))).toMap
    assert(run(df.repartition(1)) == run(df.repartition(7)))
    val all = graft.text.DsirOps.dsirSelect(df, tgt, k = 1000,
      idCol = "doc_id", textCol = "text", buckets = 32)
      .collect()
    assert(all.forall(_.getAs[Boolean]("selected")))
  }

  // ------------------------------------------- sampleRankCuts / buckets

  test("sampleRankCuts: full-rate cuts are exact rank quantiles") {
    import graft.text.SampleOps
    val vals = (0L until 90L).map(i => (i, ((i * 37) % 90).toDouble / 3.0))
    val df = vals.toDF("id", "v")
    // sampleSize >= n -> rate 1.0 -> the "sample" is the corpus
    val cuts = SampleOps.sampleRankCuts(df, "v", "id",
      Seq(1.0 / 3, 2.0 / 3, 1.0), sampleSize = 1000)
    val sorted = vals.map(_._2).sorted
    val m = sorted.length
    assert(cuts == Seq(
      sorted(math.ceil(m / 3.0).toInt - 1),
      sorted(math.ceil(2.0 * m / 3).toInt - 1),
      sorted(m - 1)))
    // deterministic under re-partitioning
    val cuts7 = SampleOps.sampleRankCuts(df.repartition(7), "v", "id",
      Seq(1.0 / 3, 2.0 / 3, 1.0), sampleSize = 1000)
    assert(cuts7 == cuts)
    // nulls are excluded, not sampled
    val withNull = (vals :+ (99L, Double.NaN)).toDF("id", "v")
      .withColumn("v", when(col("id") === 99L, lit(null)).otherwise(col("v")))
    assert(SampleOps.sampleRankCuts(withNull, "v", "id",
      Seq(1.0), sampleSize = 1000) == Seq(sorted(m - 1)))
  }

  test("perplexityBuckets: terciles are ordered, empty doc gets null") {
    val words = Seq("the", "cat", "sat", "on", "a", "mat", "dog", "ran")
    val docs = (0L until 60L).map { i =>
      i -> (0 until (5 + (i % 7)).toInt)
        .map(j => words(((i * 7 + j * 3) % 8).toInt)).mkString(" ")
    } :+ (60L -> "")
    val df = docs.toDF("doc_id", "text")
    val out = graft.text.LmOps.perplexityBuckets(
        df, df.filter(col("doc_id") % 4 === 0), "doc_id", "text",
        sampleSize = 1000)
      .collect().map(r => (r.getLong(0),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.getAs[String]("bucket")))).toSeq
    assert(out.find(_._1 == 60L).get._3.isEmpty) // empty doc: null bucket
    val byBucket = out.filter(_._2.isDefined)
      .groupBy(_._3.get).view.mapValues(_.map(_._2.get)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
  }

  // ----------------------------------------------------------- RankOps

  /** Literal single-threaded BM25 with the same quantization and the
    * same (score DESC, id ASC) ranking. */
  private def bm25Brute(docs: Seq[(Long, String)],
      queries: Seq[(Long, String)], k: Int, k1: Double, b: Double)
      : Seq[(Long, Long, Long, Long)] = {
    def toks(s: String): Seq[String] =
      s.toLowerCase.map(c => if (c.isLetterOrDigit && c < 128) c else ' ')
        .split(" +").filter(_.nonEmpty).toSeq
    val tf = docs.map { case (id, s) =>
      id -> toks(s).groupBy(identity).map { case (t, xs) =>
        t -> xs.size.toLong }
    }.toMap
    val dl = docs.map { case (id, s) => id -> toks(s).size.toLong }.toMap
    val n = docs.size.toLong
    val avgdl = if (n == 0) 1.0 else dl.values.sum.toDouble / n
    val dfc = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    queries.flatMap { case (qid, qs) =>
      val scored = docs.flatMap { case (id, _) =>
        val c = toks(qs).distinct.flatMap { t =>
          tf(id).get(t).map { f =>
            val idf = math.log(1.0 +
              (n.toDouble - dfc(t) + 0.5) / (dfc(t) + 0.5))
            val tfn = (f * (k1 + 1.0)) /
              (f + k1 * ((1.0 - b) + b * (dl(id) / avgdl)))
            math.floor(idf * tfn * 1e6 + 0.5).toLong
          }
        }
        if (c.isEmpty) None else Some(id -> c.sum)
      }
      scored.sortBy(t => (-t._2, t._1)).take(k).zipWithIndex.map {
        case ((id, sc), i) => (qid, id, sc, (i + 1).toLong)
      }
    }
  }

  test("bm25TopK matches a literal re-derivation; salts don't matter") {
    val vocab = Seq("join", "merge", "scan", "sort", "hash", "query",
      "fast", "slow", "table", "index")
    val docs = (0L until 60L).map { i =>
      i -> (0 until (5 + (i % 7)).toInt)
        .map(j => vocab(((i * 11 + j * 3) % 10).toInt)).mkString(" ")
    }
    val queries = Seq(1L -> "fast join", 2L -> "slow table scan",
      3L -> "nosuchtoken")
    val dd = docs.toDF("doc_id", "text")
    val qq = queries.toDF("query_id", "qtext")
    def run(salts: Int) =
      graft.text.RankOps.bm25TopK(dd, qq, k = 5, salts = salts)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4))
    val got = run(8)
    assert(got.toSeq == bm25Brute(docs, queries, 5, 1.2, 0.75))
    assert(run(1).toSeq == got.toSeq) // two-stage cut is exact
    assert(run(3).toSeq == got.toSeq)
    assert(!got.exists(_._1 == 3L)) // unmatched query yields no rows
  }

  /** Sequential best-fit-decreasing reference. */
  private def bfdBrute(docs: Seq[(Long, Long)], capacity: Long,
      shards: Int): Map[Long, (Int, Int)] = {
    docs.groupBy(d => (d._1 % shards).toInt).flatMap { case (sh, ds) =>
      val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
      ds.sortBy(d => (-d._2, d._1)).map { case (id, sz) =>
        val fits = rem.zipWithIndex.filter(_._1 >= sz)
        val bin =
          if (fits.isEmpty) { rem += capacity - sz; rem.length - 1 }
          else { val i = fits.minBy(f => (f._1, f._2))._2
                 rem(i) -= sz; i }
        id -> (sh, bin)
      }
    }
  }

  test("bestFitPack matches the sequential BFD reference, is " +
      "partition-invariant, keeps bins under capacity, and flags " +
      "oversize singletons") {
    val rng = new scala.util.Random(23)
    // ~10% size-0 docs: they must still best-fit (a 0-remainder bin
    // beats opening a new one) — the TreeMap path keeps 0-rem bins
    val docs = (0L until 200L).map(id => id ->
      (if (rng.nextInt(10) == 0) 0L else 5L + rng.nextInt(70).toLong))
    val want = bfdBrute(docs, 50L, 3)
    for (parts <- Seq(1, 7)) {
      val got = PackOps.bestFitPack(
          docs.toDF("doc_id", "n_tok").repartition(parts),
          "doc_id", "n_tok", 50L, 3)
        .collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3),
          r.getBoolean(4)))
        .toMap
      assert(got.view.mapValues(v => (v._1, v._2)).toMap == want,
        s"parts=$parts")
      // capacity invariant: every bin's total <= capacity, except a
      // flagged oversize singleton
      got.groupBy(v => (v._2._1, v._2._2)).foreach { case (bin, members) =>
        val total = members.values.map(_._3).sum
        if (total > 50L)
          assert(members.size == 1 && members.values.head._4,
            s"bin $bin over capacity without an overflow singleton")
      }
      assert(got.values.exists(_._4), "no oversize doc exercised")
      assert(got.values.filter(_._4).forall(v => v._3 > 50L))
    }
    // loud failures: negative and null sizes
    intercept[Exception] {
      PackOps.bestFitPack(Seq((1L, -2L)).toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", 50L, 2).collect()
    }
    intercept[Exception] {
      PackOps.bestFitPack(
        Seq((1L, Some(5L)), (2L, None))
          .toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", 50L, 2).collect()
    }
  }

  test("collocations: PMI ratio ranks glued pairs first; literal " +
      "key re-derivation; minCount cut; partition-invariant") {
    import graft.text.LmOps
    // "x y" always co-occur (6 times, each word only in the pair);
    // "a b" co-occurs 6 times but a and b also appear apart — lower
    // PMI; "c d" occurs only 3 times (< minCount 4) and must drop
    val docs = (
      Seq.fill(6)("x y") ++
      Seq.fill(6)("a b") ++ Seq.fill(5)("a q b r") ++
      Seq.fill(3)("c d")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      LmOps.collocations(d, "text", k = 5, minCount = 4L)
        .collect().map(r => (r.getInt(0), r.getString(1),
          r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toSeq
    val got = run(docs)
    // literal: sentinel-free pairs — "x y":6; "a b":6; "a q":5,
    // "q b":5, "b r":5; marginals over the same pair table: c_v =
    // {x:6, a:11, q:5, b:5}, c_w = {y:6, b:11, q:5, r:5}. The
    // perfectly-glued RARER pair (b,r) outranks the glued (x,y) —
    // ratio 5/(5·5) = 0.2 > 6/(6·6) ≈ 0.167 — exactly PMI's
    // frequency bias
    assert(got.head._2 == "b" && got.head._3 == "r")
    assert(got.head._7 == 5000000L / 5L * 1000000L / 5L)
    val xy = got.find(p => p._2 == "x").get
    assert(xy._1 == 2 && xy._7 == 6000000L / 6L * 1000000L / 6L)
    assert(!got.exists(p => p._2 == "c")) // under minCount
    assert(got.map(_._1) == (1 to got.length))
    assert(got.map(_._7).sliding(2).forall(s =>
      s.length < 2 || s(0) >= s(1)))
    assert(run(docs.repartition(7)) == got)
  }
}
