package graft

import org.apache.spark.sql.functions._
import graft.text.{DedupOps, TextOps}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens normalize case and punctuation") {
    val out = Seq("Hello, World! 42").toDF("text")
      .select(TextOps.tokens(col("text")).as("t")).head().getSeq[String](0)
    assert(out == Seq("hello", "world", "42"))
  }

  test("fused tokenizer matches the relational chain through real plans") {
    // edge space: Unicode case folds landing IN [a-z0-9] (KELVIN SIGN
    // → k, İ → i+combining dot), accents, emoji (surrogate pair),
    // digits glued to letters, empty/whitespace-only/punct-only, null
    val texts: Seq[String] = Seq(
      "Hello, World! 42", "", "   ", "...!?", "x9y z", "K 300K",
      "İstanbul", "café Ünïcode", "😀ab😀cd", "ABC123def",
      "tab\tand\nnewline", "ß sharp", null)
    val df = texts.toDF("text").repartition(3)
    val fused = df.select(TextOps.tokens(col("text")).as("t"),
      TextOps.tokenCount(col("text")).as("n")).collect()
    val rel = df.select(TextOps.tokensRelational(col("text")).as("t"))
      .select(col("t"), size(col("t")).as("n")).collect()
    assert(fused.map(r => Option(r.get(0))).toSeq ==
      rel.map(r => Option(r.get(0))).toSeq)
    assert(fused.map(r => Option(r.get(1))).toSeq ==
      rel.map(r => Option(r.get(1))).toSeq)
  }

  test("shingles produce k-grams; short docs collapse to one shingle") {
    val sh = Seq("a b c d").toDF("text")
      .select(TextOps.shingles(col("text"), 3).as("s")).head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(TextOps.shingles(col("text"), 3).as("s")).head().getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("fingerprint is whitespace/punctuation-insensitive") {
    val df = Seq(("x", "Hello,  world!"), ("y", "hello world")).toDF("id", "text")
      .select(col("id"), TextOps.fingerprint(col("text")).as("fp"))
    val fps = df.collect().map(_.getString(1))
    assert(fps(0) == fps(1))
  }

  test("exact dup groups find normalized duplicates") {
    val docs = Seq((1L, "The cat."), (2L, "the cat"), (3L, "a dog"))
      .toDF("doc_id", "text")
    val g = DedupOps.exactDupGroups(docs, "doc_id", "text").collect()
    assert(g.length == 1 && g(0).getAs[Long]("canonical_id") == 1L)
  }

  test("ngram jaccard finds near-identical pair only") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different words appear in this document here")
    ).toDF("doc_id", "text")
    val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Long]("id_a") == 1L
      && pairs(0).getAs[Long]("id_b") == 2L)
    assert(pairs(0).getAs[Double]("jaccard") > 0.6)
  }

  test("minhash LSH surfaces the near-dup pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val pairs = DedupOps.minhashCandidatePairs(docs, "doc_id", "text", 3, 4, 2)
      .collect()
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 1L
      && r.getAs[Long]("id_b") == 2L))
    assert(!pairs.exists(r => r.getAs[Long]("id_b") == 3L))
  }

  test("fused minhash signatures match the relational formulation") {
    // the shuffle-free kernel must be value-identical to explode
    // distinct shingles -> seededHash32Packed columns -> min per doc
    // (the formulation it replaced), including short-doc collapse,
    // repeated shingles, punctuation, and tokenless-doc absence.
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog!"),
      (2L, "a b"),                       // short: one whole-doc shingle
      (3L, "x x x x x x"),               // one distinct shingle
      (4L, "Lorem ipsum, dolor; sit amet con sed do eiusmod tempor"),
      (5L, ""),                          // tokenless: no signature row
      (6L, "..."),                       // tokenless after cleaning
      (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val n = 8
    val fused = DedupOps.minhashSignatures(docs, "doc_id", "text", 3, n)
      .collect().map(r => r.getLong(0) ->
        (1 to n).map(r.getLong).toVector).toMap
    val sh = DedupOps.shingleRows(docs, "doc_id", "text", 3)
    val relational = sh.select(col("id") +: (0 until n).map(i =>
        TextOps.seededHash32Packed(col("shingle"), i).as(s"h$i")): _*)
      .groupBy("id")
      .agg(min(col("h0")).as("h0"),
        (1 until n).map(i => min(col(s"h$i")).as(s"h$i")): _*)
      .collect().map(r => r.getLong(0) ->
        (1 to n).map(r.getLong).toVector).toMap
    assert(fused == relational)
    assert(!fused.contains(5L) && !fused.contains(6L) && !fused.contains(7L))
  }

  test("fused simhash words match the relational formulation") {
    // kernel must equal explode tokens -> 4x16 conditional-sum votes
    // -> join-back (the formulation it replaced), including repeated
    // tokens (occurrence-weighted votes), tokenless docs (all-ones
    // words), and null text (all-ones via coalesce).
    val docs = Seq(
      (1L, "the quick brown fox the quick"),
      (2L, "lorem ipsum dolor sit amet!"),
      (3L, ""),
      (4L, "..."),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val fused = DedupOps.simhashTable64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    val tok = docs.select(col("doc_id").as("id"),
      explode(TextOps.tokens(col("text"))).as("t"))
    val h = tok.select(col("id") +: (0 until 4).map(j =>
      conv(substring(md5(col("t")), 1 + 4 * j, 4), 16, 10)
        .cast("long").as(s"hw$j")): _*)
    val voteCols = for (j <- 0 until 4; b <- 0 until 16) yield
      sum(when(shiftright(col(s"hw$j"), b).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"v${j}_$b")
    val votes = h.groupBy("id").agg(voteCols.head, voteCols.tail: _*)
    val words = (0 until 4).map { j =>
      (0 until 16).map(b =>
        when(coalesce(col(s"v${j}_$b"), lit(0L)) >= 0, lit(1L << b))
          .otherwise(lit(0L))).reduce(_ + _).as(s"w$j")
    }
    val relational = docs.select(col("doc_id").as("id"))
      .join(votes, Seq("id"), "left")
      .select(col("id") +: words: _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    assert(fused == relational)
    assert(fused(3L) == Seq.fill(4)(0xFFFFL) &&
      fused(5L) == Seq.fill(4)(0xFFFFL))
  }

  test("simhash of identical texts is equal; hamming 0") {
    val docs = Seq((1L, "spark scala engine"), (2L, "spark scala engine"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(docs, "doc_id", "text", 0).collect()
    assert(pairs.length == 1 && pairs(0).getAs[Int]("hamming") == 0)
  }

  test("simhash64 word0 equals the 16-bit simhash; identical docs pair at 0") {
    val docs = Seq(
      (1L, "spark scala engine for large corpora"),
      (2L, "spark scala engine for large corpora"),
      (3L, "completely different words entirely elsewhere"),
      (4L, "")).toDF("doc_id", "text")
    val t64 = DedupOps.simhashTable64(docs, "doc_id", "text")
    val t16 = DedupOps.simhashTable(docs, "doc_id", "text")
    val joined = t64.join(t16, "id")
      .filter(col("w0") =!= col("sh")).count()
    assert(joined == 0)
    // empty doc: all four words all-ones
    val empty = t64.filter(col("id") === 4L).head()
    (1 to 4).foreach(i => assert(empty.getLong(i) == 0xFFFFL))
    val pairs = DedupOps.simhashPairs64(docs, "doc_id", "text", 0).collect()
    assert(pairs.length == 1 && pairs(0).getAs[Long]("id_a") == 1L
      && pairs(0).getAs[Long]("id_b") == 2L)
  }

  test("simhash64 banding has exact recall at radius 3 (pigeonhole)") {
    // Compare the banded pair set against the exhaustive cross join
    // over the same signatures: every pair within hamming <= 3 must
    // be found by the 4-word rotated-table scheme.
    val rng = new scala.util.Random(5)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val common = Seq.tabulate(30)(i => words(i % words.length)).mkString(" ")
    val docs = ((1L to 40L).map { i =>
      (i, Seq.fill(8)(words(rng.nextInt(words.length))).mkString(" "))
    } ++ Seq( // planted near-identical cluster: guaranteed small radii
      (41L, common), (42L, common),
      (43L, common + " nu"), (44L, common + " xi omicron")))
      .toDF("doc_id", "text")
    val banded = DedupOps.simhashPairs64(docs, "doc_id", "text", 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t = DedupOps.simhashTable64(docs, "doc_id", "text")
    val ham = (0 until 4).map(j =>
      TextOps.hammingDistance(col(s"a.w$j"), col(s"b.w$j"))).reduce(_ + _)
    val brute = t.as("a").crossJoin(t.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"), ham.as("h"))
      .filter(col("h") <= 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute)
    assert(brute.nonEmpty) // fixture actually exercises the radius
    intercept[IllegalArgumentException] {
      DedupOps.simhashPairs64(docs, "doc_id", "text", 4)
    }
  }

  test("langId picks the language with most stopword hits") {
    val guess = Seq("der hund und die katze ist nicht hier")
      .toDF("text").select(TextOps.langId(col("text"))).head().getString(0)
    assert(guess == "de")
    val en = Seq("the cat and the dog is in that house")
      .toDF("text").select(TextOps.langId(col("text"))).head().getString(0)
    assert(en == "en")
  }

  test("docFrequency counts each doc once per token; idf ln(N/df)") {
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "c c d")).toDF("doc_id", "text")
    val got = TextOps.docFrequency(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got("a")._1 == 2 && got("c")._1 == 2 && got("d")._1 == 1)
    assert(math.abs(got("d")._2 - math.log(3.0)) < 1e-12)
    assert(math.abs(got("a")._2 - math.log(1.5)) < 1e-12)
  }

  test("contamination broadcasts the eval side and flags source + near-dup") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d x y"),
      (3L, "q w e r t y")).toDF("doc_id", "text")
    val eval = Seq((10L, "a b c d e f")).toDF("eid", "text")
    val out = DedupOps.contamination(
      docs, "doc_id", "text", eval, "eid", "text", 3, 2L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"eval side must broadcast:\n$plan")
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.exists(r => r._1 == 1L && r._3 == 4L)) // identical text
    assert(rows.exists(r => r._1 == 2L)) // shares "a b c", "b c d"
    assert(!rows.exists(r => r._1 == 3L))
  }

  test("decontaminate drops flagged docs, keeps columns, and never " +
      "broadcasts the corpus-derived flag side") {
    val docs = Seq((1L, "a b c d e f", "s0"), (2L, "a b c d x y", "s1"),
      (3L, "q w e r t y", "s2")).toDF("doc_id", "text", "source")
    val eval = Seq((10L, "a b c d e f")).toDF("eid", "text")
    val out = DedupOps.decontaminate(
      docs, "doc_id", "text", eval, "eid", "text", 3, 2L)
    // docs 1 and 2 overlap the eval set; doc 3 survives with its row
    assert(out.columns.toSeq == Seq("doc_id", "text", "source"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(2))).toSeq
      == Seq((3L, "s2")))
    // the anti join builds the flagged side as a shuffled hash join —
    // the flag set scales with corpus contamination, so an AQE
    // broadcast of it is the scale defect the factor-100 smoke caught
    val anti = out.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("LeftAnti")).mkString("\n")
    assert(anti.nonEmpty && !anti.contains("Broadcast"),
      s"anti join must not broadcast the flagged set:\n$anti")
  }

  test("domain ops: host normalization, suffix blocklist, plan shape") {
    import graft.text.DomainOps
    val docs = Seq(
      (1L, "see http://www.Evil.COM/x and http://user@ads.evil.com./y"),
      (2L, "plain http://good.org. end"),
      (3L, "no urls here"),
      (4L, "https://sub.good.org/path https://good.org/other")
    ).toDF("doc_id", "text")

    val hosts = DomainOps.docHosts(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // www stripped, lowercased, trailing dot stripped, userinfo skipped
    assert(hosts == Set((1L, "evil.com"), (1L, "ads.evil.com"),
      (2L, "good.org"), (4L, "sub.good.org"), (4L, "good.org")))

    val stats = DomainOps.domainStats(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(stats(("good.org", 2L, 2L)) && stats(("evil.com", 1L, 1L)))

    // suffix semantics: evil.com blocks its subdomain host too; doc 4
    // survives because good.org is not blocked
    val kept = DomainOps.filterBlockedDomains(
        docs, "doc_id", "text", Seq("Evil.com"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L))

    // corpus-derived flagged set must not be broadcast on the anti join
    val plan = DomainOps.filterBlockedDomains(
        docs, "doc_id", "text", Seq("evil.com"))
      .queryExecution.executedPlan.toString
    val anti2 = plan.linesIterator.filter(_.contains("LeftAnti"))
      .mkString("\n")
    assert(anti2.nonEmpty && !anti2.contains("Broadcast"), anti2)
    // ...while the blocklist itself IS broadcast
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("deterministic sampling: partition-invariant membership, " +
      "independent salts, complete split assignment") {
    import graft.text.SampleOps
    val ids = (0L until 2000L).toDF("id")

    // membership does not depend on the partition layout (the property
    // rand()-seeded sample() lacks)
    def kept(df: org.apache.spark.sql.DataFrame) =
      SampleOps.sampleFraction(df, "id", 0.3, "s1")
        .collect().map(_.getLong(0)).toSet
    val a = kept(ids.repartition(1))
    val b = kept(ids.repartition(13))
    assert(a == b)
    // rate lands near 30% (hash uniformity)
    assert(a.size > 450 && a.size < 750, s"got ${a.size} of 2000")

    // different salts draw independently: overlap near 30% of 30%
    val c = SampleOps.sampleFraction(ids, "id", 0.3, "s2")
      .collect().map(_.getLong(0)).toSet
    assert(c != a && (a & c).nonEmpty)

    // split: every row assigned, proportions roughly honored, and the
    // assignment is independent of the sampling draw
    val splits = ids.select(col("id"), SampleOps.assignSplit(col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp").as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.values.sum == 2000 && splits.keySet ==
      Set("train", "val", "test"))
    assert(splits("train") > 1500 && splits("val") > 120)

    // stratified: per-stratum rates honored, unknown strata default
    val docs = (0L until 3000L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "z"))
      .toDF("id", "src")
    val got = SampleOps.stratifiedSample(docs, "id", "src",
        Map("a" -> 0.9, "b" -> 0.1), 0.5, "st")
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") > 800 && got("b") < 180 &&
      got("z") > 380 && got("z") < 620, got.toString)

    // deterministic order: stable across runs and total
    val o1 = SampleOps.deterministicOrder(ids, "id", "sh")
      .limit(10).collect().map(_.getLong(0)).toSeq
    val o2 = SampleOps.deterministicOrder(ids.repartition(7), "id", "sh")
      .limit(10).collect().map(_.getLong(0)).toSeq
    assert(o1 == o2 && o1 != (0L until 10L).toSeq)

    // fraction sampling is a narrow plan: no shuffle before the filter
    val plan = SampleOps.sampleFraction(ids, "id", 0.3, "s1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"sampleFraction must ride the scan, not shuffle:\n$plan")

    // exact quota per stratum, membership partition-invariant
    def quota(df: org.apache.spark.sql.DataFrame) =
      SampleOps.takePerStratum(df, "id", "src", 7, "qt")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val q1 = quota(docs)
    val q2 = quota(docs.repartition(11))
    assert(q1 == q2)
    assert(q1.groupBy(_._2).forall(_._2.size == 7))
  }

  test("stratifiedSampleExact: exact per-stratum counts, hash-rank " +
      "membership, default fraction, partition invariance") {
    import graft.text.SampleOps
    val docs = (0L until 900L).map(i =>
      (i, Seq("a", "b", "z")((i % 3).toInt))).toDF("id", "src")
    def run(d: org.apache.spark.sql.DataFrame) =
      SampleOps.stratifiedSampleExact(d, "id", "src",
        Map("a" -> ((2L, 3L)), "b" -> ((1L, 4L))), 1L, 10L, "sx")
        .select("id", "src", "sample_rank", "sampled")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getBoolean(3)))
    val got = run(docs)
    assert(got.length == 900) // audit frame: every row returns
    val byS = got.groupBy(_._2)
    // exact floor counts: 300 per stratum -> 200, 75, 30
    assert(byS("a").count(_._4) == 200)
    assert(byS("b").count(_._4) == 75)
    assert(byS("z").count(_._4) == 30) // default 1/10
    // membership = lowest hash ranks: sampled iff rank <= budget
    byS.foreach { case (s, rows) =>
      val budget = rows.count(_._4)
      rows.foreach { case (_, _, rk, sel) =>
        assert(sel == (rk <= budget), s"stratum $s rank $rk")
      }
      // ranks are a 1..n_s permutation
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // literal membership re-derivation via the hash coordinate
    def coord(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"sx:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(8), 16).toDouble /
        4294967296.0
    }
    byS.foreach { case (_, rows) =>
      val want = rows.sortBy(r => (coord(r._1), r._1))
        .take(rows.count(_._4)).map(_._1).toSet
      assert(rows.filter(_._4).map(_._1).toSet == want)
    }
    // partition invariance
    assert(run(docs.repartition(17)).toSet == got.toSet)
  }

  test("groupSplit: whole groups, exact rational cuts, literal " +
      "re-derivation, partition invariance") {
    import graft.text.SampleOps
    // 40 groups of varying sizes; split 1/2 + 1/4 + 1/4
    val docs = (0L until 820L).map(i =>
      (i, s"g${i % 40}", 1L + (i % 40) / 8))
      .toDF("id", "grp", "w")
    val splits = Seq(("train", 1L, 2L), ("val", 1L, 4L),
      ("test", 1L, 4L))
    def run(df: org.apache.spark.sql.DataFrame) =
      SampleOps.groupSplit(df, "grp", splits, "gs")
        .select("id", "grp", "split")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getString(2)))
    val got = run(docs)
    // every row assigned; a group never straddles splits
    assert(got.length == 820)
    got.groupBy(_._2).foreach { case (g, rows) =>
      assert(rows.map(_._3).distinct.length == 1,
        s"group $g straddles splits")
    }
    // literal re-derivation: groups in (hashCoord, grp) order,
    // exclusive doc-count prefix vs integer cuts
    def coord(g: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"gs:$g".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val sizes = got.groupBy(_._2).map { case (g, rs) =>
      g -> rs.length.toLong }
    val ordered = sizes.keys.toSeq.sortBy(g => (coord(g), g))
    val total = sizes.values.sum
    val cut1 = total * 1 / 2
    val cut2 = (BigInt(total) * 3 / 4).toLong
    var p = 0L
    val want = ordered.map { g =>
      val s = if (p < cut1) "train" else if (p < cut2) "val" else "test"
      p += sizes(g); g -> s
    }.toMap
    got.foreach { case (_, g, s) =>
      assert(s == want(g), s"group $g: got $s want ${want(g)}")
    }
    // every split non-empty at these proportions
    assert(got.map(_._3).distinct.toSet == Set("train", "val", "test"))
    // partition invariance
    assert(run(docs.repartition(11)).toSet == got.toSet)
    // size-weighted variant: cuts move in char units, not doc units
    val byW = SampleOps.groupSplit(docs, "grp", splits, "gs",
        sizeCol = Some("w"))
      .select("grp", "split").distinct()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val wsizes = (0 until 40).map(i =>
      s"g$i" -> (0L until 820L).filter(_ % 40 == i)
        .map(j => 1L + (j % 40) / 8).sum).toMap
    val wtotal = wsizes.values.sum
    val wc1 = wtotal / 2; val wc2 = (BigInt(wtotal) * 3 / 4).toLong
    var wp = 0L
    ordered.foreach { g =>
      val s = if (wp < wc1) "train" else if (wp < wc2) "val" else "test"
      assert(byW(g) == s, s"weighted group $g: got ${byW(g)} want $s")
      wp += wsizes(g)
    }
    // malformed fractions rejected
    intercept[IllegalArgumentException] {
      SampleOps.groupSplit(docs, "grp",
        Seq(("a", 1L, 2L), ("b", 1L, 4L)), "gs")
    }
  }

  test("dupSpans flags every occurrence and merges overlapping windows") {
    // "one two three four five" appears in docs 1 and 2 (both flag —
    // ExactSubstr semantics), doc 3 is clean, doc 4 repeats a k-gram
    // WITHIN itself (within-doc occurrences count toward minOcc).
    val docs = Seq(
      (1L, "one two three four five alpha beta gamma"),
      (2L, "zz one two three four five yy qq rr"),
      (3L, "totally different words with no shared grams at all"),
      (4L, "p q r s t u p q r s t u")).toDF("doc_id", "text")
    val spans = DedupOps.dupSpans(docs, k = 5, minOcc = 2)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // doc 1: window at pos 0 only (pos 1+ includes "alpha"... no match)
    // doc 2: window at pos 1; doc 4: "p q r s t" at 0,6 and the
    // intermediate rotations 1..6 all repeat? no — only exact 5-gram
    // repeats: pos 0 "p q r s t" == pos 6; pos 1 "q r s t u" == pos 7
    // (pos 7 window needs tokens 7..11 = q r s t u — present). Gaps
    // <= k merge everything into one span.
    assert(spans.count(_._1 == 3L) == 0)
    assert(spans.filter(_._1 == 1L).toSeq == Seq((1L, 0, 5, 1L)))
    assert(spans.filter(_._1 == 2L).toSeq == Seq((2L, 1, 6, 1L)))
    assert(spans.filter(_._1 == 4L).toSeq == Seq((4L, 0, 12, 4L)))
    // portable (md5) and native (xxhash64) keying agree row-for-row
    val p = DedupOps.dupSpans(docs, 5, 2, portableHash = true)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(p.toSeq == spans.toSeq)

    val cleaned = DedupOps.removeDupSpans(docs, k = 5, minOcc = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(1L) == "alpha beta gamma")
    assert(cleaned(2L) == "zz yy qq rr")
    assert(cleaned(3L) ==
      "totally different words with no shared grams at all")
    assert(cleaned(4L) == "")                  // fully covered drops to empty
    assert(cleaned.size == 4)                  // every input doc comes back

    // the corpus-derived dup set must join SHUFFLE_HASH, not broadcast
    // (AQE would see a small set at test SF and build it on the
    // driver — the same trap ngramJaccardPairs' shared set pins away)
    val plan = DedupOps.dupSpans(docs, 5, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan)
  }

  // ------------------------------------------------- line-level dedup

  test("dedupLinesKeepFirst: canonical survivor, blanks always kept") {
    val docs = Seq(
      (10L, "alpha beta\ncommon footer line\n\ngamma"),
      (11L, "delta eps\ncommon footer line\nalpha beta"),
      (12L, "common footer line\n...\ncommon footer line"),
      (13L, ""))
    val out = DedupOps
      .dedupLinesKeepFirst(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 10 is canonical for both its lines: nothing dropped
    assert(out(10L) == (("alpha beta\ncommon footer line\n\ngamma", 4L, 0L)))
    // doc 11 loses the footer AND "alpha beta" (both first in doc 10)
    assert(out(11L) == (("delta eps", 1L, 2L)))
    // doc 12: footer dup twice (both lose to doc 10), "..." has no
    // tokens -> structural, always kept
    assert(out(12L) == (("...", 1L, 2L)))
    // empty doc: single empty structural line survives
    assert(out(13L) == (("", 1L, 0L)))
    // partition invariance
    val out7 = DedupOps.dedupLinesKeepFirst(
        docs.toDF("doc_id", "text").repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out7 == out)
  }

  // ------------------------------------------------------- winnowing

  /** Literal single-threaded winnowing: same cleaning, same base-31
    * polynomial hashing (TextOps.polyHash31), same rightmost-min
    * rule. */
  private def winnowBrute(text: String, k: Int, w: Int, seed: Int)
      : Set[(Long, Long)] = {
    val cs = text.toLowerCase.filter(c => c.isLetterOrDigit && c < 128)
    if (cs.length < k) return Set.empty
    def h32(s: String): Long =
      s.foldLeft(seed.toLong)((acc, c) => (acc * 31 + c.toInt) % 2147483648L)
        .*(2654435761L) % 2147483648L // final golden-ratio mix
    val hv = (0 to cs.length - k).map(i => (h32(cs.substring(i, i + k)),
      (i + 1).toLong))
    (0 until math.max(hv.length - w + 1, 1)).map { p =>
      val win = hv.slice(p, p + w)
      val minv = win.map(_._1).min
      (minv, win.filter(_._1 == minv).map(_._2).max)
    }.toSet
  }

  test("winnowFingerprints matches brute; shared substrings overlap") {
    val docs = Seq(
      (0L, "The quick brown fox jumps over the lazy dog repeatedly!"),
      (1L, "Lorem ipsum THE QUICK BROWN FOX dolor sit amet."),
      (2L, "ab"),            // under k chars: empty
      (3L, "abcdef"),        // 2 kgrams < w: one window
      (4L, ""),
      (5L, null.asInstanceOf[String])) // null text: no rows, no NPE
    val rows = DedupOps
      .winnowFingerprints(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSet).toMap
    val out = docs.map(_._1).map(id =>
      id -> rows.getOrElse(id, Set.empty[(Long, Long)])).toMap
    docs.foreach { case (id, s) =>
      if (s != null)
        assert(out(id) == winnowBrute(s, 5, 4, 11), s"doc $id")
    }
    assert(out(2L).isEmpty && out(4L).isEmpty && out(5L).isEmpty)
    assert(out(3L).size == 1)
    // the paper's guarantee: a shared run >= k+w-1 chars (here
    // "thequickbrownfox", 16 >= 8) shares at least one HASH between
    // the two docs, wherever it sits in each
    val shared = out(0L).map(_._1) intersect out(1L).map(_._1)
    assert(shared.nonEmpty)
  }
}
