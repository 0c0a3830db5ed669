package graft

import org.apache.spark.sql.functions._
import graft.text.{BudgetOps, C4Ops, ClassifierOps, DedupOps}

class BudgetC4Spec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------- BudgetOps

  test("budgetSelect: literal greedy re-derivation") {
    // priorities with ties (id breaks them), varied token counts
    val rows = (0L until 50L).map(i => (i, 1L + i % 9, (i % 5).toDouble))
    val docs = rows.toDF("id", "tok", "pri")
    val budget = 60L
    val got = BudgetOps.budgetSelect(docs, "id", "tok", "pri", budget)
      .select("id", "cum_tokens", "selected").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // scalar reference: sort (pri DESC, id ASC), cumulate, cut
    var run = 0L
    val exp = rows.sortBy { case (id, _, p) => (-p, id) }.map {
      case (id, tok, _) =>
        val start = run; run += tok
        id -> ((run, start < budget))
    }.toMap
    assert(got == exp)
    // the selection over-fills by at most the straddling doc
    val selTok = rows.filter(r => exp(r._1)._2).map(_._2).sum
    assert(selTok >= budget && selTok < budget + 9)
  }

  test("budgetSelect: partition-invariant; budget edges") {
    val rows = (0L until 40L).map(i => (i, 2L + i % 4, (i % 7).toDouble))
    val docs = rows.toDF("id", "tok", "pri")
    val a = BudgetOps.budgetSelect(docs.repartition(1), "id", "tok",
        "pri", 30L)
      .select("id", "cum_tokens", "selected").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val b = BudgetOps.budgetSelect(docs.repartition(13), "id", "tok",
        "pri", 30L)
      .select("id", "cum_tokens", "selected").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(a == b)
    val none = BudgetOps.budgetSelect(docs, "id", "tok", "pri", 0L)
    assert(none.filter(col("selected")).count() == 0)
    val total = rows.map(_._2).sum
    val all = BudgetOps.budgetSelect(docs, "id", "tok", "pri", total)
    assert(all.filter(col("selected")).count() == 40)
  }

  test("budgetSelectFraction == budgetSelect at the derived budget") {
    val rows = (0L until 30L).map(i => (i, 1L + i % 6, (i % 4).toDouble))
    val docs = rows.toDF("id", "tok", "pri")
    val total = rows.map(_._2).sum
    val frac = BudgetOps.budgetSelectFraction(docs, "id", "tok",
        "pri", 1L, 3L)
      .select("id", "cum_tokens", "selected", "budget").collect()
    assert(frac.forall(_.getAs[Long]("budget") == total / 3))
    val fixed = BudgetOps.budgetSelect(docs, "id", "tok", "pri",
        total / 3)
      .select("id", "cum_tokens", "selected").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(frac.map(r =>
      (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet == fixed)
  }

  test("budgetSelectPerStratum: literal per-stratum greedy fill") {
    // 3 strata, interleaved input order, ties broken by id
    val rows = (0L until 60L).map(i =>
      (i, s"src${i % 3}", 1L + i % 7, (i % 4).toDouble))
    val docs = rows.toDF("id", "src", "tok", "pri")
    val budgets = Map("src0" -> 20L, "src1" -> 0L) // src2 -> default 5
    val got = BudgetOps.budgetSelectPerStratum(docs, "id", "tok",
        "pri", "src", budgets, defaultBudget = 5L)
      .select("id", "cum_tokens", "budget", "selected").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val exp = rows.groupBy(_._2).flatMap { case (src, rs) =>
      val b = budgets.getOrElse(src, 5L)
      var run = 0L
      rs.sortBy { case (id, _, _, p) => (-p, id) }.map {
        case (id, _, tok, _) =>
          val start = run; run += tok
          id -> ((run, b, start < b))
      }
    }
    assert(got == exp)
    // src1's zero budget admits nothing
    assert(rows.filter(_._2 == "src1").forall(r => !got(r._1)._3))
  }

  test("budgetSelectPerStratumFraction: half of EVERY stratum; " +
      "partition-invariant") {
    val rows = (0L until 80L).map(i =>
      (i, s"s${i % 4}", 2L + i % 5, (i % 6).toDouble))
    val docs = rows.toDF("id", "src", "tok", "pri")
    def run(parts: Int) = BudgetOps.budgetSelectPerStratumFraction(
        docs.repartition(parts), "id", "tok", "pri", "src", 1L, 2L)
      .select("id", "cum_tokens", "budget", "selected").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    val a = run(1); val b = run(13)
    assert(a == b)
    // every stratum's budget is floor(its own total / 2)
    val budgetByStrat = a.map(t => rows(t._1.toInt)._2 -> t._3).toMap
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(budgetByStrat(src) == rs.map(_._3).sum / 2)
    }
  }

  // ------------------------------------------------------------- C4Ops

  test("c4Filter: line rules select exactly the conforming lines") {
    val text = Seq(
      "a good first sentence here.",     // kept
      "no terminal punctuation",         // dropped: no terminal mark
      "too short.",                      // dropped: < 3 words
      "please enable javascript now.",   // dropped: javascript
      "  padded line still counts.  ",   // kept (trimmed before rules)
      "is this a question?",             // kept
      "an exclamation happens here!").mkString("\n")
    val out = C4Ops.c4Filter(Seq((1L, text)).toDF("id", "t"), "id", "t")
      .collect().head
    assert(out.getAs[Int]("n_lines") == 7)
    assert(out.getAs[Int]("n_kept") == 4)
    assert(out.getAs[Int]("n_sentences") == 4)
    assert(out.getAs[String]("text_out") ==
      Seq("a good first sentence here.", "  padded line still counts.  ",
        "is this a question?", "an exclamation happens here!")
        .mkString("\n"))
    // 4 sentences < 5 -> dropped by the sentence gate alone
    assert(!out.getAs[Boolean]("keep"))
  }

  test("c4Filter: document flags and the sentence gate") {
    val five = (1 to 5).map(i => s"this is sentence number $i.")
      .mkString("\n")
    val docs = Seq(
      (0L, five),                                    // clean: keep
      (1L, five + "\nlorem ipsum dolor sit amet."),  // lorem
      (2L, five + "\ncode { is } here."),            // brace
      (3L, five + "\nmentions swearword openly."),   // bad word
      (4L, (1 to 4).map(i => s"only four sentences here $i.")
        .mkString("\n")),                            // under the gate
      (5L, "")                                       // empty doc
    ).toDF("id", "t")
    val got = C4Ops.c4Filter(docs, "id", "t").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(got(0L).getAs[Boolean]("keep"))
    assert(got(1L).getAs[Boolean]("has_lorem") &&
      !got(1L).getAs[Boolean]("keep"))
    assert(got(2L).getAs[Boolean]("has_brace") &&
      !got(2L).getAs[Boolean]("keep"))
    assert(got(3L).getAs[Boolean]("has_bad_word") &&
      !got(3L).getAs[Boolean]("keep"))
    assert(got(4L).getAs[Int]("n_sentences") == 4 &&
      !got(4L).getAs[Boolean]("keep"))
    assert(got(5L).getAs[Int]("n_kept") == 0 &&
      got(5L).getAs[String]("text_out") == "" &&
      !got(5L).getAs[Boolean]("keep"))
  }

  test("c4Filter: bad words match whole tokens, not substrings") {
    val base = (1 to 5).map(i => s"a classic compassionate tale $i.")
      .mkString("\n")
    val docs = Seq((0L, base), (1L, base + "\nan ass appears here."))
      .toDF("id", "t")
    val got = C4Ops.c4Filter(docs, "id", "t", badWords = Seq("ass"))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    // "classic"/"compassionate" must NOT trip a list entry "ass"
    assert(!got(0L).getAs[Boolean]("has_bad_word"))
    assert(got(0L).getAs[Boolean]("keep"))
    assert(got(1L).getAs[Boolean]("has_bad_word"))
  }

  // ---------------------------------------------- fuzzyDedupDocsBest

  test("fuzzyDedupDocsBest: highest quality survives, min id on ties") {
    val base = (0 until 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, base),                    // cluster {0,1,2}: near-identical
      (1L, base + " extra"),         // ... 1 is LONGEST -> survivor
      (2L, base),                    // same text as 0 (quality tie)
      (7L, "a completely different standalone document entirely")
    ).toDF("doc_id", "text")
    val got = DedupOps.fuzzyDedupDocsBest(docs, "doc_id", "text",
        graft.text.TextOps.tokenCount(col("text")).cast("long"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("component"), r.getAs[Long]("survivor"),
          r.getAs[Boolean]("keep")))).toMap
    // components keep the min-id label; the survivor is the longest
    assert(got(0L) == ((0L, 1L, false)))
    assert(got(1L) == ((0L, 1L, true)))
    assert(got(2L) == ((0L, 1L, false)))
    // singleton keeps itself
    assert(got(7L) == ((7L, 7L, true)))
    // quality tie (drop doc 1): survivor falls to the SMALLEST id
    val tied = DedupOps.fuzzyDedupDocsBest(
        docs.filter(col("doc_id") =!= 1L), "doc_id", "text",
        graft.text.TextOps.tokenCount(col("text")).cast("long"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("survivor")).toMap
    assert(tied(0L) == 0L && tied(2L) == 0L)
  }

  test("fuzzyDedupDocs: maxBandFreq drops oversize LSH buckets " +
      "wholesale; default is uncapped") {
    val base = (0 until 30).map(i => s"w$i").mkString(" ")
    // three identical docs share EVERY band key -> every bucket has 3
    val docs = Seq((0L, base), (1L, base), (2L, base))
      .toDF("doc_id", "text")
    val uncapped = DedupOps.fuzzyDedupDocs(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("component")).toMap
    assert(uncapped == Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
    // cap = 2 < bucket size 3: no candidates, so no merging at all
    val capped = DedupOps.fuzzyDedupDocs(docs, "doc_id", "text",
        maxBandFreq = 2L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("component")).toMap
    assert(capped == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    // cap >= bucket size: identical to uncapped
    val wide = DedupOps.fuzzyDedupDocs(docs, "doc_id", "text",
        maxBandFreq = 3L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("component")).toMap
    assert(wide == uncapped)
  }

  test("budgetSelect: internal working names dodge colliding input " +
      "columns (__tok/__pri preserved verbatim)") {
    val docs = Seq(
      (0L, 5L, 2.0, "a"), (1L, 5L, 1.0, "b"), (2L, 5L, 3.0, "c")
    ).toDF("id", "tok", "pri", "__tok").withColumn("__pri", lit(-1.0))
    val got = BudgetOps.budgetSelect(docs, "id", "tok", "pri", 10L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Boolean]("selected"), r.getAs[String]("__tok"),
          r.getAs[Double]("__pri")))).toMap
    // selection order (pri DESC): 2, 0, 1 -> 2 and 0 selected
    assert(got(2L) == ((true, "c", -1.0)))
    assert(got(0L) == ((true, "a", -1.0)))
    assert(got(1L) == ((false, "b", -1.0)))
    // per-stratum runner: same contract incl. a colliding __strat
    val sdocs = Seq(
      (0L, 5L, 2.0, "s1", "keep0"), (1L, 5L, 1.0, "s1", "keep1"),
      (2L, 5L, 3.0, "s2", "keep2")
    ).toDF("id", "tok", "pri", "src", "__strat")
    val sgot = BudgetOps.budgetSelectPerStratum(sdocs, "id", "tok",
        "pri", "src", Map("s1" -> 5L, "s2" -> 5L))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Boolean]("selected"), r.getAs[String]("__strat"))))
      .toMap
    assert(sgot(0L) == ((true, "keep0")))   // s1 best fills its budget
    assert(sgot(1L) == ((false, "keep1")))
    assert(sgot(2L) == ((true, "keep2")))   // s2 sole member
  }

  test("nearDupAgainst: flags incoming docs colliding with reference") {
    val a = (0 until 25).map(i => s"a$i").mkString(" ")
    val b = (0 until 25).map(i => s"b$i").mkString(" ")
    val ref = Seq((0L, a), (2L, b)).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "entirely unrelated fresh content here today"),
      (10L, a),              // byte-identical to ref 0 -> flagged
      (11L, a + " extra")    // near-identical -> bands collide
    ).toDF("doc_id", "text")
    val got = DedupOps.nearDupAgainst(incoming, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> false, 10L -> true, 11L -> true))
    // every incoming doc gets exactly one verdict row
    assert(got.size == 3)
  }

  test("compositionReport: cube cells, marginals, and grand total") {
    import graft.text.{ReportOps, TextOps}
    val docs = Seq(
      (1L, "wiki", "en", "one two three"),
      (2L, "wiki", "fr", "un deux"),
      (3L, "web", "en", "a b c d"),
      (4L, "web", "en", "x y")
    ).toDF("doc_id", "source", "lang", "text")
    val got = ReportOps.compositionReport(docs, "source", "lang",
        TextOps.tokenCount(col("text")), "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // 2 sources x 2 langs -> cells + marginals + grand total = 8 rows
    // (wiki,fr) exists, (web,fr) doesn't
    assert(got.size == 8)
    assert(got(("wiki", "en")) == ((1L, 3L)))
    assert(got(("web", "en")) == ((2L, 6L)))
    assert(got(("wiki", "(all)")) == ((2L, 5L)))
    assert(got(("(all)", "en")) == ((3L, 9L)))
    assert(got(("(all)", "(all)")) == ((4L, 11L)))
  }

  test("compositionReport: NULL and literal-(all) dim values keep " +
      "their own cells (grouping mask, not null-ness)") {
    import graft.text.{ReportOps, TextOps}
    val docs = Seq(
      (1L, "wiki", Option("en"), "one two three"),
      (2L, "wiki", None: Option[String], "un deux"),
      (3L, "web", Option("(all)"), "a b c d"),
      (4L, "web", Option("en"), "x y")
    ).toDF("doc_id", "source", "lang", "text")
    val rows = ReportOps.compositionReport(docs, "source", "lang",
        TextOps.tokenCount(col("text")), "text")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1),
        r.getLong(2), r.getLong(3)))
    // a genuinely-NULL lang keeps its own cell; the literal "(all)"
    // data value does NOT absorb the wiki marginal or the grand total
    val expected = Seq(
      ("wiki", "en", 1L, 3L), ("wiki", null, 1L, 2L),
      ("web", "(all)", 1L, 4L), ("web", "en", 1L, 2L),
      ("wiki", "(all)", 2L, 5L), ("web", "(all)", 2L, 6L),
      ("(all)", "en", 2L, 5L), ("(all)", null, 1L, 2L),
      ("(all)", "(all)", 1L, 4L), ("(all)", "(all)", 4L, 11L))
    assert(rows.sorted(Ordering.by((t: (String, String, Long, Long)) =>
        (t._1, Option(t._2).getOrElse(""), t._3, t._4))).toSeq ==
      expected.sorted(Ordering.by((t: (String, String, Long, Long)) =>
        (t._1, Option(t._2).getOrElse(""), t._3, t._4))))
  }

  // ---------------------------------------------------------- ChunkOps

  test("chunkDocs: windows, overlap, ragged tail, empty doc") {
    import graft.text.ChunkOps
    val doc = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, doc), (2L, ""), (3L, "only two")).toDF("id", "t")
    val got = ChunkOps.chunkDocs(docs, "id", "t", chunkTokens = 5,
        stride = 3)
      .collect().map(r => (r.getAs[Long]("id"),
        r.getAs[Int]("chunk_idx"), r.getAs[Int]("n_tokens"),
        r.getAs[String]("chunk_text"))).toSet
    // doc 1: n=10 -> ceil((10-5)/3)+1 = 3 windows at 0,3,6; the
    // third reaches the end, so no suffix-duplicate tail follows
    assert(got == Set(
      (1L, 0, 5, "t1 t2 t3 t4 t5"),
      (1L, 1, 5, "t4 t5 t6 t7 t8"),
      (1L, 2, 4, "t7 t8 t9 t10"),
      (3L, 0, 2, "only two"))) // empty doc 2 emits nothing
    // consecutive full chunks share chunk - stride = 2 tokens
    assert("t4 t5 t6 t7 t8".startsWith("t4 t5"))
  }

  test("chunkDocs: kernel matches scalar slicing over random shapes") {
    import graft.text.ChunkOps
    val rnd = new scala.util.Random(7)
    val docs = (0L until 30L).map { i =>
      val n = rnd.nextInt(40) // 0..39 tokens
      (i, (0 until n).map(j => s"w${rnd.nextInt(9)}x$j").mkString(" "))
    }
    val (chunk, stride) = (7, 5)
    val got = ChunkOps.chunkDocs(docs.toDF("id", "t"), "id", "t",
        chunk, stride)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getString(3)))).toMap
    val exp = docs.flatMap { case (id, t) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) Nil
      else {
        val nw = if (toks.length <= chunk) 1
          else (toks.length - chunk + stride - 1) / stride + 1
        (0 until nw).map { p =>
          val w = toks.slice(p * stride, p * stride + chunk)
          (id, p) -> ((w.length, w.mkString(" ")))
        }
      }
    }.toMap
    assert(got == exp)
    // no window is ever a suffix of its predecessor: every token is
    // covered and the last window reaches the end exactly once
    got.keys.groupBy(_._1).foreach { case (id, ks) =>
      val toks = docs.toMap.apply(id).split(" ").filter(_.nonEmpty)
      val last = ks.map(_._2).max
      assert(last * stride + got((id, last))._1 == toks.length)
    }
  }

  test("chunkDocs: stride == chunk tiles without overlap") {
    import graft.text.ChunkOps
    val doc = (1 to 9).map(i => s"w$i").mkString(" ")
    val got = ChunkOps.chunkDocs(Seq((1L, doc)).toDF("id", "t"),
        "id", "t", chunkTokens = 4, stride = 4)
      .collect().map(r => r.getAs[Int]("chunk_idx") ->
        r.getAs[String]("chunk_text")).toMap
    assert(got == Map(0 -> "w1 w2 w3 w4", 1 -> "w5 w6 w7 w8",
      2 -> "w9"))
  }

  // ------------------------------------------------------------ BpeOps

  test("learnMerges: hand-derived merge sequence and tie-breaks") {
    import graft.text.BpeOps
    // pair (a,b) weighs 2*2+3=7; after merging, (ab,ab) weighs 2
    val merges = BpeOps.learnMerges(
      Seq(("abab", 2L), ("ab", 3L)), numMerges = 3)
    assert(merges.take(2) == Seq(("a", "b"), ("ab", "ab")))
    // exhaustion: nothing left to merge after abab/ab are atoms
    assert(merges.length <= 3)
    // tie-break: equal counts fall to the lexicographically smallest
    val tied = BpeOps.learnMerges(Seq(("ba", 1L), ("ab", 1L)), 1)
    assert(tied == Seq(("a", "b")))
  }

  test("encodeWordScalar: lowest rank first, leftmost on rank ties") {
    import graft.functions.BpeKernel
    val ranks = Map(("a", "b") -> 0, ("ab", "ab") -> 1)
    assert(BpeKernel.encodeWordScalar("ababab", ranks) ==
      Seq("abab", "ab"))
    assert(BpeKernel.encodeWordScalar("xyz", ranks) ==
      Seq("x", "y", "z"))
    assert(BpeKernel.encodeWordScalar("a", ranks) == Seq("a"))
  }

  test("applyBpe: doc subword stream; reconstruction; invariance") {
    import graft.text.BpeOps
    import graft.text.BpeOps.BpeModel
    val model = BpeModel(Seq(("a", "b"), ("ab", "ab")))
    val docs = Seq((1L, "ab abab cd"), (2L, "")).toDF("id", "text")
    val got = BpeOps.applyBpe(docs, "text", model)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Seq[String]]("subwords"), r.getAs[Int]("n_subwords"))))
      .toMap
    assert(got(1L) == ((Seq("ab", "abab", "c", "d"), 4)))
    assert(got(2L) == ((Seq(), 0)))
    // reconstruction: joining a word's subwords yields the word
    val rnd = new scala.util.Random(3)
    val words = (0 until 50).map(_ =>
      (0 until 1 + rnd.nextInt(8)).map(_ => "abcd"(rnd.nextInt(4)))
        .mkString)
    val learned = BpeOps.learnMerges(
      words.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy(_._1), 20)
    val ranks = learned.zipWithIndex.toMap
    words.foreach { w =>
      assert(graft.functions.BpeKernel.encodeWordScalar(w, ranks)
        .mkString == w)
    }
    // learning is partition-invariant (hash sample + exact top cut)
    val corpus = (0L until 200L).map(i =>
      (i, s"w${i % 9} token stream sample t${i % 13}"))
      .toDF("doc_id", "text")
    val m1 = BpeOps.learnBpe(corpus.repartition(1), "doc_id", "text",
      30, sampleRate = 0.5, maxWords = 100)
    val m2 = BpeOps.learnBpe(corpus.repartition(13), "doc_id", "text",
      30, sampleRate = 0.5, maxWords = 100)
    assert(m1 == m2)
  }

  test("fertilityReport: literal counts; sequential == lowest-rank-first") {
    import graft.text.BpeOps
    import graft.text.BpeOps.BpeModel
    // model ab -> abab over a two-group corpus with a null text
    val model = BpeModel(Seq(("a", "b"), ("ab", "ab")))
    val docs = Seq(
      ("s1", "en", "ab abab cd"),  // subwords: ab | abab | c, d
      ("s1", "en", "xy"),          // x, y -> 2 singletons
      ("s1", "de", ""),            // tokenless
      ("s2", "en", null.asInstanceOf[String]))
      .toDF("source", "lang", "text")
    val got = BpeOps.fertilityReport(docs, "text",
        Seq("source", "lang"), model)
      .orderBy("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      // (source, lang, n_docs, n_words, n_word_bytes, n_subwords,
      //  n_singleton_bytes)
      ("s1", "de", 1L, 0L, 0L, 0L, 0L),
      ("s1", "en", 2L, 4L, 10L, 6L, 4L), // ab,abab,cd,xy -> ab|abab|c,d|x,y
      ("s2", "en", 1L, 0L, 0L, 0L, 0L)))

    // The q144 oracle replays merges SEQUENTIALLY (rank r exhausted
    // before rank r+1) while the kernel applies LOWEST-RANK-FIRST.
    // For trained tables these coincide (a merge's operands are only
    // producible by strictly earlier merges) — pin that equivalence
    // on the real corpus's learned table, per distinct word.
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val learned = BpeOps.learnBpe(real, "doc_id", "text",
      numMerges = 16, sampleRate = 1.0, maxWords = 500, salt = "fert")
    val ranks = learned.merges.zipWithIndex.toMap
    def sequential(w: String): Seq[String] = {
      var syms = w.map(_.toString).toVector
      learned.merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toVector
      }
      syms
    }
    val words = real.select(explode(
        graft.text.TextOps.tokens(col("text"))).as("w"))
      .distinct().collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(graft.functions.BpeKernel.encodeWordScalar(w, ranks) ==
        sequential(w), s"order divergence on '$w'")
    }
  }

  // ----------------------------------------------------- ClassifierOps

  private def nbFixture = Seq(
    (0L, true, "good prose reads well and flows with clear words"),
    (1L, true, "clear good words flow in well made prose here"),
    (2L, false, "spam junk click now buy cheap spam junk offer"),
    (3L, false, "cheap spam buy junk click offer now junk spam")
  ).toDF("id", "y", "t")

  test("naiveBayes: separates held-out docs; empty doc scores prior") {
    val model = ClassifierOps.trainNaiveBayes(nbFixture, "id", "y",
      "t", buckets = 64, seed = 7)
    assert(model.weights.count() == 64) // every bucket materialized
    val held = Seq(
      (10L, "clear prose with good words"),
      (11L, "buy cheap spam junk now"),
      (12L, "")).toDF("id", "t")
    val got = ClassifierOps.scoreNaiveBayes(held, model, "id", "t")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(got(10L).getAs[Boolean]("predicted"))
    assert(!got(11L).getAs[Boolean]("predicted"))
    // feature-free doc scores the bare prior (balanced classes:
    // bias = floor(ln(3/3)*1e6+0.5) = 0, and predicted needs > 0)
    assert(got(12L).getAs[Long]("n_feat") == 0L)
    assert(got(12L).getAs[Long]("score_micro") == model.biasMicro)
    assert(model.biasMicro == 0L && !got(12L).getAs[Boolean]("predicted"))
  }

  test("naiveBayes: prior and totals match the scalar closed form") {
    val model = ClassifierOps.trainNaiveBayes(
      nbFixture.filter(col("id") =!= 3L), "id", "y", "t",
      buckets = 64, seed = 7)
    // 2 pos vs 1 neg docs: bias = floor(ln(3/2)*1e6+0.5)
    assert(model.biasMicro ==
      math.floor(math.log(3.0 / 2.0) * 1e6 + 0.5).toLong)
    // a bucket with no training mass carries the both-zero smoothed
    // weight: docs have 9 tokens -> 17 unigram+bigram features each
    val (tp, tn) = (2 * 17.0, 1 * 17.0)
    val w0 = math.floor((math.log(1.0 / (tp + 64))
      - math.log(1.0 / (tn + 64))) * 1e6 + 0.5).toLong
    val ws = model.weights.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ws.size == 64 && ws.values.exists(_ == w0))
  }

  test("naiveBayes confusion: exact counts against held-out labels") {
    val model = ClassifierOps.trainNaiveBayes(nbFixture, "id", "y",
      "t", buckets = 64, seed = 7)
    val held = Seq(
      (20L, true, "good clear prose flows well"),
      (21L, true, "spam junk spam junk spam"), // mislabeled pos -> fn
      (22L, false, "cheap junk click spam buy"),
      (23L, false, "well made good clear words")) // mislabeled neg -> fp
      .toDF("id", "y", "t")
    val scored = ClassifierOps.scoreNaiveBayes(
      held.select("id", "t"), model, "id", "t")
    val c = ClassifierOps.confusion(scored, held, "id", "y")
      .collect().head
    assert(c.getAs[Long]("tp") == 1 && c.getAs[Long]("fn") == 1 &&
      c.getAs[Long]("tn") == 1 && c.getAs[Long]("fp") == 1)
  }

  test("naiveBayes: scores are partition-invariant") {
    val corpus = (0L until 40L).map(i =>
      (i, s"doc $i mixes good prose with spam junk ${i % 5}"))
      .toDF("id", "t")
    val model = ClassifierOps.trainNaiveBayes(nbFixture, "id", "y",
      "t", buckets = 64, seed = 7)
    val a = ClassifierOps.scoreNaiveBayes(corpus.repartition(1),
        model, "id", "t")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = ClassifierOps.scoreNaiveBayes(corpus.repartition(11),
        model, "id", "t")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(a == b)
  }

  test("ngramDiversity: literal trigram counts, short docs " +
      "contribute nothing, null groups fold, partition-invariant") {
    import graft.text.ReportOps
    val docs = Seq(
      // "a b a b a" -> trigrams: "a b a","b a b","a b a" (3 total, 2 distinct)
      (1L, Some("spam"), "a b a b a"),
      (2L, Some("spam"), "a b a"),        // +1 total, same gram
      (3L, Some("fresh"), "x y z w"),     // "x y z","y z w" (2, 2)
      (4L, None, "only two"),             // < 3 tokens: nothing
      (5L, None, "p q r")                 // null group -> ""
    ).toDF("doc_id", "source", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      ReportOps.ngramDiversity(d, "text", "source")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2))).toMap
    val got = run(docs)
    assert(got == Map("spam" -> (4L, 2L), "fresh" -> (2L, 2L),
      "" -> (1L, 1L)))
    assert(run(docs.repartition(5)) == got)
  }

  test("firstOccurrenceNovelty: shingles credit the smallest doc_id; " +
      "short docs fold to the whole-text shingle; partition-invariant") {
    import graft.text.ReportOps
    val docs = Seq(
      (1L, "a b c d"),        // {a b c, b c d} — both first here
      (2L, "a b c"),          // {a b c} — seen in doc 1: 0 novel
      (3L, "b c d e"),        // {b c d, c d e} — c d e novel
      (4L, "hi"),             // short: shingle "hi", novel
      (5L, "hi")              // short dup: same shingle, not novel
    ).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      ReportOps.firstOccurrenceNovelty(d, "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2))).toMap
    val got = run(docs)
    assert(got == Map(1L -> (2L, 2L), 2L -> (1L, 0L),
      3L -> (2L, 1L), 4L -> (1L, 1L), 5L -> (1L, 0L)))
    assert(run(docs.repartition(4)) == got)
  }
}
