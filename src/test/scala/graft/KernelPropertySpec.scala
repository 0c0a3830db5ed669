package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** Property tests for the fused text kernels, evaluated directly
  * (`nullSafeEval` on GenericArrayData — no Spark jobs, so hundreds
  * of trials are cheap) against independent brute re-derivations. The
  * DataFrame-level parity of each kernel against the relational
  * formulation it replaced is pinned separately in TextOpsSpec /
  * PackQualityScrubSpec; these cover the combinatorial edge space
  * (doc lengths around k/w boundaries, repeats, single tokens). */
class KernelPropertySpec extends AnyFunSuite {

  private def holds(p: Prop, n: Int = 200): Boolean =
    SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n), p).passed

  private val genTok: Gen[String] =
    Gen.choose(1, 6).flatMap(l =>
      Gen.listOfN(l, Gen.alphaLowerChar).map(_.mkString))
  private val genDoc: Gen[List[String]] =
    Gen.choose(0, 24).flatMap(n => Gen.listOfN(n, genTok))

  private def arr(tokens: Seq[String]): ArrayData =
    new GenericArrayData(
      tokens.map(t => UTF8String.fromString(t): Any).toArray)

  private def rows(res: Any): Seq[InternalRow] = {
    val a = res.asInstanceOf[ArrayData]
    (0 until a.numElements()).map(i =>
      a.getStruct(i, 3)) // widest struct arity used below is 3
  }

  // ----------------------------------------------------------- shingles

  private def bruteShingles(toks: List[String], k: Int): Seq[String] =
    if (toks.isEmpty) Seq.empty
    else if (toks.length < k) Seq(toks.mkString(" "))
    else toks.sliding(k).map(_.mkString(" ")).toSeq

  test("DistinctShingles == brute distinct sliding windows") {
    val p = Prop.forAll(genDoc, Gen.choose(1, 5)) { (toks, k) =>
      val res = DistinctShingles(null, k).nullSafeEval(arr(toks))
      val a = res.asInstanceOf[ArrayData]
      val got = (0 until a.numElements()).map(a.getUTF8String(_).toString)
      got == bruteShingles(toks, k).distinct
    }
    assert(holds(p))
  }

  test("PositionedWindows == brute positioned windows") {
    val p = Prop.forAll(genDoc, Gen.choose(1, 5)) { (toks, k) =>
      val res = PositionedWindows(null, k).nullSafeEval(arr(toks))
      val a = res.asInstanceOf[ArrayData]
      val got = (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2)
        (r.getInt(0), r.getUTF8String(1).toString)
      }
      val exp =
        if (toks.length < k) Seq.empty
        else toks.sliding(k).zipWithIndex
          .map { case (w, i) => (i, w.mkString(" ")) }.toSeq
      got == exp
    }
    assert(holds(p))
  }

  // ------------------------------------------------------------ bigrams

  test("BigramCountsExpr == brute (<s>-sentinel) pair counts") {
    val p = Prop.forAll(genDoc) { toks =>
      val res = BigramCountsExpr(null).nullSafeEval(arr(toks))
      val got = rows(res).map(r => (r.getUTF8String(0).toString,
        r.getUTF8String(1).toString) -> r.getLong(2)).toMap
      val exp = toks.zipWithIndex
        .map { case (w, i) => (if (i == 0) "<s>" else toks(i - 1), w) }
        .groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
      got == exp && rows(res).map(_.getLong(2)).sum == toks.length.toLong
    }
    assert(holds(p))
  }

  // ------------------------------------------------------- dsir buckets

  test("HashedNgramCountsExpr == brute bucketScalar counts") {
    val p = Prop.forAll(genDoc, Gen.choose(2, 64)) { (toks, b) =>
      val res = HashedNgramCountsExpr(null, b, 7).nullSafeEval(arr(toks))
      val got = rows(res).map(r => r.getLong(0) -> r.getLong(1)).toMap
      val feats = toks.zipWithIndex.flatMap { case (w, i) =>
        if (i == 0) Seq(w) else Seq(w, s"${toks(i - 1)} $w")
      }
      val exp = feats.map(HashedNgrams.bucketScalar(_, 7, b))
        .groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
      got == exp
    }
    assert(holds(p, 60)) // md5 per feature — keep trials moderate
  }

  // ------------------------------------------------------------ minhash

  test("MinhashSig == brute laneHashScalar minima over the shingle set") {
    val p = Prop.forAll(genDoc, Gen.choose(1, 4)) { (toks, k) =>
      val res = MinhashSig(null, k, 8).nullSafeEval(arr(toks))
      if (toks.isEmpty) res == null
      else {
        val a = res.asInstanceOf[ArrayData]
        val got = (0 until 8).map(a.getLong)
        val sh = bruteShingles(toks, k).distinct
        val exp = (0 until 8).map(i =>
          sh.map(MinhashKernel.laneHashScalar(_, i)).min)
        got == exp
      }
    }
    assert(holds(p, 60))
  }

  // ------------------------------------------------------------ simhash

  test("SimhashWords == wordsScalar; empty doc gives all-ones words") {
    val p = Prop.forAll(genDoc) { toks =>
      val res = SimhashWords(null).nullSafeEval(arr(toks))
      val a = res.asInstanceOf[ArrayData]
      val got = (0 until 4).map(a.getLong)
      got == SimhashKernel.wordsScalar(toks) &&
        (toks.nonEmpty || got == Seq.fill(4)(0xFFFFL))
    }
    assert(holds(p, 60))
  }

  // ---------------------------------------------------------- winnowing

  test("WinnowSelect == selectScalar; shared >=k+w-1 substrings overlap") {
    val genClean = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val p = Prop.forAll(genClean) { cs =>
      val res = WinnowSelect(null, 5, 4, 11)
        .nullSafeEval(UTF8String.fromString(cs))
      val a = res.asInstanceOf[ArrayData]
      val got = (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
      got == Winnow.selectScalar(cs, 5, 4, 11)
    }
    assert(holds(p))
    // the paper's theorem 1: any shared substring of length >= k+w-1
    // yields at least one shared fingerprint HASH, wherever it sits
    val pShare = Prop.forAll(
      Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString),
      Gen.listOfN(12, Gen.alphaLowerChar).map(_.mkString),
      Gen.listOfN(12, Gen.alphaLowerChar).map(_.mkString)) { (s, p1, p2) =>
      val h1 = Winnow.selectScalar(p1 + s, 5, 4, 11).map(_._1).toSet
      val h2 = Winnow.selectScalar(s + p2, 5, 4, 11).map(_._1).toSet
      (h1 intersect h2).nonEmpty
    }
    assert(holds(pShare, 100))
  }

  test("WinnowSelect deque == naive scalar over random (k, w); unicode") {
    // The r12 monotonic-deque selection and the UTF-16 non-ASCII
    // fallback are only exercised at (k=5, w=4, ASCII) above — sweep
    // the parameter space (w up to 32, far beyond the oracle
    // setting) and a codepoint alphabet spanning ASCII, Latin-1,
    // CJK, and a surrogate-pair emoji (UTF-16 code-unit iteration is
    // the contract, matching selectScalar's charAt exactly).
    val genKW = for {
      k <- Gen.choose(1, 8); w <- Gen.choose(1, 32)
    } yield (k, w)
    val genUni = Gen.choose(0, 48).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Gen.alphaLowerChar.map(_.toString), Gen.numChar.map(_.toString),
        Gen.oneOf("é", "ß", "中", "語", "😀"))).map(_.mkString))
    val p = Prop.forAll(genUni, genKW) { case (cs, (k, w)) =>
      val res = WinnowSelect(null, k, w, 11)
        .nullSafeEval(UTF8String.fromString(cs))
      val a = res.asInstanceOf[ArrayData]
      val got = (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
      got == Winnow.selectScalar(cs, k, w, 11)
    }
    assert(holds(p, 400))
  }

  // --------------------------------------------------------- repetition

  test("RepetitionStatsExpr == brute line/gram re-derivation") {
    val p = Prop.forAll(genDoc, Gen.choose(1, 5)) { (toks, width) =>
      val res = RepetitionStatsExpr(null, width, Seq(2))
        .nullSafeEval(arr(toks)).asInstanceOf[InternalRow]
      if (toks.isEmpty)
        res.getLong(0) == 0L && res.getDouble(1) == 0.0 &&
          res.getDouble(2) == 0.0 && res.getDouble(3) == 0.0
      else {
        val lines = toks.grouped(width).map(_.mkString(" ")).toList
        val lc = lines.groupBy(identity).view.mapValues(_.size.toLong)
        val total = lines.length.toLong
        val dupFrac = 1.0 - lc.size.toDouble / total.toDouble
        val dupChars = lc.map { case (l, c) => (c - 1) * l.length.toLong }.sum
        val allChars = lc.map { case (l, c) => c * l.length.toLong }.sum
        val chars = toks.mkString(" ").length.toLong
        val top =
          if (toks.length < 2) 0L
          else toks.sliding(2).map(_.mkString(" ")).toList
            .groupBy(identity)
            .map { case (g, v) => v.size.toLong * g.length }.max
        res.getLong(0) == total &&
          res.getDouble(1) == dupFrac &&
          res.getDouble(2) == dupChars.toDouble / allChars.toDouble &&
          res.getDouble(3) ==
            (if (chars > 0) top.toDouble / chars.toDouble else 0.0)
      }
    }
    assert(holds(p))
  }

  // ------------------------------------------------------ fused tokenizer

  /** Raw-text generator biased toward the tokenizer's edge space:
    * Unicode case folds that land IN [a-z0-9] (KELVIN SIGN → k,
    * İ → i + combining dot), accents, surrogate pairs, digits glued
    * to letters, and every separator class. */
  private val genRawText: Gen[String] = {
    val piece = Gen.oneOf(
      genTok, Gen.const(" "), Gen.const("\t\n"), Gen.const("..!?"),
      Gen.const("ABC"), Gen.const("É"), Gen.const("K"), // KELVIN
      Gen.const("İ"), // İ: lowers to i + combining dot
      Gen.const("x9y"), Gen.const("42"), Gen.const("😀"),
      Gen.const("ß"), Gen.const("ä̈"), Gen.const(""))
    Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, piece).map(_.mkString))
  }

  /** Brute re-derivation of the pinned relational semantics: maximal
    * [a-z0-9] runs of the JDK-lowercased text. `String.toLowerCase`
    * (root locale) and `UTF8String.toLowerCase` both implement the
    * full Unicode one-to-many lowercase map, so they agree. */
  private def bruteTokens(s: String): Seq[String] = {
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    lower.foreach { ch =>
      if ((ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')) sb += ch
      else if (sb.nonEmpty) { out += sb.result(); sb.clear() }
    }
    if (sb.nonEmpty) out += sb.result()
    out.toSeq
  }

  test("Tokenize kernel == maximal [a-z0-9] runs of the lowered text") {
    val p = Prop.forAll(genRawText) { s =>
      val res = Tokenize.tokensImpl(UTF8String.fromString(s))
      val got = (0 until res.numElements())
        .map(i => res.getUTF8String(i).toString)
      got == bruteTokens(s) &&
        Tokenize.tokenCountImpl(UTF8String.fromString(s)) == got.length
    }
    assert(holds(p, n = 400))
  }
}
