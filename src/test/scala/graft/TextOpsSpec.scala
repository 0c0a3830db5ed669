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

  test("simhash of identical texts is equal; hamming 0") {
    val docs = Seq((1L, "spark scala engine"), (2L, "spark scala engine"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(docs, "doc_id", "text", 0).collect()
    assert(pairs.length == 1 && pairs(0).getAs[Int]("hamming") == 0)
  }

  test("langId picks the language with most stopword hits") {
    val guess = Seq("der hund und die katze ist nicht hier")
      .toDF("text").select(TextOps.langId(col("text"))).head().getString(0)
    assert(guess == "de")
    val en = Seq("the cat and the dog is in that house")
      .toDF("text").select(TextOps.langId(col("text"))).head().getString(0)
    assert(en == "en")
  }
}
