package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{BudgetDoc, BudgetedDoc, StreamingBudget}

/** Specs for the streaming token-budget fill: the pure transition
  * (cum continuation, the exclusive-prefix admission rule, overflow
  * and negative-size guards), and cross-run end-to-end parity with
  * the batch [[graft.text.BudgetOps.budgetSelectPerStratum]] at
  * constant priority. */
class StreamingBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("stamp continues the running total across batches, admits by " +
      "exclusive prefix, and guards sizes and overflow") {
    val st = new TestGroupState[Long]
    val budgets = Map("a" -> 10L)
    val b1 = StreamingBudget.stamp("a",
      Iterator(BudgetDoc("a", 5L, 4L), BudgetDoc("a", 2L, 3L)), st,
      budgets, 0L, 1000L).toSeq
    // id order: doc 2 (cum 3, sel: 0<10), doc 5 (cum 7, sel: 3<10)
    assert(b1 == Seq(BudgetedDoc("a", 2L, 3L, 3L, 10L, true),
      BudgetedDoc("a", 5L, 4L, 7L, 10L, true)))
    assert(st.value == 7L)
    // next run: doc 9 starts at 7 < 10 -> admitted despite overshoot;
    // doc 11 starts at 15 >= 10 -> rejected but still emitted
    val b2 = StreamingBudget.stamp("a",
      Iterator(BudgetDoc("a", 11L, 2L), BudgetDoc("a", 9L, 8L)), st,
      budgets, 0L, 1000L).toSeq
    assert(b2 == Seq(BudgetedDoc("a", 9L, 8L, 15L, 10L, true),
      BudgetedDoc("a", 11L, 2L, 17L, 10L, false)))
    // absent stratum gets the default (0 = excluded, rows still emit)
    val b3 = StreamingBudget.stamp("zz",
      Iterator(BudgetDoc("zz", 1L, 5L)), new TestGroupState[Long],
      budgets, 0L, 1000L).toSeq
    assert(b3 == Seq(BudgetedDoc("zz", 1L, 5L, 5L, 0L, false)))
    intercept[IllegalArgumentException] {
      StreamingBudget.stamp("a", Iterator(BudgetDoc("a", 1L, -1L)),
        new TestGroupState[Long], budgets, 0L, 1000L).toSeq
    }
    intercept[IllegalStateException] {
      StreamingBudget.stamp("a", Iterator(BudgetDoc("a", 1L, 101L)),
        new TestGroupState[Long], budgets, 0L, 100L).toSeq
    }
  }

  test("cron drains in id order are bit-identical to the batch " +
      "per-stratum budget fill at constant priority") {
    val docs = (0L until 90L).map(i =>
      (i, Seq("en", "de", "fr")(((i % 7) % 3).toInt), 1L + i % 13))
      .toDF("doc_id", "lang", "n_tok")
    val budgets = Map("en" -> 60L, "de" -> 40L)
    val batch = graft.text.BudgetOps.budgetSelectPerStratum(
        docs.withColumn("__p", lit(0.0)), "doc_id", "n_tok", "__p",
        "lang", budgets, defaultBudget = 25L)
      .select("doc_id", "cum_tokens", "budget", "selected")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val in = Files.createTempDirectory("bf_in").toString
    val out = Files.createTempDirectory("bf_out").toString
    val ckpt = Files.createTempDirectory("bf_ckpt").toString
    docs.filter(col("doc_id") < 40).coalesce(1).write
      .mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def drain(): Unit = StreamingBudget.fillRun(spark, in, out, ckpt,
      schema, "lang", "n_tok", budgets, defaultBudget = 25L)
    drain()
    docs.filter(col("doc_id") >= 40).coalesce(1).write
      .mode("append").parquet(in)
    drain()
    val streamed = spark.read.parquet(out)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cum_tokens"), r.getAs[Long]("budget"),
          r.getAs[Boolean]("selected"))).toMap
    assert(streamed == batch)
  }
}
