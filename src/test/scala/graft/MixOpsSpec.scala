package graft

import org.apache.spark.sql.functions._

import graft.text.{BudgetOps, MixOps}

/** UniMax allocation specs: the pure closed form against a literal
  * sequential water-filling simulation, the window restatement
  * against the pure form, exact budget exhaustion, and the
  * fill-with-derived-budgets composition. */
class MixOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Literal sequential UniMax (the paper's loop), integerized with
    * the same floor-share + remainder-to-first convention. */
  private def unimaxSeq(totals: Map[String, Long], budget: Long,
      capNum: Long, capDen: Long): Map[String, Long] = {
    val rows = totals.toSeq
      .map { case (s, n) => s -> (BigInt(n) * capNum / capDen).toLong }
      .sortBy { case (s, cap) => (cap, s) }
    var rem = budget
    var i = 0
    val out = scala.collection.mutable.Map.empty[String, Long]
    var sharing = false
    var u = 0L; var extra = 0L; var sharedIdx = 0L
    rows.foreach { case (s, cap) =>
      val left = rows.size - i
      if (!sharing && BigInt(cap) * left <= BigInt(rem)) {
        out(s) = cap; rem -= cap
      } else {
        if (!sharing) {
          sharing = true; u = rem / left; extra = rem % left
        }
        out(s) = u + (if (sharedIdx < extra) 1L else 0L)
        sharedIdx += 1
      }
      i += 1
    }
    out.toMap
  }

  private val cases: Seq[(Map[String, Long], Long, Long, Long)] = Seq(
    // mixed capped/uncapped, remainder spread over several strata
    (Map("a" -> 10L, "b" -> 300L, "c" -> 500L, "d" -> 700L), 1000L, 2L, 1L),
    // everything fits under caps (budget never reached)
    (Map("a" -> 10L, "b" -> 20L), 1000L, 1L, 1L),
    // budget smaller than every cap: pure equal share + remainder
    (Map("a" -> 400L, "b" -> 500L, "c" -> 600L), 100L, 1L, 1L),
    // fractional epoch cap
    (Map("en" -> 900L, "de" -> 100L, "fr" -> 50L), 300L, 1L, 3L),
    // zero-token stratum and zero budget
    (Map("a" -> 0L, "b" -> 10L), 0L, 2L, 1L),
    (Map.empty[String, Long], 50L, 1L, 1L))

  test("unimaxAllocate matches the sequential water-filling loop") {
    cases.foreach { case (totals, b, cn, cd) =>
      assert(MixOps.unimaxAllocate(totals, b, cn, cd) ==
        unimaxSeq(totals, b, cn, cd), s"case $totals b=$b cap=$cn/$cd")
    }
  }

  test("allocations sum to exactly min(budget, sum of caps)") {
    cases.foreach { case (totals, b, cn, cd) =>
      val caps = totals.values
        .map(n => (BigInt(n) * cn / cd).toLong).sum
      val got = MixOps.unimaxAllocate(totals, b, cn, cd).values.sum
      assert(got == math.min(b, caps), s"case $totals")
      // never over any stratum's cap
      MixOps.unimaxAllocate(totals, b, cn, cd).foreach { case (s, a) =>
        assert(a <= (BigInt(totals(s)) * cn / cd).toLong, s"stratum $s")
      }
    }
  }

  test("window restatement equals the pure closed form") {
    val docs = Seq(
      (1L, "a", 5L), (2L, "a", 5L), (3L, "b", 150L), (4L, "b", 150L),
      (5L, "c", 500L), (6L, "d", 700L), (7L, null, 40L))
      .toDF("id", "src", "n_tok")
    val totals = Map("a" -> 10L, "b" -> 300L, "c" -> 500L,
      "d" -> 700L, "" -> 40L)
    val want = MixOps.unimaxAllocate(totals, 1000L, 2L, 1L)
    val got = MixOps
      .unimaxAllocation(docs, "src", "n_tok", 1000L, 2L, 1L)
      .collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == want)
    // fraction variant: budget = floor(1550 / 2) = 775
    val gotF = MixOps
      .unimaxAllocationFraction(docs, "src", "n_tok", 1L, 2L, 2L, 1L)
      .collect()
    assert(gotF.map(_.getLong(5)).distinct.toSeq == Seq(775L))
    val wantF = MixOps.unimaxAllocate(totals, 775L, 2L, 1L)
    assert(gotF.map(r => r.getString(0) -> r.getLong(3)).toMap == wantF)
    // partition invariance of the groupBy+window plan
    val got7 = MixOps
      .unimaxAllocation(docs.repartition(7), "src", "n_tok", 1000L, 2L, 1L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got7 == want)
  }

  test("mulDivFloor accepts computed/aliased Columns (no toString round-trip)") {
    // A composite expression's toString ("(a + b) AS x") is not
    // parseable SQL — the old expr(x.toString) construction threw or
    // silently re-resolved; the native-Column build must evaluate it.
    val df = Seq((7L, 5L), (1000000000000L, 999999999999L))
      .toDF("a", "b")
    val got = df.select(
        MixOps.mulDivFloor(col("a") + col("b"), 3L, 7L).as("y"))
      .collect().map(_.getLong(0)).toSeq
    val want = Seq((7L + 5L, 3L, 7L), (1999999999999L, 3L, 7L))
      .map { case (x, n, d) => (BigInt(x) * n / d).toLong }
    assert(got == want)
    // and through the public fraction entry point with aliased inputs
    val docs = Seq((1L, "a", 5L), (2L, "b", 9L))
      .toDF("id", "raw.src", "raw tok")
    val out = MixOps.unimaxAllocationFraction(docs, "`raw.src`",
      "`raw tok`", 1L, 2L, 1L, 1L).collect()
    assert(out.map(_.getLong(5)).distinct.toSeq == Seq(7L))
  }

  test("temperatureSqrtAllocation: isqrt weights + exact Hamilton apportionment") {
    // totals: a=100 (w=10), b=400 (w=20), c=10000 (w=100), d=0 (w=0),
    // null->""=25 (w=5); W=135. budget=1000:
    // base = floor(w*1000/135) = 74/148/740/0/37 (sum 999),
    // leftover 1 goes to the largest remainder (c: 100).
    val docs = Seq(("a", 60L), ("a", 40L), ("b", 400L), ("c", 10000L),
      ("d", 0L), (null, 25L)).toDF("src", "n_tok")
    val out = MixOps.temperatureSqrtAllocation(docs, "src", "n_tok", 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map("a" -> (10L, 74L), "b" -> (20L, 148L),
      "c" -> (100L, 741L), "d" -> (0L, 0L), "" -> (5L, 37L)))
    assert(out.values.map(_._2).sum == 1000L)
    // fraction variant: T = 10525, floor(T/5) = 2105; still exact-sum
    val frac = MixOps.temperatureSqrtAllocationFraction(docs, "src",
      "n_tok", 1L, 5L).collect()
    assert(frac.map(_.getLong(4)).distinct.toSeq == Seq(2105L))
    assert(frac.map(_.getLong(3)).sum == 2105L)
    // partition invariance
    val out7 = MixOps.temperatureSqrtAllocation(docs.repartition(7),
      "src", "n_tok", 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out7 == out.map { case (k, (_, a)) => k -> a })
  }

  test("temperatureSqrtAllocate closed form == window restatement; fill uses it") {
    val docs = Seq(("a", 60L), ("a", 40L), ("b", 400L), ("c", 10000L),
      ("d", 0L), (null, 25L)).toDF("src", "n_tok")
    val totals = Map("a" -> 100L, "b" -> 400L, "c" -> 10000L,
      "d" -> 0L, "" -> 25L)
    val want = MixOps.temperatureSqrtAllocate(totals, 1000L)
    val win = MixOps.temperatureSqrtAllocation(docs, "src", "n_tok", 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(win == want)
    assert(want.values.sum == 1000L)
    // fill: priorities descend with id so greedy order is id ASC;
    // budgets must equal the closed-form apportionment
    val pool = (1L to 30L).map { i =>
      (i, if (i <= 10) "s" else "t", 10L, -i.toDouble)
    }.toDF("id", "src", "n_tok", "pri")
    // totals: s=100 (w=10), t=200 (w=14), W=24, budget=120:
    // base s=50, t=70, sum 120, leftover 0
    val out = BudgetOps.budgetSelectTemperatureSqrt(pool, "id", "n_tok",
      "pri", "src", 120L).collect()
    val budgets = out.map(r => r.getString(1) -> r.getLong(5)).toMap
    assert(budgets == Map("s" -> 50L, "t" -> 70L))
    assert(budgets == MixOps.temperatureSqrtAllocate(
      Map("s" -> 100L, "t" -> 200L), 120L))
    val selected = out.filter(_.getBoolean(6)).map(_.getLong(0)).toSet
    assert(selected == ((1L to 5L) ++ (11L to 17L)).toSet)
  }

  test("budgetSelectUnimax fills each stratum to its derived budget") {
    // priorities descend with id so the greedy order is id ASC
    val docs = (1L to 40L).map { i =>
      (i, if (i <= 10) "small" else "big", 10L, -i.toDouble)
    }.toDF("id", "src", "n_tok", "pri")
    // totals: small=100, big=300; caps(1 epoch)=totals;
    // budget=200: small capped (100*2 <= 200), big shares 100
    val out = BudgetOps.budgetSelectUnimax(docs, "id", "n_tok", "pri",
      "src", 200L, 1L, 1L).collect()
    val budgets = out.map(r => r.getString(1) -> r.getLong(5)).toMap
    assert(budgets == Map("small" -> 100L, "big" -> 100L))
    val selected = out.filter(_.getBoolean(6)).map(_.getLong(0)).toSet
    assert(selected == ((1L to 10L) ++ (11L to 20L)).toSet)
    // matches the explicit-budgets fill with the same allocation
    val viaMap = BudgetOps.budgetSelectPerStratum(docs, "id", "n_tok",
      "pri", "src", Map("small" -> 100L, "big" -> 100L)).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5),
        r.getBoolean(6))).toSet
    assert(out.map(r => (r.getLong(0), r.getLong(4), r.getLong(5),
      r.getBoolean(6))).toSet == viaMap)
  }
}
