package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UniMax budget allocation — derive the per-stratum token budgets a
  * mixture fill consumes, instead of taking them as caller input
  * (Chung, Garcia, Constant et al., "UniMax: Fairer and More
  * Effective Language Sampling for Large-Scale Multilingual
  * Pretraining", ICLR 2023). Given per-stratum token totals, a total
  * training budget B, and an epoch cap c (max passes over any
  * stratum's data), UniMax water-fills: visit strata in ascending
  * cap order and give each `min(cap_l, remaining/strataRemaining)` —
  * small strata are fully used up to c epochs, large strata split
  * the leftover equally. The result is the standard "fair" mixture
  * recipe: no stratum repeats more than c times, head strata are
  * down-weighted to exactly the budget that remains.
  *
  * Exactness (the property the oracle checks lean on): everything is
  * integer. The epoch cap is a rational `capNum/capDen`
  * (cap_l = floor(n_l·capNum/capDen)); the water level is resolved
  * by the closed form below rather than the sequential loop; and the
  * real-valued "equal share" is integerized as floor + one extra
  * token to the first `remainder` uncapped strata in sort order —
  * deterministic on any engine, and the allocations sum to exactly
  * `min(B, Σcaps)`.
  *
  * Closed form: sort strata by (cap ASC, stratum ASC). With caps
  * ascending, once one stratum's cap exceeds the equal share, every
  * later stratum's does too (the share stays constant among
  * uncapped strata), so the capped set is a PREFIX: p* = the first
  * position where `cap_p · (R − p + 1) > B − Σ_{j<p} cap_j`.
  * Positions before p* take their cap; positions from p* share
  * `B − Σ_{j<p*} cap_j`. No iteration, so the whole allocation is
  * one window pass — and one SQL restatement.
  *
  * Scale shape: the corpus collapses to one L-row aggregate
  * (L = stratum cardinality — sources/languages, parameter-small by
  * the same contract as [[BudgetOps.budgetSelectPerStratum]]'s
  * budget map and [[SampleOps]]'s rate table), and the window pass
  * runs over those L rows only; the corpus itself is touched by
  * exactly one map-side-combining groupBy. Overflow bounds: the
  * closed form compares `cap·(R−p+1)` in DECIMAL(38,0)/HUGEINT, so
  * Long-range token totals are safe at any stratum count; the
  * floor(n·num/den) steps use the exact decomposition
  * `(n div den)·num + ((n mod den)·num) div den`, which never
  * multiplies two corpus-sized numbers. Token totals must be
  * non-negative (they are counts).
  *
  * Reference scope: the reference pipeline has no mixture operator;
  * this extends the engine's curation family ([[BudgetOps]],
  * [[SampleOps]]) per the build brief's training-data mandate. */
object MixOps {

  /** Exact floor(x·num/den) for x ≥ 0 without overflowing the
    * product: (x div den)·num + ((x mod den)·num) div den. Built
    * with native Column arithmetic (integral `div` via
    * [[call_function]]) so any Column — aliased, computed, lambda —
    * is safe; a `Column.toString`-into-`expr` round-trip would parse
    * only simple named columns. */
  private[graft] def mulDivFloor(x: Column, num: Long, den: Long): Column = {
    val xl = x.cast("long")
    call_function("div", xl, lit(den)) * lit(num) +
      call_function("div", (xl % lit(den)) * lit(num), lit(den))
  }

  /** Driver-side UniMax allocation over per-stratum token totals —
    * the pure closed form, shared by [[unimaxAllocation]]'s window
    * restatement (spec-pinned equal) and
    * [[BudgetOps.budgetSelectUnimax]]'s pass-1 hook. Totals must be
    * non-negative. Returns stratum → allocated tokens; allocations
    * sum to exactly min(budget, Σcaps). */
  def unimaxAllocate(totals: Map[String, Long], budget: Long,
      capNum: Long, capDen: Long): Map[String, Long] = {
    require(budget >= 0 && capNum >= 0 && capDen > 0,
      s"budget=$budget capNum=$capNum capDen=$capDen")
    require(totals.valuesIterator.forall(_ >= 0),
      "unimaxAllocate: token totals must be non-negative")
    val rows = totals.toSeq
      .map { case (s, n) => (s, (BigInt(n) * capNum / capDen).toLong) }
      .sortBy { case (s, cap) => (cap, s) }
    val r = rows.size
    var cum = BigInt(0)
    var pstar = -1
    for (((_, cap), idx) <- rows.zipWithIndex if pstar < 0) {
      val pos = idx + 1
      if (BigInt(cap) * (r - pos + 1) > BigInt(budget) - cum) pstar = pos
      else cum += cap
    }
    if (pstar < 0) rows.toMap
    else {
      val avail = budget - cum.toLong
      val nShare = r - pstar + 1
      val u = avail / nShare
      val rem = avail % nShare
      rows.zipWithIndex.map { case ((s, cap), idx) =>
        val pos = idx + 1
        if (pos < pstar) s -> cap
        else s -> (u + (if (pos - pstar < rem) 1L else 0L))
      }.toMap
    }
  }

  /** UniMax allocation as a declarative plan: groupBy-collapse the
    * corpus to per-stratum totals, then resolve the closed form in
    * one window pass over the L-row aggregate (the single-partition
    * window is L-row-bounded by the stratum-cardinality contract).
    * NULL strata fold to "". Budget = `totalBudget` tokens; epoch
    * cap = capNum/capDen. Returns
    * (stratum, n_tokens, cap_tokens, alloc_tokens, capped, budget)
    * — all exact BIGINT/boolean, bit-reproducible. */
  def unimaxAllocation(df: DataFrame, stratumCol: String,
      tokenCol: String, totalBudget: Long, capNum: Long,
      capDen: Long): DataFrame = {
    require(totalBudget >= 0, s"totalBudget=$totalBudget")
    allocate(df, stratumCol, tokenCol, lit(totalBudget), capNum, capDen)
  }

  /** [[unimaxAllocation]] with budget = floor(totalTokens·num/den),
    * derived inside the same window pass — "spend a quarter of the
    * corpus, no stratum more than c epochs" without a separate
    * corpus action. */
  def unimaxAllocationFraction(df: DataFrame, stratumCol: String,
      tokenCol: String, num: Long, den: Long, capNum: Long,
      capDen: Long): DataFrame = {
    require(den > 0 && num >= 0, s"num=$num den=$den")
    allocate(df, stratumCol, tokenCol,
      mulDivFloor(col("__T"), num, den), capNum, capDen)
  }

  /** Square-root temperature allocation — the mBERT/XLM-R "α = 0.5
    * exponentiated sampling" mixture recipe (Devlin 2019 app.,
    * Conneau & Lample 2019 §3): stratum l gets budget
    * floor(B·√n_l / Σ√n) — head strata down-weighted, tails
    * up-weighted, smoothly between proportional (α=1) and uniform
    * (α=0). Everything exact BIGINT: weights are CORRECTED integer
    * square roots (floor(sqrt(n)) ± 1 fixup, so no fp-edge
    * divergence between engines), the proportional share is
    * floor(w·B / W) in DECIMAL(38,0) (w·B overflows Long at corpus
    * scale), and the dropped remainder tokens are re-dealt by
    * Hamilton largest-remainder apportionment — +1 to the strata
    * with the largest `(w·B) mod W`, ties to stratum ASC — so
    * allocations sum to EXACTLY min-of-nothing: B when W > 0 (the
    * apportionment is exact), 0 when the corpus is empty.
    *
    * Same scale shape as [[unimaxAllocation]]: one map-side-combining
    * corpus groupBy, then a window pass over the L-row stratum
    * aggregate. Returns (stratum, n_tokens, weight, alloc_tokens,
    * budget). */
  def temperatureSqrtAllocation(df: DataFrame, stratumCol: String,
      tokenCol: String, totalBudget: Long): DataFrame = {
    require(totalBudget >= 0, s"totalBudget=$totalBudget")
    allocateSqrt(df, stratumCol, tokenCol, lit(totalBudget))
  }

  /** [[temperatureSqrtAllocation]] with budget = floor(T·num/den)
    * derived inside the same window pass. */
  def temperatureSqrtAllocationFraction(df: DataFrame,
      stratumCol: String, tokenCol: String, num: Long, den: Long)
      : DataFrame = {
    require(den > 0 && num >= 0, s"num=$num den=$den")
    allocateSqrt(df, stratumCol, tokenCol,
      mulDivFloor(col("__T"), num, den))
  }

  /** Driver-side √-temperature allocation — the pure closed form of
    * [[temperatureSqrtAllocation]] (spec-pinned equal), shared by
    * [[BudgetOps.budgetSelectTemperatureSqrt]]'s pass-1 hook. */
  def temperatureSqrtAllocate(totals: Map[String, Long], budget: Long)
      : Map[String, Long] = {
    require(budget >= 0, s"budget=$budget")
    require(totals.valuesIterator.forall(_ >= 0),
      "temperatureSqrtAllocate: token totals must be non-negative")
    def isqrtL(n: Long): Long = {
      val s0 = math.sqrt(n.toDouble).toLong
      val down = if (s0 * s0 > n) s0 - 1 else s0
      if ((down + 1) * (down + 1) <= n) down + 1 else down
    }
    val w = totals.map { case (s, n) => s -> isqrtL(n) }
    val tw = w.valuesIterator.map(BigInt(_)).sum
    if (tw <= 0) return totals.map { case (s, _) => s -> 0L }
    val base = w.map { case (s, wi) =>
      s -> (BigInt(wi) * budget / tw).toLong }
    val rem = w.map { case (s, wi) => s -> (BigInt(wi) * budget % tw) }
    var leftover = budget - base.valuesIterator.sum
    val order = rem.toSeq.sortBy { case (s, r) => (-r, s) }.map(_._1)
    val plus = order.take(leftover.toInt).toSet
    base.map { case (s, b) => s -> (b + (if (plus(s)) 1L else 0L)) }
  }

  /** Corrected integer sqrt: floor(sqrt(x)) exactly for 0 ≤ x ≲ 2^52
    * (token counts). The fp sqrt can land one off at either side of a
    * perfect square; two integer comparisons fix it up. */
  private def isqrt(x: Column): Column = {
    val s0 = floor(sqrt(x.cast("double"))).cast("long")
    val down = s0 - when(s0 * s0 > x, 1L).otherwise(0L)
    down + when((down + 1) * (down + 1) <= x, 1L).otherwise(0L)
  }

  private def allocateSqrt(df: DataFrame, stratumCol: String,
      tokenCol: String, budgetCol: Column): DataFrame = {
    val totals = df
      .groupBy(coalesce(col(stratumCol).cast("string"), lit(""))
        .as("stratum"))
      .agg(sum(coalesce(col(tokenCol).cast("long"), lit(0L)))
        .as("n_tokens"))
    val wAll = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRem = Window.orderBy(col("__rem").desc, col("stratum").asc)
    val big = (c: Column) => c.cast("decimal(38,0)")
    totals
      .withColumn("weight", isqrt(col("n_tokens")))
      .withColumn("__W", sum("weight").over(wAll))
      .withColumn("__T", sum("n_tokens").over(wAll))
      .withColumn("budget", budgetCol)
      // floor(w·B/W) and (w·B) mod W in decimal — exact, no overflow
      .withColumn("__base",
        when(col("__W") > 0, expr("CAST((CAST(weight AS DECIMAL(38,0))"
          + " * budget) div __W AS BIGINT)")).otherwise(lit(0L)))
      .withColumn("__rem",
        when(col("__W") > 0,
          (big(col("weight")) * big(col("budget"))) % big(col("__W")))
          .otherwise(lit(0)))
      .withColumn("__left",
        when(col("__W") > 0, col("budget") - sum("__base").over(wAll))
          .otherwise(lit(0L)))
      .withColumn("__rk", row_number().over(wRem))
      .withColumn("alloc_tokens",
        col("__base") + when(col("__rk") <= col("__left"), 1L)
          .otherwise(0L))
      .select("stratum", "n_tokens", "weight", "alloc_tokens", "budget")
  }

  private def allocate(df: DataFrame, stratumCol: String,
      tokenCol: String, budgetCol: Column, capNum: Long,
      capDen: Long): DataFrame = {
    require(capNum >= 0 && capDen > 0, s"capNum=$capNum capDen=$capDen")
    val totals = df
      .groupBy(coalesce(col(stratumCol).cast("string"), lit(""))
        .as("stratum"))
      .agg(sum(coalesce(col(tokenCol).cast("long"), lit(0L)))
        .as("n_tokens"))
    val w = Window.orderBy(col("cap_tokens").asc, col("stratum").asc)
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val big = (c: Column) => c.cast("decimal(38,0)")
    totals
      .withColumn("cap_tokens",
        mulDivFloor(col("n_tokens"), capNum, capDen))
      .withColumn("__pos", row_number().over(w))
      .withColumn("__cumcap", sum("cap_tokens").over(wCum))
      .withColumn("__R", count(lit(1)).over(wAll))
      .withColumn("__T", sum("n_tokens").over(wAll))
      .withColumn("budget", budgetCol)
      .withColumn("__fail",
        big(col("cap_tokens")) * big(col("__R") - col("__pos") + 1) >
          big(col("budget")) - big(col("__cumcap") - col("cap_tokens")))
      .withColumn("__pstar",
        min(when(col("__fail"), col("__pos"))).over(wAll))
      .withColumn("__sbefore", coalesce(
        sum(when(col("__pos") < col("__pstar"), col("cap_tokens")))
          .over(wAll), lit(0L)))
      .withColumn("__avail", col("budget") - col("__sbefore"))
      .withColumn("__nsh", col("__R") - col("__pstar") + 1)
      .withColumn("alloc_tokens",
        when(col("__pstar").isNull || col("__pos") < col("__pstar"),
          col("cap_tokens"))
        .otherwise(expr("__avail div __nsh") +
          when(col("__pos") - col("__pstar") < col("__avail") % col("__nsh"),
            lit(1L)).otherwise(lit(0L))))
      .withColumn("capped",
        col("__pstar").isNull || col("__pos") < col("__pstar"))
      .select("stratum", "n_tokens", "cap_tokens", "alloc_tokens",
        "capped", "budget")
  }
}
