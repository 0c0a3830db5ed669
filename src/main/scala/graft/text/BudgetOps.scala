package graft.text

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Token-budget corpus selection: the "fill the training budget"
  * step every large-scale pipeline runs last — rank the scored pool
  * by priority and admit documents greedily until a token budget is
  * reached (e.g. "take the best 1.4T tokens from the scored crawl").
  *
  * Semantics: documents are laid out in the total order
  * (priority DESC, id ASC) — ties are broken by id, so the layout is
  * deterministic on any partitioning and re-derivable by an auditor —
  * and a document is selected iff the budget was not already
  * exhausted when the stream reaches it (its EXCLUSIVE cumulative
  * token offset is < budget). The selection therefore yields at
  * least `budget` tokens whenever the corpus holds them; the one
  * straddling document may overflow the budget, the convention that
  * keeps the rule one-pass and cut-point-exact (dropping the
  * straddler instead would under-fill; callers wanting that apply
  * `cum_tokens <= budget` to the returned frame).
  *
  * The hard part at scale is the same GLOBAL prefix sum as
  * [[PackOps]]: every document needs its absolute token offset in
  * priority order, and a `Window.orderBy` over the corpus is a
  * single-partition stage. This uses the identical two-pass
  * distributed scan — range-shuffle on the order key (persisted so
  * both passes read the SAME sampled range bounds), per-partition
  * totals whose driver collect is bounded by the shuffle-partition
  * count, then a second pass adding each partition's exclusive
  * prefix — so the only corpus-wide movement is the one range
  * exchange any global ordering costs.
  *
  * Contract: the result is eagerly materialized (serialized
  * localCheckpoint) and the shuffle substrate released before
  * returning — the [[PackOps.packedBlocks]] retention contract, so a
  * long-lived session retains nothing. Lineage truncation means the
  * result is not recomputable on executor loss; re-run the selection
  * in that case (it is deterministic, so the re-run is identical).
  *
  * Reference scope: the reference pipeline has no budget operator
  * (it is a flux-tower ETL); this extends the engine for the
  * large-scale training-data use cases in the build brief.
  */
object BudgetOps {

  /** Select documents in (priority DESC, `idCol` ASC) order until
    * `budget` tokens are admitted. Returns every input row plus
    * `cum_tokens` (INCLUSIVE running token total in selection order),
    * `selected` (= exclusive offset < budget), and `budget` (the
    * resolved budget — telemetry for the fraction variant). Null
    * tokens count 0; priorities must be non-null (cast to double for
    * ordering). budget <= 0 selects nothing; >= total selects all.
    * The token and priority columns are evaluated ONCE, during the
    * range-shuffle materialization — pass expensive scoring
    * expressions directly rather than pre-materializing them.
    * `cum_tokens`/`selected`/`budget` are reserved output names —
    * input columns with those names are overwritten. */
  def budgetSelect(df: DataFrame, idCol: String, tokenCol: String,
      priorityCol: String, budget: Long): DataFrame =
    run(df, idCol, tokenCol, priorityCol, _ => budget)

  /** [[budgetSelect]] with budget = floor(total·num/den) — "take
    * half the corpus's tokens" without the caller paying a separate
    * corpus-wide agg action for the total: pass 1 of the prefix-sum
    * scan already sums every partition's tokens, so the fraction is
    * derived from the SAME materialization the selection reads (the
    * caller's scoring projection is evaluated exactly once). Exact
    * integer arithmetic (BigInt intermediate, no double rounding). */
  def budgetSelectFraction(df: DataFrame, idCol: String,
      tokenCol: String, priorityCol: String, num: Long, den: Long)
      : DataFrame = {
    require(den > 0 && num >= 0, s"num=$num den=$den")
    run(df, idCol, tokenCol, priorityCol,
      total => (BigInt(total) * num / den).toLong)
  }

  /** Per-stratum budget fill — token-proportioned data MIXING (the
    * FineWeb/Dolma "mix sources to a token recipe" step): within
    * EACH stratum (source, language, domain tier), admit documents
    * in (priority DESC, id ASC) order until that stratum's token
    * budget is reached. `budgets` maps stratum (as string) to its
    * budget; absent strata get `defaultBudget` (0 = excluded).
    *
    * Same two-pass distributed scan, range-partitioned on
    * (stratum, priority DESC, id): rows of a stratum are contiguous
    * across the partition sequence, so pass 1's driver collect is
    * one row per (partition, stratum-run) — bounded by the partition
    * count plus the stratum cardinality, which is parameter-sized by
    * assumption (sources/languages — the same contract as
    * [[SampleOps.stratifiedSample]]'s broadcast rate table). A NULL
    * stratum folds to the empty string.
    *
    * Output adds `cum_tokens` (within-stratum inclusive running
    * total), `budget` (the stratum's resolved budget), `selected`. */
  def budgetSelectPerStratum(df: DataFrame, idCol: String,
      tokenCol: String, priorityCol: String, stratumCol: String,
      budgets: Map[String, Long], defaultBudget: Long = 0L)
      : DataFrame =
    runPerStratum(df, idCol, tokenCol, priorityCol, stratumCol,
      totals => totals.map { case (s, _) =>
        s -> budgets.getOrElse(s, defaultBudget) })

  /** [[budgetSelectPerStratum]] with every stratum's budget derived
    * as floor(stratumTotal·num/den) from pass-1 totals — "half of
    * every source" costs no extra pass (the [[budgetSelectFraction]]
    * contract, per stratum). */
  def budgetSelectPerStratumFraction(df: DataFrame, idCol: String,
      tokenCol: String, priorityCol: String, stratumCol: String,
      num: Long, den: Long): DataFrame = {
    require(den > 0 && num >= 0, s"num=$num den=$den")
    runPerStratum(df, idCol, tokenCol, priorityCol, stratumCol,
      totals => totals.map { case (s, t) =>
        s -> (BigInt(t) * num / den).toLong })
  }

  /** Per-stratum fill with budgets DERIVED by UniMax water-filling
    * ([[MixOps.unimaxAllocate]]): total budget `totalBudget`, no
    * stratum over capNum/capDen epochs. The allocation is computed
    * from the SAME pass-1 stratum totals the fill already collects,
    * so deriving the recipe costs no extra corpus action — the
    * [[budgetSelectPerStratumFraction]] contract with the UniMax
    * closed form as the budget rule. */
  def budgetSelectUnimax(df: DataFrame, idCol: String,
      tokenCol: String, priorityCol: String, stratumCol: String,
      totalBudget: Long, capNum: Long, capDen: Long): DataFrame =
    runPerStratum(df, idCol, tokenCol, priorityCol, stratumCol,
      totals => MixOps.unimaxAllocate(totals, totalBudget,
        capNum, capDen))

  /** [[budgetSelectUnimax]] with totalBudget =
    * floor(corpusTokens·num/den), both derived from pass-1 totals. */
  def budgetSelectUnimaxFraction(df: DataFrame, idCol: String,
      tokenCol: String, priorityCol: String, stratumCol: String,
      num: Long, den: Long, capNum: Long, capDen: Long): DataFrame = {
    require(den > 0 && num >= 0, s"num=$num den=$den")
    runPerStratum(df, idCol, tokenCol, priorityCol, stratumCol,
      totals => {
        val total = totals.valuesIterator.map(BigInt(_)).sum
        MixOps.unimaxAllocate(totals, (total * num / den).toLong,
          capNum, capDen)
      })
  }

  /** Per-stratum fill with budgets DERIVED by √-temperature
    * apportionment ([[MixOps.temperatureSqrtAllocate]] — the
    * mBERT/XLM-R α=0.5 recipe): total budget `totalBudget` split
    * ∝ √stratumTokens, computed from the SAME pass-1 totals the fill
    * already collects (the [[budgetSelectUnimax]] contract with the
    * sqrt closed form as the budget rule). */
  def budgetSelectTemperatureSqrt(df: DataFrame, idCol: String,
      tokenCol: String, priorityCol: String, stratumCol: String,
      totalBudget: Long): DataFrame =
    runPerStratum(df, idCol, tokenCol, priorityCol, stratumCol,
      totals => MixOps.temperatureSqrtAllocate(totals, totalBudget))

  /** [[budgetSelectTemperatureSqrt]] with totalBudget =
    * floor(corpusTokens·num/den), both derived from pass-1 totals. */
  def budgetSelectTemperatureSqrtFraction(df: DataFrame, idCol: String,
      tokenCol: String, priorityCol: String, stratumCol: String,
      num: Long, den: Long): DataFrame = {
    require(den > 0 && num >= 0, s"num=$num den=$den")
    runPerStratum(df, idCol, tokenCol, priorityCol, stratumCol,
      totals => {
        val total = totals.valuesIterator.map(BigInt(_)).sum
        MixOps.temperatureSqrtAllocate(totals,
          (total * num / den).toLong)
      })
  }

  /** Internal working-column name that cannot collide with any input
    * column: `base`, or `base` + the first integer suffix free in
    * `cols`. Keeps the only reserved OUTPUT names the documented
    * three (cum_tokens/selected/budget). */
  private def freshName(base: String, cols: Seq[String]): String = {
    var n = base
    var i = 0
    while (cols.contains(n)) { i += 1; n = base + i }
    n
  }

  private def runPerStratum(df0: DataFrame, idCol: String,
      tokenCol: String, priorityCol: String, stratumCol: String,
      budgetsOf: Map[String, Long] => Map[String, Long]): DataFrame = {
    // reserved-name contract, as in run()
    val df = df0.drop("cum_tokens", "selected", "budget")
    val spark = df.sparkSession
    val n = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val tokC = freshName("__tok", df.columns)
    val priC = freshName("__pri", df.columns)
    val stratC = freshName("__strat", df.columns)

    val ranged = df
      .withColumn(tokC, coalesce(col(tokenCol).cast("long"), lit(0L)))
      .withColumn(priC, col(priorityCol).cast("double"))
      .withColumn(stratC,
        coalesce(col(stratumCol).cast("string"), lit("")))
      .repartitionByRange(n, col(stratC), col(priC).desc,
        col(idCol))
      .sortWithinPartitions(col(stratC), col(priC).desc,
        col(idCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val tokIdx = ranged.schema.fieldIndex(tokC)
      val stratIdx = ranged.schema.fieldIndex(stratC)

      // Pass 1: per-(partition, stratum) totals. Strata are contiguous
      // across the partition sequence, so this collect is bounded by
      // partitions + strata, never by data size.
      val totalsRows = ranged.select(col(stratC), col(tokC))
        .queryExecution.toRdd.mapPartitions { it =>
          val pid = TaskContext.getPartitionId()
          val acc = scala.collection.mutable.LinkedHashMap
            .empty[String, Long]
          while (it.hasNext) {
            val r = it.next()
            val s = r.getUTF8String(0).toString
            acc(s) = acc.getOrElse(s, 0L) + r.getLong(1)
          }
          acc.iterator.map { case (s, t) => (pid, s, t) }
        }.collect()
      val stratTotals = totalsRows.groupBy(_._2)
        .map { case (s, rs) => s -> rs.map(_._3).sum }
      val budgets = budgetsOf(stratTotals)
      val prefix: Map[(Int, String), Long] =
        totalsRows.groupBy(_._2).flatMap { case (s, rs) =>
          var acc = 0L
          rs.sortBy(_._1).map { case (pid, _, t) =>
            val entry = ((pid, s), acc); acc += t; entry
          }
        }

      // Pass 2: per-stratum running sums within the SAME partitions.
      val outSchema = ranged.schema
        .add("cum_tokens", LongType, nullable = false)
        .add("budget", LongType, nullable = false)
      ranged.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val run = scala.collection.mutable.HashMap.empty[String, Long]
        it.map { r =>
          val s = r.getString(stratIdx)
          val cur = run.getOrElse(s, prefix.getOrElse((pid, s), 0L)) +
            r.getLong(tokIdx)
          run(s) = cur
          Row.fromSeq(r.toSeq :+ cur :+ budgets.getOrElse(s, 0L))
        }
      }(Encoders.row(outSchema))
        .withColumn("selected",
          col("cum_tokens") - col(tokC) < col("budget"))
        .drop(tokC, priC, stratC)
        .localCheckpoint(eager = true, StorageLevel.MEMORY_AND_DISK_SER)
    } finally ranged.unpersist(blocking = false)
  }

  private def run(df0: DataFrame, idCol: String, tokenCol: String,
      priorityCol: String, budgetOf: Long => Long): DataFrame = {
    // honor the reserved-name contract: pre-existing output-named
    // columns are replaced, not duplicated (schema.add would emit an
    // ambiguous twin)
    val df = df0.drop("cum_tokens", "selected", "budget")
    val spark = df.sparkSession
    val n = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val tokC = freshName("__tok", df.columns)
    val priC = freshName("__pri", df.columns)

    val ranged = df
      .withColumn(tokC, coalesce(col(tokenCol).cast("long"), lit(0L)))
      .withColumn(priC, col(priorityCol).cast("double"))
      .repartitionByRange(n, col(priC).desc, col(idCol))
      .sortWithinPartitions(col(priC).desc, col(idCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val tokIdx = ranged.schema.fieldIndex(tokC)

      // Pass 1: per-partition totals (materializes the persist; one
      // row per partition, so the collect is partition-count-bounded).
      val totals = ranged.select(col(tokC))
        .queryExecution.toRdd.mapPartitions { it =>
          val pid = TaskContext.getPartitionId()
          var s = 0L
          while (it.hasNext) s += it.next().getLong(0)
          Iterator((pid, s))
        }.collect().toMap
      val prefix = new Array[Long](n)
      var acc = 0L
      (0 until n).foreach { p =>
        prefix(p) = acc
        acc += totals.getOrElse(p, 0L)
      }
      val budget = budgetOf(acc)

      // Pass 2: running sum within the SAME persisted partitions.
      val outSchema = ranged.schema
        .add("cum_tokens", LongType, nullable = false)
      ranged.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var run = prefix(pid)
        it.map { r =>
          run += r.getLong(tokIdx)
          Row.fromSeq(r.toSeq :+ run)
        }
      }(Encoders.row(outSchema))
        .withColumn("selected",
          col("cum_tokens") - col(tokC) < lit(budget))
        .withColumn("budget", lit(budget))
        .drop(tokC, priC)
        .localCheckpoint(eager = true, StorageLevel.MEMORY_AND_DISK_SER)
    } finally ranged.unpersist(blocking = false)
  }
}
