package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at cluster scale.
  *
  * AQE's skew-join splitting covers sort-merge joins; these helpers
  * cover the two cases it doesn't: aggregations whose hot key
  * overwhelms one reducer, and broadcast-infeasible joins against a
  * frame with a few pathological keys.
  *
  * Salting is deterministic (hash of stable columns, not rand()), so
  * results are reproducible and retries/speculative tasks agree.
  */
object SkewOps {

  /** Two-stage salted aggregation for algebraic aggregates: stage 1
    * aggregates on (keys, salt) — splitting a hot key across `salts`
    * reducers — stage 2 merges the partials. Supported merges: sum,
    * count (merged as sum), min, max.
    *
    * `saltCols` should be high-cardinality stable columns (an id); the
    * salt is `pmod(hash(saltCols), salts)`.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
      aggs: Seq[(String, String)], saltCols: Seq[String],
      salts: Int = 16): DataFrame = {
    require(aggs.nonEmpty && salts > 0)
    val salted = df.withColumn("__salt",
      pmod(hash(saltCols.map(col): _*), lit(salts)))
    val stage1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial(aggs.head), aggs.tail.map(partial): _*)
    stage1.groupBy(keys.map(col): _*)
      .agg(merge(aggs.head), aggs.tail.map(merge): _*)
  }

  private def partial(a: (String, String)): Column = a match {
    case (c, "sum") => sum(col(c)).as(s"__p_${c}_sum")
    case (c, "count") => count(col(c)).as(s"__p_${c}_count")
    case (c, "min") => min(col(c)).as(s"__p_${c}_min")
    case (c, "max") => max(col(c)).as(s"__p_${c}_max")
    case (c, f) => throw new IllegalArgumentException(
      s"unsupported salted aggregate $f($c) — not algebraic")
  }

  private def merge(a: (String, String)): Column = a match {
    case (c, "sum") => sum(col(s"__p_${c}_sum")).as(s"${c}_sum")
    case (c, "count") => sum(col(s"__p_${c}_count")).as(s"${c}_count")
    case (c, "min") => min(col(s"__p_${c}_min")).as(s"${c}_min")
    case (c, "max") => max(col(s"__p_${c}_max")).as(s"${c}_max")
    case _ => throw new IllegalStateException
  }

  /** Salted equi-join: replicate each right-side row `salts` times
    * (one per salt value) and salt the left side deterministically, so
    * a hot join key spreads over `salts` tasks. Right side grows by
    * the salt factor — use when right is small-ish but above the
    * broadcast threshold, or when a handful of left keys dominate.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftSaltCols: Seq[String], salts: Int = 16): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(hash(leftSaltCols.map(col): _*), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, on :+ "__salt").drop("__salt")
  }
}
