package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bounded top-k as an AGGREGATE, not a window.
  *
  * The retrieval family's original shape — `row_number() OVER
  * (PARTITION BY q_id ORDER BY score)` then `rank <= k` — is exact
  * but shuffles EVERY (query, candidate) row into the window
  * exchange: at |Q| queries over an N-row corpus that is |Q|·N
  * shuffled rows to keep |Q|·k (the r15 VERDICT's one remaining plan
  * improvement). A bounded-heap aggregate gets the same exact answer
  * with partial aggregation: each map task keeps at most k rows per
  * query in a size-k priority queue, so the exchange moves at most
  * |Q|·k·partitions rows — independent of N — and the final merge is
  * a k-way heap union. Spark ships the aggregate (`CollectTopK`, the
  * engine behind ml's prediction top-k); this wrapper only binds the
  * ordering convention the retrieval operators share.
  *
  * Convention: `key` is a STRUCT whose fields compare
  * lexicographically ASCENDING (the InterpretedOrdering struct
  * order), nulls first per field; the caller encodes direction into
  * the fields (e.g. descending cosine with nulls last =
  * `coalesce(-cos, +Inf)` ascending) and MUST include a unique
  * tiebreak field (e.g. the neighbor id) so the kept set — and with
  * it the result hash — is a total order, not a heap accident.
  * Payload fields ride behind the tiebreak (never consulted by the
  * comparator). The result array is sorted ascending, best first, so
  * `posexplode` yields `rank = pos + 1` directly.
  */
object TopK {

  /** The k smallest `key` structs of the group, sorted ascending
    * (best first). Exact — see the ordering convention above. */
  def smallestK(key: Column, k: Int): Column = {
    require(k >= 1, s"k=$k")
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.aggregate
        .GraftTopKBridge.collectTopK(
          ColumnBridge.expression(key), k, reverse = true))
  }

  /** The retrieval family's shared cut: group `scored` by `q_id`,
    * keep the k best rows per query under (`sortKey` ASC, `n_id`
    * ASC), explode back to (q_id, rank, n_id, `valCol`) with the int
    * `rank` the row_number window form produced. `sortKey` encodes
    * the caller's direction and null placement (e.g. cosine DESC
    * nulls last = `coalesce(-cos, +Inf)`; a plain ascending distance
    * passes through, inheriting nulls-first — the `.asc` window
    * default); `n_id` must be unique per query so the kept set is a
    * total order. */
  def perQueryCut(scored: org.apache.spark.sql.DataFrame, k: Int,
      sortKey: Column, valCol: String): org.apache.spark.sql.DataFrame =
    scored.groupBy("q_id")
      .agg(smallestK(struct(sortKey.as("s"), col("n_id"),
        col(valCol).as("v")), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + lit(1)).cast("int").as("rank"),
        col("t.n_id").as("n_id"), col("t.v").as(valCol))
}
