package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed lake tables for co-located joins.
  *
  * The L1 lake is re-joined on the same keys constantly (site/time
  * merges J3/J4, status joins, variable-map joins). Writing both sides
  * bucketed by the join key with the same bucket count makes every
  * such join shuffle-free: partitioning is baked into the table
  * layout, so Spark schedules bucket-to-bucket joins with no Exchange
  * — at 100 TB that removes the dominant cost of the repeated merge
  * (a full-network shuffle per run) in exchange for one-time bucketed
  * writes. `sortBy` on the same key also lets sort-merge join skip
  * its per-task sort when buckets are single-file.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table in the session
    * catalog. Bucket count is a layout contract: both sides of a
    * co-located join must use the same `numBuckets`. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketing tables on the bucket key — plans with no
    * Exchange on either side. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, on: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on)
}
