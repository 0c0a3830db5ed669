package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CO2 profile / storage-flux analytics (reference:
  * code/profile_processing/profile_data_processor.py:64-317 and
  * Boyagin_data_prep.py:54-133) — the only truly 2-D data in the
  * reference: concentration x (time, height).
  *
  * Long format: one row per (DATETIME, height, value). All operators
  * partition windows by time or height, never collect.
  */
object ProfileOps {

  /** J8: broadcast a scalar series (pressure/temperature) across all
    * profile heights — cross join with the heights dimension. */
  def broadcastAcrossHeights(scalars: DataFrame, heights: Seq[Double],
      tsCol: String): DataFrame =
    scalars.withColumn("height",
      explode(array(heights.map(lit): _*)))

  /** A10: layer means — lowest layer takes the bottom intake value,
    * higher layers average adjacent heights (h_{i-1}, h_i). */
  def layerMeans(profile: DataFrame, tsCol: String, heightCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(tsCol)).orderBy(col(heightCol))
    profile
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .withColumn("layer_value",
        when(col("__prev").isNull, col(valueCol))
          .otherwise((col(valueCol) + col("__prev")) / 2.0))
      .withColumn("__prev_h", lag(col(heightCol), 1).over(w))
      .withColumn("layer_depth",
        when(col("__prev_h").isNull, col(heightCol))
          .otherwise(col(heightCol) - col("__prev_h")))
      .drop("__prev", "__prev_h")
  }

  /** W1: per-layer time derivative: (c_t - c_{t-1}) / dt_seconds,
    * scaled by layer depth — the storage term of one layer. */
  def layerStorage(layers: DataFrame, tsCol: String, heightCol: String,
      intervalSec: Long): DataFrame = {
    val w = Window.partitionBy(col(heightCol)).orderBy(col(tsCol))
    layers.withColumn("layer_storage",
      (col("layer_value") - lag(col("layer_value"), 1).over(w))
        / intervalSec.toDouble * col("layer_depth"))
  }

  /** A11: storage flux = per-timestamp sum over layers with
    * skipna=False — any missing layer nulls the total (strict sum). */
  def storageFlux(storage: DataFrame, tsCol: String): DataFrame =
    storage.groupBy(col(tsCol)).agg(
      when(count(lit(1)) === count(col("layer_storage")),
        sum(col("layer_storage"))).as("storage_flux"),
      count(lit(1)).as("n_layers"))
}
