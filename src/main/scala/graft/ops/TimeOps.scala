package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Time-series resampling over event streams: fixed-width bins per key,
  * including EMPTY bins (gap fill) - the downsampling shape monitoring
  * and feature pipelines need, where "no events this interval" is a
  * data point, not a missing row.
  */
object TimeOps {

  /** Aggregate `valueCol` into `binSeconds`-wide bins per key, emitting
    * every bin between each key's first and last event (gaps included,
    * with n_events = 0 and sum_value = 0.0).
    *
    * Scale shape: binned aggregation is one shuffle on (key, bin); the
    * bin spine is generated from the per-key [min, max] span - a
    * key-count-sized frame, built by sequence + explode, never a
    * driver-side loop - and the spine-to-aggregate join is an equi-join
    * on the same (key, bin) key it was just shuffled on. Span per key is
    * bounded by the data's own time range; a key with a pathological
    * multi-year span at 1-second bins would fan out accordingly - size
    * `binSeconds` to the retention window, as any production
    * downsampler does.
    *
    * Output: (keyCol, bin_start timestamp, n_events, sum_value,
    * is_gap) ordered semantics-free (driver compare sorts).
    */
  def resampleGapFill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      binSeconds: Long
  ): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    // epoch-second bin id: integer floor division keeps whole-bin
    // alignment identical across engines (timestamps enter as exact
    // micros; unix_timestamp truncates toward zero = floor for any
    // post-1970 stream)
    val binId = (unix_timestamp(F.col(tsCol)) / binSeconds).cast(LongType)
    val binned = df
      .select(F.col(keyCol).as("key"), binId.as("bin"), F.col(valueCol).as("v"))
      .groupBy("key", "bin")
      // decimal accumulation: the sum is exact, so it is independent of
      // partitioning/merge order (a double sum is not)
      .agg(count(lit(1)).as("n_events"),
        sum(F.col("v").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
    val spine = binned
      .groupBy("key")
      .agg(min(F.col("bin")).as("lo"), max(F.col("bin")).as("hi"))
      .select(F.col("key"), explode(sequence(F.col("lo"), F.col("hi"))).as("bin"))
    spine
      .join(binned, Seq("key", "bin"), "left")
      .select(
        F.col("key").as(keyCol),
        timestamp_seconds(F.col("bin") * binSeconds).as("bin_start"),
        coalesce(F.col("n_events"), lit(0L)).as("n_events"),
        coalesce(F.col("sum_value"), lit(0.0)).as("sum_value"),
        F.col("n_events").isNull.as("is_gap"))
  }
}
