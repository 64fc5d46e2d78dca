package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Corpus profiling: the per-column data-quality summary every curation
  * pipeline runs before and after a transform (null rates, cardinality,
  * value ranges) - one pass, one shuffle, any column count.
  */
object ProfileOps {

  /** Profile `cols` of `df`: one output row per column with row/null/
    * distinct counts and lexicographic min/max of the stringified
    * values (stringifying unifies the output schema; numeric columns
    * wanting numeric ranges profile fine through their own dtype
    * queries - this is the uniform overview).
    *
    * Scale shape: a single melt (explode of a k-wide struct array -
    * rows x k, columnar scan stays pruned to `cols`) feeding one
    * groupBy("col") aggregation. Exact distinct counts shuffle the
    * (col, value) pairs once; swap `countDistinct` for
    * `approx_count_distinct` when profiling at the full 100-TB corpus
    * and cardinality error is acceptable.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val melted = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("col"), F.col(c).cast(StringType).as("v"))): _*)).as("kv"))
      .select(F.col("kv.col").as("col"), F.col("kv.v").as("v"))
    melted.groupBy("col").agg(
      count(lit(1)).as("n_rows"),
      sum(when(F.col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
      countDistinct(F.col("v")).as("n_distinct"),
      min(F.col("v")).as("min_v"),
      max(F.col("v")).as("max_v"))
  }

  /** Tukey-fence outlier flagging: within each group, a row is an
    * outlier iff its value falls outside [q1 - k*iqr, q3 + k*iqr]
    * (exact interpolated quartiles) - the standard data-cleaning pass
    * that drops sensor glitches / pathological documents before
    * training statistics are computed. Returns the input rows with
    * appended `fence_lo` / `fence_hi` / `is_outlier`.
    *
    * Scale shape: one group-sized quartile aggregate broadcast back
    * onto a scan-speed comparison - the corpus itself never shuffles.
    * (Exact percentiles hold the full value multiset per group during
    * the aggregate; at extreme group sizes swap in approx_percentile -
    * the fence logic is unchanged.)
    */
  def iqrOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Double = 1.5
  ): DataFrame = {
    require(k >= 0.0, s"fence multiplier must be non-negative, got $k")
    require(!df.columns.contains("gr_group"),
      "input already has a gr_group column; rename it before profiling")
    val fences = df.groupBy(F.col(groupCol).as("gr_group"))
      .agg(
        expr(s"percentile($valueCol, 0.25)").as("q1"),
        expr(s"percentile($valueCol, 0.75)").as("q3"))
      .select(F.col("gr_group"),
        (F.col("q1") - (F.col("q3") - F.col("q1")) * k).as("fence_lo"),
        (F.col("q3") + (F.col("q3") - F.col("q1")) * k).as("fence_hi"))
    df.join(broadcast(fences), F.col(groupCol) <=> F.col("gr_group"))
      .withColumn("is_outlier",
        F.col(valueCol) < F.col("fence_lo") || F.col(valueCol) > F.col("fence_hi"))
      .drop("gr_group")
  }

  /** Per-group equi-width histogram: `bins` equal-width buckets spanning
    * the group's own [min, max]; the max lands in the last bucket
    * (half-open bins, closed at the top). Output: (group, bin, n) -
    * empty bins are absent (join a spine if you need them as zeros;
    * [[graft.ops.TimeOps.resampleGapFill]] shows the pattern).
    *
    * Same broadcast-aggregate shape as [[iqrOutliers]]: one group-sized
    * min/max aggregate back onto the scan, then ONE shuffle on
    * (group, bin) for the counts. The bin arithmetic is plain
    * floor/divide so any engine reproduces the same buckets bit-for-bit
    * (width_bucket's edge conventions differ across engines).
    */
  def equiWidthHistogram(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      bins: Int
  ): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(!df.columns.contains("gr_group"),
      "input already has a gr_group column; rename it before profiling")
    val ranges = df.filter(F.col(valueCol).isNotNull)
      .groupBy(F.col(groupCol).as("gr_group"))
      .agg(min(F.col(valueCol)).cast(DoubleType).as("v_min"),
        max(F.col(valueCol)).cast(DoubleType).as("v_max"))
    df.filter(F.col(valueCol).isNotNull)
      .join(broadcast(ranges), F.col(groupCol) <=> F.col("gr_group"))
      .withColumn("bin",
        // degenerate single-point group: everything in bin 0
        when(F.col("v_max") === F.col("v_min"), lit(0))
          .otherwise(least(
            floor((F.col(valueCol).cast(DoubleType) - F.col("v_min")) /
              ((F.col("v_max") - F.col("v_min")) / bins)),
            lit(bins - 1).cast(LongType)))
          .cast(IntegerType))
      .groupBy(F.col(groupCol), F.col("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** Key-skew profile: the pre-shuffle diagnosis report for a join/agg
    * key - per key value, its row count, frequency rank, corpus share,
    * cumulative share down the rank order, and skew factor (count over
    * the mean count). This is how a 100-TB job decides between a plain
    * shuffle, a broadcast, salting, or AQE skew handling BEFORE paying
    * for the wrong plan: a top key with share 0.3 and skew 40x says
    * "salt or isolate this key", a flat profile says "plain shuffle is
    * fine".
    *
    * Scale shape: ONE key-aggregate shuffle folds the corpus to a
    * key-cardinality frame; the rank/cumulative windows then run over
    * that group-sized frame (the one place a single-partition window is
    * correct - same discipline as StatOps' grand-total frames). High-
    * cardinality keys: cap the profile with a downstream limit on rank;
    * the aggregate itself is the full histogram either way.
    *
    * Output: one row per distinct key (nulls profiled as a key):
    * (keyCol, n, rank, share, cum_share, skew), divisions rounded 6dp.
    */
  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(F.col(keyCol)).agg(count(lit(1)).as("n"))
    val byFreq = Window.orderBy(F.col("n").desc, F.col(keyCol).asc_nulls_last)
    counts
      .withColumn("rank", row_number().over(byFreq).cast(IntegerType))
      .withColumn("gr_tot", sum(F.col("n")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("gr_keys", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("gr_cum", sum(F.col("n")).over(
        byFreq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(
        F.col(keyCol), F.col("n"), F.col("rank"),
        round(F.col("n").cast(DoubleType) / F.col("gr_tot").cast(DoubleType), 6).as("share"),
        round(F.col("gr_cum").cast(DoubleType) / F.col("gr_tot").cast(DoubleType), 6).as("cum_share"),
        round(F.col("n").cast(DoubleType) * F.col("gr_keys").cast(DoubleType) /
          F.col("gr_tot").cast(DoubleType), 6).as("skew"))
  }
}
