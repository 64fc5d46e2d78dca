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
    * key-cardinality frame, then ONE range shuffle realizes the
    * frequency order data-parallel. Rank and cumulative share are NOT
    * computed with an unpartitioned window (key cardinality is
    * unbounded - profiling `user_id` on a 100-TB corpus would funnel
    * ~1e9 rows through one task): like [[ShardOps.globalOrderIndex]],
    * a per-partition scan emits local (rank, cum-n) and a
    * partition-count-sized driver array of offsets lifts them to
    * global - the same count-job-plus-map-job shape as
    * `RDD.zipWithIndex`, with the grand totals falling out of the same
    * offsets array for free. Every stage is data-parallel.
    *
    * Output: one row per distinct key (nulls profiled as a key):
    * (keyCol, n, rank, share, cum_share, skew), divisions rounded 6dp.
    */
  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    val spark = df.sparkSession
    val counts = df.groupBy(F.col(keyCol)).agg(count(lit(1)).as("n"))
    // frequency order, realized by range partitioning (balanced via
    // quantile sampling), never by a single-partition sort
    val sorted = counts
      .repartitionByRange(F.col("n").desc, F.col(keyCol).asc_nulls_last)
      .sortWithinPartitions(F.col("n").desc, F.col(keyCol).asc_nulls_last)
    val nIdx = sorted.schema.fieldIndex("n")
    // capture ONE RDD so both jobs (offset count + indexed map) see the
    // same sampled range boundaries - the zipWithIndex discipline
    val rdd = sorted.rdd
    // per-partition (rows, sum n): a #partitions-sized driver array
    val partStats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var rows = 0L; var s = 0L
      it.foreach { r => rows += 1L; s += r.getLong(nIdx) }
      Iterator((pid, rows, s))
    }.collect().sortBy(_._1)
    val nParts = partStats.length
    val rankOff = new Array[Long](nParts)
    val cumOff = new Array[Long](nParts)
    locally {
      var r = 0L; var c = 0L; var i = 0
      while (i < nParts) {
        rankOff(i) = r; cumOff(i) = c
        r += partStats(i)._2; c += partStats(i)._3
        i += 1
      }
    }
    val grTot = partStats.map(_._3).sum
    val grKeys = partStats.map(_._2).sum
    val outSchema = StructType(sorted.schema.fields ++ Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("gr_cum", LongType, nullable = false)))
    val indexed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var rank = if (pid < nParts) rankOff(pid) else 0L
      var cum = if (pid < nParts) cumOff(pid) else 0L
      it.map { r =>
        rank += 1L; cum += r.getLong(nIdx)
        // NB: :+ appends (not ++ Seq(a, b)) - Seq(int, long) would
        // numerically WIDEN the rank to Long and break the row encoder
        Row.fromSeq(r.toSeq :+ rank.toInt :+ cum)
      }
    }
    spark.createDataFrame(indexed, outSchema)
      .select(
        F.col(keyCol), F.col("n"), F.col("rank"),
        round(F.col("n").cast(DoubleType) / lit(grTot).cast(DoubleType), 6).as("share"),
        round(F.col("gr_cum").cast(DoubleType) / lit(grTot).cast(DoubleType), 6).as("cum_share"),
        round(F.col("n").cast(DoubleType) * lit(grKeys).cast(DoubleType) /
          lit(grTot).cast(DoubleType), 6).as("skew"))
  }
}
