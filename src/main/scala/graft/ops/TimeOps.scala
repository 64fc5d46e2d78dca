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

  /** Ordered conversion funnel: for every entity that performed
    * `stages(0)`, the earliest strictly-increasing chain of stage
    * timestamps - t(i+1) is the first `stages(i+1)` event AFTER t(i),
    * so an out-of-order occurrence (a click before the first view)
    * never converts. Output: (entity, t_<stage0>, t_<stage1>, ...),
    * later stages NULL where the chain stops. The product-analytics
    * primitive behind every "view -> cart -> purchase" report.
    *
    * Scale shape: one filtered min-aggregate per stage, each an
    * equi-shuffle on the entity key; the stage frames are entity-sized
    * (<= one row per entity), so every join after the first is between
    * already-reduced frames on the SAME key - Catalyst reuses the
    * partitioning, and the raw corpus is scanned once per stage with
    * the stage filter pushed to the scan. No windows over the full
    * event stream, no per-entity event lists in memory.
    */
  def funnel(
      df: DataFrame,
      entityCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]
  ): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"stages must be distinct, got $stages")
    val first = df.filter(F.col(typeCol) === stages.head)
      .groupBy(F.col(entityCol))
      .agg(min(F.col(tsCol)).as(s"t_${stages.head}"))
    stages.tail
      .foldLeft((first, s"t_${stages.head}")) { case ((acc, prevT), stage) =>
        val tCol = s"t_$stage"
        val next = df.filter(F.col(typeCol) === stage)
          .join(acc.select(F.col(entityCol), F.col(prevT)), Seq(entityCol))
          .filter(F.col(tsCol) > F.col(prevT))
          .groupBy(F.col(entityCol))
          .agg(min(F.col(tsCol)).as(tCol))
        (acc.join(next, Seq(entityCol), "left"), tCol)
      }
      ._1
  }

  /** Retention cohorts: entities grouped by first-seen day, with the
    * count of distinct entities active at each day offset from their
    * cohort day (offset 0 = the cohort day itself; every cohort has it).
    *
    * Scale shape: the first-seen frame is ONE aggregate on the entity
    * key, and the enrichment join hits the event stream on that same
    * key; the final (cohort_day, offset) aggregate is days x offsets -
    * tiny at any corpus size. countDistinct shuffles (entity, day)
    * pairs, already deduplicated map-side by the partial aggregate.
    */
  def cohortRetention(df: DataFrame, entityCol: String, tsCol: String): DataFrame = {
    val firstSeen = df.groupBy(F.col(entityCol))
      .agg(to_date(min(F.col(tsCol))).as("cohort_day"))
    df.select(F.col(entityCol), to_date(F.col(tsCol)).as("active_day"))
      .join(firstSeen, Seq(entityCol))
      .groupBy(
        F.col("cohort_day"),
        datediff(F.col("active_day"), F.col("cohort_day")).as("day_offset"))
      .agg(countDistinct(F.col(entityCol)).as("n_users"))
  }

  /** The decay weights [[ewmaScore]] applies at recency offset j
    * (0 = most recent): `a * (1-a)^j` for interior terms, `(1-a)^j` for
    * the oldest included term (the init value's full tail mass). Powers
    * built by iterated multiplication so a replaying engine interpolates
    * the EXACT same doubles (Double.toString round-trips).
    */
  private[graft] def ewmaWeights(alpha: Double, maxHistory: Int): (Array[Double], Array[Double]) = {
    val pow = Array.iterate(1.0, maxHistory)(_ * (1.0 - alpha))
    (pow.map(alpha * _), pow)
  }

  /** Time-decayed activity score per key: the exponentially weighted
    * moving average of `valueCol` over the key's `maxHistory` most
    * recent events - ewma = v_old for the oldest included event, then
    * ewma = a*v + (1-a)*ewma walking toward the most recent. The
    * standard recency-weighted engagement / freshness feature.
    *
    * The recurrence is unrolled into closed-form per-term weights
    * ([[ewmaWeights]]), so the whole computation is: one per-key window
    * rank (bounded to `maxHistory` rows per key), a weight lookup by
    * offset, and ONE order-independent aggregation - each term's
    * double product is computed identically everywhere, then summed
    * through DECIMAL(38,18), so the result is exact under any
    * aggregation order and replayable by any engine. No sequential
    * per-key fold, no collect.
    *
    * Output: (keyCol, n_used, ewma rounded to 6dp). Null values are
    * excluded before ranking.
    */
  def ewmaScore(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      alpha: Double = 0.3,
      maxHistory: Int = 30
  ): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(maxHistory >= 1, s"maxHistory must be positive, got $maxHistory")
    import org.apache.spark.sql.expressions.Window
    val recency = Window.partitionBy(F.col(keyCol))
      .orderBy(F.col(tsCol).desc, F.col(tieCol).desc)
    val ranked = df.filter(F.col(valueCol).isNotNull)
      .withColumn("_rn", row_number().over(recency))
      .filter(F.col("_rn") <= maxHistory)
    ewmaAggregate(ranked, keyCol, valueCol, alpha, maxHistory)
  }

  /** The aggregation tail of [[ewmaScore]], shared with the streaming
    * buffer variant (graft.streaming.StreamOps.ewmaBufferStream): input
    * is the already-ranked recent history - (keyCol, valueCol, `_rn`
    * 1 = most recent, <= maxHistory rows per key) - so batch and
    * streaming paths run the IDENTICAL weight lookup and decimal-exact
    * sum, and one oracle covers both.
    */
  private[graft] def ewmaAggregate(
      ranked: DataFrame,
      keyCol: String,
      valueCol: String,
      alpha: Double,
      maxHistory: Int
  ): DataFrame = {
    val (wa, wt) = ewmaWeights(alpha, maxHistory)
    import org.apache.spark.sql.expressions.Window
    val perKey = Window.partitionBy(F.col(keyCol))
    ranked
      .withColumn("_m", count(lit(1)).over(perKey))
      .withColumn("_w",
        when(F.col("_rn") === F.col("_m"), element_at(typedlit(wt.toSeq), F.col("_rn")))
          .otherwise(element_at(typedlit(wa.toSeq), F.col("_rn"))))
      .groupBy(F.col(keyCol))
      .agg(
        count(lit(1)).as("n_used"),
        round(sum((F.col(valueCol) * F.col("_w")).cast(DecimalType(38, 18)))
          .cast(DoubleType), 6).as("ewma"))
  }
}
