package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Mergeable frequency / cardinality sketches expressed RELATIONALLY -
  * as groupBy trees rather than opaque binary blobs. A Count-Min table
  * or an HLL register file is just a (bounded) aggregate: Spark's
  * map-side partial aggregation IS the sketch merge, so at 100 TB each
  * executor folds its partitions locally and only d*w (CMS) or m (HLL)
  * cells per group cross the wire - never raw values. Keeping the cells
  * relational also makes them storable (parquet), incrementally
  * mergeable across runs (union + re-aggregate), and replayable by a
  * second engine for exact correctness oracles - the same discipline as
  * the SpaceSaving summaries (graft.functions.SpaceSaving).
  *
  * All hashes route through md5 (deterministic, engine-portable), the
  * repo-wide convention (SampleOps, DedupOps.minhashLshPairs).
  */
object SketchOps {

  /** Bucket of `item` in CMS row `row` - first 8 md5 hex chars of
    * "row:item" (32 bits, fits a Long exactly) mod `width`.
    */
  private def cmBucket(row: Column, item: Column, width: Int): Column =
    pmod(
      conv(substring(md5(concat_ws(":", row.cast(StringType), item)), 1, 8), 16, 10)
        .cast(LongType),
      lit(width.toLong)).cast(IntegerType)

  /** Count-Min sketch of item frequencies: a `depth` x `width` counter
    * table where cell (i, b) sums the occurrences of every item whose
    * row-i hash lands in bucket b. One wide groupBy over the exploded
    * (row, bucket) pairs - map-side combine reduces each partition to at
    * most depth*width cells before the (single) shuffle, so the cost is
    * independent of the number of distinct items: the whole point of a
    * CMS over an exact count at corpus scale.
    *
    * Output: (row, bucket, c), at most depth*width rows.
    */
  def countMinSketch(
      items: DataFrame,
      itemCol: String,
      depth: Int,
      width: Int
  ): DataFrame = {
    require(depth > 0 && width > 0, s"need positive depth/width, got $depth/$width")
    val rows = explode(array((0 until depth).map(lit): _*)).as("row")
    items
      .filter(F.col(itemCol).isNotNull)
      .select(F.col(itemCol).cast(StringType).as("item"), rows)
      .select(F.col("row"),
        cmBucket(F.col("row"), F.col("item"), width).as("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("c"))
  }


  /** Point-query a Count-Min sketch: for each probe item, the estimate
    * is the MIN over the `depth` cells its hashes select. Guarantees:
    * est >= true count always (counters only ever overcount), and with
    * width w the expected overcount is stream_length / w per row, so the
    * min of `depth` independent rows is within eps = e/w of the truth
    * with probability 1 - e^-depth. The sketch is tiny (<= depth*width
    * rows) and is broadcast; probes stream - a probe-side scan never
    * shuffles.
    *
    * Output: (item, est).
    */
  def countMinEstimate(
      sketch: DataFrame,
      probes: DataFrame,
      itemCol: String,
      depth: Int,
      width: Int
  ): DataFrame = {
    val rows = explode(array((0 until depth).map(lit): _*)).as("row")
    probes
      .filter(F.col(itemCol).isNotNull)
      .select(F.col(itemCol).cast(StringType).as("item"), rows)
      .select(F.col("item"), F.col("row"),
        cmBucket(F.col("row"), F.col("item"), width).as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("item")
      // an absent cell means nothing ever hashed there: that row's
      // counter is 0, and min(0, ...) = 0 - the item was never seen
      .agg(min(coalesce(F.col("c"), lit(0L))).as("est"))
  }

  /** Per-group distinct-count estimate via a relational HyperLogLog:
    * `m` max-of-rho registers per group, Flajolet et al.'s raw
    * estimator, and the standard linear-counting correction for the
    * small range (E <= 2.5m with empty registers present).
    *
    * The 60-bit item hash (15 md5 hex chars - the widest slice that
    * still fits a signed Long exactly) splits into register = low
    * log2(m) bits and rho = trailing-zero count of the rest, plus one
    * (an all-zero rest saturates at 55). Registers aggregate with MAX -
    * commutative, idempotent, map-side combinable: each executor sends
    * at most m cells per group regardless of row count, and register
    * files from different runs union+MAX into one (sketch merge).
    *
    * Everything up to the estimate is integer-exact (Z's harmonic sum is
    * computed as sum(1 << (R - M_j)), a 64-term integer sum, never a
    * float accumulation), so a second engine replays the whole pipeline
    * bit-identically; the final doubles are single mul/div/ln chains of
    * identical operands.
    *
    * Output: one row per group: (groupCols..., r, v, zint, hll_raw,
    * hll_est) where r = max rho, v = empty registers, zint the integer
    * harmonic sum - the full register-file diagnostics, not just the
    * estimate.
    */
  /** Fixed-range equi-width histogram: the mergeable QUANTILE summary
    * beside the frequency (CMS), cardinality (HLL), and top-k
    * (SpaceSaving) sketches. The bin edges are fixed by the caller
    * BEFORE counting - that is what makes the counts a sketch: cells
    * from different partitions, runs, or micro-batches merge by plain
    * addition (union + re-aggregate), unlike any equi-DEPTH summary
    * whose boundaries depend on the data it saw. Spark's map-side
    * partial aggregation IS the merge: each executor sends at most
    * groups x (bins + 2) cells across the wire regardless of row count.
    *
    * Bin arithmetic is floor((v - lo) / binWidth) with binWidth
    * computed ONCE driver-side and interpolated into both engines, so
    * the IEEE operation chain is identical everywhere; values below lo
    * land in bin -1, values >= hi in bin `bins` (the two unbounded
    * sentinel cells), and the float-edge case v just under hi flooring
    * onto `bins` is clamped to bins - 1 on both sides.
    *
    * Output: (groupCols..., bin, c), at most groups x (bins + 2) rows
    * (empty cells are absent - re-densify when rendering).
    */
  def fixedHistogram(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      lo: Double,
      hi: Double,
      bins: Int
  ): DataFrame = {
    require(bins > 0, s"need positive bins, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    require(groupCols.nonEmpty, "need at least one group column")
    val w = (hi - lo) / bins
    val v = F.col(valueCol).cast(DoubleType)
    val raw = floor((v - lit(lo)) / lit(w)).cast(IntegerType)
    val bin = when(v < lit(lo), lit(-1))
      .when(v >= lit(hi), lit(bins))
      .otherwise(least(raw, lit(bins - 1)))
    // NaN is dropped EXPLICITLY: Spark's comparisons send NaN to a null
    // bin while other engines sort NaN above +inf into the overflow
    // cell - silently divergent sketches. No bin is the honest answer.
    df.filter(v.isNotNull && !isnan(v) &&
        groupCols.map(F.col(_).isNotNull).reduce(_ && _))
      .select(groupCols.map(F.col) :+ bin.as("bin"): _*)
      .groupBy(groupCols.map(F.col) :+ F.col("bin"): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Interpolated quantile estimates from a [[fixedHistogram]] counter
    * table. For each requested q in (0, 1]: target rank t = q * N over
    * the IN-RANGE count N (the unbounded sentinel bins carry no
    * position information - they are reported by the caller as
    * diagnostics, not interpolated), the containing bin is the first
    * with cumulative count >= t (unique, because only non-empty bins
    * exist and the cumulative sum is strictly increasing), and the
    * estimate places t linearly within that bin:
    *
    *   est = lo + (bin + (t - cumBefore) / c_bin) * binWidth
    *
    * Everything left of the final division is integer-exact
    * (cumulative counts), and the double chain is spelled identically
    * in the DuckDB oracle, so estimates replay bit-for-bit. Groups
    * with zero in-range rows produce no output rows.
    *
    * The error bound is the classic histogram guarantee: the estimate
    * is within one binWidth of a true q-quantile - the caller trades
    * resolution for a summary whose size is independent of N.
    *
    * Output: (groupCols..., q, est), one row per group x quantile.
    */
  def histogramQuantiles(
      hist: DataFrame,
      groupCols: Seq[String],
      qs: Seq[Double],
      lo: Double,
      hi: Double,
      bins: Int
  ): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got $qs")
    require(bins > 0 && hi > lo, s"bad histogram shape [$lo, $hi) / $bins")
    val w = (hi - lo) / bins
    val g = groupCols.map(F.col)
    import org.apache.spark.sql.expressions.Window
    val inRange = hist.filter(F.col("bin") >= 0 && F.col("bin") < bins)
    val cum = inRange
      .withColumn("cum",
        sum("c").over(Window.partitionBy(g: _*).orderBy("bin")))
      .withColumn("cum_before", F.col("cum") - F.col("c"))
    val totals = inRange.groupBy(g: _*).agg(sum("c").as("n"))
    val targets = totals
      .select(g :+ F.col("n") :+ explode(array(qs.map(lit): _*)).as("q"): _*)
      .withColumn("t", F.col("q") * F.col("n"))
    targets
      .join(cum, groupCols)
      // first bin whose cumulative reaches t: cum_before < t <= cum.
      // q > 0 makes t > 0, so the interpolation fraction is in (0, 1]
      .filter(F.col("cum_before") < F.col("t") && F.col("t") <= F.col("cum"))
      .select(g ++ Seq(
        F.col("q"),
        round(lit(lo) + (F.col("bin") +
          (F.col("t") - F.col("cum_before")) / F.col("c")) * lit(w), 6).as("est")): _*)
  }

  /** Unknown-range companion to [[fixedHistogram]]: derive each
    * group's bin edges from its own [min, max] - the first-contact
    * profile of a column nobody can pre-know the range of. The edge
    * derivation is ONE extra map-side-combined min/max aggregate
    * (groups-sized result, broadcast back onto the scan), so the
    * corpus crosses the wire as cells exactly like the fixed-range
    * path; the whole thing stays one lazy plan - no driver pass, no
    * collect.
    *
    * Contract differences from [[fixedHistogram]], both deliberate:
    * - No sentinel cells: [lo, hi] covers every value by construction,
    *   v == hi clamps into the last bin, so bin ids are [0, bins-1]
    *   (0 for every row of a constant group - binWidth 0 is legal).
    * - The derived (lo, hi) travel as OUTPUT COLUMNS, because
    *   downstream interpolation must use the same edges; and because
    *   edges are data-derived, cells from DIFFERENT runs/batches merge
    *   by addition ONLY within the same derived-edge family - for a
    *   stream-maintained sketch fix the range up front
    *   ([[fixedHistogram]] + histogramMaintenance).
    *
    * Output: (groupCols..., bin, lo, hi, c).
    */
  def fixedHistogramAuto(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      bins: Int
  ): DataFrame = {
    require(bins > 0, s"need positive bins, got $bins")
    require(groupCols.nonEmpty, "need at least one group column")
    val v = F.col(valueCol).cast(DoubleType)
    val g = groupCols.map(F.col)
    val clean = df.filter(v.isNotNull && !isnan(v) &&
      groupCols.map(F.col(_).isNotNull).reduce(_ && _))
    val edges = clean.groupBy(g: _*)
      .agg(min(v).as("lo"), max(v).as("hi"))
    // identical IEEE chain to the oracle: sub, sub, div, div, floor
    val w = (F.col("hi") - F.col("lo")) / lit(bins.toDouble)
    val raw = floor((v - F.col("lo")) / w).cast(IntegerType)
    val bin = when(F.col("hi") === F.col("lo"), lit(0))
      .otherwise(least(raw, lit(bins - 1)))
    clean.join(broadcast(edges), groupCols)
      .select(g ++ Seq(bin.as("bin"), F.col("lo"), F.col("hi")): _*)
      .groupBy(g ++ Seq(F.col("bin"), F.col("lo"), F.col("hi")): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Quantile interpolation off a [[fixedHistogramAuto]] table: the
    * same rank arithmetic as [[histogramQuantiles]], with the bin
    * edges read from the sketch's own (lo, hi) columns instead of
    * caller parameters, and no sentinel exclusion (auto mode has no
    * sentinels - every cell is in range, so N is the full group
    * count). A constant group (lo == hi) estimates every quantile at
    * lo, which is exact. Same one-binWidth error bound, same
    * bit-replayable double chain.
    *
    * Output: (groupCols..., q, est).
    */
  def histogramQuantilesAuto(
      hist: DataFrame,
      groupCols: Seq[String],
      qs: Seq[Double],
      bins: Int
  ): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got $qs")
    require(bins > 0, s"need positive bins, got $bins")
    val g = groupCols.map(F.col)
    import org.apache.spark.sql.expressions.Window
    // the caller's `bins` scales binWidth below, so a sketch built with a
    // DIFFERENT bin count would silently mis-scale every estimate - the
    // same silent-misalignment class psiFromHistograms guards against.
    // Fail loudly instead: auto mode has no sentinels, so legal ids are
    // exactly [0, bins-1].
    val checked = hist.withColumn("bin",
      when(F.col("bin").between(0, bins - 1), F.col("bin"))
        .otherwise(raise_error(concat(
          lit(s"histogramQuantilesAuto: bin id outside [0, ${bins - 1}] - " +
            "sketch was built with a different bin count: "),
          F.col("bin").cast("string")))))
    val cum = checked
      .withColumn("cum",
        sum("c").over(Window.partitionBy(g: _*).orderBy("bin")))
      .withColumn("cum_before", F.col("cum") - F.col("c"))
    val totals = hist.groupBy(g: _*).agg(sum("c").as("n"))
    val targets = totals
      .select(g :+ F.col("n") :+ explode(array(qs.map(lit): _*)).as("q"): _*)
      .withColumn("t", F.col("q") * F.col("n"))
    val w = (F.col("hi") - F.col("lo")) / lit(bins.toDouble)
    targets
      .join(cum, groupCols)
      .filter(F.col("cum_before") < F.col("t") && F.col("t") <= F.col("cum"))
      .select(g ++ Seq(
        F.col("q"),
        round(F.col("lo") + (F.col("bin") +
          (F.col("t") - F.col("cum_before")) / F.col("c")) * w, 6).as("est")): _*)
  }

  /** TAIL-ACCURATE mergeable quantile sketch: an HDR-histogram-style
    * log-bucketed counter table (the published HdrHistogram / DDSketch
    * design re-expressed relationally), closing the gap
    * [[sampleSketch]] cannot: a k-sample's rank error is O(1/sqrt(k))
    * UNIFORM in rank, so at q999 on a heavy-tailed column the estimate
    * lands whole octaves below the true tail - while log-buckets give a
    * RELATIVE-VALUE error bound (half a bucket: 2^-6 ~ 1.6%) at EVERY
    * quantile, q999 included, independent of n and of the distribution.
    *
    * Binning is ALL integer, which is what makes it engine-exact and
    * layout-independent (no log()/pow() float boundaries):
    *
    *   - scale: `vi = floor(value * 2^20)` - a power-of-two multiply is
    *     exact IEEE (exponent shift), floor is exact, so both engines
    *     compute the same BIGINT; |value| >= 2e12 raises rather than
    *     silently overflowing (the bound protects the SERVING side too:
    *     [[hdrQuantiles]]' midpoint decode adds lo + hi, which needs the
    *     scaled magnitude under 2^61);
    *   - sign split: `sgn` in {-1, 0, 1}, `a = abs(vi)`;
    *   - bucket: `a < 32 -> code = a` (exact small values); else with
    *     `e = bitlen(a) - 1` (via `length(bin(a))`, pure string-of-bits
    *     - no float log2), `code = (e-5)*32 + (a >> (e-5))` - the top 5
    *     mantissa bits after the leading 1, i.e. 32 sub-buckets per
    *     octave, monotone in a.
    *
    * `sgn * code` is monotone in the VALUE, so rank arithmetic works
    * directly on the sketch. State: at most (64-5)*32+32 ~ 1.9k cells
    * per group across the full long range (a few hundred in practice).
    * Cells merge by ADDITION - map-side partial aggregation is the
    * sketch merge, two sketches from different runs/batches merge by
    * union + re-sum, and the merged sketch is EXACTLY the sketch of
    * the union (no compaction randomness, unlike KLL - which is also
    * why it is deterministic under any partitioning).
    *
    * Output: (groupCols..., sgn, code, c).
    */
  def hdrSketch(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String]
  ): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val v = F.col(valueCol).cast(DoubleType)
    val g = groupCols.map(F.col)
    val guarded = when(abs(v) < lit(2.0e12), v)
      .otherwise(raise_error(concat(
        lit(s"hdrSketch: |$valueCol| >= 2e12 would overflow the scaled-long " +
          "arithmetic (2^20 scale here, lo+hi midpoint decode in hdrQuantiles): "),
        v.cast(StringType))))
    df.filter(v.isNotNull && !isnan(v) &&
        groupCols.map(F.col(_).isNotNull).reduce(_ && _))
      .select(g :+ floor(guarded * lit(1048576.0)).as("__hdr_vi"): _*)
      .select(g ++ Seq(
        when(F.col("__hdr_vi") < 0, -1L).when(F.col("__hdr_vi") > 0, 1L)
          .otherwise(0L).as("sgn"),
        abs(F.col("__hdr_vi")).as("__hdr_a")): _*)
      .select(g ++ Seq(F.col("sgn"),
        when(F.col("__hdr_a") < 32, F.col("__hdr_a"))
          .otherwise(expr(
            "(length(bin(__hdr_a)) - 6) * 32 + shiftright(__hdr_a, length(bin(__hdr_a)) - 6)"))
          .as("code")): _*)
      .groupBy(g ++ Seq(F.col("sgn"), F.col("code")): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Quantile serving off a [[hdrSketch]]: cumulative counts in
    * `sgn * code` order (monotone in value), target rank `t = q * n`
    * with the same `cum_before < t <= cum` convention as
    * [[histogramQuantiles]], estimate = the hit bucket's midpoint,
    * decoded back with integer shifts:
    * `lo = top << shift`, `hi = lo + 2^shift - 1`,
    * `est = sgn * (lo + hi) / 2 / 2^20` - dyadic rationals, so the
    * double is EXACT and both engines serve identical bits. Pure
    * arithmetic on a cells-sized frame; the corpus is long gone.
    *
    * Output: (groupCols..., q, est).
    */
  def hdrQuantiles(
      sketch: DataFrame,
      groupCols: Seq[String],
      qs: Seq[Double]
  ): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got $qs")
    val g = groupCols.map(F.col)
    import org.apache.spark.sql.expressions.Window
    val cum = sketch
      .withColumn("cum", sum("c").over(
        Window.partitionBy(g: _*).orderBy(F.col("sgn") * F.col("code"))))
      .withColumn("cum_before", F.col("cum") - F.col("c"))
    val totals = sketch.groupBy(g: _*).agg(sum("c").as("n"))
    val targets = totals
      .select(g :+ F.col("n") :+ explode(array(qs.map(lit): _*)).as("q"): _*)
      .withColumn("t", F.col("q") * F.col("n"))
    val lo = when(F.col("code") < 32, F.col("code"))
      .otherwise(expr(
        "shiftleft(code - 32 * (shiftright(code, 5) - 1), shiftright(code, 5) - 1)"))
    val hi = when(F.col("code") < 32, F.col("code"))
      .otherwise(lo + expr(
        "shiftleft(cast(1 as bigint), shiftright(code, 5) - 1)") - 1)
    targets
      .join(cum, groupCols)
      .filter(F.col("cum_before") < F.col("t") && F.col("t") <= F.col("cum"))
      .select(g ++ Seq(
        F.col("q"),
        (F.col("sgn") * (lo + hi) / lit(2.0) / lit(1048576.0)).as("est")): _*)
  }

  /** ONE-PASS mergeable rank sketch: a deterministic uniform k-sample
    * per group, kept as the k rows whose `md5(id)` hashes are smallest
    * ([[graft.functions.MinKAgg]]). This closes the gap neither
    * histogram covers alone: [[fixedHistogram]] needs the range up
    * front, [[fixedHistogramAuto]] scans twice (edges, then cells) -
    * the sample sketch profiles an unknown-range, unbounded-domain
    * column in a SINGLE scan with k-bounded state per partial, and two
    * sketches from different runs/batches merge exactly (union +
    * re-trim is the sketch of the union - min-k of hashes is
    * associative).
    *
    * Determinism is the md5 discipline used everywhere else: the kept
    * sample is a pure function of the (group, id) set - independent of
    * partitioning, arrival order, AND of the values themselves (the
    * hash reads only the id), so it replays engine-independently
    * (`ORDER BY md5(id) LIMIT k` per group in any SQL engine).
    * Requires `idCol` unique per row; a duplicated id degrades
    * deterministically to one entry carrying its minimum value.
    *
    * Estimate quality: classic sampling bound (DKW) - sample quantiles
    * are within O(1/sqrt(k)) RANK error of the true quantiles with
    * high probability; k = 4096 gives ~2% rank error, independent of
    * row count.
    *
    * Output: (groupCols..., n, sample) - n the true group row count,
    * sample the value-sorted array (size min(k, n)).
    */
  def sampleSketch(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      groupCols: Seq[String],
      k: Int
  ): DataFrame = {
    require(k > 0, s"need positive k, got $k")
    require(groupCols.nonEmpty, "need at least one group column")
    val v = F.col(valueCol).cast(DoubleType)
    val g = groupCols.map(F.col)
    val minK = org.apache.spark.sql.functions.udaf(
      new graft.functions.MinKAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(String, Double)]())
    // null ids are DROPPED (md5(NULL) is NULL - it can neither hash nor
    // rank deterministically), exactly as null values and null groups are
    df.filter(F.col(idCol).isNotNull && v.isNotNull && !isnan(v) &&
        groupCols.map(F.col(_).isNotNull).reduce(_ && _))
      .select(g :+ md5(F.col(idCol).cast(StringType)).as("h") :+ v.as("v"): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"), minK(F.col("h"), F.col("v")).as("sample"))
  }

  /** The EXPLODED form of [[sampleSketch]]'s state - (groupCols..., h,
    * v), at most k rows per group, h the md5(id) hex - for callers that
    * need to keep MERGING after the pass: the streaming maintenance
    * lifecycle ([[graft.streaming.StreamOps.sampleMaintenance]]) folds
    * each micro-batch into this frame (min-v per hash, then re-trim to
    * the k smallest hashes), and because min-k-by-hash is associative
    * the maintained state equals one [[sampleState]] over the union of
    * everything that ever streamed in. [[sampleStateToSketch]] converts
    * to the (sample array) form [[sampleQuantiles]] reads.
    */
  def sampleState(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      groupCols: Seq[String],
      k: Int
  ): DataFrame = {
    require(k > 0, s"need positive k, got $k")
    require(groupCols.nonEmpty, "need at least one group column")
    val v = F.col(valueCol).cast(DoubleType)
    val g = groupCols.map(F.col)
    import org.apache.spark.sql.expressions.Window
    // same null-id rule as sampleSketch: dropped, not ranked-first
    df.filter(F.col(idCol).isNotNull && v.isNotNull && !isnan(v) &&
        groupCols.map(F.col(_).isNotNull).reduce(_ && _))
      .select(g :+ md5(F.col(idCol).cast(StringType)).as("h") :+ v.as("v"): _*)
      .groupBy(g :+ F.col("h"): _*)
      .agg(min("v").as("v"))
      .withColumn("rk",
        row_number().over(Window.partitionBy(g: _*).orderBy("h")))
      .filter(F.col("rk") <= k)
      .drop("rk")
  }

  /** Collapse a [[sampleState]] frame to the (groupCols..., sample)
    * shape [[sampleQuantiles]] serves from. Groups x k rows in, groups
    * rows out - sketch-sized both sides.
    */
  def sampleStateToSketch(state: DataFrame, groupCols: Seq[String]): DataFrame =
    state.groupBy(groupCols.map(F.col): _*)
      .agg(sort_array(collect_list("v")).as("sample"))

  /** Quantile order statistics off a [[sampleSketch]]: est for q is the
    * ceil(q * m)-th smallest sample value (m = sample size) - the
    * classic empirical quantile, exact ON THE SAMPLE, so the only
    * error is sampling error (the DKW bound above). Pure array reads
    * on a groups-sized frame; the corpus is long gone.
    *
    * Output: (groupCols..., q, est).
    */
  def sampleQuantiles(
      sketch: DataFrame,
      groupCols: Seq[String],
      qs: Seq[Double]
  ): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got $qs")
    val g = groupCols.map(F.col)
    sketch
      .select(g :+ F.col("sample") :+
        explode(array(qs.map(lit): _*)).as("q"): _*)
      .filter(size(F.col("sample")) > 0)
      .select(g ++ Seq(
        F.col("q"),
        element_at(F.col("sample"),
          greatest(ceil(F.col("q") * size(F.col("sample"))).cast(IntegerType), lit(1)))
          .as("est")): _*)
  }

  def hllDistinct(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      m: Int = 64
  ): DataFrame =
    hllEstimate(hllRegisters(df, keyCol, groupCols, m), groupCols, m)

  /** The sparse HyperLogLog register file - (groupCols..., reg, mj),
    * max-of-rho per register, absent = 0: the MERGEABLE half of
    * [[hllDistinct]], split out so register files from different runs
    * or micro-batches union + MAX into one
    * ([[graft.streaming.StreamOps.hllMaintenance]]) - max is
    * associative/idempotent, so the maintained file equals one build
    * over everything ever seen, and [[hllEstimate]] serves the count
    * off the file alone.
    */
  def hllRegisters(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      m: Int = 64
  ): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(F.col)
    val h = conv(substring(md5(F.col(keyCol).cast(StringType)), 1, 15), 16, 10)
      .cast(LongType)
    val rest = shiftright(h, 6) // h div m, 54 bits
    val rho = when(rest === 0L, lit(55))
      .otherwise(bit_count(rest.bitwiseAND(-rest) - 1) + 1)
    df
      .filter(F.col(keyCol).isNotNull && groupCols.map(F.col(_).isNotNull).reduce(_ && _))
      .select(g :+ pmod(h, lit(m.toLong)).cast(IntegerType).as("reg") :+ rho.as("rho"): _*)
      .groupBy(groupCols.map(F.col) :+ F.col("reg"): _*)
      .agg(max("rho").as("mj"))
  }

  /** Flajolet estimator + linear-counting correction over a
    * [[hllRegisters]] file. Groups x m arithmetic only - the stream or
    * corpus the file summarizes is long gone.
    */
  def hllEstimate(
      maxRho: DataFrame,
      groupCols: Seq[String],
      m: Int = 64
  ): DataFrame = {
    // alpha_m * m^2 for m = 64; the LITERAL 2904.064 (= 0.709 * 64^2) is
    // spelled identically in the oracle SQL so both engines parse the
    // same IEEE double rather than re-multiplying
    require(m == 64, "estimator constant below is specialised to m = 64")
    val alphaM2 = lit(2904.064)
    val g = groupCols.map(F.col)

    // densify: every group needs all m registers (absent = 0) for the
    // harmonic sum; groups x m is group-count-sized, not data-sized
    val allRegs = maxRho.select(g: _*).distinct()
      .select(g :+ explode(sequence(lit(0), lit(m - 1))).as("reg"): _*)
    val regs = allRegs
      .join(maxRho, groupCols :+ "reg", "left")
      .withColumn("mj", coalesce(F.col("mj"), lit(0)))

    val grp = regs
      .groupBy(g: _*)
      .agg(max("mj").as("r"), sum(when(F.col("mj") === 0, 1L).otherwise(0L)).as("v"))
    val zint = regs
      .join(grp.select(g :+ F.col("r"): _*), groupCols)
      .groupBy(g: _*)
      .agg(sum(expr("shiftleft(cast(1 as bigint), r - mj)")).as("zint"))

    val raw = alphaM2 * pow(lit(2.0), F.col("r")) / F.col("zint")
    grp
      .join(zint, groupCols)
      .withColumn("hll_raw", raw)
      .withColumn("hll_est",
        when(F.col("hll_raw") <= lit(2.5 * m) && F.col("v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / F.col("v")))
          .otherwise(F.col("hll_raw")))
      .select(g ++ Seq(F.col("r"), F.col("v"), F.col("zint"),
        round(F.col("hll_raw"), 6).as("hll_raw"),
        round(F.col("hll_est"), 6).as("hll_est")): _*)
  }
}
