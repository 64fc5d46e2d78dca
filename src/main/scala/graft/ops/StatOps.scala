package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Distribution-drift diagnostics for corpus curation: did a source,
  * a filter pass, or a new crawl SHIFT the data distribution? The
  * operators here are exact (integer / decimal arithmetic end-to-end,
  * deterministic under any partitioning) and reduce to
  * value-distinct-sized frames immediately - the corpus crosses the
  * wire once as per-value counts, never as rows, so a 100-TB input
  * costs one map-side-combined aggregation regardless of skew.
  */
object StatOps {

  /** Per-stratum two-sample Kolmogorov-Smirnov drift audit: for every
    * stratum (source, shard, date...), the exact KS distance between
    * that stratum's distribution of `valueCol` and the distribution of
    * the REST of the corpus - the "is this source weird" screen run
    * before a new source is admitted to a training mix.
    *
    * D = max over values v of |F_s(v) - F_rest(v)| is computed as an
    * INTEGER argmax: maximize |cumS(v) * nRest - cumRest(v) * nS| over
    * the distinct values, with the products carried in DECIMAL(38,0)
    * so corpus-scale counts (1e12 x 1e12) cannot overflow and the
    * winning value is chosen by exact comparison, never a float one.
    * Ties on the maximum report the smallest value (deterministic).
    * The final D is the one double division, performed identically by
    * the replaying engine.
    *
    * Shape: one groupBy to per-(stratum, value) counts, a dense
    * strata x distinct-values completion (both frames are
    * statistics-sized, not corpus-sized), one cumulative window per
    * stratum, one argmax aggregate. Strata with an empty complement
    * (the stratum IS the corpus) are dropped - D would be undefined.
    *
    * Scale contract: the value column must be DISCRETE and bounded
    * (lengths, scores on a grid, bucketed timestamps) - the dense
    * frame is strata x distinct values. For a continuous column,
    * quantize through [[SketchOps.fixedHistogram]] bins first; the KS
    * distance on the binned values bounds the true D within one bin of
    * CDF mass, the same resolution trade the quantile sketch makes.
    *
    * Output: (stratum, n_stratum, n_rest, ks_at, ks) - the distance,
    * and the value at which the two CDFs diverge most (where to LOOK
    * when the audit fires).
    */
  def ksDriftByStratum(
      df: DataFrame,
      valueCol: String,
      strataCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = F.col(valueCol)
    val rows = df
      .filter(v.isNotNull && F.col(strataCol).isNotNull)
      .select(F.col(strataCol).as("stratum"), v.as("v"))
    // per-(stratum, value) and per-value counts: everything downstream
    // is sized by strata x distinct values
    val sv = rows.groupBy("stratum", "v").agg(count(lit(1)).as("cs"))
    val gv = rows.groupBy("v").agg(count(lit(1)).as("cg"))
    // densify: every stratum needs a cumulative reading at EVERY global
    // value point (the sup over the union of jump points), absent = 0
    val dense = sv.select("stratum").distinct()
      .crossJoin(gv)
      .join(sv, Seq("stratum", "v"), "left")
      .withColumn("cs", coalesce(F.col("cs"), lit(0L)))
    val win = Window.partitionBy("stratum").orderBy("v")
    val cums = dense
      .withColumn("cum_s", sum("cs").over(win))
      .withColumn("cum_g", sum("cg").over(win))
    val totals = sv.groupBy("stratum").agg(sum("cs").as("n_s"))
    val grand = gv.agg(sum("cg").as("n_g"))
    val dec = DecimalType(38, 0)
    val joined = cums
      .join(broadcast(totals), "stratum")
      .crossJoin(broadcast(grand))
      .filter(F.col("n_g") > F.col("n_s")) // rest must be non-empty
      .withColumn("cum_rest", F.col("cum_g") - F.col("cum_s"))
      .withColumn("n_rest", F.col("n_g") - F.col("n_s"))
      .withColumn("diff",
        abs(F.col("cum_s").cast(dec) * F.col("n_rest").cast(dec)
          - F.col("cum_rest").cast(dec) * F.col("n_s").cast(dec)))
    joined
      .groupBy("stratum")
      .agg(
        min("n_s").as("n_stratum"),
        min("n_rest").as("n_rest"),
        max("diff").as("d_num"),
        min_by(F.col("v"), struct(negate(F.col("diff")), F.col("v"))).as("ks_at"))
      .select(
        F.col("stratum"),
        F.col("n_stratum"),
        F.col("n_rest"),
        F.col("ks_at"),
        round(F.col("d_num").cast(DoubleType)
          / (F.col("n_stratum").cast(DoubleType) * F.col("n_rest").cast(DoubleType)),
          6).as("ks"))
  }

  /** Two-sample KS distance between two [[SketchOps.fixedHistogram]]
    * counter tables - the continuous-column companion to
    * [[ksDriftByStratum]] (whose dense frame needs a DISCRETE value
    * column): quantize both sides through the same fixed bin edges
    * first, then take the exact sup-gap of the binned CDFs here.
    * Coarsening can only shrink a sup over fewer evaluation points, so
    * the binned distance is a LOWER bound on the true D, within one
    * bin of CDF mass - a drift alarm on the binned value fires a
    * fortiori on the true distributions.
    *
    * Sentinel cells participate: the underflow bin (-1) is the CDF's
    * first step and the overflow bin its last (where both CDFs reach 1
    * and the gap is 0 by construction). The argmax is integer
    * cross-multiplied in DECIMAL(38,0) with ties to the smallest bin,
    * the same discipline as [[ksDriftByStratum]]; inputs are sketch
    * cells, so two 100-TB corpus versions compare without a re-scan.
    *
    * Output: one row: (n_a, n_b, ks_at_bin, ks).
    */
  def ksFromHistograms(histA: DataFrame, histB: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = histA.groupBy("bin").agg(sum("c").as("ca"))
    val b = histB.groupBy("bin").agg(sum("c").as("cb"))
    val cells = a.join(b, Seq("bin"), "full")
      .select(F.col("bin"),
        coalesce(F.col("ca"), lit(0L)).as("ca"),
        coalesce(F.col("cb"), lit(0L)).as("cb"))
    val totals = cells.agg(sum("ca").as("n_a"), sum("cb").as("n_b"))
    // a global-order window is the banned single-partition funnel for
    // corpus data - but `cells` is bounded at bins + 2 SKETCH rows, so
    // the funnel holds a few hundred rows regardless of corpus size
    val win = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = DecimalType(38, 0)
    cells
      .withColumn("cum_a", sum("ca").over(win))
      .withColumn("cum_b", sum("cb").over(win))
      .crossJoin(broadcast(totals))
      .withColumn("diff",
        abs(F.col("cum_a").cast(dec) * F.col("n_b").cast(dec)
          - F.col("cum_b").cast(dec) * F.col("n_a").cast(dec)))
      .groupBy("n_a", "n_b")
      .agg(
        min_by(F.col("bin"), struct(negate(F.col("diff")), F.col("bin"))).as("ks_at_bin"),
        max("diff").as("d_num"))
      .select(
        F.col("n_a"), F.col("n_b"), F.col("ks_at_bin"),
        round(F.col("d_num").cast(DoubleType)
          / (F.col("n_a").cast(DoubleType) * F.col("n_b").cast(DoubleType)), 6).as("ks"))
  }

  /** Categorical mix drift between CONSECUTIVE periods: for every
    * period after the first, the PSI between its category distribution
    * (event types, sources, languages...) and the previous period's -
    * the "did this week's traffic mix shift" monitor, the categorical
    * companion to [[psiFromHistograms]]' numeric snapshots.
    *
    * The corpus reduces map-side to (period, category) counts;
    * everything after runs on the dense periods x categories frame
    * (absent cells epsilon-floor like the histogram PSI, so a category
    * appearing or vanishing registers as drift instead of dividing by
    * zero). The period ordering window runs over the PERIODS frame -
    * bounded by the number of periods, never the corpus.
    *
    * Output: (period, prev_period, n_curr, n_prev, psi), one row per
    * period with a predecessor.
    */
  def mixDriftByPeriod(
      df: DataFrame,
      periodCol: String,
      catCol: String,
      eps: Double = 1e-6
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(F.col(periodCol).isNotNull && F.col(catCol).isNotNull)
      .select(F.col(periodCol).as("period"), F.col(catCol).as("cat"))
    val pc = base.groupBy("period", "cat").agg(count(lit(1)).as("c"))
    val dense = pc.select("period").distinct()
      .crossJoin(pc.select("cat").distinct())
      .join(pc, Seq("period", "cat"), "left")
      .withColumn("c", coalesce(F.col("c"), lit(0L)))
    val totals = pc.groupBy("period").agg(sum("c").as("n"))
    // predecessor per period: a lag over the period list (period-count
    // rows - the single partition is bounded and deliberate)
    val order = totals.select(F.col("period"),
      lag("period", 1).over(Window.orderBy("period")).as("prev_period"))
      .filter(F.col("prev_period").isNotNull)
    val withN = dense.join(broadcast(totals), "period")
      .select(F.col("period"), F.col("cat"),
        greatest(F.col("c").cast(DoubleType) / F.col("n").cast(DoubleType), lit(eps))
          .as("p"),
        F.col("n"))
    order
      .join(withN.select(F.col("period"), F.col("cat"),
        F.col("p").as("p_curr"), F.col("n").as("n_curr")), "period")
      .join(withN.select(F.col("period").as("prev_period"), F.col("cat"),
        F.col("p").as("p_prev"), F.col("n").as("n_prev")), Seq("prev_period", "cat"))
      .select(F.col("period"), F.col("prev_period"), F.col("n_curr"), F.col("n_prev"),
        ((F.col("p_curr") - F.col("p_prev")) * log(F.col("p_curr") / F.col("p_prev")))
          .cast(DecimalType(38, 18)).as("term"))
      .groupBy("period", "prev_period", "n_curr", "n_prev")
      .agg(round(sum("term").cast(DoubleType), 6).as("psi"))
  }

  /** Population stability index between per-stratum histograms built by
    * [[SketchOps.fixedHistogram]] - the standard "did the distribution
    * move between snapshot A and snapshot B" score over PRE-AGGREGATED
    * sketch cells, so two 100-TB corpus versions are compared without
    * either being re-scanned here.
    *
    *   PSI = sum over bins (pa - pb) * ln(pa / pb)
    *
    * Empty cells take the standard epsilon floor (interpolated into
    * both engines) so the logarithm is always defined; the per-bin
    * proportions divide exact integer counts, and the termwise doubles
    * sum through DECIMAL(38,18), making the score independent of
    * aggregation order - the same discipline as the BM25 scorer.
    *
    * Output: one row: (n_a, n_b, psi).
    */
  def psiFromHistograms(
      histA: DataFrame,
      histB: DataFrame,
      bins: Int,
      eps: Double = 1e-6
  ): DataFrame = {
    require(bins > 0, s"need positive bins, got $bins")
    val a = histA.groupBy("bin").agg(sum("c").as("ca"))
    val b = histB.groupBy("bin").agg(sum("c").as("cb"))
    // `bins` declares the hash family the two sketches must share:
    // fixedHistogram(bins = B) emits bin ids in [-1, B] (-1 = below-lo
    // overflow cell, B = above-hi). A sketch built with a different bin
    // count would silently misalign the cells, so out-of-range ids
    // fail the plan instead of skewing the score - the check runs on
    // sketch CELLS (<= bins + 2 rows per side), not corpus rows.
    val cells = a.join(b, Seq("bin"), "full")
      .select(
        when(F.col("bin").between(-1, bins), F.col("bin"))
          .otherwise(raise_error(concat(
            lit(s"psiFromHistograms: bin id outside [-1, $bins] - " +
              "histogram was built with a different bin count: "),
            F.col("bin").cast("string")))).as("bin"),
        coalesce(F.col("ca"), lit(0L)).as("ca"),
        coalesce(F.col("cb"), lit(0L)).as("cb"))
    // totals ride the plan as a one-row broadcast (construction stays
    // job-free, the whole score is one lazy plan)
    val totals = cells.agg(sum("ca").as("n_a"), sum("cb").as("n_b"))
    val pa = greatest(F.col("ca").cast(DoubleType) / F.col("n_a").cast(DoubleType), lit(eps))
    val pb = greatest(F.col("cb").cast(DoubleType) / F.col("n_b").cast(DoubleType), lit(eps))
    cells
      .crossJoin(broadcast(totals))
      .select(F.col("n_a"), F.col("n_b"),
        ((pa - pb) * log(pa / pb)).cast(DecimalType(38, 18)).as("term"))
      .groupBy("n_a", "n_b")
      .agg(round(sum("term").cast(DoubleType), 6).as("psi"))
  }
}
