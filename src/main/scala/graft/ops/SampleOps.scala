package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Sampling operators for training-data pipelines. */
object SampleOps {

  /** First 8 hex chars of md5(key) - the engine-parity-critical hash
    * prefix every sampler in this family compares against. ONE spelling
    * so the Spark side and the DuckDB oracles can never desynchronize.
    */
  private def md5Prefix(keyCol: String): Column =
    substring(md5(F.col(keyCol).cast(StringType)), 1, 8)

  /** The same prefix as a uniform double in [0, 2^32). */
  private def md5U(keyCol: String): Column =
    conv(md5Prefix(keyCol), 16, 10).cast(LongType).cast(DoubleType)

  /** Repeat-factor mixture materialization - the "books x2.5, web x1"
    * step of an LLM data recipe: every document of stratum s appears
    * floor(repeats(s)) times for sure, plus one md5-sampled extra copy
    * with probability frac(repeats(s)) - so each stratum's expected
    * volume multiplier is EXACTLY its configured factor, and the
    * realized copy set is a pure function of (key, copy index):
    * reproducible across runs, engines, and partitionings, and
    * downstream `epochShuffle` on (key, copy) spreads the copies
    * through the stream. Strata absent from the map keep factor 1.0;
    * factors below 1 subsample (0 full copies, one md5-thresholded).
    *
    * Pure per-row expansion - no shuffle at all; the explode fans each
    * row to at most ceil(factor) copies.
    *
    * Output: input columns + `copy` (0-based copy index).
    */
  def repeatMix(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      repeats: Map[String, Double]
  ): DataFrame = {
    require(repeats.values.forall(f => f >= 0.0 && f < 1000),
      s"repeat factors must be in [0, 1000), got $repeats")
    val s = F.col(strataCol).cast(StringType)
    val inKeys = repeats.keys.toSeq.sorted
    def chain(value: String => Column, dflt: Column): Column =
      inKeys.foldRight(dflt) { case (k, e) => when(s === k, value(k)).otherwise(e) }
    val whole = chain(k => lit(math.floor(repeats(k)).toInt), lit(1))
    // per-stratum fractional-tail threshold, precomputed driver-side
    // with the family-wide hexThreshold rule
    val thr = chain(k => lit(hexThreshold(repeats(k) - math.floor(repeats(k)))),
      lit(hexThreshold(0.0)))
    df
      .withColumn("__whole", whole)
      .withColumn("__thr", thr)
      .withColumn("copy", explode(sequence(lit(0), F.col("__whole"))))
      .filter(F.col("copy") < F.col("__whole") ||
        substring(md5(concat_ws(":",
          F.col(keyCol).cast(StringType), F.col("copy").cast(StringType))), 1, 8)
          < F.col("__thr"))
      .drop("__whole", "__thr")
  }

  /** Importance scoring for data selection a la DSIR (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling",
    * public): score every raw-pool document by how target-like its
    * hashed n-gram feature distribution is,
    *
    *   score(doc) = sum over features f of
    *     ln p_target(bucket(f)) - ln p_raw(bucket(f))
    *
    * with unigram+bigram presence features hashed into `buckets` md5
    * buckets and add-one smoothing on both category distributions.
    * Selecting the top-N by score is the deterministic counterpart of
    * the paper's importance resampling - the same ranking signal
    * without the Gumbel noise, so the selection replays bit-for-bit
    * (ordering compares the EXACT decimal sums, never rounded floats).
    *
    * Scale shape: the target (small by definition - it is the curated
    * domain sample) and the raw pool each reduce in ONE
    * explode+aggregate to a `buckets`-sized count table; the
    * per-bucket weight table broadcasts onto the raw pool's feature
    * scan, and each doc collapses to one decimal-exact sum. No
    * corpus-sized shuffle beyond the per-doc aggregation, no LM
    * training, no UDFs.
    *
    * Output: (idCol, n_features, score_exact) - score_exact is the
    * EXACT decimal sum so callers rank on it before rounding for
    * display.
    */
  def dsirScores(
      raw: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      targetTextCol: String,
      buckets: Int = 1024
  ): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    def feats(c: Column): Column =
      concat(graft.ops.DedupOps.shingleStrings(c, 1),
        graft.ops.DedupOps.shingleStrings(c, 2))
    def bucketOf(f: Column): Column =
      pmod(conv(substring(md5(f), 1, 8), 16, 10).cast(LongType), lit(buckets.toLong))
    def bucketCounts(df: DataFrame, tc: String): DataFrame = df
      .filter(F.col(tc).isNotNull)
      .select(explode(feats(F.col(tc))).as("f"))
      .select(bucketOf(F.col("f")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
    val tC = bucketCounts(target, targetTextCol).withColumnRenamed("c", "ca")
    // one definition feeds both the category counts and the scoring
    // join. Each consumer recomputes the lazy explode (two feature
    // passes total) - deliberately: materializing token-volume
    // (id, bucket) rows to save a re-scan would cost more than the
    // scan it saves, the bigramFluency trade
    val docBuckets = raw
      .filter(F.col(textCol).isNotNull)
      .select(F.col(idCol), explode(feats(F.col(textCol))).as("f"))
      .select(F.col(idCol), bucketOf(F.col("f")).as("bucket"))
    val rC = docBuckets.groupBy("bucket").agg(count(lit(1)).as("cb"))
    val tTot = tC.agg(coalesce(sum("ca"), lit(0L)).as("ta"))
    val rTot = rC.agg(coalesce(sum("cb"), lit(0L)).as("tb"))
    // every bucket a raw doc can hit appears in rC (same corpus), so a
    // left join from rC covers the whole probe domain; absent target
    // cells smooth to ca = 0
    val weights = rC.join(tC, Seq("bucket"), "left")
      .select(F.col("bucket"), coalesce(F.col("ca"), lit(0L)).as("ca"), F.col("cb"))
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(F.col("bucket"),
        (log((F.col("ca") + lit(1.0)) / (F.col("ta") + lit(buckets.toDouble)))
          - log((F.col("cb") + lit(1.0)) / (F.col("tb") + lit(buckets.toDouble))))
          .as("w"))
    docBuckets
      .join(broadcast(weights), "bucket")
      .groupBy(F.col(idCol))
      .agg(
        count(lit(1)).as("n_features"),
        sum(F.col("w").cast(DecimalType(38, 18))).as("score_exact"))
  }

  /** Deterministic ~`fraction` sample keyed on a column's md5: a row is
    * kept iff the first 8 hex chars of md5(key) fall below the
    * fraction's threshold.
    *
    * Why not `df.sample`: its output depends on seed, partitioning, and
    * row order - re-running on a re-partitioned copy of the data picks
    * a different subset. This selection is a pure function of the key,
    * so it is reproducible across runs, engines (anything with md5 can
    * replicate the exact subset), cluster layouts, and incremental
    * loads - the property a training-data pipeline actually needs from
    * a holdout/subsample split. Keys sharing a value are kept or
    * dropped TOGETHER (sample by entity, not by row).
    */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    if (fraction >= 1.0) df
    else {
      // clamp: fraction within 2^-33 of 1.0 passes the >= 1.0 guard but
      // rounds to 0x100000000, whose 9-char hex would compare BELOW most
      // 8-char md5 prefixes and keep ~6% instead of ~100%
      val raw = math.min(math.round(fraction * 0x100000000L), 0xffffffffL)
      val threshold = f"$raw%08x"
      df.filter(md5Prefix(keyCol) < lit(threshold))
    }
  }

  private[graft] def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    // fraction 1.0 must keep EVERYTHING: "g" sorts above every hex char,
    // so md5_prefix < "g" is always true (a clamped "ffffffff" would
    // drop the ~1-in-2^32 keys whose prefix is exactly ffffffff)
    if (fraction >= 1.0) "g"
    else f"${math.min(math.round(fraction * 0x100000000L), 0xffffffffL)}%08x"
  }

  /** Weighted deterministic sampling: each row is kept with probability
    * min(1, fraction * weight) - the quality-weighted subsampling step
    * of a curation pipeline (upweight high-quality documents, thin the
    * low-quality tail) - while staying a pure function of the key:
    * md5-uniform u(key) in [0, 2^32) is compared against the row's own
    * scaled threshold. Reproducible across runs/engines/layouts exactly
    * like [[deterministicSample]]; per-row arithmetic only, no shuffle.
    * A NULL or negative weight keeps nothing (null predicate filters).
    */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      fraction: Double
  ): DataFrame = {
    require(fraction >= 0.0, s"fraction must be non-negative, got $fraction")
    val u = md5U(keyCol)
    // the null check is EXPLICIT because least() IGNORES nulls in both
    // Spark and DuckDB: least(1.0, null) = 1.0 would silently keep
    // every null-weight row at full probability instead of dropping it
    df.filter(
      F.col(weightCol).isNotNull &&
        u < least(lit(1.0), F.col(weightCol) * fraction) * lit(4294967296.0))
  }

  /** Deterministic train/validation/test split assignment: the md5-
    * uniform position of `keyCol` is bucketed by the cumulative split
    * fractions, appending a `split` label column. A pure function of
    * the key - the same document lands in the same split across runs,
    * engines, cluster layouts, and incremental loads, and rows sharing
    * a key travel together (split by entity, never by row, so near-
    * identical copies of a document cannot straddle train/test through
    * the splitter itself). Per-row arithmetic only; no shuffle.
    *
    * `splits` maps label -> fraction; fractions must sum to 1 (1e-9
    * tolerance). The last split absorbs the rounding remainder.
    */
  def assignSplits(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)]
  ): DataFrame = {
    require(splits.nonEmpty, "assignSplits needs at least one split")
    require(splits.forall(_._2 >= 0.0), s"fractions must be non-negative: $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${splits.map(_._2).sum}")
    val prefix = md5Prefix(keyCol)
    // boundaries are clamped into [0,1] (the FP running sum can overshoot
    // 1.0 a hair mid-sequence, which hexThreshold would reject) and the
    // LAST one is forced to exactly 1.0: an FP sum a hair UNDER 1.0 would
    // hexThreshold to "ffffffff" and leave prefix=="ffffffff" keys
    // unlabeled instead of in the catch-all
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.min(c, 1.0)).init :+ 1.0
    // boundaries as hex-string thresholds (hexThreshold(1.0) = "g"
    // sorts above every hex digit, so the last bucket is a catch-all)
    val labeled = splits.zip(cum).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), c)) =>
        val hit = prefix < lit(hexThreshold(c))
        Some(acc.fold(when(hit, name))(_.when(hit, name)))
    }.get
    df.withColumn("split", labeled)
  }

  /** Leakage-safe split assignment: [[assignSplits]], but keyed by each
    * document's duplicate-CLUSTER representative instead of its own id -
    * so near-duplicate documents can never straddle train/test and leak
    * evaluation content into training. This is the step plain
    * id-keyed splitting cannot give you: two near-identical docs have
    * different ids, and a per-id split puts them in different splits
    * ~28% of the time at 80/10/10.
    *
    * `clusters` is the `(id, cluster_id)` frame produced by
    * [[GraphOps.connectedComponents]] over near-dup pairs (it contains
    * only clustered docs); unclustered docs fall back to their own id.
    * The join is doc-vs-vertex-sized; the split itself stays per-row
    * md5 arithmetic - reproducible across engines, layouts, and
    * incremental loads as long as cluster representatives are stable.
    *
    * Output: `(doc_id, rep, split)`.
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      clusters: DataFrame,
      splits: Seq[(String, Double)]
  ): DataFrame = {
    // one row per id BY CONSTRUCTION (deterministic min): a duplicate id
    // in a hand-built clusters frame would otherwise fan the join out
    // and silently DUPLICATE documents in the split assignment. For
    // connectedComponents output (already unique per id) the aggregate
    // is an identity over a vertex-sized frame.
    val oneRep = clusters.groupBy(F.col("id"))
      .agg(F.min(F.col("cluster_id")).as("cluster_id"))
    val withRep = df
      .join(oneRep, df(idCol) === oneRep("id"), "left")
      .select(df(idCol).as("doc_id"),
        coalesce(F.col("cluster_id"), df(idCol)).as("rep"))
    assignSplits(withRep, "rep", splits)
      .select(F.col("doc_id"), F.col("rep"), F.col("split"))
  }

  /** Token-budget (mixture-control) sampling: thin each stratum so its
    * EXPECTED surviving volume is `budgetPerStratum` units of
    * `volumeCol` (tokens, chars, bytes) - the knob a data-mixing pass
    * turns to stop one dominant source/language from swamping the mix.
    * Strata already under budget keep everything; an over-budget
    * stratum keeps each row with probability budget/stratum_volume,
    * decided by the same md5-uniform key function as the rest of the
    * sampling family (reproducible across engines and layouts).
    *
    * Scale shape: one stratum-sized aggregate, broadcast back, then a
    * scan-speed filter - the corpus never shuffles.
    */
  def tokenBudgetSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      volumeCol: String,
      budgetPerStratum: Double
  ): DataFrame = {
    require(budgetPerStratum >= 0.0, s"budget must be non-negative, got $budgetPerStratum")
    require(!df.columns.contains("gr_stratum"),
      "input already has a gr_stratum column; rename it before sampling")
    val totals = df.groupBy(F.col(strataCol).as("gr_stratum"))
      .agg(sum(F.col(volumeCol)).cast(DoubleType).as("stratum_volume"))
    val u = md5U(keyCol)
    // null-SAFE join: a NULL stratum (e.g. undetected language) is a
    // stratum like any other and gets the same budget - a plain equi-join
    // would silently drop every NULL-stratum row from the sample
    df.join(broadcast(totals), F.col(strataCol) <=> F.col("gr_stratum"))
      .filter(u < least(lit(1.0), lit(budgetPerStratum) / F.col("stratum_volume"))
        * lit(4294967296.0))
      .drop("gr_stratum", "stratum_volume")
  }

  /** Temperature-scaled source rebalancing - the multilingual-mix
    * sampler (Conneau/Lample's T-scaling: sampling probability
    * p_s ∝ n_s^(1/T) flattens the source distribution as T grows,
    * so low-resource strata stop drowning under the head): each
    * stratum keeps fraction min(1, totalBudget · p_s / n_s) of its
    * volume, selected by the family's md5 threshold - reproducible
    * across runs, engines, and partitionings. T = 1 is proportional
    * sampling (every stratum keeps the same fraction); T → ∞
    * approaches uniform-per-stratum budgets.
    *
    * One stratum-sized aggregate + one single-row normalizer, both
    * broadcast back onto a scan-speed filter: the corpus never
    * shuffles. NULL strata count as a stratum (null-safe join, same
    * rule as [[tokenBudgetSample]]).
    */
  def temperatureMix(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      volumeCol: String,
      totalBudget: Double,
      temperature: Double
  ): DataFrame = {
    require(totalBudget >= 0.0, s"budget must be non-negative, got $totalBudget")
    require(temperature > 0.0, s"temperature must be positive, got $temperature")
    require(!df.columns.exists(Set("gr_stratum", "gr_n", "gr_p", "gr_z", "gr_keep")),
      "input already has a gr_stratum/gr_n/gr_p/gr_z/gr_keep column; rename it first")
    val totals = df.groupBy(F.col(strataCol).as("gr_stratum"))
      .agg(sum(F.col(volumeCol)).cast(DoubleType).as("gr_n"))
      .withColumn("gr_p", F.pow(F.col("gr_n"), lit(1.0 / temperature)))
    // DECIMAL sum: the normalizer must be aggregation-order exact or
    // boundary keys flip between runs/engines
    val z = totals.agg(
      sum(F.col("gr_p").cast(DecimalType(38, 18))).cast(DoubleType).as("gr_z"))
    val fracs = totals.crossJoin(broadcast(z))
      .select(F.col("gr_stratum"),
        least(lit(1.0), lit(totalBudget) * F.col("gr_p") / F.col("gr_z") / F.col("gr_n"))
          .as("gr_keep"))
    df.join(broadcast(fracs), F.col(strataCol) <=> F.col("gr_stratum"))
      .filter(md5U(keyCol) < F.col("gr_keep") * lit(4294967296.0))
      .drop("gr_stratum", "gr_keep")
  }

  /** Per-stratum deterministic sampling: each stratum value gets its own
    * keep-fraction (e.g. downsample boilerplate-heavy sources hard,
    * keep rare ones whole); strata absent from `fractions` get
    * `defaultFraction`. The same md5-threshold selection as
    * [[deterministicSample]], so within a stratum the choice is still a
    * pure, engine-independent function of the key - rebalancing a
    * training mix stays reproducible under reruns, repartitioning, and
    * incremental loads. A single codegen'd CASE chain over the stratum
    * column: scan-speed, no shuffle, no per-stratum passes.
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0
  ): DataFrame = {
    val s = F.col(strataCol).cast(StringType)
    val thr = fractions.toSeq.sortBy(_._1).foldRight(
      lit(hexThreshold(defaultFraction))) { case ((value, fraction), elseCol) =>
      when(s === value, lit(hexThreshold(fraction))).otherwise(elseCol)
    }
    df.filter(md5Prefix(keyCol) < thr)
  }

  /** EXACTLY min(k, |stratum|) rows per stratum, deterministically: rank
    * within each stratum by the md5 of the key (tiebreak the key) and
    * keep the top k - the "exactly 1000 docs per language" eval-set
    * construction that fraction-based sampling can only approximate.
    * Like every sampler in this family the selection is a pure function
    * of (key, stratum): reproducible across runs, engines, layouts, and
    * incremental loads (a new row displaces the previous rank-k row,
    * never reshuffles the rest).
    *
    * Scale shape: one shuffle clustered on the stratum, per-stratum
    * window rank - parallel across strata; a single giant stratum is
    * bounded by its own size, same as any per-group top-k.
    */
  def exactKPerStratum(df: DataFrame, keyCol: String, strataCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(F.col(strataCol))
      .orderBy(md5Prefix(keyCol), F.col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(F.col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic mixture interleaving: one global training-stream
    * order whose every prefix tracks the requested source proportions.
    * Each stratum's rows are md5-ranked (an epoch shuffle within the
    * stratum), then row rk of a stratum with weight w is scheduled at
    * target time (rk - 0.5) / w - the classic stride-scheduling rule:
    * a weight-0.5 source fires every 2 ticks, a weight-0.1 source
    * every 10 - and the final position is the global rank of that
    * target ([[graft.ops.ShardOps.globalOrderIndex]]: range partition,
    * no single-partition funnel). Strata absent from `weights` are
    * dropped; a weights KEY matching no stratum raises at first action
    * (keys compare against the column's string rendering).
    *
    * This is what "shuffle then hope" cannot give you: a 60/25/15
    * mixture holds at every checkpoint boundary, not just in
    * expectation over the whole epoch, and re-runs reproduce the exact
    * order on any cluster layout.
    *
    * Output: input columns + `position` (0-based global order).
    */
  def interleaveBySources(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      weights: Map[String, Double]
  ): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    import org.apache.spark.sql.expressions.Window
    val s = F.col(strataCol).cast(StringType)
    val inMix = weights.keys.toSeq.sorted
    val wCol = inMix.foldRight(lit(Double.NaN)) { case (value, elseCol) =>
      when(s === value, lit(weights(value))).otherwise(elseCol)
    }
    val rkWin = Window.partitionBy(F.col(strataCol))
      .orderBy(md5Prefix(keyCol), F.col(keyCol))
    val targeted = df.filter(s.isin(inMix: _*))
      .withColumn("__rk", row_number().over(rkWin))
      .withColumn("__target", (F.col("__rk") - lit(0.5)) / wCol)
    val ordered = graft.ops.ShardOps.globalOrderIndex(targeted,
        Seq(F.col("__target"), F.col(strataCol), F.col(keyCol)))
      .drop("__rk", "__target")
    // a weights key that matches NO stratum (typo, or a numeric column
    // rendering "1" where the caller wrote "1.0") must be an ERROR, not
    // a silently thinner - or empty - mixture. The check rides the plan
    // as a one-row broadcast guard (assert_true over an anti-join of
    // the keys against the distinct strata renderings), so construction
    // stays job-free and the error surfaces on first action. Cost: one
    // extra single-column scan (map-side combined to the stratum set)
    // per action of the result - accepted; the alternative, an eager
    // validation job here, would break lazy plan construction.
    val spark = df.sparkSession
    import spark.implicits._
    val missing = inMix.toDF("__k")
      .join(df.select(s.as("__k")).distinct(), Seq("__k"), "left_anti")
    val guard = broadcast(missing.agg(
      assert_true(count(lit(1)) === 0,
        concat(lit("interleaveBySources: weights key(s) matching no stratum: "),
          concat_ws(",", sort_array(collect_list(F.col("__k")))),
          lit(" - keys must equal the column's STRING rendering"))).as("__guard")))
    // the assert must flow through a FILTER, not a dropped projection:
    // column pruning would elide an unused assert_true column, silently
    // disarming the check (assert_true yields null when it passes, so
    // the isNull predicate keeps every row)
    ordered.crossJoin(guard).filter(F.col("__guard").isNull).drop("__guard")
  }
}
