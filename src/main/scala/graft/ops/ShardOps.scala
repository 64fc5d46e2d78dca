package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Corpus sharding for training pipelines: assign every document a
  * GLOBAL position in a deterministic order, then derive training-order
  * shuffles and size-balanced shard assignments from it.
  *
  * The core primitive is [[globalOrderIndex]]: a total order over the
  * whole corpus realized WITHOUT a single-partition window (the
  * `row_number() OVER (ORDER BY ...)` plan funnels 100 TB through one
  * task). Instead: range-repartition on the sort key (Spark samples key
  * quantiles, so partitions are balanced), sort within partitions, then
  * a two-phase index - count rows per partition (a partition-count-sized
  * driver array), prefix-sum the offsets, and add each partition's
  * offset to its local index. Identical semantics to the window plan,
  * but every stage is data-parallel.
  */
object ShardOps {

  /** `df` plus a `position` column (0-based long): the row's rank in the
    * total order defined by `sortExprs` (which must be a strict total
    * order - include a unique tiebreaker column).
    *
    * Implementation is `RDD.zipWithIndex` over the range-partitioned,
    * partition-sorted frame: the one genuinely per-partition-imperative
    * step (local index + broadcast offset), exactly what zipWithIndex
    * does in one extra count job. Rows keep their partition-local sort
    * order, so position == global rank.
    */
  def globalOrderIndex(df: DataFrame, sortExprs: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortExprs: _*).sortWithinPartitions(sortExprs: _*)
    val schema = StructType(sorted.schema.fields :+ StructField("position", LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(indexed, schema)
  }

  /** Global running total of `valueCol` under the total order
    * `sortExprs` - WITHOUT the single-partition window funnel: the
    * classic distributed prefix sum. Range-partition on the sort key,
    * cumulative-sum WITHIN each partition in parallel, then add each
    * partition's offset (the sum of all earlier partitions' totals,
    * computed on a #partitions-row frame and broadcast back).
    *
    * `sortExprs` MUST define a TOTAL order (include a unique tiebreak
    * column): with ties, range partitioning may split a peer group
    * across partitions and the per-partition window would disagree
    * with a global one (SQL window SUM includes all peers of the
    * current row). Under a total order, ROWS and RANGE frames
    * coincide and any boundary placement gives the same result.
    *
    * Output: input columns + `running_total` (inclusive of the current
    * row).
    */
  def runningTotal(
      df: DataFrame,
      sortExprs: Seq[Column],
      valueCol: String,
      checkpoint: Boolean = true
  ): DataFrame = {
    require(sortExprs.nonEmpty, "need at least one sort expression")
    require(!df.columns.exists(Set("gr_pid", "gr_local", "gr_tot", "gr_off")),
      "input already has a gr_pid/gr_local/gr_tot/gr_off column; rename it first")
    // the OUTPUT name gets the same guard: silently replacing an existing
    // running_total (e.g. re-cumulating after a filter) is exactly the
    // misalignment class the gr_* check exists to prevent
    require(!df.columns.contains("running_total"),
      "input already has a running_total column; rename or drop it first")
    import org.apache.spark.sql.expressions.Window
    val parted = df.repartitionByRange(sortExprs: _*)
      .withColumn("gr_pid", F.spark_partition_id())
    val local0 = parted.withColumn("gr_local",
      sum(F.col(valueCol)).over(
        Window.partitionBy(F.col("gr_pid")).orderBy(sortExprs: _*)))
    // checkpoint=false keeps the whole plan lazy - for PLAN INSPECTION
    // only. The default materializes once because the offsets aggregate
    // and the final join must observe the SAME range boundaries and
    // partition ids: two independent evaluations of a repartitionByRange
    // may sample different boundaries (the sampler seeds off the RDD
    // id), and only exchange reuse - an optimization, not a contract -
    // would keep the lazy branches consistent.
    val local = if (checkpoint) local0.localCheckpoint() else local0
    // offsets: #partitions rows - the one place a single-partition
    // window is CORRECT (the frame is partition-count-sized, not
    // corpus-sized)
    val offsets = local.groupBy(F.col("gr_pid"))
      .agg(sum(F.col(valueCol)).as("gr_tot"))
      .withColumn("gr_off",
        coalesce(
          sum(F.col("gr_tot")).over(
            Window.orderBy(F.col("gr_pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(F.col("gr_pid"), F.col("gr_off"))
    local.join(broadcast(offsets), "gr_pid")
      .withColumn("running_total", F.col("gr_local") + F.col("gr_off"))
      .drop("gr_pid", "gr_local")
  }

  /** Deterministic epoch shuffle: the training-order permutation for
    * epoch `epoch`, as a pure function of (key, epoch) - md5 over the
    * salted key, then [[globalOrderIndex]] over the hash. Reproducible
    * across runs, cluster layouts, and engines (anything with md5
    * derives the same order), and each epoch is an independent
    * permutation - the property `df.orderBy(rand(seed))` does NOT give
    * you (rand is partitioning-dependent).
    *
    * Output: input columns + `shuffle_key` (md5 hex) + `position`.
    */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Int): DataFrame =
    globalOrderIndex(
      df.withColumn(
        "shuffle_key",
        md5(concat(lit(s"epoch$epoch:"), F.col(keyCol).cast(StringType)))),
      // md5 collisions don't occur, but the order must be total by
      // construction, not by assumption: tiebreak on the key itself
      Seq(F.col("shuffle_key"), F.col(keyCol))
    )

  /** Size-balanced shard assignment: rank documents by `sizeCol`
    * descending (tiebreak `idCol`) and deal them round-robin into
    * `numShards` shards - the classic round-robin-by-size-rank heuristic
    * that keeps every shard within one document of the same cardinality
    * AND closely matched on total size (neighbors in the size order land
    * in different shards). One global rank ([[globalOrderIndex]], no
    * single-partition funnel) + a modulo; no shuffle beyond the range
    * partition.
    *
    * Output: input columns + `position` + `shard` (0-based int).
    */
  def balancedShards(df: DataFrame, sizeCol: String, idCol: String, numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    globalOrderIndex(df, Seq(F.col(sizeCol).desc, F.col(idCol)))
      .withColumn("shard", (F.col("position") % numShards).cast(IntegerType))
  }

  /** Per-shard release manifest - the dataset-card / integrity step of
    * publishing a corpus version: for each shard, the document count,
    * byte volume, id range, and an ORDER-INDEPENDENT 64-bit content
    * hash (XOR of per-document md5-derived hashes over id AND text, so
    * any engine, any partitioning, and any row order produce the same
    * fingerprint; changing, adding, or dropping a single document
    * flips it). Two corpus versions diff by comparing manifest rows -
    * shards-count rows, not corpora.
    *
    * One map-side-combined aggregation; XOR is commutative/associative
    * so partial aggregation applies like any sum.
    *
    * Output: (shardCol, n_docs, total_chars, min_id, max_id,
    * content_hash).
    */
  def shardManifest(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shardCol: String
  ): DataFrame = {
    val docHash = F.conv(substring(
        md5(concat_ws(":", F.col(idCol).cast(StringType), F.col(textCol))), 1, 15),
      16, 10).cast(LongType)
    df.filter(F.col(textCol).isNotNull)
      .select(F.col(shardCol), F.col(idCol), F.col(textCol), docHash.as("h"))
      .groupBy(F.col(shardCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(F.col(textCol))).as("total_chars"),
        min(F.col(idCol)).as("min_id"),
        max(F.col(idCol)).as("max_id"),
        F.expr("bit_xor(h)").as("content_hash"))
  }

  /** Length-bucketed batching: consecutive runs of `batchSize`
    * length-sorted documents form one batch, so every batch holds
    * near-equal-length sequences and the padded-token waste
    * (batch_max x batch_size - sum of lengths, the tokens a trainer
    * pads and throws away) collapses versus random batching. The sort
    * is [[globalOrderIndex]] - range partition + per-partition
    * offsets, never a single-partition window - and the output is the
    * batch-level summary (batch count = N / batchSize rows, not
    * corpus-sized).
    *
    * Output: (batch_id, n_docs, min_len, max_len, sum_len,
    * padding_waste), fully deterministic ((length, id) total order).
    */
  def lengthBucketedBatches(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      batchSize: Int
  ): DataFrame = {
    require(batchSize >= 1, s"batchSize must be positive, got $batchSize")
    globalOrderIndex(df.filter(F.col(lenCol).isNotNull),
        Seq(F.col(lenCol), F.col(idCol)))
      .withColumn("batch_id", F.expr(s"position DIV $batchSize"))
      .groupBy("batch_id")
      .agg(
        count(lit(1)).as("n_docs"),
        min(F.col(lenCol)).as("min_len"),
        max(F.col(lenCol)).as("max_len"),
        sum(F.col(lenCol)).as("sum_len"))
      .withColumn("padding_waste",
        F.col("max_len") * F.col("n_docs") - F.col("sum_len"))
  }

  /** Spread the low 16 bits of `x` onto the even bit positions of a
    * 32-bit value (the classic magic-mask interleave ladder) - pure
    * built-in bitwise ops, so it codegens inside the scan stage and
    * replays in any engine with `& | <<`.
    */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton (Z-order) value of two dimension columns: bit-interleaves
    * the low 16 bits of each (callers bucket wider domains first - see
    * [[graft.sources.Sinks.zOrderWrite]], which range-buckets via
    * min/max stats). Sorting/partitioning by `z_value` clusters rows so
    * that every run of the file is narrow in BOTH dimensions at once -
    * the property that makes parquet min/max pruning effective for
    * rectangle predicates on either or both columns, where a plain sort
    * clusters only its leading column. Inputs are masked to 16 bits
    * (`x & 0xFFFF`), so callers own the reduction to that domain.
    */
  def zValue(a: Column, b: Column): Column =
    spread16(a.cast(LongType))
      .bitwiseOR(shiftleft(spread16(b.cast(LongType)), 1))
}
