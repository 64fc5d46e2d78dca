package graft.ptree

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Fuzzy (Levenshtein) trie search.
  *
  * Spark-native equivalent of `QueryThorLevenshtein` / `QueryRoxieLevenshtein`
  * (/root/reference/PrefixTree.ecl:314-446, 459-588), with two physical modes
  * mirroring the reference's Thor/Roxie split:
  *
  *   - '''broadcast mode''' (default when the trie fits): the trie is
  *     collected once into a `Map[parentId -> children]`, broadcast, and a
  *     SINGLE `mapPartitions` over the query dataset runs the whole pruned
  *     traversal per query (Kernels.search). Zero per-iteration Spark jobs,
  *     zero shuffles - the honest analog of Roxie's indexed point lookups
  *     (ecl:655), and the fast path at any query-set size. A distinct-word
  *     dictionary trie is tiny relative to a 100 TB corpus (dedup happens at
  *     build), so this covers most real corpora.
  *
  *   - '''join mode''' (tries larger than executor memory): the literal
  *     iterate-to-fixpoint of the reference's LOOP (ecl:430-442) as a
  *     driver-side loop of inner joins `frontier.node_id = trie.parent_id`
  *     with the same two prune predicates attached (branch-and-bound on the
  *     DP row-min, ecl:434; subtree length window, ecl:440-441 - kept
  *     separate per the author's double-count warning, SURVEY.md B.q3).
  *     Rows reaching an end-cap exit the loop into the result (ECL LOOP
  *     emission semantics, ecl:431). `localCheckpoint` truncates lineage
  *     each iteration so plans don't grow with trie depth.
  */
object Query {

  /** Output schema: the reference's Thor projection (ecl:445) -
    * (query_string, node = matched word, final_distance) - plus
    * `n_occurrences`, the matched word's corpus multiplicity (the
    * reference expresses multiplicity as repeated end-cap rows,
    * ecl:205-208; callers wanting that shape filter/explode on the
    * count, callers wanting dedup semantics just drop the column).
    */
  def queryBatch(
      queries: DataFrame,
      col: String,
      trie: Dataset[PTNode],
      maxDist: Int,
      broadcastThresholdBytes: Long = 512L * 1024 * 1024
  ): DataFrame = {
    // persist across the mode decision: the sizing agg + collect()/join
    // would otherwise run trie construction twice. Both modes consume the
    // trie eagerly (collect, or the checkpointing loop), so unpersisting
    // on return is safe.
    val t = trie.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (estimatedIndexBytes(t) <= broadcastThresholdBytes)
        queryBroadcast(queries, col, t, maxDist)
      else queryJoin(queries, col, t, maxDist)
    } finally t.unpersist()
  }

  /** Estimated JVM heap for the collected children index
    * (`Map[parent_id -> Array[PTNode]]`) - the quantity the broadcast
    * decision must bound. A row COUNT is the wrong guard: 20M nodes with
    * 8-char edges is ~3 GB, with 200-char document-shard payloads it is
    * ~10 GB, and both the driver (one copy at collect + one serialized in
    * the broadcast) and EVERY executor (a full deserialized copy each on
    * a 1000-node cluster) pay it. Model: per node, the PTNode object
    * (header 16 + 3 longs + 3 ints + bool + padding + String ref ≈ 72 B)
    * plus its slot in a children array and amortized map-entry overhead
    * (≈ 56 B) → 128 B fixed, plus the String payload at 2 B/char (UTF-16
    * worst case; compact strings halve it for ASCII). One single-pass agg
    * over the (persisted) trie - same cost as the count() it replaces.
    * The 512 MB default leaves a multi-GB driver comfortable: ~2 copies
    * driver-side during collect+broadcast plus serialization scratch.
    */
  private[ptree] def estimatedIndexBytes(trie: Dataset[PTNode]): Long = {
    val r = trie.toDF()
      .agg(count(lit(1)), coalesce(sum(length(column("node"))), lit(0L)))
      .head()
    r.getLong(0) * 128L + 2L * r.getLong(1)
  }

  /** Best-`k` matches per query within `maxDist`: the reference's
    * fixed-threshold query composed with a rank window - composition,
    * not a new physical operator, because `Window` + `row_number`
    * already express the semantics (and Catalyst pushes the rank limit
    * into a per-partition top-k). Ties break by (distance, node) so the
    * result is deterministic and oracle-comparable.
    */
  def fuzzyTopK(
      queries: DataFrame,
      col: String,
      trie: Dataset[PTNode],
      maxDist: Int,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_string")
      .orderBy(column("final_distance").asc, column("node").asc)
    // distinct first: a duplicated query string would rank its duplicated
    // match rows into adjacent slots and silently push genuine
    // runners-up past k ("best k per distinct query" is the semantics)
    queryBatch(queries.select(column(col)).distinct(), col, trie, maxDist)
      .withColumn("rank", row_number().over(w))
      .filter(column("rank") <= k)
      .select(
        column("query_string"),
        column("node"),
        column("final_distance").cast(IntegerType).as("final_distance"),
        column("rank").cast(IntegerType).as("rank"))
  }

  /** Single-string query (reference's Roxie macro, ecl:459-588): pure
    * driver-side traversal over a prebuilt children index - no Spark jobs
    * at all once the index is built (see [[childrenIndex]]).
    */
  def queryOne(
      query: String,
      children: Map[Long, Array[PTNode]],
      maxDist: Int
  ): Seq[(String, Int)] =
    Kernels.search(query, maxDist, children.getOrElse(_, null)).toSeq

  /** Collect a trie into the serving-side index: parent_id -> children. */
  def childrenIndex(trie: Dataset[PTNode]): Map[Long, Array[PTNode]] =
    trie.collect().groupBy(_.parent_id)

  /** Serving-side autocomplete: all dictionary words extending `prefix`,
    * with their corpus multiplicity, by O(|prefix| + |answer|) trie
    * descent over the collected children index (Kernels.prefixSearch) -
    * no Spark jobs. The batch-shaped equivalent is an honest codegen'd
    * scan: `trie.filter(_.is_word).filter(startswith(col("node"),
    * lit(prefix)))` - at batch granularity Spark's scan beats pointer
    * chasing, so the trie descent is reserved for the serving path where
    * per-call latency matters.
    */
  def prefixOne(
      prefix: String,
      children: Map[Long, Array[PTNode]]
  ): Seq[(String, Long)] =
    Kernels.prefixSearch(prefix, children.getOrElse(_, null)).toSeq

  def queryBroadcast(
      queries: DataFrame,
      col: String,
      trie: Dataset[PTNode],
      maxDist: Int,
      visitCounter: Option[org.apache.spark.util.LongAccumulator] = None,
      cellCounter: Option[org.apache.spark.util.LongAccumulator] = None
  ): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val index = childrenIndex(trie)
    val bc = spark.sparkContext.broadcast(index)
    queries
      .select(column(col).cast(StringType).as("query_string"))
      // spread the query set over every core: the input's file partitioning
      // (often 1 block) would otherwise serialize the whole batch
      .repartition(spark.sparkContext.defaultParallelism)
      .as[String]
      .mapPartitions { it =>
        val idx = bc.value
        val lookup: Long => Array[PTNode] = idx.getOrElse(_, null)
        it.flatMap { q =>
          val (hits, stats) = Kernels.searchCounted(q, maxDist, lookup)
          visitCounter.foreach(_.add(stats.nodes))
          cellCounter.foreach(_.add(stats.cells))
          hits.map { case (w, d, c) => (q, w, d, c) }
        }
      }
      .toDF("query_string", "node", "final_distance", "n_occurrences")
  }

  /** One frontier-expansion step of the join-mode loop: inner join
    * `frontier.node_id = trie.parent_id` with the branch-and-bound and
    * length-window prunes attached (reference ecl:434, 440-441).
    * `private[ptree]` so the plan spec can assert the 100 TB property
    * directly: with the trie pre-partitioned on parent_id, this join
    * must shuffle ONLY the frontier side.
    */
  private[ptree] def frontierJoin(frontier: DataFrame, t: DataFrame, maxDist: Int): DataFrame =
    frontier.join(
      t,
      frontier("node_id") === t("parent_id") &&
        element_at(frontier("state"), -1) <= lit(maxDist) &&
        length(frontier("query_string")) <= t("_max") + lit(maxDist) &&
        length(frontier("query_string")) >= t("_min") - lit(maxDist),
      "inner"
    )

  /** @param withPath thread the reference's `cumulative_nodes` debug
    *   column (ecl:405-406, 424-425) through the loop: the concatenation
    *   of edge labels consumed so far, emitted as `path` on every result
    *   row. For an end-cap emission the parent path spells exactly the
    *   matched word (`path == node` - spec'd), which is the traversal-
    *   debugging property the reference kept the column for. Off by
    *   default: it widens every frontier shuffle row by the path length.
    */
  def queryJoin(
      queries: DataFrame,
      col: String,
      trie: Dataset[PTNode],
      maxDist: Int,
      withPath: Boolean = false
  ): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._

    // DP state = row ++ [rowMin]; element_at(state, len(q)+1) is the exact
    // distance cell, state[last] the branch-and-bound lower bound - same
    // packing idea as the reference's byte-string state (ecl:332-372) but
    // as a native array<int> column.
    // `depth` (trie chars consumed) is threaded as its own column: the
    // banded DP saturates row(0) at maxDist+1, so the all-insertions cell
    // can no longer double as the consumed counter. The DP step itself is
    // a native codegen expression (graft.functions.PtLevExtend), not a UDF.
    def extend(q: Column, e: Column, s: Column, d: Column): Column =
      graft.functions.GraftFunctions.pt_lev_extend(q, e, s, d, maxDist)

    // Trie side: pre-partition ONCE by parent_id and cache - every loop
    // iteration reuses the same exchange instead of re-shuffling 100 TB of
    // trie. Only the (shrinking) frontier moves per iteration.
    val parts = spark.sessionState.conf.numShufflePartitions
    val t = trie.toDF().repartition(parts, $"parent_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the cache BEFORE the first join plans against it: an
    // unexecuted AQE cache plan reports UnknownPartitioning, and the
    // first iteration would then defensively re-shuffle the whole trie
    // (PrefixTreeSpec's per-iteration plan test pins this down)
    t.count()

    val frontier0 = queries
      .select(column(col).cast(StringType).as("query_string"))
      .withColumn("node_id", lit(0L))
      .withColumn(
        "state",
        concat(sequence(lit(0), length($"query_string")), array(lit(0)))
      )
      .withColumn("depth", lit(0))
    var frontier =
      (if (withPath) frontier0.withColumn("path", lit("")) else frontier0)
        .localCheckpoint()

    // each iteration's emissions are checkpointed once and unioned at the
    // end - re-checkpointing a growing union would rematerialize all
    // prior results every iteration (O(depth^2))
    var emitted: List[DataFrame] = Nil
    var nFrontier = frontier.count()
    try {
    while (nFrontier > 0) {
      // ONE join execution + ONE materialization per iteration: project
      // down to the surviving columns, advance the DP for non-end-caps,
      // filter both branch conditions, THEN checkpoint - emitted rows and
      // the next frontier are cheap filters over the cached result.
      // (Checkpointing the raw full-width join was measured slower than
      // running the join per branch; the projected+filtered form is
      // narrower than either.)
      val surviveCols = Seq(
        $"query_string",
        $"is_word",
        $"node",
        $"n_occurrences",
        t("id").as("next_id"),
        // end-caps exit the loop into the result set (ecl:431): the exact
        // distance is the parent row's cell [len(q)], computed WITHOUT
        // advancing the DP (end-caps carry the full word, not an edge)
        element_at($"state", length($"query_string") + 1).as("final_distance"),
        when(!$"is_word", extend($"query_string", $"node", $"state", $"depth"))
          .as("state2"),
        $"depth"
      ) ++ (if (withPath) Seq($"path") else Nil)
      val step = frontierJoin(frontier, t, maxDist)
        .select(surviveCols: _*)
        .filter(
          ($"is_word" && $"final_distance" <= lit(maxDist)) ||
            (!$"is_word" && element_at($"state2", -1) <= lit(maxDist)))
        .localCheckpoint()

      // ONE control-flow job per iteration: both branch counts from the
      // cached step (separate isEmpty probes would each schedule a job)
      val cnts = step.agg(
        count(when($"is_word", 1)).as("n_emit"),
        count(when(!$"is_word", 1)).as("n_frontier")).head()
      nFrontier = cnts.getLong(1)

      val emitCols = Seq(
        $"query_string", $"node", $"final_distance", $"n_occurrences"
      ) ++ (if (withPath) Seq($"path") else Nil)
      if (cnts.getLong(0) > 0) emitted ::= step.filter($"is_word").select(emitCols: _*)

      val stepCols = Seq(
        $"query_string",
        $"next_id".as("node_id"),
        $"state2".as("state"),
        ($"depth" + length($"node")).cast(IntegerType).as("depth")
      ) ++ (if (withPath) Seq(concat($"path", $"node").as("path")) else Nil)
      frontier = step.filter(!$"is_word").select(stepCols: _*)
    }
    // finally (not success-path only): an exception mid-loop must not
    // leak the cached trie partitioning
    } finally t.unpersist()
    if (emitted.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("query_string", StringType),
          StructField("node", StringType),
          StructField("final_distance", IntegerType),
          StructField("n_occurrences", LongType)
        ) ++ (if (withPath) Seq(StructField("path", StringType)) else Nil))
      )
    else
      emitted.reduce(_ union _)
        .withColumn("final_distance", $"final_distance".cast(IntegerType))
  }
}
