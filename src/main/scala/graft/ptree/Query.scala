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

  // -------------------------------------------------------------------
  // trie sizing: computed ONCE per trie, never per query call
  // -------------------------------------------------------------------

  /** Session-lifetime stats cache, keyed on the trie's analyzed-plan
    * semantic hash: a trie READ back from a persisted index
    * ([[PrefixTree.read]] / [[PrefixTree.readTable]]) registers its
    * sidecar/table-property stats here, and a trie built in-session
    * computes them at most once - so [[queryJoin]]'s strategy selection
    * costs ZERO extra jobs on the paths that used to pay a per-call
    * sizing aggregate (the round-12 pt_* bench regressions). Entries
    * are 4 numbers each; staleness (same plan, changed underlying
    * files) only mis-sizes a strategy choice - [[queryJoin]]'s phase-2
    * loop makes any chain-height guess correct.
    */
  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[Int, TrieStats]()

  private def cacheKey(trie: Dataset[PTNode]): Int =
    trie.queryExecution.analyzed.semanticHash()

  /** Register externally-known stats (a persisted index's sidecar) for
    * a trie plan. Called by [[PrefixTree.read]]/[[PrefixTree.readTable]].
    */
  private[ptree] def registerStats(trie: Dataset[PTNode], st: TrieStats): Unit =
    statsCache.put(cacheKey(trie), st)

  /** The trie's [[TrieStats]]: cache hit, or ONE single-pass aggregate
    * (count, total edge chars, longest word, shortest root edge)
    * computed and cached. On a trie the caller just persisted, the agg
    * doubles as the cache materialization - no wasted pass either way.
    */
  def trieStats(trie: Dataset[PTNode]): TrieStats = {
    val k = cacheKey(trie)
    val hit = statsCache.get(k)
    if (hit != null) hit
    else {
      val st = computeTrieStats(trie)
      statsCache.put(k, st)
      st
    }
  }

  /** The uncached one-pass stats aggregate. [[PrefixTree.writeIndexed]]
    * runs this over the just-written files (a cheap columnar scan) to
    * build the sidecar.
    */
  private[ptree] def computeTrieStats(trie: Dataset[PTNode]): TrieStats = {
    val r = trie.toDF().agg(
      count(lit(1)),
      coalesce(sum(length(column("node"))), lit(0L)),
      max(when(column("is_word"), length(column("node")))),
      min(when(!column("is_word") && column("parent_id") === 0L,
        length(column("node"))))).head()
    val maxWord = if (r.isNullAt(2)) 0 else r.getInt(2)
    val minTop = if (r.isNullAt(3)) math.max(maxWord, 1) else r.getInt(3)
    TrieStats(r.getLong(0), r.getLong(1), maxWord, minTop)
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
    * worst case; compact strings halve it for ASCII). Served from
    * [[trieStats]] - a persisted index answers with no job at all.
    * The 512 MB default leaves a multi-GB driver comfortable: ~2 copies
    * driver-side during collect+broadcast plus serialization scratch.
    */
  private[ptree] def estimatedIndexBytes(trie: Dataset[PTNode]): Long = {
    val st = trieStats(trie)
    st.nodes * 128L + 2L * st.chars
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
    *
    * The frontier must carry `qlen` = length(query_string), computed
    * ONCE at frontier construction: the window prune evaluates per
    * candidate pair per level, and re-deriving the length there would
    * re-walk the query string hChain x fan-out times per row.
    */
  private[ptree] def frontierJoin(frontier: DataFrame, t: DataFrame, maxDist: Int): DataFrame =
    frontier.join(
      t,
      frontier("node_id") === t("parent_id") &&
        // null state = a settled (done) row riding the phase-1 chain via
        // its sentinel key; genuine frontier rows always carry state
        (frontier("state").isNull ||
          element_at(frontier("state"), -1) <= lit(maxDist)) &&
        frontier("qlen") <= t("_max") + lit(maxDist) &&
        frontier("qlen") >= t("_min") - lit(maxDist),
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
    // 64 SENTINEL rows (negative ids, parent_id = id) are appended for the
    // phase-1 chain: rows that have already produced their result keep
    // flowing through subsequent joins by matching a sentinel (spread over
    // 64 keys by query hash so the done-stream is not one hot partition).
    // The sentinels' window bounds are maximal and they are not words, so
    // they can never affect a genuine traversal row.
    val dbgT = sys.env.contains("GRAFT_DEBUG_TIMING")
    var dbg0 = System.nanoTime()
    def dbg(tag: String): Unit = if (dbgT) {
      System.err.println(f"[queryJoin] $tag: ${(System.nanoTime() - dbg0) / 1e6}%.0f ms")
      dbg0 = System.nanoTime()
    }
    val parts = spark.sessionState.conf.numShufflePartitions
    val sentinels = spark.range(1, 65).select(
      (-$"id").as("id"), (-$"id").as("parent_id"),
      lit(1 << 29).as("_max"), lit(0).as("_min"),
      lit(false).as("is_word"), lit(0).as("compute_node"),
      lit("").as("node"), lit(0L).as("n_occurrences"))
    // SIZE the trie cache's partition count by bytes, not by the session
    // shuffle-partition default: every chain level (and loop iteration)
    // runs one join task per cached trie partition, so a megabyte-scale
    // dictionary trie sliced into 32 partitions pays ~32x the task-
    // scheduling it needs, while a TB-scale trie gets as many partitions
    // as the session allows. 32 MB per partition keeps a partition's
    // build side comfortably in a task's memory.
    val ownCache = trie.storageLevel == StorageLevel.NONE
    val tIn = if (ownCache) trie.persist(StorageLevel.MEMORY_AND_DISK) else trie
    // sizing AND height come from trieStats - a cache hit (persisted
    // index sidecar, or any earlier query over the same trie plan) costs
    // zero jobs here; a miss runs the one-pass aggregate exactly once
    // per trie per session instead of once per queryJoin call
    val st = trieStats(tIn)
    val trieBytes = st.nodes * 48L + 2L * st.chars
    val partsT = math.max(1L, math.min(parts.toLong, trieBytes / (32L * 1024 * 1024) + 1)).toInt
    val maxWord = st.maxWordLen
    val minTop = st.minTopEdge
    val hChain = math.min(1 + math.max(0, maxWord - minTop) + 1, 24)
    // physical strategy for the chain levels: a trie that fits a task's
    // memory comfortably joins as a BROADCAST hash join - all hChain
    // levels then fuse into ONE shuffle-free codegen'd stage at the full
    // parallelism of the query set, and ReuseExchange ships the (single)
    // broadcast once. Bigger tries use the partitioned join, where only
    // the frontier shuffles per level. Same algebra either way - this is
    // strategy selection, exactly what Catalyst does for any other join.
    val useBcast = trieBytes <= 64L * 1024 * 1024
    dbg(s"trie sizing (partsT=$partsT, bcast=$useBcast, h=$hChain)")
    val t = tIn.toDF().unionByName(sentinels).repartition(partsT, $"parent_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the cache BEFORE the first partitioned join plans
    // against it: an unexecuted AQE cache plan reports UnknownPartitioning
    // and the first level would defensively re-shuffle the whole trie
    // (PrefixTreeSpec pins this down). The broadcast path doesn't consult
    // partitioning, so there the chain's own job populates the cache.
    if (!useBcast) { t.count(); dbg("cache materialize") }

    val frontier0 = queries
      .select(column(col).cast(StringType).as("query_string"))
      // computed ONCE here; frontierJoin's length-window prune reads it
      // per candidate pair per level (see frontierJoin's contract)
      .withColumn("qlen", length($"query_string"))
      // root key 0 as a NON-FOLDABLE expression, deliberately: a literal
      // node_id would be constant-propagated into the level-1 join
      // condition, erasing the equi-key and planning the first level as
      // a BroadcastNestedLoopJoin - every query row then evaluates the
      // window predicates against EVERY root edge (queries x roots pairs
      // at 10x dictionary scale), where the hash join probes one bucket.
      // pmod(qlen, 1) is always 0 but data-dependent, so the equi-key
      // survives and level 1 plans as the same hash join as every other
      // level (plan-pinned in PrefixTreeSpec).
      .withColumn("node_id", pmod($"qlen", lit(1)).cast(LongType))
      .withColumn(
        "state",
        concat(sequence(lit(0), length($"query_string")), array(lit(0)))
      )
      .withColumn("depth", lit(0))

    // ------------------------------------------------------------------
    // Phase 1 - UNROLLED CHAIN: the trie's height is knowable upfront
    // (first edge >= minTopEdge chars, every deeper edge >= 1 char, plus
    // the end-cap level), so instead of a driver loop of
    // materialize-count-join round trips, unroll `hChain` levels into ONE
    // lazy LINEAR plan and let Spark run the whole traversal as a single
    // job: no per-level localCheckpoint serialization, no per-level
    // control job, one Catalyst/AQE pass, stages pipelined back to back.
    // Rows that reach their result are NOT split into a separate branch
    // (a second reference of the level plan would double the logical tree
    // per level - exponential planning): they flip to done=true, retarget
    // their join key to a sentinel trie row, and ride the remaining
    // levels as inert fan-out-1 rows. Extra shuffle volume is
    // |result| x residual-depth narrow rows - the price of one job.
    // hChain is capped: a pathologically deep trie (document-length
    // strings) falls through to the phase-2 loop, which handles
    // arbitrary depth with bounded lineage.
    val nullStr = lit(null).cast(StringType)
    var cur = frontier0
      .withColumn("done", lit(false))
      .withColumn("r_node", nullStr)
      .withColumn("r_dist", lit(null).cast(IntegerType))
      .withColumn("r_occ", lit(null).cast(LongType))
    if (withPath) cur = cur.withColumn("path", lit(""))
    // broadcast-mode chain: the whole traversal is one pipelined stage,
    // so parallelism is fixed by the INPUT partitioning - spread the
    // query set over every core upfront (file layout often delivers a
    // single split)
    if (useBcast) cur = cur.repartition(spark.sparkContext.defaultParallelism)

    val frontierCols = Seq($"query_string", $"qlen", $"node_id", $"state", $"depth") ++
      (if (withPath) Seq($"path") else Nil)

    for (_ <- 1 to hChain) {
      // fresh expression IDs for the trie side each level: `cur` already
      // contains the previous level's trie attributes, and re-joining the
      // SAME cached Dataset would be an ambiguous self-join. Aliasing is
      // a no-op projection; alias-aware output partitioning still lets
      // the join reuse the cached parent_id exchange.
      val tl = t.select(t.columns.map(n => t(n).as(n)): _*)
      // done rows pass the join via their sentinel key: a null state
      // takes frontierJoin's null-state escape, and the sentinel's
      // maximal length window is always satisfied.
      val settled = $"done" || $"is_word"
      cur = frontierJoin(cur, if (useBcast) broadcast(tl) else tl, maxDist)
        .select((Seq(
          $"query_string",
          $"qlen",
          when(settled, -(pmod(xxhash64($"query_string"), lit(64L)) + lit(1L)))
            .otherwise(tl("id")).as("node_id"),
          // settled rows drop their state entirely (frontierJoin's prune
          // has a null-state escape): the done-stream rides the remaining
          // levels as narrow rows
          when(settled, lit(null).cast(ArrayType(IntegerType)))
            .otherwise(extend($"query_string", $"node", $"state", $"depth")).as("state"),
          when(settled, $"depth")
            .otherwise($"depth" + length($"node")).cast(IntegerType).as("depth"),
          settled.as("done"),
          when($"done", $"r_node").otherwise(when($"is_word", $"node")).as("r_node"),
          when($"done", $"r_dist")
            .otherwise(when($"is_word", element_at($"state", length($"query_string") + 1)))
            .cast(IntegerType).as("r_dist"),
          when($"done", $"r_occ").otherwise(when($"is_word", $"n_occurrences")).as("r_occ")
        ) ++ (if (withPath)
          Seq(when(settled, $"path").otherwise(concat($"path", $"node")).as("path"))
        else Nil)): _*)
        .filter(
          ($"done" && $"r_dist" <= lit(maxDist)) ||
            (!$"done" && element_at($"state", -1) <= lit(maxDist)))
    }

    // ONE materialization + ONE control job for the whole chain.
    //
    // Whole-stage codegen policy: in broadcast mode all hChain levels
    // fuse into ONE generated doConsume chain, which crosses the JVM's
    // 64 KB method limit somewhere past ~8 levels - Janino then refuses
    // (three wasted compile attempts of a 10k-line class) and Spark
    // falls back to per-operator execution anyway. For deep chains,
    // skip the doomed fusion UP FRONT: per-operator execution still
    // runs every projection/join through small per-expression codegen
    // (each level's UnsafeProjection compiles on its own), and was
    // measured 2.6x FASTER than fencing the chain into compilable
    // whole-stage blocks with CodegenFallback barriers (the barrier
    // Project drops the whole row through an interpreted row-writer -
    // fused local variables are exactly what made the chain fast).
    // Shallow chains keep full fusion. The deep-trie spec pins this
    // with spark.sql.codegen.fallback=false: a regression back to the
    // 64 KB overflow throws there instead of silently degrading.
    val safeUnroll = 8
    dbg("chain plan built")
    // The skip must be scoped to THIS plan, not the session: flipping
    // spark.conf would (a) de-codegen any unrelated query planning
    // concurrently on the same session and (b) race two deep queryJoins'
    // save/restore into leaving the flag permanently false. A THREAD-
    // LOCAL conf clone (SQLConf.withExistingConf) scopes the override to
    // this planning call: Catalyst's preparation rules read SQLConf.get,
    // which consults the thread-local before the session conf. The
    // deep-trie spec pins the effect (codegen.fallback=false would throw
    // on a 64 KB overflow if the override ever stopped taking).
    val chain = if (hChain > safeUnroll) {
      import org.apache.spark.sql.internal.SQLConf
      val scoped = SQLConf.get.clone()
      scoped.setConfString("spark.sql.codegen.wholeStage", "false")
      SQLConf.withExistingConf(scoped) { cur.localCheckpoint() }
    } else cur.localCheckpoint()
    dbg("chain executed")
    // the chain's job has populated t's cache; the input-side cache (ours
    // only if the caller hadn't persisted) is no longer needed
    if (ownCache) tIn.unpersist()
    val emitCols0 = Seq(
      $"query_string", $"r_node".as("node"), $"r_dist".as("final_distance"),
      $"r_occ".as("n_occurrences")
    ) ++ (if (withPath) Seq($"path") else Nil)
    var emitted: List[DataFrame] = List(chain.filter($"done").select(emitCols0: _*))
    var frontier = chain.filter(!$"done").select(frontierCols: _*)
    var nFrontier = frontier.count()
    dbg(s"leftover control (n=$nFrontier)")

    // ------------------------------------------------------------------
    // Phase 2 - FALLBACK LOOP for tries deeper than the unroll cap
    // (normally nFrontier == 0 here and this is skipped entirely)
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
        $"qlen",
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
        $"qlen",
        $"next_id".as("node_id"),
        $"state2".as("state"),
        ($"depth" + length($"node")).cast(IntegerType).as("depth")
      ) ++ (if (withPath) Seq(concat($"path", $"node").as("path")) else Nil)
      frontier = step.filter(!$"is_word").select(stepCols: _*)
    }
    // finally (not success-path only): an exception mid-loop must not
    // leak the cached trie partitioning
    } finally t.unpersist()
    // emitted is never empty: the chain contributes its (possibly empty)
    // done-slice with the full output schema
    emitted.reduce(_ union _)
      .withColumn("final_distance", $"final_distance".cast(IntegerType))
  }
}
