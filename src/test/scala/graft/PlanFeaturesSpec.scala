package graft

import org.apache.spark.sql.functions._

/** Pins the two runtime-filtering features a 100-TB deployment leans on,
  * against THIS library's layouts (partitioned sinks, parquet scans):
  *
  *  - runtime bloom-filter join pruning: a selective dimension filter is
  *    turned into a bloom filter applied on the fact side BEFORE the
  *    join shuffle - the difference between shuffling a full fact table
  *    and shuffling the ~matching slice;
  *  - dynamic partition pruning: a dimension filter prunes fact
  *    PARTITION DIRECTORIES at runtime when the fact is laid out by
  *    [[graft.sources.Sinks.writePartitioned]].
  *
  * Both assertions are on the plan, not timings - at test scale the
  * effect is invisible in milliseconds but the plan shape is exactly
  * what ships to a cluster.
  */
class PlanFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString + "/data"
  }

  test("runtime bloom filter injected on the fact side of a selective join") {
    val dir = tmp("bloom")
    // parquet-backed tables: runtime filters key off file-scan statistics
    (1L to 2000L).map(i => (i, i % 97, s"payload_$i"))
      .toDF("fact_id", "key", "payload").write.parquet(s"$dir/fact")
    (0L to 96L).map(i => (i, s"dim_$i")).toDF("key", "name")
      .write.parquet(s"$dir/dim")
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // test-sized data: drop the size gates so the rewrite fires here
      // exactly as it would on a 10-GB-scan fact table in production
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    ) {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"name" === "dim_7")
      val q = fact.join(dim, "key").select("fact_id", "name")
      val plan = q.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("bloomfilter") || plan.contains("might_contain"),
        s"no runtime bloom filter in plan:\n$plan")
      // bloom pruning must not change the answer: keys 7,104,...,1947
      val ids = q.select("fact_id").as[Long].collect()
      assert(ids.length == 21 && ids.forall(_ % 97 == 7))
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    val dir = tmp("skew")
    // 50k rows, ~90% on one key: the classic hot-key join skew that
    // salting fixes statically and AQE fixes at runtime
    (1L to 50000L).map(i => (i, if (i % 10 != 0) 0L else i % 97, s"pad_pad_pad_$i"))
      .toDF("row_id", "key", "pad").write.parquet(s"$dir/fact")
    (0L to 96L).map(i => (i, s"dim_$i")).toDF("key", "name")
      .write.parquet(s"$dir/dim")
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-sized thresholds: flag a partition as skewed above ~64KB
      // and split toward ~16KB targets (production defaults are 256MB/
      // 64MB - the MECHANISM is what this pins)
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // force a shuffle join: broadcast would bypass the skew machinery
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"
    ) {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
      // keep pad in the aggregate so column pruning can't shrink the
      // skewed shuffle partition below the detection threshold
      val q = fact.join(dim, "key").groupBy("name")
        .agg(count(lit(1)).as("n"), max(length(col("pad"))).as("mx"))
      val rows = q.collect() // AQE decides skew handling during execution
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(4000)}")
      // correctness under the split: hot key 0 keeps all its rows
      // (45000 with i%10!=0, plus the 51 multiples of both 10 and 97)
      val n0 = rows.find(_.getString(0) == "dim_0").get.getLong(1)
      assert(n0 == 45051L, s"hot-key row count wrong under skew split: $n0")
    }
  }

  test("dedup candidate self-joins plan as equi-joins, never nested-loop products") {
    import graft.ops.DedupOps
    val docs = (1L to 200L).map(i =>
      (i, s"token_${i % 7} token_${i % 11} token_${i % 13} shared body text"))
      .toDF("doc_id", "text")
    // every candidate generator must key its self-join (shingle / band /
    // block) - a BroadcastNestedLoopJoin or CartesianProduct here is the
    // all-pairs plan that cannot scale
    val plans = Seq(
      "jaccard" -> DedupOps.jaccardPairs(docs, "doc_id", "text", 0.5, shingleLen = 3),
      "jaccard_prefix" -> DedupOps.jaccardPairsPrefix(docs, "doc_id", "text", 0.5, shingleLen = 3),
      "minhash" -> DedupOps.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 16, bands = 4, shingleLen = 3, threshold = 0.5, maxBucketSize = 50),
      "simhash" -> DedupOps.simhashPairs(docs, "doc_id", "text",
        maxHamming = 3, maxBlockSize = 50))
    for ((name, df) <- plans) {
      val p = df.queryExecution.executedPlan.toString.toLowerCase
      assert(!p.contains("broadcastnestedloop") && !p.contains("cartesianproduct"),
        s"$name self-join degenerated to a product:\n${p.take(2000)}")
    }
  }

  test("dynamic partition pruning through a Sinks.writePartitioned layout") {
    val dir = tmp("dpp")
    val fact = (1L to 1000L).map(i => (i, s"lang_${i % 8}", i * 10))
      .toDF("id", "lang", "v")
    graft.sources.Sinks.writePartitioned(fact, s"$dir/fact", Seq("lang"))
    // the pruning filter must be "likely selective" (literal equality -
    // a bare boolean attribute does not qualify for DPP)
    (0 to 7).map(i => (s"lang_$i", if (i % 3 == 0) "keep" else "drop"))
      .toDF("lang", "grp").write.parquet(s"$dir/dim")
    withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      // test-sized data: the cost heuristic compares estimated pruned
      // bytes against the subquery overhead and refuses on kilobytes -
      // pin the estimate so the rewrite fires as it would on a real
      // partitioned corpus
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "1000"
    ) {
      val f = graft.sources.Sinks.readPartitioned(spark, s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"grp" === "keep")
      val q = f.join(dim, "lang").groupBy("lang").agg(sum($"v").as("sv"))
      val plan = q.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning in plan:\n$plan")
      // langs 0,3,6 survive: correctness of the pruned result
      assert(q.select("lang").as[String].collect().toSet ==
        Set("lang_0", "lang_3", "lang_6"))
    }
  }

  test("persisted IVF index: probe join prunes list partitions dynamically") {
    import graft.ops.SimilarityOps
    val rnd = new scala.util.Random(31)
    val vecs = (0 until 300)
      .map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("id", "v")
    val idx = SimilarityOps.ivfBuild(vecs, "id", "v", nCentroids = 16, lloydIters = 0)
    val dir = tmp("ivfdpp")
    SimilarityOps.ivfWrite(idx, dir)
    val back = SimilarityOps.ivfRead(spark, dir)
    // query side through parquet: DPP keys off a selective predicate
    // over a file source (a LocalRelation folds the filter away)
    vecs.write.parquet(s"$dir/queries")
    val qvecs = spark.read.parquet(s"$dir/queries")
    withConf(
      // test-sized data again: the rewrite's byte-estimate heuristic
      // refuses on kilobytes; at sf0.01+ it fires with stock configs
      // (verified via explain("formatted") on ann_ivf_persisted)
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "1000"
    ) {
      val q = SimilarityOps.ivfQuery(back, qvecs.filter($"id" < 4), "id", "v",
        k = 3, nProbe = 2)
      // the lists scan must carry a dynamic pruning expression on
      // list_id: a query batch probing 2 of 16 lists reads ~2/16 of the
      // corpus files - the entire point of the partitioned index layout
      val plan = q.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning on the IVF lists scan:\n$plan")
      assert(q.count() > 0)
    }
  }

  test("persisted trigram index: bucket probe prunes posting partitions dynamically") {
    import graft.ops.SearchOps
    val docs = (1L to 200L)
      .map(i => (i, s"document number $i with payload token_${i % 17} text"))
      .toDF("doc_id", "text")
    val dir = tmp("tridpp")
    SearchOps.trigramWrite(
      SearchOps.trigramIndex(docs, "doc_id", "text"), s"$dir/idx", nBuckets = 32)
    val back = SearchOps.trigramRead(spark, s"$dir/idx")
    // needles through parquet: DPP keys off a selective predicate over a
    // file source (a LocalRelation folds the filter away)
    Seq("token_3", "token_5").toDF("n").write.parquet(s"$dir/needles")
    val needles = spark.read.parquet(s"$dir/needles").filter(length($"n") > 2)
    withConf(
      // test-sized data: the byte-estimate heuristic refuses on
      // kilobytes; at corpus scale it fires with stock configs
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "1000"
    ) {
      val q = SearchOps.trigramQuery(docs, "doc_id", "text", back, needles, "n")
      // the postings scan must carry a dynamic pruning expression on
      // gbucket: a needle batch touching a handful of grams reads only
      // their bucket directories, never the whole posting table
      val plan = q.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning on the trigram postings scan:\n$plan")
      assert(q.count() > 0)
    }
  }

  test("globalOrderIndex plans range partitioning, never a single-partition funnel") {
    import graft.ops.ShardOps
    val df = (1L to 10000L).toDF("id")
      .withColumn("k", md5($"id".cast("string")))
    val indexed = ShardOps.globalOrderIndex(df, Seq($"k", $"id"))
    // the naive row_number() OVER (ORDER BY ...) plan funnels the whole
    // corpus through ONE task; the primitive must instead range-partition
    // the sort key (data-parallel total order)
    val sortedPlan = df.repartitionByRange($"k", $"id")
      .sortWithinPartitions($"k", $"id")
      .queryExecution.executedPlan.toString.toLowerCase
    assert(sortedPlan.contains("rangepartitioning"),
      s"no range partitioning in the ordering stage:\n$sortedPlan")
    assert(!sortedPlan.contains("singlepartition"),
      s"single-partition exchange in the ordering stage:\n$sortedPlan")
    // and the result is still the exact global rank
    val head = indexed.orderBy($"position").select($"k").as[String].head()
    val expectedHead = df.orderBy($"k", $"id").select($"k").as[String].head()
    assert(head == expectedHead)
    assert(indexed.agg(countDistinct($"position")).as[Long].head() == 10000L)
  }

  test("keySkew ranks via range partitioning, never a single-partition window funnel") {
    import graft.ops.ProfileOps
    val df = (1L to 20000L).map(i => "k" + (i % 257)).toDF("key")
    val skew = ProfileOps.keySkew(df, "key")
    // key cardinality is unbounded at corpus scale: the rank/cumulative
    // stage must never plan an unpartitioned window (WindowExec over
    // SinglePartition) - the zipWithIndex-style offset lift has no
    // window at all
    val plan = skew.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("singlepartition"),
      s"single-partition exchange in the keySkew plan:\n$plan")
    assert(!plan.contains("windowexec") && !plan.contains("window"),
      s"window operator in the keySkew plan:\n$plan")
    // the frequency-ordering stage itself plans range partitioning
    val orderingPlan = df.groupBy($"key").agg(count(lit(1)).as("n"))
      .repartitionByRange($"n".desc, $"key".asc_nulls_last)
      .sortWithinPartitions($"n".desc, $"key".asc_nulls_last)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(orderingPlan.contains("rangepartitioning"),
      s"no range partitioning in the keySkew ordering stage:\n$orderingPlan")
    // and the values still match the naive global-window semantics
    val rows = skew.orderBy($"rank").collect()
    assert(rows.length == 257)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 257))
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.last == 1.0 && cums.zip(cums.tail).forall { case (a, b) => a <= b })
    val expectTop = rows.maxBy(_.getAs[Long]("n"))
    assert(expectTop.getAs[Int]("rank") == 1)
  }

  test("fixedHistogram plans ONE exchange with map-side partial aggregation") {
    val df = (1L to 5000L).map(i => ("g" + (i % 3), (i % 97).toDouble)).toDF("g", "v")
    val plan = graft.ops.SketchOps.fixedHistogram(df, "v", Seq("g"), 0.0, 100.0, 20)
      .queryExecution.executedPlan.toString
    // the whole point of fixed bin edges: each partition folds to at
    // most groups x (bins + 2) cells BEFORE the one shuffle
    assert(plan.contains("partial_count") || plan.toLowerCase.contains("partial"),
      s"no map-side partial aggregation in the cell build:\n${plan.take(2000)}")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"histogram cell build must shuffle exactly once:\n${plan.take(2000)}")
  }

  test("fixedHistogramAuto: derived edges broadcast back onto the scan, partial agg kept") {
    val df = (1L to 5000L).map(i => ("g" + (i % 3), (i % 97).toDouble)).toDF("g", "v")
    val plan = graft.ops.SketchOps.fixedHistogramAuto(df, "v", Seq("g"), 20)
      .queryExecution.executedPlan.toString
    // the [min,max] edge table is groups-sized: it must come back as a
    // broadcast hash join (a sort-merge would shuffle the corpus TWICE),
    // and the cell build must still fold map-side before its one shuffle
    assert(plan.contains("BroadcastHashJoin"),
      s"edges must broadcast onto the scan:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for the edges join:\n${plan.take(2000)}")
    assert(plan.toLowerCase.contains("partial"),
      s"no map-side partial aggregation in the cell build:\n${plan.take(2000)}")
  }

  test("sampleSketch: one exchange, partial object aggregation before it") {
    val df = (1L to 5000L).map(i => ("g" + (i % 3), i, (i % 97).toDouble))
      .toDF("g", "id", "v")
    val plan = graft.ops.SketchOps.sampleSketch(df, "id", "v", Seq("g"), 64)
      .queryExecution.executedPlan.toString
    // the whole point of the mergeable min-k state: each partition folds
    // to at most k entries per group BEFORE the one shuffle - rows never
    // cross the wire for a quantile profile
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"sample sketch must shuffle exactly once:\n${plan.take(2000)}")
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial"),
      s"no map-side partial aggregation:\n${plan.take(2000)}")
  }

  test("hdrSketch: one exchange, partial hash aggregation, codegen binning") {
    // through parquet, not a LocalTableScan: a local relation constant-
    // folds the binning away and hides the scan-stage shape being pinned
    val path = java.nio.file.Files.createTempDirectory("graft_hdr_plan").toString
    (1L to 5000L).map(i => ("g" + (i % 3), (i % 97) * 1.5))
      .toDF("g", "v").write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    val sk = graft.ops.SketchOps.hdrSketch(df, "v", Seq("g"))
    sk.collect() // materialize so AQE finalizes and codegen stages appear
    val plan = sk.queryExecution.executedPlan.toString
    // addition-mergeable cells: each partition folds to at most
    // octaves x 32 cells per group BEFORE the one shuffle - the tail
    // profile moves sketch cells, never rows
    // count EXECUTED shuffle stages (the finalized AQE plan echoes its
    // initial plan below the real one, so raw "Exchange" double-counts)
    assert("ShuffleQueryStage".r.findAllIn(plan).size == 1,
      s"hdr sketch must shuffle exactly once:\n${plan.take(2000)}")
    assert(plan.contains("HashAggregate") && plan.contains("partial"),
      s"no map-side partial aggregation:\n${plan.take(2000)}")
    // the integer binning (bin/shiftright/abs chain) stays inside
    // whole-stage codegen (the `*(n)` stage markers) - no UDF, no
    // interpreter fallback
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      s"binning must be codegen'd:\n${plan.take(2000)}")
  }

  test("hardNegatives corpus pass rides a broadcast join, never a sort-merge shuffle") {
    val rnd = new scala.util.Random(5)
    val df = Seq.tabulate(200)(i =>
      (i.toLong, Array.fill(4)(rnd.nextGaussian().toFloat), i % 2)).toDF("id", "v", "lab")
    val plan = graft.ops.SimilarityOps.hardNegatives(df, "id", "v", "lab",
        df.filter($"id" < 3), k = 2)
      .queryExecution.executedPlan.toString
    // anchors broadcast; the label-inequality condition makes it a
    // nested-loop against the broadcast side - the corpus itself must
    // not shuffle for scoring (only ranked candidates move, to the
    // per-anchor top-k window)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"anchor side must broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not sort-merge-shuffle for scoring:\n${plan.take(2000)}")
  }

  test("robust-scale stats join back onto the scan is a broadcast hash join") {
    val df = (1L to 5000L).map(i => ("t" + (i % 3), (i % 211).toDouble, i)).toDF("g", "v", "id")
    val hist = graft.ops.SketchOps.fixedHistogram(df, "v", Seq("g"), 0.0, 250.0, 25)
    val qs = graft.ops.SketchOps.histogramQuantiles(hist, Seq("g"),
      Seq(0.25, 0.5, 0.75), 0.0, 250.0, 25)
    val stats = qs.groupBy("g").agg(
      min(when($"q" === 0.25, $"est")).as("q1"),
      min(when($"q" === 0.5, $"est")).as("med"),
      min(when($"q" === 0.75, $"est")).as("q3"))
    val out = df.join(broadcast(stats), "g")
      .select($"id", when($"q3" > $"q1", ($"v" - $"med") / ($"q3" - $"q1")).as("z"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"sketch-derived stats must broadcast onto the scan:\n${plan.take(2000)}")
    assert(out.count() == 5000L)
  }

  test("bloomDecontam probe plans with ZERO shuffle exchanges (pure map-side scan)") {
    val dir = tmp("bloomprobe")
    (1L to 500L).map(i => (i, s"token$i repeated words token${i % 7} end"))
      .toDF("doc_id", "text").write.parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")
    val out = graft.ops.TextOps.bloomDecontam(
      docs, "doc_id", "text",
      docs.filter($"doc_id" % 10 === 0), "text",
      shingleLen = 2, mBits = 1 << 14, kHashes = 3)
    // the build half already ran (the .head() inside the op); the PROBE
    // plan - what executes over the 100-TB corpus - must be scan ->
    // project -> filter with the bitset riding along as a reference
    // object: no Exchange of corpus data anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bloom probe must not shuffle corpus data:\n${plan.take(2000)}")
    assert(plan.contains("bloom_flag_count"), "probe must go through the codegen kernel")
    // and it returns the same rows as running it end to end
    assert(out.count() > 0)
  }

  test("fetchList plans a LEFT ANTI equi-join, never a nested-loop product") {
    import graft.ops.WebOps
    val cand = (1L to 2000L).map(i => (s"surt$i", s"d$i", i))
      .toDF("surt", "digest", "id")
    val index = (1L to 1500L).map(i => (s"surt$i", s"d$i")).toDF("surt", "digest")
    val out = WebOps.fetchList(cand, "surt", "digest", index, "surt", "digest")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"no anti join in the fetchList plan:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct") &&
      !plan.toLowerCase.contains("broadcastnestedloop"),
      s"nested-loop product in the fetchList plan:\n$plan")
    assert(out.count() == 500)
  }

  test("domainCap ranks salted before the exact per-domain pass - no hot-domain funnel") {
    import graft.ops.WebOps
    val pages = (1L to 5000L).map(i => (i, s"https://h${i % 127}.org/p/$i"))
      .toDF("id", "url")
    val out = WebOps.domainCap(pages, "url", "id", maxPerDomain = 5, saltBuckets = 16)
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("singlepartition"),
      s"single-partition exchange in the domainCap plan:\n$plan")
    assert(plan.contains("hashpartitioning"),
      s"no hash partitioning for the domain window:\n$plan")
    // TWO window stages: the first partitions by (domain, gr_salt) so no
    // task ever ranks more than one salt slice of a hot domain; only the
    // second (over <= saltBuckets*cap survivors per domain) keys on the
    // domain alone. The salt column appears in exactly one window's
    // partition spec.
    assert(plan.contains("gr_salt"),
      s"no salted window stage in the domainCap plan:\n$plan")
    val nWindows = "\\bwindow\\b".r.findAllIn(plan).length
    assert(nWindows >= 2, s"expected two window stages, plan:\n$plan")
    assert(out.count() == 127L * 5)
    // output equivalence with the unsalted spec: the two-phase top-K
    // keeps EXACTLY the single-window top-K rows (hot-domain fixture:
    // one domain holds half the corpus)
    val hot = (1L to 2000L).map(i =>
      (i, if (i <= 1000) s"https://mega.example/p/$i" else s"https://s${i % 97}.org/p/$i"))
      .toDF("id", "url")
    val salted = WebOps.domainCap(hot, "url", "id", maxPerDomain = 7, saltBuckets = 16)
      .select($"id").as[Long].collect().toSet
    val oneWindow = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"domain").orderBy(md5($"url"), $"id")
      WebOps.foldDomainByHost(hot, WebOps.urlHost($"url"), "domain")
        .withColumn("rk", row_number().over(w)).filter($"rk" <= 7)
        .select($"id").as[Long].collect().toSet
    }
    assert(salted == oneWindow,
      s"two-phase top-K diverged from the single-window spec: ${salted.diff(oneWindow)} / ${oneWindow.diff(salted)}")
  }

  test("frontierSchedule's corpus-scale window is salted; offsets broadcast back") {
    import graft.ops.WebOps
    val frontier = (1L to 3000L).map(i => (i, s"https://h${i % 61}.org/p/$i"))
      .toDF("id", "url")
    val delays = Seq(("h1.org", 2.0)).toDF("domain", "crawl_delay")
    val out = WebOps.frontierSchedule(frontier, "id", "url", delays)
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("singlepartition"),
      s"single-partition exchange in the frontierSchedule plan:\n$plan")
    // the row_number window partitions by (domain, gr_salt); the offset
    // frame comes back as a broadcast join, never a corpus shuffle
    assert(plan.contains("gr_salt"),
      s"no salted ranking window in the frontierSchedule plan:\n$plan")
    assert(plan.contains("broadcast"),
      s"offsets/delays not broadcast in the frontierSchedule plan:\n$plan")
  }

  test("crawlTraps plans map-side partial aggregation before its one exchange") {
    import graft.ops.WebOps
    val urls = (1L to 4000L).map(i => s"https://t${i % 11}.org/a/b/$i").toDF("url")
    val out = WebOps.crawlTraps(urls, "url")
    val plan = out.queryExecution.executedPlan.toString
    // signals fuse into the scan; the domain aggregate partial-aggs
    // map-side (partial_count/partial_sum markers) before shuffling
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"no map-side partial aggregation in the crawlTraps plan:\n${plan.take(2000)}")
    assert(out.count() == 11)
  }
}
