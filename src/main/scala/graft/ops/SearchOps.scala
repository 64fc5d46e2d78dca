package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Substring search over a corpus, accelerated by an inverted
  * character-trigram index - the grep-shaped workload (`text LIKE
  * '%needle%'`) that a 100-TB corpus cannot answer with a full scan per
  * query batch.
  *
  * Losslessness: a document containing `needle` contains every one of
  * needle's character trigrams, so intersecting ANY subset of the
  * needle's posting lists over-approximates the answer; an exact
  * `contains` verify on the (small) candidate set removes the false
  * positives. Using only the K RAREST trigrams of each needle keeps the
  * joined posting lists short regardless of how common the needle's
  * other grams are (the standard trigram-index trick - same shape as
  * pg_trgm / code-search indexes).
  */
object SearchOps {

  /** All distinct character trigrams of `c` (lowercased input expected
    * from callers; empty/short strings yield an empty array). One
    * codegen kernel call - the transform/sequence/array_distinct tree
    * it replaces was interpreted per element, and this runs over every
    * corpus row in the index build.
    */
  private def trigrams(c: Column): Column =
    graft.functions.GraftFunctions.char_grams(c, 3)

  /** Build the inverted index: one (gram, id) posting per distinct
    * trigram per document, over the LOWERCASED text (search is
    * case-insensitive). One shuffle-free explode; persist with
    * [[graft.sources.Sinks.writePartitioned]] or bucket on `gram` for
    * repeated query batches at scale.
    */
  def trigramIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.filter(F.col(textCol).isNotNull)
      .select(F.col(idCol).as("id"), lower(F.col(textCol)).as("t"))
      .select(F.col("id"), explode(trigrams(F.col("t"))).as("gram"))

  /** Find every (needle, doc) pair where the document's text contains
    * the needle (case-insensitive), through the trigram index.
    *
    *   - needles with >= 3 chars: K-rarest-gram posting intersection ->
    *     exact verify on candidates (lossless; a needle holding a gram
    *     absent from the index matches nothing, which the intersection
    *     yields for free);
    *   - shorter needles carry no trigram and fall back to a broadcast
    *     verify against the corpus (the only honest option - and a
    *     1-2 char substring matches nearly everything anyway).
    *
    * Scale shape: posting lists shuffle only for the needle's chosen
    * grams (needle-batch-sized x K lists, each as short as the rarest
    * gram allows), candidates group on (needle, id), and the verify
    * join touches candidate docs only. The corpus is never scanned per
    * needle.
    *
    * Output: (needle, id).
    */
  def substringSearch(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame, // (gram, id) as produced by trigramIndex
      needles: DataFrame,
      needleCol: String,
      rarestK: Int = 4
  ): DataFrame = {
    require(rarestK > 0, s"rarestK must be positive, got $rarestK")
    val docs = corpus.filter(F.col(textCol).isNotNull)
      .select(F.col(idCol).as("id"), lower(F.col(textCol)).as("t"))
    val nds = needles.select(lower(F.col(needleCol)).as("needle")).distinct()
    val long = nds.filter(length(F.col("needle")) >= 3)
    val ng = long.select(F.col("needle"),
      explode(trigrams(F.col("needle"))).as("gram"))
    // doc-frequency of exactly the grams the needle batch uses (the
    // needle side is query-batch-sized - broadcast it, count postings)
    val dfreq = index.join(broadcast(ng.select("gram").distinct()), Seq("gram"))
      .groupBy("gram").agg(count(lit(1)).as("gram_df"))
    // K rarest grams per needle, ties broken by the gram itself
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("needle").orderBy(F.col("gram_df").asc, F.col("gram").asc)
    val present = ng.join(dfreq, Seq("gram"))
    // a needle with ANY absent gram can never match - drop it BEFORE
    // the posting intersection (not after: a needle whose 4 rarest
    // grams are all present but whose 14th gram is absent would
    // otherwise run a full intersection for a provably empty result)
    val gramCounts = ng.groupBy("needle").agg(count(lit(1)).as("n_grams"))
    val eligible = present.groupBy("needle").agg(count(lit(1)).as("n_present"))
      .join(gramCounts, Seq("needle"))
      .filter(F.col("n_present") === F.col("n_grams"))
      .select(F.col("needle"),
        least(lit(rarestK.toLong), F.col("n_grams")).as("k_used"))
    val chosen = present
      .join(broadcast(eligible.select("needle")), Seq("needle"), "left_semi")
      .withColumn("rn", row_number().over(w))
      .filter(F.col("rn") <= rarestK)
    val candidates = index
      .join(chosen.select("needle", "gram").hint("shuffle_hash"), Seq("gram"))
      .groupBy("needle", "id")
      .agg(count(lit(1)).as("n_hit"))
      .join(broadcast(eligible), Seq("needle"))
      .filter(F.col("n_hit") === F.col("k_used"))
      .select("needle", "id")
    val verifiedLong = candidates
      .join(docs, Seq("id"))
      .filter(F.col("t").contains(F.col("needle")))
      .select(F.col("needle"), F.col("id"))
    val short = nds.filter(length(F.col("needle")).between(1, 2))
    val verifiedShort = docs
      .join(broadcast(short))
      .filter(F.col("t").contains(F.col("needle")))
      .select(F.col("needle"), F.col("id"))
    verifiedLong.union(verifiedShort)
  }

  /** The persisted trigram index: posting lists hive-partitioned on a
    * hash bucket of the gram, so a query batch prunes unprobed buckets
    * at file listing (same lifecycle as the IVF lists and the BM25
    * statistics tables; the reference's own INDEX/BUILDINDEX shape,
    * /root/reference/PrefixTree.ecl:611-613, applied to the posting
    * table).
    *
    * Bucketing by pmod(xxhash64(gram), nBuckets) rather than by the raw
    * gram keeps the directory count bounded (a corpus holds ~10^4-10^5
    * distinct trigrams, and gram bytes can be path-illegal) while
    * preserving the pruning property: every posting of a given gram
    * lives in exactly one bucket directory.
    */
  final case class TrigramIndexed(postings: DataFrame, nBuckets: Int)

  private val BucketCol = "gbucket"

  private def bucketOf(gram: Column, nBuckets: Int): Column =
    F.pmod(F.xxhash64(gram), lit(nBuckets.toLong))

  /** Write a [[trigramIndex]] posting table partitioned on the gram
    * bucket. Within each bucket the writer sorts by gram, so parquet
    * row-group min/max stats additionally prune within a bucket file.
    * `filesPerValue` fans a hot bucket over several writer tasks (same
    * skew control as Sinks.writePartitioned, which this mirrors - the
    * write is inlined here to add the within-file gram sort).
    */
  def trigramWrite(
      index: DataFrame,
      path: String,
      nBuckets: Int = 64,
      filesPerValue: Int = 1
  ): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val bucketed = index.withColumn(BucketCol, bucketOf(F.col("gram"), nBuckets))
    val keys =
      if (filesPerValue <= 1) Seq(F.col(BucketCol))
      else Seq(F.col(BucketCol),
        F.pmod(F.xxhash64(F.col("gram"), F.col("id")), lit(filesPerValue.toLong)))
    bucketed
      .repartition(keys: _*)
      .sortWithinPartitions("gram", "id")
      .write.mode("overwrite")
      .partitionBy(BucketCol)
      .parquet(s"$path/postings")
    val spark = index.sparkSession
    import spark.implicits._
    // nBuckets must travel with the layout: a reader probing with a
    // different modulus would prune to the WRONG buckets (silently empty
    // results) - one-row meta parquet, same shape as the BM25 stats table
    Seq(nBuckets).toDF("n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Read a persisted trigram index back. The postings stay a lazy
    * partitioned scan; only the one-row meta table is collected (the
    * same driver-side cost as ivfRead's k centroids).
    */
  def trigramRead(spark: org.apache.spark.sql.SparkSession, path: String): TrigramIndexed =
    TrigramIndexed(
      spark.read.parquet(s"$path/postings"),
      spark.read.parquet(s"$path/meta").head().getInt(0))

  /** [[substringSearch]] through a persisted index: restrict the posting
    * scan to the bucket directories the needle batch's grams hash into
    * (an inner join on the PARTITION column against the distinct probed
    * buckets - dynamic partition pruning drops the rest at file listing,
    * the ivfQuery list_id shape), then run the standard K-rarest-gram
    * intersection. Lossless: pruning keeps whole buckets, so every
    * posting - and the exact doc-frequency - of every probed gram
    * survives.
    */
  def trigramQuery(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      idx: TrigramIndexed,
      needles: DataFrame,
      needleCol: String,
      rarestK: Int = 4
  ): DataFrame = {
    val wantedBuckets = needles
      .select(lower(F.col(needleCol)).as("needle"))
      .filter(length(F.col("needle")) >= 3)
      .select(explode(trigrams(F.col("needle"))).as("gram"))
      .select(bucketOf(F.col("gram"), idx.nBuckets).as(BucketCol))
      .distinct()
    val pruned = idx.postings
      .join(broadcast(wantedBuckets), Seq(BucketCol))
      .select("gram", "id")
    substringSearch(corpus, idCol, textCol, pruned, needles, needleCol, rarestK)
  }

  /** BM25 ranked keyword retrieval (Robertson/Sparck Jones Okapi
    * weighting): score(q, d) = sum over query terms of
    * idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)),
    * idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1) - the Lucene-shape
    * non-negative variant.
    *
    * Retrieval is term-at-a-time over the term-frequency table (an
    * inverted-index equi-join on term - the corpus is never scanned per
    * query), per-term contributions are computed in double but SUMMED
    * through DECIMAL(38,18), so the score - and therefore the RANKING -
    * is exact under any aggregation order and replayable by any engine
    * with ln. Ties broken by doc id.
    *
    * Scale shape: tf/df/dl are vocabulary- and corpus-proportional
    * aggregates built once (a deployment persists them, same lifecycle
    * as the trigram posting table); the per-query work is proportional
    * to the posting lists of its terms. Corpus-level constants (N,
    * avgdl) ride a one-row broadcast, never a collect.
    *
    * Output: (queryCol, rank 1..k, doc_id, score rounded 6dp).
    */
  def bm25Search(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
      .localCheckpoint() // feeds dl, df_t AND the retrieval join: build once
    bm25Query(Bm25Index(tf, docLengths(tf), docFreqs(tf), corpusStats(tf)),
      queries, queryCol, k, k1, b)
  }

  /** The persisted form of the BM25 statistics: the term-frequency
    * table plus its three derived aggregates, written once per corpus
    * version (same lifecycle as the trie's `writeIndexedTable` and the
    * IVF `ivfWrite`) so query batches pay ZERO corpus scans.
    */
  final case class Bm25Index(tf: DataFrame, dl: DataFrame, dfT: DataFrame, stats: DataFrame)

  private def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(F.col(idCol).as("did"), explode(DedupOps.tokens(F.col(textCol))).as("term"))
      .groupBy("did", "term").agg(count(lit(1)).as("tf"))

  private def docLengths(tf: DataFrame): DataFrame =
    tf.groupBy("did").agg(sum(F.col("tf")).as("dl"))

  private def docFreqs(tf: DataFrame): DataFrame =
    tf.groupBy("term").agg(count(lit(1)).as("df"))

  private def corpusStats(tf: DataFrame): DataFrame =
    docLengths(tf).agg(count(lit(1)).as("n"), sum(F.col("dl")).as("totdl"))

  /** Build the BM25 index frames from a corpus (no writes, no jobs -
    * pure plan construction; pair with [[bm25Write]]). */
  def bm25Build(docs: DataFrame, idCol: String, textCol: String): Bm25Index = {
    val tf = termFrequencies(docs, idCol, textCol)
    Bm25Index(tf, docLengths(tf), docFreqs(tf), corpusStats(tf))
  }

  /** Re-derive the three aggregate tables from a (did, term, tf) table -
    * the incremental-maintenance entry point
    * ([[graft.streaming.StreamOps.bm25Maintenance]] folds each batch
    * into tf and re-derives; tf is the ground truth the other three are
    * pure functions of).
    */
  def statsFromTf(tf: DataFrame): Bm25Index =
    Bm25Index(tf, docLengths(tf), docFreqs(tf), corpusStats(tf))

  def bm25Write(idx: Bm25Index, path: String): Unit = {
    // write tf FIRST, then derive the three aggregates from the written
    // parquet: the corpus tokenize+count runs once, and dl/df/stats
    // re-aggregate a compact columnar table instead of re-running the
    // full build plan per output
    idx.tf.write.mode("overwrite").parquet(s"$path/tf")
    val tf = idx.tf.sparkSession.read.parquet(s"$path/tf")
    docLengths(tf).write.mode("overwrite").parquet(s"$path/dl")
    docFreqs(tf).write.mode("overwrite").parquet(s"$path/df")
    corpusStats(tf).write.mode("overwrite").parquet(s"$path/stats")
  }

  def bm25Read(spark: org.apache.spark.sql.SparkSession, path: String): Bm25Index =
    Bm25Index(
      spark.read.parquet(s"$path/tf"),
      spark.read.parquet(s"$path/dl"),
      spark.read.parquet(s"$path/df"),
      spark.read.parquet(s"$path/stats"))

  /** Score a query batch against a built/read [[Bm25Index]] - the
    * retrieval half of [[bm25Search]]; pure plan construction (zero
    * jobs until an action), touching only the index tables, never the
    * corpus.
    */
  def bm25Query(
      idx: Bm25Index,
      queries: DataFrame,
      queryCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qTerms = queries
      .select(F.col(queryCol).as("query"), explode(DedupOps.tokens(F.col(queryCol))).as("term"))
      .distinct()
    val avgdl = F.col("totdl").cast(DoubleType) / F.col("n")
    val idf = F.log((F.col("n") - F.col("df") + lit(0.5)) / (F.col("df") + lit(0.5)) + lit(1.0))
    val termScore = idf * F.col("tf") * lit(k1 + 1) /
      (F.col("tf") + lit(k1) * (lit(1 - b) + lit(b) * F.col("dl") / avgdl))
    val byScore = Window.partitionBy("query")
      .orderBy(F.col("s").desc, F.col("did"))
    // the probe side is query-batch-sized; the tf table is
    // corpus-sized. Freshly-read parquet carries no stats, so without
    // the hint Catalyst can plan this as a full-tf shuffle join - pin
    // the index-probe shape (broadcast the batch, stream the postings).
    // CONTRACT: `queries` is a query batch, small by definition; the
    // hint is unconditional because sizing it would need a job at plan
    // construction (this function is pinned job-free). A caller scoring
    // a corpus-sized "query" frame should drop to a shuffle join by
    // passing batches - the broadcast limit will fail loudly, not
    // silently degrade.
    broadcast(qTerms)
      .join(idx.tf, "term")
      .join(idx.dl, "did")
      .join(idx.dfT, "term")
      .crossJoin(broadcast(idx.stats))
      .groupBy(F.col("query"), F.col("did"))
      .agg(sum(termScore.cast(DecimalType(38, 18))).as("s"))
      .withColumn("rank", row_number().over(byScore))
      .filter(F.col("rank") <= k)
      .select(F.col("query"), F.col("rank"),
        F.col("did").as("doc_id"),
        round(F.col("s").cast(DoubleType), 6).as("score"))
  }

  /** IR evaluation of a retrieval run against a relevance-judgment set
    * (qrels): per query, recall@k / precision@k / reciprocal rank -
    * how a retrieval stack (BM25, ANN, trigram, rerankers) is actually
    * tuned: run candidates at scale, score them against labeled
    * judgments, compare variants on the metric table.
    *
    * Inputs: `retrieved` rows (qid, doc, rank) with rank 1-based and
    * dense per query (a [[bm25Query]] / `SimilarityOps.bruteTopK`-shaped
    * frame); `qrels` rows (qid, doc) under the SAME column names -
    * binary relevance. Duplicates are tolerated on BOTH sides and
    * deduped internally: qrels on (qid, doc); the run on (qid, doc)
    * keeping the earliest rank, so a document listed twice inside
    * top-k (rerank unions, multi-index merges) counts once in
    * n_ret/n_hit and scores rr from its best position.
    *
    * Metric pitfall (why the integer fields are in the output): cross-
    * query AVERAGES of float metrics depend on summation order, which a
    * distributed engine does not fix - so this emits per-query rows
    * with the integer numerators/denominators (n_rel, n_hit,
    * first_rank) plus the three per-query divisions (deterministic
    * IEEE ops); a caller aggregates to MRR/mean-recall at whatever
    * grouping it needs, ideally from the integers.
    *
    * Scale shape: one equi-join of the (top-k-bounded) run against the
    * deduped qrels on (qid, doc), one qid aggregate, one join against
    * the qrel-count frame (query-count-sized; AQE broadcasts it). The
    * corpus itself never appears - only run and judgment rows move.
    *
    * Output: one row per qid present in `retrieved`:
    * (qid, n_rel, n_ret, n_hit, first_rank [0 = no hit], rr, recall_k,
    * precision_k), divisions rounded to 6dp.
    */
  def retrievalEval(
      retrieved: DataFrame,
      qidCol: String,
      docCol: String,
      rankCol: String,
      qrels: DataFrame,
      k: Int
  ): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val reserved = Set("gr_rel_hit", "gr_rank", "n_rel", "n_ret", "n_hit", "first_rank")
    require(!retrieved.columns.exists(reserved),
      s"retrieved must not already carry ${reserved.mkString("/")}; rename first")
    val rel = qrels.select(F.col(qidCol), F.col(docCol)).distinct()
    val nRel = rel.groupBy(F.col(qidCol)).agg(count(lit(1)).as("n_rel"))
    // Dedup the run on (qid, doc) keeping the best rank: a run that
    // lists the same document twice inside top-k (rerank unions,
    // multi-index merges) must not double-count the hit - n_ret/n_hit
    // count DISTINCT retrieved documents, rr uses the earliest rank.
    // Duplicate-free runs are unchanged (one row per group already).
    retrieved
      .filter(F.col(rankCol) <= k)
      .groupBy(F.col(qidCol), F.col(docCol))
      .agg(min(F.col(rankCol)).as("gr_rank"))
      .join(rel.withColumn("gr_rel_hit", lit(1)), Seq(qidCol, docCol), "left")
      .groupBy(F.col(qidCol))
      .agg(
        count(lit(1)).as("n_ret"),
        sum(coalesce(F.col("gr_rel_hit"), lit(0))).as("n_hit"),
        min(when(F.col("gr_rel_hit") === 1, F.col("gr_rank"))).as("gr_fr"))
      .join(nRel, Seq(qidCol), "left")
      .select(
        F.col(qidCol),
        coalesce(F.col("n_rel"), lit(0L)).as("n_rel"),
        F.col("n_ret"),
        F.col("n_hit"),
        coalesce(F.col("gr_fr"), lit(0)).cast(IntegerType).as("first_rank"),
        round(when(F.col("gr_fr").isNotNull,
          lit(1.0) / F.col("gr_fr").cast(DoubleType)).otherwise(0.0), 6).as("rr"),
        round(when(coalesce(F.col("n_rel"), lit(0L)) > 0,
          F.col("n_hit").cast(DoubleType) / F.col("n_rel").cast(DoubleType))
          .otherwise(0.0), 6).as("recall_k"),
        round(F.col("n_hit").cast(DoubleType) / lit(k.toDouble), 6).as("precision_k"))
  }
}
