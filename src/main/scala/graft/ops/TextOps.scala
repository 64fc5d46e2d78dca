package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data curation: tokenization,
  * language ID, quality scoring, fingerprinting. All pure column
  * expressions (whole-stage codegen, no UDFs) so they fuse into the scan
  * stage - at 100 TB these run at parquet-read speed.
  */
object TextOps {

  /** Whitespace word count. */
  def wordCount(text: Column): Column =
    size(DedupOps.tokens(text)).cast(IntegerType)

  /** BPE-ish subword token count: alpha runs, digit runs, and single
    * punctuation marks each count as one token (a cheap, deterministic
    * stand-in for a real tokenizer's token count). The alternatives are
    * disjoint character classes, so the count is engine-independent
    * (no lookaround - RE2-safe for the DuckDB oracle).
    */
  val subwordPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(subwordPattern), lit(0))).cast(IntegerType)

  /** Merge-table BPE token count - the real-tokenizer upgrade of
    * [[subwordCount]] for budgeting by what a model actually consumes:
    * the same three pre-token classes (letter runs / digit runs /
    * single punctuation, lowercased), each unit then split by the
    * checked-in public-GPT-2-format merge table
    * (src/main/resources/graft/bpe_merges.txt, loaded once per JVM -
    * see ExprKernels.bpeRanks). One codegen kernel call per row, memoized
    * per distinct unit, so the scan stays whole-stage-codegen'd; counts
    * replay engine-independently (the DuckDB oracle re-runs the merge
    * loop as a recursive CTE over the same interpolated ranks). Drop-in
    * `counter` for [[packSequences]] and the volume column for
    * [[graft.ops.SampleOps.tokenBudgetSample]].
    */
  def bpeTokenCount(text: Column): Column =
    graft.functions.GraftFunctions.bpe_count(lower(text))

  /** GPT-2-convention byte-level BPE token count - the published-
    * tokenizer interop path: the REAL GPT-2 pre-tokenizer (contraction
    * suffixes, space-led runs, case preserved), the bytes-to-unicode
    * table, and the checked-in vocab.bpe-format merge table
    * (src/main/resources/graft/vocab.bpe, `#version` header +
    * Ġ-marked word-initial tokens - swap in a real published
    * vocab.bpe and budgets account in that tokenizer's units).
    * Byte-level: any input, any script, no unknown tokens. One codegen
    * kernel call per row, memoized per distinct unit.
    */
  def bpeTokenCountPublic(text: Column): Column =
    graft.functions.GraftFunctions.bpe_count_public(text)

  /** The pre-token unit classes shared by [[bpeTokenCount]] (the
    * kernel lowercases first, so the classes are spelled lowercase):
    * letter runs, digit runs, single non-space punctuation.
    */
  val bpeUnitPattern = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]"

  /** TRAIN a BPE merge table from the corpus itself (Sennrich et al.
    * 2016) - the learning half of the tokenizer lifecycle whose
    * applying half is [[bpeTokenCount]]: `numMerges` rounds of "count
    * adjacent symbol pairs, merge the most frequent everywhere".
    *
    * Scale shape - the reason this trains on 100 TB: the corpus is
    * scanned ONCE, reducing map-side to the distinct pre-token units
    * and their frequencies (vocabulary-sized, the same reduction every
    * production BPE trainer makes). All `numMerges` rounds then run on
    * that unit table: one pair-count aggregation (pair-vocabulary-
    * sized), ONE collected row (the argmax pair - ties break on
    * count desc, pair lexicographic asc, so the learned table is
    * deterministic), and one per-row fold applying the merge. State is
    * localCheckpoint-ed per round - the collect forces each round
    * anyway, so lineage never stacks.
    *
    * The merge application is a single `aggregate` fold per unit:
    * greedy left-to-right, non-overlapping (after merging, the new
    * symbol is left||right, which can never equal `left` - right is
    * non-empty - so a just-merged symbol cannot chain into another
    * merge in the same pass; "aaa" under (a,a) becomes [aa, a]).
    * Pair counting counts every adjacent position ("aaa" counts (a,a)
    * twice), matching the reference algorithm.
    *
    * Stops early if the corpus runs out of mergeable pairs. Output:
    * (rank, lhs, rhs) - rank 0 is the first (most frequent) merge; the
    * table is exactly the GPT-2-format artifact [[bpeTokenCount]]
    * consumes.
    */
  def bpeTrain(
      df: DataFrame,
      textCol: String,
      numMerges: Int
  ): DataFrame = {
    require(numMerges > 0, s"need positive numMerges, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    var state = df
      .filter(F.col(textCol).isNotNull)
      .select(explode(
        regexp_extract_all(lower(F.col(textCol)), lit(bpeUnitPattern), lit(0))).as("u"))
      .groupBy("u")
      .agg(count(lit(1)).as("f"))
      .withColumn("toks", F.expr("filter(split(u, ''), x -> x <> '')"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var exhausted = false
    for (rank <- 0 until numMerges if !exhausted) {
      val top = state
        .filter(size(F.col("toks")) >= 2)
        .select(F.col("f"), explode(F.transform(
          sequence(lit(0), size(F.col("toks")) - 2),
          i => struct(
            element_at(F.col("toks"), i + 1).as("lhs"),
            element_at(F.col("toks"), i + 2).as("rhs")))).as("p"))
        .groupBy(F.col("p.lhs").as("lhs"), F.col("p.rhs").as("rhs"))
        .agg(sum("f").as("c"))
        .orderBy(F.col("c").desc, F.col("lhs").asc, F.col("rhs").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((rank, l, r))
        val prev = state
        state = state
          .withColumn("toks", F.aggregate(
            F.col("toks"),
            F.array().cast(ArrayType(StringType)),
            (acc, x) =>
              when(size(acc) > 0 &&
                  element_at(acc, -1) === lit(l) && x === lit(r),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
                .otherwise(concat(acc, array(x)))))
          .localCheckpoint()
        prev.queryExecution.analyzed.foreach {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
          case _ => ()
        }
      }
    }
    merges.toSeq.toDF("merge_rank", "lhs", "rhs")
  }

  /** Driver-side BPE training off the collected unit vocabulary - the
    * companion off-ramp to [[bpeTrain]] for learning LARGE merge
    * tables (thousands of ranks). The corpus is still scanned exactly
    * once, distributively, reducing map-side to the distinct
    * (unit, frequency) vocabulary - Zipf makes that vocabulary-sized,
    * not corpus-sized, so collecting it is bounded the same way the
    * union-find off-ramp in [[graft.ops.GraphOps]] is (`maxVocab`
    * guard, clear error pointing at the distributed path). Training
    * then iterates in driver memory, where `numMerges` rounds cost
    * seconds instead of 2 x numMerges Spark jobs.
    *
    * Bit-parity with [[bpeTrain]] by construction (TextOpsSpec): same
    * unit regex, same code-point initial split, same every-adjacent-
    * position weighted pair count, same greedy left-to-right merge
    * fold, and the same tie-break - count desc, then pair ascending in
    * UNSIGNED UTF-8 byte order, which is exactly the order Spark's
    * UTF8String sort gives the distributed trainer.
    *
    * Output: rank-ordered (rank, lhs, rhs) - the GPT-2-format artifact
    * [[bpeTokenCount]]'s checked-in table is generated from
    * (graft.tools.BpeMergesTool).
    */
  def bpeTrainLocal(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocab: Int = 1 << 20
  ): Seq[(Int, String, String)] = {
    require(numMerges > 0, s"need positive numMerges, got $numMerges")
    val vocab = df
      .filter(F.col(textCol).isNotNull)
      .select(explode(
        regexp_extract_all(lower(F.col(textCol)), lit(bpeUnitPattern), lit(0))).as("u"))
      .groupBy("u")
      .agg(count(lit(1)).as("f"))
      .limit(maxVocab + 1)
      .collect()
    require(vocab.length <= maxVocab,
      s"unit vocabulary exceeds maxVocab=$maxVocab; raise the cap or use " +
        "the distributed trainer bpeTrain")
    // unsigned UTF-8 byte order == Spark's UTF8String binary sort order
    // (a plain String compare is UTF-16 code-unit order and disagrees
    // on supplementary characters)
    def utf8Less(a: String, b: String): Boolean = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    def pairLess(a: (String, String), b: (String, String)): Boolean =
      if (a._1 != b._1) utf8Less(a._1, b._1) else utf8Less(a._2, b._2)
    // state: per distinct unit, its current symbol list + frequency
    val toks = vocab.map { r =>
      val u = r.getString(0)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < u.length) {
        val cp = u.codePointAt(i)
        buf += u.substring(i, i + Character.charCount(cp))
        i += Character.charCount(cp)
      }
      buf
    }
    val freq = vocab.map(_.getLong(1))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var exhausted = false
    var rank = 0
    while (rank < numMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        var j = 0
        while (j < t.length - 1) {
          counts.merge((t(j), t(j + 1)), freq(i), _ + _)
          j += 1
        }
        i += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: (String, String) = null
        var bestC = -1L
        counts.forEach { (p, c) =>
          if (c > bestC || (c == bestC && pairLess(p, best))) { best = p; bestC = c }
        }
        val (l, r) = best
        merges += ((rank, l, r))
        // the same greedy left-to-right non-overlapping fold bpeTrain
        // applies as a Spark `aggregate` expression
        i = 0
        while (i < toks.length) {
          val t = toks(i)
          if (t.length >= 2) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < t.length) {
              if (out.nonEmpty && out.last == l && t(j) == r)
                out(out.length - 1) = l + r
              else out += t(j)
              j += 1
            }
            if (out.length != t.length) { t.clear(); t ++= out }
          }
          i += 1
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Apply a LEARNED merge table (e.g. [[bpeTrain]]'s collected output
    * - a driver-side list, rank-ordered) and count the resulting
    * tokens per document: the composition that closes the tokenizer
    * lifecycle, train -> apply -> budget, with the corpus's own table
    * instead of the checked-in one [[bpeTokenCount]] reads.
    *
    * Shape: the corpus reduces to per-(doc, unit) multiplicities and
    * the DISTINCT unit vocabulary; the merge chain - one greedy
    * left-to-right `aggregate` fold per rank, exactly the fold
    * [[bpeTrain]] applies during training, chained in rank order -
    * runs once per distinct unit, not once per occurrence, and the
    * per-doc count is one join + sum over vocabulary-sized frames.
    * Order matters and is honored: merges apply strictly in rank
    * order, so the segmentation equals the trainer's final state.
    *
    * Output: (idCol, n_learned_tokens), documents with null text
    * absent.
    */
  def bpeApplyCount(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]
  ): DataFrame = {
    val docUnits = df
      .filter(F.col(textCol).isNotNull)
      .select(F.col(idCol), explode(
        regexp_extract_all(lower(F.col(textCol)), lit(bpeUnitPattern), lit(0))).as("u"))
      .groupBy(F.col(idCol), F.col("u"))
      .agg(count(lit(1)).as("n_units"))
    val folded = merges.foldLeft(
      F.expr("filter(split(u, ''), x -> x <> '')")) { case (toksCol, (l, r)) =>
      F.aggregate(
        toksCol,
        F.array().cast(ArrayType(StringType)),
        (acc, x) =>
          when(size(acc) > 0 &&
              element_at(acc, -1) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(x))))
    }
    val unitTokens = docUnits.select("u").distinct()
      .withColumn("n_toks", size(folded))
    docUnits
      .join(unitTokens, "u")
      .groupBy(F.col(idCol))
      .agg(sum(F.col("n_units") * F.col("n_toks")).cast(IntegerType)
        .as("n_learned_tokens"))
  }

  /** Perplexity-style quality score from the corpus's OWN bigram
    * statistics - the CCNet/KenLM curation step re-expressed with
    * integer-exact arithmetic: per-document mean bigram surprisal,
    * where -log2 P(w2|w1) under add-V smoothing
    * (`log2(c(w1)+V) - log2(c(w1 w2)+1)`) is computed with the same
    * monotone integer log-code family as [[SketchOps.hdrSketch]]
    * (`ilog32(x) = 32*(e-5) + (x >> (e-5))`, `e = bitlen-1` via
    * `length(bin(x))` - a piecewise-linear 32*log2 within ~3%). Counts
    * are pre-scaled by 2^8 before coding so every value lands in the
    * LOG region of the code: the sub-32 linear region would flatten
    * rare-bigram surprisal (the common case in the tail) and invert
    * rankings; the scaling's +8-octave offset cancels exactly in the
    * difference. All integer until the final division, so the score
    * replays engine-exactly - a float-log variant cannot (ln
    * boundaries diverge in the last ulp).
    *
    * Low mean surprisal = the corpus predicts the document's bigrams
    * well = template/boilerplate/repetitive text; high = rare
    * constructions or garbage. Both tails are the standard filter cuts.
    *
    * Scale shape: two type-table-sized aggregates (map-side combined),
    * one type-level join to form per-bigram surprisal, then ONE
    * shuffle join of the exploded corpus bigrams against that
    * bigram-type table and a per-doc sum. Documents with fewer than 2
    * tokens are absent (no bigram evidence), like
    * [[diversityByStratum]]'s empty strata.
    *
    * Output: (idCol, n_bigrams, surprisal, avg_bits).
    */
  def bigramSurprisal(
      df: DataFrame,
      idCol: String,
      textCol: String,
      smoothV: Long = 4096L
  ): DataFrame = {
    require(smoothV >= 1, s"need smoothing >= 1, got $smoothV")
    def ilog32(name: String): String =
      s"CASE WHEN $name < 32 THEN $name ELSE " +
        s"(length(bin($name)) - 6) * 32 + shiftright($name, length(bin($name)) - 6) END"
    val bgs = df
      .filter(F.col(textCol).isNotNull)
      .select(F.col(idCol), graft.ops.DedupOps.tokens(F.col(textCol)).as("tks"))
      .filter(size(F.col("tks")) >= 2)
      .select(F.col(idCol), explode(F.expr(
        "transform(sequence(1, size(tks) - 1), " +
          "i -> struct(tks[i-1] AS w1, concat(tks[i-1], ' ', tks[i]) AS bg))")).as("p"))
      .select(F.col(idCol), F.col("p.w1").as("w1"), F.col("p.bg").as("bg"))
    val c1 = bgs.groupBy("w1").agg(count(lit(1)).as("c1")) // history counts
    val c2 = bgs.groupBy("w1", "bg").agg(count(lit(1)).as("c2"))
    val typeSurprisal = c2.join(c1, "w1")
      .withColumn("x1", (F.col("c1") + lit(smoothV)) * lit(256L))
      .withColumn("x2", (F.col("c2") + lit(1L)) * lit(256L))
      .select(F.col("bg"),
        (expr(ilog32("x1")) - expr(ilog32("x2"))).as("s"))
    bgs.join(typeSurprisal, "bg")
      .groupBy(F.col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("s").as("surprisal"))
      .withColumn("avg_bits",
        F.col("surprisal").cast(DoubleType) /
          (F.col("n_bigrams") * 32).cast(DoubleType))
  }

  /** Seed-trained token-level quality classifier - the
    * CCNet/FineWeb-style "train a linear model on a trusted seed slice,
    * score everything" curation stage, as a multinomial Naive Bayes
    * log-odds scorer with the SAME integer log-code family as
    * [[bigramSurprisal]] (so it replays engine-exactly; a float-log
    * NB cannot). `labelCol` marks the seed: true = trusted/positive
    * slice, false = background. Per token type with add-one smoothing,
    *
    *   w(t) = [log2(cPos(t)+1) - log2(NPos+V)]
    *        - [log2(cNeg(t)+1) - log2(NNeg+V)]
    *
    * each log2 taken as the 32-per-octave integer code on the
    * 2^8-pre-scaled count (offsets cancel in the difference, same
    * argument as [[bigramSurprisal]]); a document's score is the sum
    * of w over its token occurrences, `predicted = score >= 0`. The
    * class prior is deliberately absorbed into the caller's threshold
    * (the standard practice - curation picks the cut on the score
    * distribution, not at NB's 0).
    *
    * Scale shape: token explode -> ONE type-level aggregate (map-side
    * combined; the type table is vocabulary-sized, not corpus-sized)
    * -> a single-row totals frame broadcast-cross-joined onto the type
    * table (one row, never a shuffle) -> one equi-join of corpus
    * tokens against the weight table + per-doc sum. Exactly
    * [[bigramSurprisal]]'s plan with a vocabulary in place of a bigram
    * table. Requires both label values to be present for the weights
    * to mean anything (an all-one-class corpus degenerates to
    * smoothing-only weights; it still executes).
    *
    * Output: (idCol, n_tokens, score, avg_bits, predicted) - one row
    * per labeled document with >= 1 token.
    */
  def nbQualityFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String
  ): DataFrame = {
    def ilog32(name: String): String =
      s"CASE WHEN $name < 32 THEN $name ELSE " +
        s"(length(bin($name)) - 6) * 32 + shiftright($name, length(bin($name)) - 6) END"
    val tok = df
      .filter(F.col(textCol).isNotNull && F.col(labelCol).isNotNull)
      .select(F.col(idCol), F.col(labelCol).as("lbl"),
        explode(graft.ops.DedupOps.tokens(F.col(textCol))).as("t"))
    val types = tok.groupBy("t").agg(
      sum(when(F.col("lbl"), 1L).otherwise(0L)).as("cp"),
      sum(when(F.col("lbl"), 0L).otherwise(1L)).as("cn"))
    val totals = types.agg(
      sum("cp").as("np"), sum("cn").as("nn"), count(lit(1)).as("v"))
    val weights = types.crossJoin(broadcast(totals))
      .withColumn("xp", (F.col("cp") + lit(1L)) * lit(256L))
      .withColumn("xn", (F.col("cn") + lit(1L)) * lit(256L))
      .withColumn("tp", (F.col("np") + F.col("v")) * lit(256L))
      .withColumn("tn", (F.col("nn") + F.col("v")) * lit(256L))
      .select(F.col("t"),
        (expr(ilog32("xp")) - expr(ilog32("tp"))
          - expr(ilog32("xn")) + expr(ilog32("tn"))).as("w"))
    tok.join(weights, "t")
      .groupBy(F.col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("score"))
      .withColumn("avg_bits",
        F.col("score").cast(DoubleType) /
          (F.col("n_tokens") * 32).cast(DoubleType))
      .withColumn("predicted", F.col("score") >= 0L)
  }

  /** Quality-ranked token-budget selection - the FineWeb-Edu-style
    * "take the best-scoring documents until the budget is spent"
    * recipe, composing [[nbQualityFilter]] with a distributed prefix
    * sum: rank every labeled document by its NB score (descending,
    * doc-id tiebreak - a total order), accumulate token counts along
    * that order with [[graft.ops.ShardOps.runningTotal]] (range
    * partition + per-partition windows + broadcast offsets - never a
    * single-partition funnel), and keep the prefix whose cumulative
    * token count stays within `budgetTokens`. Deterministic: the kept
    * set is a pure function of (corpus, labels, budget).
    *
    * Output: (idCol, n_tokens, score, cum_tokens), the selected
    * documents.
    */
  def qualityBudget(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      budgetTokens: Long
  ): DataFrame = {
    require(budgetTokens >= 0, s"budget must be non-negative, got $budgetTokens")
    val scored = nbQualityFilter(df, idCol, textCol, labelCol)
      .select(F.col(idCol), F.col("n_tokens"), F.col("score"))
    graft.ops.ShardOps
      .runningTotal(scored, Seq(F.col("score").desc, F.col(idCol)), "n_tokens")
      .filter(F.col("running_total") <= budgetTokens)
      .select(F.col(idCol), F.col("n_tokens"), F.col("score"),
        F.col("running_total").as("cum_tokens"))
  }

  /** Lexical-diversity report per stratum (source, language, shard...):
    * type-token ratio and distinct-bigram ratio - the standard cheap
    * screens for template-generated or highly repetitive sources (a
    * source whose TTR collapses against its peers is boilerplate or
    * spam long before a human reads it), and the corpus-level
    * complement of the per-document repetition score.
    *
    * Two explode+aggregate passes (tokens, bigrams WITH multiplicity -
    * diversity is about repeated use, so no distinct-ing before the
    * count); outputs are strata-sized.
    *
    * Output: (stratum, n_docs, n_tokens, n_types, ttr, n_bigrams,
    * distinct_bigram_ratio) - ratios NULL for empty denominators.
    */
  def diversityByStratum(
      df: DataFrame,
      textCol: String,
      strataCol: String
  ): DataFrame = {
    val base = df
      .filter(F.col(textCol).isNotNull && F.col(strataCol).isNotNull)
      .select(F.col(strataCol).as("stratum"),
        graft.ops.DedupOps.tokens(F.col(textCol)).as("tks"))
    val uni = base
      .select(F.col("stratum"), explode(F.col("tks")).as("tok"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_tokens"), countDistinct(F.col("tok")).as("n_types"))
    val bi = base
      .select(F.col("stratum"), explode(F.expr(
        "CASE WHEN size(tks) >= 2 THEN transform(sequence(1, size(tks) - 1), " +
          "i -> concat(tks[i-1], ' ', tks[i])) ELSE array() END")).as("bg"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_bigrams"), countDistinct(F.col("bg")).as("n_dbigrams"))
    val nd = base.groupBy("stratum").agg(count(lit(1)).as("n_docs"))
    nd.join(uni, Seq("stratum"), "left").join(bi, Seq("stratum"), "left")
      .select(F.col("stratum"), F.col("n_docs"),
        coalesce(F.col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(F.col("n_types"), lit(0L)).as("n_types"),
        when(F.col("n_tokens") > 0,
          round(F.col("n_types").cast(DoubleType) / F.col("n_tokens"), 6)).as("ttr"),
        coalesce(F.col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(F.col("n_bigrams") > 0,
          round(F.col("n_dbigrams").cast(DoubleType) / F.col("n_bigrams"), 6))
          .as("distinct_bigram_ratio"))
  }

  /** Tokenize to one row per (id, pos, token). */
  def tokenize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(F.col(idCol), posexplode(DedupOps.tokens(F.col(textCol))).as(Seq("pos", "token")))

  /** Canonical text normalization: Unicode NFC composition (native
    * codegen expression - composed "é" and decomposed "e"+U+0301
    * become one word), lowercase, whitespace runs collapsed to a single
    * space, ends trimmed. The standard first stage of a curation
    * pipeline: every downstream exact-dedup hash, shingle, and token
    * depends on this canonicalization being deterministic.
    *
    * Pure column expression chain - fuses into the parquet scan
    * (whole-stage codegen, no shuffle, no UDF).
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      lower(graft.functions.GraftFunctions.nfc_normalize(text)),
      "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** HTML -> text extraction - the standard FIRST step of a web-crawl
    * curation pipeline (before any dedup/quality/tokenize stage sees
    * the document): drop `<script>`/`<style>` subtrees wholesale (their
    * content is code, not prose), drop comments, strip remaining tags
    * to spaces, decode numeric character references generally
    * ([[decodeNumericRefs]] - any Unicode scalar, decimal or hex),
    * unescape the five ubiquitous named entities, collapse
    * whitespace. Deliberately regex-subset-portable: every pattern
    * avoids backreferences and uses only `(?is)` flags + lazy
    * quantifiers, the common ground of Java regex (Spark) and RE2
    * (DuckDB) - which is what lets the oracle replay the chain
    * byte-for-byte. A full DOM parse adds boilerplate-block scoring
    * (main-content extraction) but runs per-row in the same scan; this
    * chain is the codegen'd, shuffle-free 95% case.
    */
  /** The numeric-character-reference pattern [[decodeNumericRefs]]
    * splits and extracts on - decimal (`&#233;`, 1-7 digits) and hex
    * (`&#xE9;`, 1-6 digits) forms, Java-regex/RE2 common subset.
    */
  val numRefPattern = "&#[0-9]{1,7};|&#[xX][0-9A-Fa-f]{1,6};"

  /** Decode HTML numeric character references (`&#233;` -> e-acute,
    * `&#x1F600;` -> the emoji) - the GENERAL decoder, any Unicode
    * scalar value, not an entity lookup table. Expression-level and
    * oracle-replayable:
    *
    *   - split the string on [[numRefPattern]] (n+1 literal parts) and
    *     extract the n refs, then refold parts and decoded refs with
    *     one higher-order `aggregate` - per-row work, no explode;
    *   - a ref decodes through its code point: hex/decimal digits ->
    *     int, then UTF-16 code units rendered as hex bytes and decoded
    *     with the UTF-16BE charset (Spark has no code-point-to-string
    *     function; `chr` is mod-256) - supplementary-plane refs take
    *     the surrogate-pair arithmetic branch;
    *   - out-of-range (0, > U+10FFFF) and surrogate-range references
    *     are left as literal text, mirroring a lenient browser.
    *
    * Double-escaped input (`&amp;#39;`) stays literal: the pattern
    * needs `&#` adjacency, which `&amp;#...` does not contain - run
    * this BEFORE the named-entity replaces (the [[stripHtml]] order).
    *
    * ONE codegen kernel call ([[graft.functions.DecodeNumRefs]]): the
    * split + extract_all + interpreted `aggregate` refold this
    * replaced re-evaluated the whole upstream strip chain once per
    * fold STEP (interpreted HOF lambdas get no common-subexpression
    * elimination, and `parts`/`refs` each root the full regex chain) -
    * measured ~3 ms/doc, 16s of a 5,000-doc text_strip_html scan; the
    * kernel is one linear pass.
    */
  def decodeNumericRefs(c: Column): Column =
    graft.functions.GraftFunctions.decode_num_refs(c)

  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    // numeric refs decode BEFORE the named replaces so &amp;#39; stays
    // literal "&#39;" (the pattern needs &# adjacency); the named fold
    // keeps &amp; LAST for the same single-decode discipline
    val noNumRefs = decodeNumericRefs(noTags)
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&nbsp;" -> " ", "&amp;" -> "&" // amp LAST: &amp;lt; is literal "&lt;"
    ).foldLeft(noNumRefs) { case (c, (from, to)) =>
      F.replace(c, lit(from), lit(to)) // literal replace: no regex dialect in play
    }
    trim(regexp_replace(unescaped, "[ \\t\\n\\x0B\\f\\r]+", " "))
  }

  /** LINE-preserving HTML -> text extraction - the WET-extractor
    * variant of [[stripHtml]]: `<br>` and block-CLOSING tags (`</p>`,
    * `</div>`, `</h1..6>`, `</li>`, `</tr>`) become newlines, every
    * other tag (and script/style/comment content) is removed, entities
    * decode identically to [[stripHtml]] - and NO whitespace collapse
    * runs, because the line structure IS the output's point: this is
    * the extraction that feeds line-granular cleaning
    * ([[c4LineFilter]], [[dedupLines]]), where [[stripHtml]]'s
    * newline-collapsing single-string shape would destroy every line
    * boundary before the filters could see one. Inline tags strip to
    * "" (not " ") so within-word markup (`co<b>ol</b>`) does not split
    * words - the jusText-style choice; block boundaries, which would
    * otherwise join, are exactly the tags that newline (a TRAILING
    * block-closer therefore yields a trailing newline - formatting the
    * line consumers treat as a blank line). All patterns in the
    * Java-regex/RE2 common subset; null html stays null.
    */
  /** Sentence segmentation (the boundary pass between documents and
    * chunking/packing: sentence-aligned chunks beat arbitrary word
    * cuts for training examples). Deliberately simple, REPLAYABLE
    * contract: a boundary is one-or-more terminators (`.!?`) followed
    * by whitespace; pieces trim, empties drop. The boundary run itself
    * is consumed (interior sentences lose their terminal punctuation -
    * the trade for staying in the RE2 subset on BOTH engines: the
    * keep-the-terminator split needs lookbehind, which RE2 refuses).
    * Abbreviation false-splits ("Dr. Smith") are accepted and
    * documented - at corpus scale they shorten some sentences, never
    * corrupt text. Pure codegen; fuses into the scan.
    */
  def sentences(text: Column): Column =
    F.filter(F.transform(split(text, "[.!?]+[ \\t\\n\\x0B\\f\\r]+"),
      (s: Column) => trim(s)), (s: Column) => s =!= "")

  /** Flesch-style readability signals (the classic prose-difficulty
    * screen - a quality dimension the length/punctuation heuristics
    * miss: wall-of-jargon text scores low, simple prose high). Inputs
    * are exact integer counts, so the fixed-coefficient double
    * formula replays bit-for-bit:
    *
    *   flesch = 206.835 - 1.015·(words/sentences) - 84.6·(syllables/words)
    *
    * with syllables approximated as VOWEL GROUPS (`[aeiouy]+` runs
    * over the lowercased text - the standard cheap proxy; word
    * boundaries don't affect the corpus-level sum) and sentences from
    * [[sentences]]. Degenerate docs (no words or no sentences) score
    * NULL rather than dividing by zero. Pure codegen projections.
    *
    * Adds: n_sentences, n_words, n_syllables, flesch.
    */
  def readability(df: DataFrame, textCol: String): DataFrame = {
    val t = F.col(textCol)
    val nS = F.size(sentences(t))
    val nW = F.size(F.filter(split(trim(t), "\\s+"), (w: Column) => w =!= ""))
    val nY = F.size(F.regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0)))
    df.withColumn("n_sentences", nS)
      .withColumn("n_words", nW)
      .withColumn("n_syllables", nY)
      .withColumn("flesch",
        when(F.col("n_sentences") > 0 && F.col("n_words") > 0,
          lit(206.835) -
            lit(1.015) * (F.col("n_words").cast(DoubleType) / F.col("n_sentences")) -
            lit(84.6) * (F.col("n_syllables").cast(DoubleType) / F.col("n_words")))
          .otherwise(lit(null).cast(DoubleType)))
  }

  def stripHtmlLines(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", "")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", "")
    val breaks = regexp_replace(noComment,
      "(?i)<br\\s*/?>|</p>|</div>|</h[1-6]>|</li>|</tr>", "\n")
    val noTags = regexp_replace(breaks, "<[^>]+>", "")
    val noNumRefs = decodeNumericRefs(noTags)
    Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noNumRefs) { case (c, (from, to)) =>
      F.replace(c, lit(from), lit(to))
    }
  }

  /** Vocabulary coverage: per-document token and out-of-vocabulary
    * counts against the corpus's own top-`vocabSize` token types
    * (frequency desc, token asc on ties - fully deterministic). High
    * OOV rate flags mis-tokenized, non-target-language, or garbage
    * documents; the vocabulary itself is the input to subword-tokenizer
    * training. Documents with no tokens (null/blank text) are absent
    * from the output.
    *
    * Scale shape: token counting is one map-side-combined aggregate on
    * the token type (type-table-sized, like the bigram LM); the top-V
    * cut is a TakeOrdered of the type table, V rows; the vocabulary
    * joins back BROADCAST, so the per-document pass is one scan plus
    * one aggregate on the doc id - no corpus-sized shuffle beyond it.
    *
    * Output: (id, n_tokens, n_oov, oov_rate rounded to 6dp).
    */
  def vocabOov(df: DataFrame, idCol: String, textCol: String, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val toks = df.filter(F.col(textCol).isNotNull)
      .select(F.col(idCol).as("id"), explode(DedupOps.tokens(F.col(textCol))).as("tok"))
    val vocab = toks.groupBy(F.col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(F.col("cnt").desc, F.col("tok").asc)
      .limit(vocabSize)
      .select(F.col("tok"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(F.col("id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(F.col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(F.col("id"), F.col("n_tokens"), F.col("n_oov"),
        round(F.col("n_oov").cast(DoubleType) / F.col("n_tokens"), 6).as("oov_rate"))
  }

  /** Sound (lossless) length-band prefilter for `jaro_winkler(a, b) >=
    * threshold`: evaluates to true for EVERY pair that can reach the
    * threshold, using only the two byte lengths - so it runs before the
    * O(|a|*|b|) kernel and prunes the bulk of a candidate scan.
    *
    * Derivation (all lengths in UTF-8 bytes, matching the kernel's
    * DuckDB-pinned byte semantics):
    *   - the Winkler boost adds at most 0.4*(1-J) (prefix capped at 4,
    *     p = 0.1), so JW >= t forces Jaro J >= (t - 0.4) / 0.6 (and when
    *     no boost applies, J >= t, which is even stronger for t <= 1);
    *   - J = (m/|a| + m/|b| + (m - floor(tau))/m) / 3 with matches
    *     m <= min(|a|,|b|): the m/min and transposition terms are <= 1
    *     and m/max <= min/max, so J <= (2 + min/max) / 3;
    *   - combining: min/max >= 3*J - 2 >= 3*(t-0.4)/0.6 - 2 = 5t - 4.
    * A 1e-6 slack absorbs the caller's round(jw, 6) >= t convention
    * (round-to-6dp admits jw >= t - 5e-7). Vacuous (always true) for
    * t <= 0.8, where 5t - 4 <= 0 bounds nothing.
    */
  def jwLengthBand(a: Column, b: Column, threshold: Double): Column = {
    val ratio = 5.0 * (threshold - 1e-6) - 4.0
    if (ratio <= 0) lit(true)
    else {
      val (la, lb) = (octet_length(a), octet_length(b))
      least(la, lb).cast(DoubleType) >= lit(ratio) * greatest(la, lb)
    }
  }

  /** Pack documents into token-budgeted training sequences - the batch
    * assembly stage that follows chunking in an LLM data pipeline:
    * short documents are concatenated until the next would overflow
    * `budget` tokens, which starts a new sequence (greedy first-fit, a
    * codegen kernel - the reset-on-overflow recurrence is sequential,
    * so prefix sums can't express it).
    *
    * Scale shape: packing runs independently inside `nGroups`
    * deterministic groups (`id % nGroups` - engine-portable, never a
    * hash only Spark can compute), in ascending id order within each
    * group. ONE shuffle on the group key; each group's state is a
    * (id, n_tokens) pair list - document SIZES, never text - so a group
    * of 100k docs costs ~1.6 MB. Groups pack in parallel; sequences are
    * keyed (grp, seq) so no coordination crosses groups. A document
    * longer than the budget gets a sequence of its own (callers chunk
    * first - [[chunkDocuments]] - when that matters).
    *
    * Empty and NULL documents are dropped (they carry no tokens).
    * Output: (idCol, grp, seq, n_tokens, seq_total); (grp, seq) is the
    * sequence key, seq_total its token fill.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      nGroups: Int = 64,
      counter: Column => Column = wordCount
  ): DataFrame = {
    require(budget > 0 && nGroups > 0, s"need budget > 0, nGroups > 0; got $budget, $nGroups")
    import org.apache.spark.sql.expressions.Window
    val t = df.select(F.col(idCol).as("id"), counter(F.col(textCol)).as("n"))
      .filter(F.col("n").isNotNull && F.col("n") > 0)
      .withColumn("grp", pmod(F.col("id"), lit(nGroups)).cast(IntegerType))
    val packed = t.groupBy("grp")
      // sort_array on struct(id, n) orders by id asc (first field wins)
      .agg(sort_array(collect_list(struct(F.col("id"), F.col("n")))).as("items"))
      .select(F.col("grp"), F.col("items"),
        graft.functions.GraftFunctions.greedy_pack(
          transform(F.col("items"), x => coalesce(x.getField("n"), lit(0))),
          budget).as("bins"))
    packed
      .select(F.col("grp"), explode(arrays_zip(F.col("items"), F.col("bins"))).as("z"))
      .select(
        F.col("z.items.id").as(idCol),
        F.col("grp"),
        F.col("z.bins").as("seq"),
        F.col("z.items.n").as("n_tokens"))
      .withColumn("seq_total",
        sum(F.col("n_tokens").cast(LongType)).over(Window.partitionBy("grp", "seq")))
  }

  /** Materialize [[packSequences]] assignments as actual training
    * text: one row per (grp, seq) with the members' normalized token
    * streams concatenated in ascending id order. Output text is bounded
    * by the pack budget (members total <= budget tokens unless a single
    * oversized doc owns the sequence), so the collect_list per sequence
    * is small by construction.
    *
    * Output: (grp, seq, n_docs, seq_total, seq_text).
    */
  def packSequenceTexts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      nGroups: Int = 64
  ): DataFrame = {
    val packed = packSequences(df, idCol, textCol, budget, nGroups)
    val norm = df.select(F.col(idCol).as("pid"),
      array_join(DedupOps.tokens(F.col(textCol)), " ").as("norm"))
    packed.join(norm, packed(idCol) === F.col("pid"))
      .groupBy("grp", "seq")
      .agg(
        count(lit(1)).as("n_docs"),
        // identical for every member of the sequence by construction
        max(F.col("seq_total")).as("seq_total"),
        array_join(
          transform(
            sort_array(collect_list(struct(F.col(idCol), F.col("norm")))),
            x => x.getField("norm")),
          " ").as("seq_text"))
  }

  /** Split documents into token-budgeted training chunks with overlap -
    * the standard context-window packing stage of an LLM data pipeline.
    *
    * Chunk k starts at token offset k * (budget - overlap); every chunk
    * carries up to `budget` tokens, consecutive chunks share exactly
    * `overlap` tokens, and a tail start whose remaining tokens would be
    * wholly contained in the previous chunk is NOT emitted (no chunk is
    * a subset of another). Empty/NULL documents yield no chunks.
    *
    * Scale shape: pure per-row 1->N expansion (sequence + explode +
    * slice, all codegen) - zero shuffles, runs at scan speed, and the
    * output order/content is a deterministic function of the row, so the
    * DuckDB oracle replays it exactly.
    *
    * Output: (idCol, chunk_idx, n_tokens, chunk).
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      overlap: Int
  ): DataFrame = {
    require(overlap >= 0 && budget > overlap,
      s"need 0 <= overlap < budget, got budget=$budget overlap=$overlap")
    val stride = budget - overlap
    df.select(F.col(idCol), DedupOps.tokens(F.col(textCol)).as("tk"))
      .withColumn("len", size(F.col("tk")))
      .filter(F.col("len") > 0)
      // starts: 0, stride, 2*stride, ... <= max(len - overlap - 1, 0):
      // s = 0 always emits; s > 0 emits iff len - s > overlap (strictly
      // new content vs the previous chunk)
      .select(
        F.col(idCol), F.col("tk"), F.col("len"),
        explode(sequence(lit(0),
          greatest(F.col("len") - lit(overlap + 1), lit(0)), lit(stride))).as("s"))
      .select(
        F.col(idCol),
        (F.col("s") / stride).cast(IntegerType).as("chunk_idx"),
        least(lit(budget), F.col("len") - F.col("s")).cast(IntegerType).as("n_tokens"),
        array_join(slice(F.col("tk"), F.col("s") + 1, lit(budget)), " ").as("chunk"))
  }

  /** The trained language-ID profile: (language codes in alphabetical
    * order - also the deterministic argmax tie-break order - and the
    * trigram -> per-language integer weight vectors), loaded from the
    * checked-in table graft/lang_profiles.tsv generated by
    * [[graft.tools.LangProfilesTool]] (26-language character-trigram
    * multinomial Naive Bayes over embedded seed prose, weights as
    * 32-per-octave integer log codes - the repo's standard
    * engine-exact log family).
    */
  lazy val langProfiles: (Seq[String], Map[String, Seq[Long]]) = {
    // the Seq/Map VIEW of the kernel's table (one parse per JVM,
    // graft.functions.ExprKernels.langTable): the oracle SQL is
    // interpolated from this view, so the scoring kernel and its
    // replay cannot load different tables
    val (langs, table) = graft.functions.ExprKernels.langTable
    val rows = Map.newBuilder[String, Seq[Long]]
    table.forEach((g, ws) => rows += g -> ws.toSeq)
    (langs.toSeq, rows.result())
  }

  /** Expected dominant [[scriptClasses]] class per [[langId]] language
    * - the consistency contract between the two signals ("lang=ru but
    * 40% latin" is a mislabel or spam). Languages whose script the
    * class table does not range (Hangul ko, Devanagari hi) map to
    * "other", which is exactly what [[scriptProfile]] emits for them.
    * ONE definition, used by the Spark column and (interpolated) by
    * the oracle.
    */
  val langExpectedScript: Map[String, String] = Map(
    "ar" -> "arabic", "bg" -> "cyrillic", "bn" -> "other", "ca" -> "latin",
    "cs" -> "latin", "da" -> "latin", "de" -> "latin", "el" -> "greek",
    "en" -> "latin", "es" -> "latin", "et" -> "latin", "eu" -> "latin",
    "fa" -> "arabic", "fi" -> "latin", "fr" -> "latin", "he" -> "other",
    "hi" -> "other", "hr" -> "latin", "hu" -> "latin", "id" -> "latin",
    "it" -> "latin", "ja" -> "cjk", "ko" -> "other", "lt" -> "latin",
    "lv" -> "latin", "nl" -> "latin", "no" -> "latin", "pl" -> "latin",
    "pt" -> "latin", "ro" -> "latin", "ru" -> "cyrillic", "sk" -> "latin",
    "sl" -> "latin", "sr" -> "cyrillic", "sv" -> "latin", "sw" -> "latin",
    "ta" -> "other", "th" -> "other", "tr" -> "latin", "uk" -> "cyrillic",
    "vi" -> "latin", "zh" -> "cjk")

  /** The language-ID normalization, column-side: lowercase, every
    * character that is not a letter or combining mark to a space,
    * collapse runs, trim. `\p{L}`/`\p{M}` spell and match identically
    * in Java regex and RE2, so the DuckDB oracle replays it
    * byte-exactly; [[graft.tools.LangProfilesTool.normalize]] is the
    * same function host-side (training and scoring MUST agree).
    */
  def langNormalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{M}]", " "), " +", " "))

  /** Language identification over 42 languages (ar bg bn ca cs da de
    * el en es et eu fa fi fr he hi hr hu id it ja ko lt lv nl no pl
    * pt ro ru sk sl sr sv sw ta th tr uk vi zh):
    * mixed character 1/2/3-gram multinomial Naive Bayes with the
    * TRAINED integer weight table ([[langProfiles]]) - the langid.py
    * feature recipe: unigrams carry script and letter-frequency
    * evidence (what separates CJK text a short profile cannot cover
    * with exact trigrams), bigrams/trigrams the orthography (what
    * separates da/no or es/pt). Scoring: normalize
    * ([[langNormalize]]), cap at 256 chars (language evidence
    * saturates long before that; the cap bounds per-row cost at scan
    * speed), slide 1/2/3-char windows, sum each matched gram's
    * per-language weight vector, and take the argmax (alphabetical
    * first-wins tie-break). 'und' when the text is NULL or no gram
    * hits the vocabulary (no evidence).
    *
    * Scale shape: a pure per-row column - ONE codegen kernel call
    * ([[graft.functions.LangIdScore]]) whose weight table is a static
    * JVM HashMap loaded once per executor from the classpath resource
    * (the ExprKernels.bpeRanks stance): O(1) probe per gram, ~765
    * probes per capped doc, no shuffle, fuses into the scan. The
    * map-LITERAL spelling this replaced (`element_at(typedLit(prof),
    * g)` inside an interpreted higher-order-function fold)
    * linear-scanned all ~12k keys per gram - measured ~51 ms per
    * 300-char document, ~10^4 core-years at 100 TB; the kernel form
    * scores the same table at scan speed. Integer weights end-to-end,
    * so the DuckDB oracle replays the exact scores from the same
    * interpolated table.
    */
  def langId(text: Column): Column =
    when(text.isNull, lit("und")).otherwise(
      graft.functions.GraftFunctions.lang_id_score(
        substring(langNormalize(text), 1, 256)))

  /** Language histogram bin of `text`: the 1-based index of [[langId]]'s
    * verdict in the alphabetical [[langProfiles]] language list, 0 for
    * 'und' - the integer cell id that lets the 42-category language mix
    * ride the numeric histogram/PSI machinery
    * ([[graft.ops.StatOps.psiFromHistograms]], cells in [0, 42] within
    * its [-1, bins] contract). ONE definition shared by the batch
    * drift query and the streaming monitor
    * ([[graft.streaming.StreamOps.langMixMaintenance]]).
    */
  def langBin(text: Column): Column =
    coalesce(
      array_position(typedLit(langProfiles._1), langId(text)),
      lit(0L)).cast(IntegerType)

  /** Unicode-script classes counted by [[scriptProfile]], in DOMINANCE
    * order (the tie-break: earlier wins on equal counts). Explicit
    * code-point RANGES, not `\p{Script}` properties: the property
    * NAMES differ between Java regex (`IsCyrillic`) and RE2
    * (`Cyrillic`), while `\x{...}` ranges are spelled - and match -
    * identically in both engines, which is what lets the oracle replay
    * the counts byte-for-byte. BMP-only ranges, so UTF-16 `length`
    * (Spark) and code-point `length` (DuckDB) agree.
    */
  val scriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{00C0}-\\x{024F}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]",
    "cjk" -> "[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "digit" -> "[0-9]")

  /** Per-document Unicode-script profile - the script-level complement
    * of [[langId]] a multilingual curation pass cuts on first (a
    * "lang=en" doc that is 40% CJK is mislabeled or spam; a corpus
    * slice suddenly trending Cyrillic is a drift signal): per script
    * class, the character count (`n_<class>`), total characters, and
    * the dominant class (most characters; [[scriptClasses]] order
    * breaks ties; "other" when no class matches anything).
    *
    * Counts are `length(t) - length(regexp_replace(t, class, ''))` -
    * a pure codegen regexp chain, shuffle-free, scan-fused; see
    * [[scriptClasses]] for why ranges, not script properties.
    *
    * Output: (idCol, n_chars, n_latin, n_cyrillic, n_greek, n_cjk,
    * n_arabic, n_digit, dominant).
    */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = F.col(textCol)
    def cnt(pat: String): Column =
      (length(t) - length(regexp_replace(t, pat, ""))).cast(LongType)
    val counted = df.filter(t.isNotNull).select(
      F.col(idCol) +: length(t).cast(LongType).as("n_chars") +:
        scriptClasses.map { case (name, pat) => cnt(pat).as(s"n_$name") }: _*)
    val names = scriptClasses.map(_._1)
    val dominant = names.zipWithIndex.foldRight(lit("other")) {
      case ((name, i), elseCol) =>
        val mine = F.col(s"n_$name")
        val notBeatenByLater = names.drop(i + 1)
          .map(o => mine >= F.col(s"n_$o"))
          .foldLeft(lit(true))(_ && _)
        when(mine > 0 && notBeatenByLater, lit(name)).otherwise(elseCol)
    }
    counted.withColumn("dominant", dominant)
  }

  /** Heuristic quality score in [0,1] plus its component signals:
    * word count band, mean word length band, alpha ratio, repetition
    * ratio (distinct/total words). Deterministic, rounded for oracle
    * comparability.
    */
  def qualitySignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = F.col(textCol)
    val toks = DedupOps.tokens(t)
    val nWords = size(toks)
    val meanLen = length(regexp_replace(trim(t), "\\s+", "")).cast(DoubleType) / nWords
    val alphaRatio = (length(t) - length(regexp_replace(t, "[A-Za-z ]", "")))
      .cast(DoubleType) / greatest(length(t), lit(1))
    val distinctRatio = size(array_distinct(toks)).cast(DoubleType) / greatest(nWords, lit(1))
    val score =
      (when(nWords.between(20, 5000), 0.25).otherwise(0.0)
        + when(meanLen.between(2.0, 12.0), 0.25).otherwise(0.0)
        + when(alphaRatio >= 0.8, 0.25).otherwise(0.0)
        + when(distinctRatio >= 0.3, 0.25).otherwise(0.0))
    df.select(
      F.col(idCol),
      nWords.cast(IntegerType).as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(alphaRatio, 4).as("alpha_ratio"),
      round(distinctRatio, 4).as("distinct_ratio"),
      round(score, 2).as("quality_score")
    )
  }

  /** Vocabulary build + integer encoding: rank the corpus's tokens by
    * (count desc, token asc) - deterministic, engine-replayable - keep
    * the top `vocabSize` as ids 1..V, and encode every document's token
    * sequence to ids (out-of-vocabulary -> 0). The tokenize-to-ids step
    * between curation and packing: downstream consumers (packing,
    * shuffling, sharding) operate on the id arrays.
    *
    * Scale shape: ONE token count (the same aggregation `text_oov`
    * runs), a bounded top-V collect (the vocabulary IS broadcast-sized
    * by definition - that's what makes it a vocabulary), then encoding
    * is a per-row map lookup over a broadcast literal map - the corpus
    * never shuffles. Output: `(doc_id, n_tokens, ids_csv)` - ids as a
    * comma-joined string so the array survives any engine's
    * row-hashing convention (the emb_quantize stance).
    */
  def vocabEncode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int
  ): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val base = df.filter(F.col(textCol).isNotNull)
    // deterministic vocabulary: top-V by (n desc, tok asc), ids 1..V
    val vocab: Array[(String, Int)] = base
      .select(explode(DedupOps.tokens(F.col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(F.col("n").desc, F.col("tok").asc)
      .limit(vocabSize)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (r.getAs[String]("tok"), i + 1) }
    // empty corpus -> empty vocab: every token is OOV (a zero-arg
    // array() is untyped and would fail map_from_arrays analysis)
    def idOf(t: Column): Column =
      if (vocab.isEmpty) lit(0)
      else coalesce(element_at(map_from_arrays(
        array(vocab.map(v => lit(v._1)): _*),
        array(vocab.map(v => lit(v._2)): _*)), t), lit(0))
    base.select(
      F.col(idCol).as("doc_id"),
      DedupOps.tokens(F.col(textCol)).as("__tk"))
      .select(F.col("doc_id"),
        size(F.col("__tk")).as("n_tokens"),
        concat_ws(",",
          transform(F.col("__tk"), t => idOf(t).cast(StringType)))
          .as("ids_csv"))
  }

  /** The Gopher document-quality rule set (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", Table A1 subset) - the published
    * filter battery most pre-training pipelines start from: word-count
    * band, mean-word-length band, alpha-word ratio, stopword presence,
    * bullet-line and ellipsis-line ratios, symbol-to-word ratio.
    *
    * Every rule is decided by INTEGER cross-multiplication over exact
    * counts (never a float ratio compare), so the verdicts replay
    * bit-for-bit in any engine; the counts ship alongside the booleans
    * so a pipeline can re-threshold without re-scanning. Pure per-row
    * column arithmetic - scan-fused, zero shuffles.
    */
  def gopherFilters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      keepCols: Seq[String] = Nil): DataFrame = {
    val gopherOut = Set("doc_id", "n_words", "word_chars", "n_alpha",
      "n_stop", "n_lines", "n_bullet", "n_ellipsis", "n_symbols",
      "words_ok", "mean_len_ok", "alpha_ok", "stop_ok", "bullet_ok",
      "ellipsis_ok", "symbol_ok", "keep")
    require(keepCols.forall(!gopherOut.contains(_)),
      s"keepCols ${keepCols.filter(gopherOut.contains)} collide with " +
        "gopherFilters output columns; rename them first")
    val t = F.col(textCol)
    val toks = DedupOps.tokens(t)
    val lines = F.filter(split(t, "\n"), l => trim(l) =!= "")
    val stopwords = Seq("the", "and", "of", "to", "a", "in", "is", "that", "for", "it")
    val nWords = size(toks).as("n_words")
    // total word chars via HOF fold (exact integer; regexp-free)
    val wordChars = coalesce(
      aggregate(toks, lit(0L), (acc, tok) => acc + length(tok)), lit(0L)).as("word_chars")
    val nAlpha = size(F.filter(toks, tok => tok.rlike("[a-z]"))).as("n_alpha")
    val nStop = size(array_intersect(array_distinct(toks),
      array(stopwords.map(lit(_)): _*))).as("n_stop")
    val nLines = size(lines).as("n_lines")
    val nBullet = size(F.filter(lines,
      l => substring(trim(l), 1, 1).isin("-", "*", "•"))).as("n_bullet")
    val nEllipsis = size(F.filter(lines, l => endswith(trim(l), lit("...")))).as("n_ellipsis")
    val nSymbols = (length(t) - length(translate(t, "#…", ""))).as("n_symbols")
    // keepCols ride through (e.g. a language stratum for per-language
    // calibration audits) so a one-scan consumer needs no doc-keyed
    // re-join against the input
    df.filter(t.isNotNull)
      .select(Seq(F.col(idCol).as("doc_id")) ++ keepCols.map(F.col) ++
        Seq(nWords, wordChars, nAlpha, nStop, nLines, nBullet,
          nEllipsis, nSymbols): _*)
      .select(F.col("*"),
        F.col("n_words").between(50, 100000).as("words_ok"),
        (F.col("word_chars") >= F.col("n_words") * 3 &&
          F.col("word_chars") <= F.col("n_words") * 10).as("mean_len_ok"),
        (F.col("n_words") > 0 && F.col("n_alpha") * 5 >= F.col("n_words") * 4).as("alpha_ok"),
        (F.col("n_stop") >= 2).as("stop_ok"),
        (F.col("n_bullet") * 10 <= F.col("n_lines") * 9).as("bullet_ok"),
        (F.col("n_ellipsis") * 10 <= F.col("n_lines") * 3).as("ellipsis_ok"),
        (F.col("n_symbols") * 10 <= F.col("n_words")).as("symbol_ok"))
      .withColumn("keep",
        F.col("words_ok") && F.col("mean_len_ok") && F.col("alpha_ok") &&
          F.col("stop_ok") && F.col("bullet_ok") && F.col("ellipsis_ok") &&
          F.col("symbol_ok"))
  }

  /** C4-style line-level cleaning (the T5 corpus recipe): the standard
    * first-pass heuristic filter every web-scale text pipeline runs
    * between HTML extraction ([[stripHtml]]) and model-based scoring
    * ([[nbQualityFilter]]).
    *
    * Page-level drops (the whole document goes): text containing
    * "lorem ipsum" (template placeholder), a '{' (source code), or a
    * policy boilerplate phrase ("terms of use" / "privacy policy" /
    * "cookie policy") - all case-insensitive.
    *
    * Line-level keeps (applied to each '\n'-separated line): non-blank,
    * ends in a terminal punctuation mark (. ! ? ") after trimming, has
    * at least `minWords` whitespace-separated words, and does not
    * mention "javascript" (case-insensitive). A document survives only
    * if at least `minLines` lines survive.
    *
    * Scale shape: one codegen'd projection + filter - split / lambda
    * filter / array_join are all expression-level, so the operator
    * fuses into the scan; NO shuffle, NO UDF, no driver state. The
    * predicates live in the Java-regex/RE2 common subset so the DuckDB
    * oracle replays them byte-for-byte.
    *
    * Output: (idCol, n_lines, n_kept, clean) for surviving documents -
    * clean is the kept lines re-joined with '\n' in original order.
    */
  def c4LineFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 3,
      minLines: Int = 2
  ): DataFrame = {
    require(minWords >= 1, s"need minWords >= 1, got $minWords")
    require(minLines >= 1, s"need minLines >= 1, got $minLines")
    val t = F.col(textCol)
    val pageOk =
      Seq("lorem ipsum", "terms of use", "privacy policy", "cookie policy")
        .map(p => instr(lower(t), p) === 0).reduce(_ && _) &&
        instr(t, "{") === 0
    val lines = split(t, "\n")
    val kept = F.filter(lines, l => {
      val lt = trim(l)
      lt =!= "" &&
        instr(lower(l), "javascript") === 0 &&
        lt.rlike("[.!?\"]$") &&
        size(F.filter(split(lt, "\\s+"), w => w =!= "")) >= minWords
    })
    df.filter(t.isNotNull && pageOk)
      .select(F.col(idCol),
        size(lines).cast(LongType).as("n_lines"),
        size(kept).cast(LongType).as("n_kept"),
        array_join(kept, "\n").as("clean"))
      .filter(F.col("n_kept") >= minLines)
  }

  /** Cross-document LINE dedup - C4's other famous cleaning step
    * (beside the line-quality rules of [[c4LineFilter]]): every line
    * of every document competes globally, and only the FIRST
    * occurrence (smallest (doc_id-as-given, line_no)) survives; later
    * copies of the same line text drop, wherever they appear. This is
    * what strips repeated boilerplate lines (nav bars, footers, share
    * buttons) that per-document filters cannot see.
    *
    * Semantics pinned for the oracle:
    *   - lines split on '\n', matched on EXACT raw text;
    *   - lines whose trimmed length is < `minLen` never dedup (blank
    *     lines and short connectors are formatting, not boilerplate -
    *     collapsing every empty line corpus-wide to one survivor would
    *     shred documents);
    *   - the survivor is the lexicographically smallest (id, line_no)
    *     pair, so the result is deterministic under any partitioning;
    *   - clean_text is the kept lines re-joined with '\n' in original
    *     order; documents keeping zero lines emit clean_text = "".
    *
    * Scale shape: ONE line-keyed aggregate (map-side-combined min of a
    * (id, line_no) struct - a hot boilerplate line folds to one cell
    * per partition before the shuffle, so skew is capped by partition
    * count) + one shuffle-hash join back on the line text + the
    * doc-keyed reassembly fold. No window over unbounded keys, no
    * per-character work.
    *
    * Output: (idCol, n_lines, n_dropped, clean_text), one row per
    * non-null-text document.
    */
  def dedupLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int = 10
  ): DataFrame = dedupLinesAgainst(df, idCol, textCol, minLen, None)._1

  /** The [[dedupLines]] core with an optional externally-SEEN line set:
    * lines present in `seen` lose outright (their first occurrence
    * already surfaced elsewhere - the streaming lifecycle's state),
    * and the second return is the batch's NEWLY-claimed line
    * vocabulary (this frame's winners), which is exactly what the
    * maintained seen set advances by.
    */
  private[graft] def dedupLinesAgainst(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int,
      seen: Option[DataFrame]
  ): (DataFrame, DataFrame) = {
    require(minLen >= 1, s"need minLen >= 1, got $minLen")
    val base = df.filter(F.col(textCol).isNotNull)
      .select(F.col(idCol).as("id"), F.col(textCol).as("t"))
    val lines = base.select(F.col("id"),
      posexplode(split(F.col("t"), "\n")).as(Seq("ln", "line")))
    val keyed0 = lines.filter(length(trim(F.col("line"))) >= minLen)
    val keyed = seen.fold(keyed0)(s =>
      keyed0.join(s.select(F.col("line")), Seq("line"), "left_anti"))
    val firsts = keyed.groupBy(F.col("line"))
      .agg(min(struct(F.col("id"), F.col("ln"))).as("first"))
    val verdict = lines
      .join(firsts.hint("shuffle_hash"), Seq("line"), "left")
      .withColumn("keep",
        length(trim(F.col("line"))) < minLen ||
          (F.col("first.id") === F.col("id") && F.col("first.ln") === F.col("ln")))
    val cleaned = verdict.groupBy(F.col("id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(F.col("keep"), 0L).otherwise(1L)).as("n_dropped"),
        array_join(transform(
          array_sort(collect_list(when(F.col("keep"),
            struct(F.col("ln"), F.col("line"))))),
          s => s.getField("line")), "\n").as("clean_text"))
      .select(F.col("id").as(idCol), F.col("n_lines"), F.col("n_dropped"),
        F.col("clean_text"))
    (cleaned, firsts.select(F.col("line")))
  }

  /** Pointwise mutual information over adjacent token pairs - the
    * classic collocation extractor (Church & Hanks 1990), the signal
    * tokenizer-merge audits and stopword/phrase mining read at corpus
    * scale. PMI(a,b) = log2(P(ab) / (P(a)P(b))) with positional
    * marginals (a counted as bigram-left, b as bigram-right), taken in
    * the SAME 32-per-octave integer log-code family as
    * [[bigramSurprisal]]/[[nbQualityFilter]] on 2^8-pre-scaled counts,
    * so the score is an exact integer both engines reproduce:
    *
    *   pmi_code = code(c_ab*256) + code(N*256)
    *            - code(c1*256)   - code(c2*256)
    *
    * (N = total bigram occurrences; pmi_bits = pmi_code/32 is the
    * log2 estimate, exact in binary since the divisor is a power of
    * two).
    *
    * Scale shape: token explode -> bigram transform (projection-side
    * 1->N, no shuffle) -> THREE map-side-combined aggregates onto
    * vocabulary-sized frames (pair counts, left counts, right counts)
    * -> a single-row total broadcast-cross-joined -> two equi-joins of
    * the minCount-filtered pair table against the marginal tables.
    * Document pairs are never formed; nothing corpus-sized shuffles
    * after the count aggregates.
    *
    * Output: (w1, w2, c_ab, c1, c2, pmi_code, pmi_bits) for pairs with
    * c_ab >= minCount.
    */
  def pmiCollocations(
      df: DataFrame,
      textCol: String,
      minCount: Long = 5L
  ): DataFrame = {
    require(minCount >= 1, s"need minCount >= 1, got $minCount")
    def ilog32(name: String): String =
      s"CASE WHEN $name < 32 THEN $name ELSE " +
        s"(length(bin($name)) - 6) * 32 + shiftright($name, length(bin($name)) - 6) END"
    val bgs = df
      .filter(F.col(textCol).isNotNull)
      .select(graft.ops.DedupOps.tokens(F.col(textCol)).as("tks"))
      .filter(size(F.col("tks")) >= 2)
      .select(explode(F.expr(
        "transform(sequence(1, size(tks) - 1), " +
          "i -> struct(tks[i-1] AS w1, tks[i] AS w2))")).as("p"))
      .select(F.col("p.w1").as("w1"), F.col("p.w2").as("w2"))
    val cab = bgs.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
    val c1 = bgs.groupBy("w1").agg(count(lit(1)).as("c1"))
    val c2 = bgs.groupBy("w2").agg(count(lit(1)).as("c2"))
    val tot = cab.agg(sum("c_ab").as("n"))
    cab.filter(F.col("c_ab") >= minCount)
      .join(c1, "w1")
      .join(c2, "w2")
      .crossJoin(broadcast(tot))
      .withColumn("xab", F.col("c_ab") * lit(256L))
      .withColumn("xn", F.col("n") * lit(256L))
      .withColumn("x1", F.col("c1") * lit(256L))
      .withColumn("x2", F.col("c2") * lit(256L))
      .select(F.col("w1"), F.col("w2"), F.col("c_ab"), F.col("c1"), F.col("c2"),
        (expr(ilog32("xab")) + expr(ilog32("xn"))
          - expr(ilog32("x1")) - expr(ilog32("x2"))).as("pmi_code"))
      .withColumn("pmi_bits", F.col("pmi_code").cast(DoubleType) / lit(32.0))
  }

  /** Redact common PII shapes - emails, phone numbers, IPv4 addresses -
    * with typed placeholders. A pure regexp_replace chain: codegen'd,
    * streams at scan speed, RE2-safe patterns (no lookaround), applied
    * email -> IP -> phone so the digit-heavy phone patterns can't eat
    * the inside of an address they should label. The phone pattern is
    * deliberately structural (either a +international run or a 3-3-4
    * grouped number), NOT a bare digit-run: a naive `[0-9\-\s]{8,}`
    * devours dates, timestamps, and numeric lists - silently corrupting
    * non-PII training text. A production pipeline swaps in its own
    * pattern set/NER here; the operator shape (Column in, Column out,
    * fuses into any projection) is the part that matters at 100 TB.
    */
  def redactPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val phone = "\\+[0-9][0-9()\\- ]{5,16}[0-9]|\\(?[0-9]{3}\\)?[\\- ][0-9]{3}[\\- ][0-9]{4}"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "[EMAIL]"),
        ipv4, "[IP]"),
      phone, "[PHONE]")
  }

  /** PII incidence audit - the measurement half of the redaction story
    * (a pipeline that redacts without counting can't report what it
    * removed, and can't prove it removed everything): per-group match
    * counts for the same three [[redactPii]] pattern classes, how many
    * documents carried any PII, and the RESIDUAL match count after
    * redaction - the release-gate invariant (residual must be 0, and
    * is, because redaction and audit share one pattern set; a drifted
    * pattern shows up here as a nonzero residual, loudly).
    *
    * Pure codegen scan (regexp counts fused into the projection) + ONE
    * shuffle on the group key with map-side partial sums - the same
    * plan at any corpus size. Null texts are excluded (no evidence,
    * not zero-PII evidence).
    *
    * Output: (groupCol, n_docs, n_email, n_ip, n_phone,
    * n_docs_with_pii, n_residual).
    */
  def piiAudit(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val phone = "\\+[0-9][0-9()\\- ]{5,16}[0-9]|\\(?[0-9]{3}\\)?[\\- ][0-9]{3}[\\- ][0-9]{4}"
    val t = F.col(textCol)
    def hits(c: Column, pat: String): Column =
      size(F.regexp_extract_all(c, lit(pat), lit(0))).cast(LongType)
    val red = redactPii(t)
    df.filter(t.isNotNull)
      .select(
        F.col(groupCol),
        hits(t, email).as("e"), hits(t, ipv4).as("i"), hits(t, phone).as("p"),
        (hits(red, email) + hits(red, ipv4) + hits(red, phone)).as("r"))
      .groupBy(F.col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("e").as("n_email"), sum("i").as("n_ip"), sum("p").as("n_phone"),
        sum(when(F.col("e") + F.col("i") + F.col("p") > 0, 1L).otherwise(0L))
          .as("n_docs_with_pii"),
        sum("r").as("n_residual"))
  }

  /** Bigram language-model fluency score: train add-one-smoothed bigram
    * transition probabilities on the corpus itself, then score every
    * document by the MEAN probability the model assigns its next-token
    * transitions. Boilerplate and templated text (transitions the corpus
    * has seen thousands of times) score high; lexical soup scores near
    * the smoothing floor - a standard cheap fluency/typicality signal
    * for training-data curation.
    *
    * Model: P(cur | prev) = (c(prev,cur) + 1) / (c(prev) + V), with a
    * `<s>` start marker per document and V = |distinct next-tokens|.
    * Docs with no tokens yield no transitions and are dropped.
    *
    * Scale shape: the corpus is reduced ONCE to the bigram-TYPE table
    * (groupBy shuffle), which is checkpointed compactly and enriched
    * with c(prev) and V at type-table size - the denominator join on the
    * skewed `prev` key happens on one row per bigram type, never on the
    * corpus. The corpus then takes a single (prev, cur) equi-join
    * against the enriched types (AQE splits hot types) and one groupBy
    * doc. Per-transition probabilities are rounded to 12 dp and summed
    * as DECIMAL so the doc mean is order-independent and replayable by
    * any engine.
    */
  def bigramFluency(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val marked = concat(array(lit("<s>")), DedupOps.tokens(F.col(textCol)))
    val n = size(marked)
    val bigrams = OpsUtil
      .spread(df.filter(F.col(textCol).isNotNull))
      .select(
        F.col(idCol),
        explode(arrays_zip(slice(marked, lit(1), n - 1), slice(marked, lit(2), n - 1))).as("bg"))
      .select(
        F.col(idCol),
        F.col("bg").getField("0").as("prev"),
        F.col("bg").getField("1").as("cur"))

    // one corpus reduction to bigram types; checkpoint the COMPACT table
    // so the three downstream aggregates don't re-scan the corpus
    val types = bigrams
      .groupBy("prev", "cur")
      .agg(count(lit(1)).as("c_bg"))
      .localCheckpoint()
    val prevTotals = types.groupBy("prev").agg(sum("c_bg").as("c_prev"))
    val vocab = types.agg(countDistinct("cur").as("vocab"))
    val enriched = types
      .join(prevTotals, Seq("prev"))
      .crossJoin(broadcast(vocab))
      .select(
        F.col("prev"),
        F.col("cur"),
        round((F.col("c_bg") + 1).cast(DoubleType) / (F.col("c_prev") + F.col("vocab")), 12)
          .as("p"))

    bigrams
      .join(enriched, Seq("prev", "cur"))
      .groupBy(F.col(idCol))
      .agg(
        count(lit(1)).cast(IntegerType).as("n_bigrams"),
        round(
          (sum(F.col("p").cast(DecimalType(32, 12))).cast(DoubleType) / count(lit(1))),
          6).as("fluency"))
  }

  /** Per-document KL divergence D(doc ‖ corpus) between the document's
    * unigram token distribution and the whole corpus's - the standard
    * "is this document's vocabulary typical" outlier signal for
    * training-data curation (high KL = jargon, boilerplate, or
    * wrong-language text; near 0 = corpus-typical). No smoothing is
    * needed: the corpus distribution is built from these same documents,
    * so q > 0 wherever p > 0.
    *
    * Scale shape mirrors [[bigramFluency]]: the corpus reduces ONCE to
    * the compact (doc, token) count table (checkpointed - it feeds the
    * doc totals, the corpus totals, and the final join without
    * re-scanning the corpus); the corpus-frequency join happens at token
    * granularity (AQE splits hot tokens) and the grand total arrives as
    * a one-row broadcast. Per-token contributions are rounded to 12 dp
    * and summed as DECIMAL so the per-doc sum is order-independent and
    * replayable by any engine.
    */
  def klDivergence(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docCounts = tokenize(df.filter(F.col(textCol).isNotNull), idCol, textCol)
      .groupBy(F.col(idCol), F.col("token"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val docTotals = docCounts.groupBy(F.col(idCol)).agg(sum("c").as("n"))
    val corpusCounts = docCounts.groupBy("token").agg(sum("c").as("cw"))
    val corpusTotal = corpusCounts.agg(sum("cw").as("nw"))
    // p = c/n (doc), q = cw/nw (corpus); term = p * ln(p/q). The exact
    // arithmetic shape (two divisions, a ratio, ln, multiply) is pinned:
    // IEEE doubles make it bit-identical across engines.
    docCounts
      .join(docTotals, Seq(idCol))
      .join(corpusCounts, Seq("token"))
      .crossJoin(broadcast(corpusTotal))
      .select(
        F.col(idCol),
        F.col("n"),
        round((F.col("c") / F.col("n")) *
          log((F.col("c") / F.col("n")) / (F.col("cw") / F.col("nw"))), 12).as("term"))
      .groupBy(F.col(idCol))
      .agg(
        max(F.col("n")).cast(IntegerType).as("n_tokens"),
        round(sum(F.col("term").cast(DecimalType(32, 12))).cast(DoubleType), 6).as("kl"))
  }

  /** Order-sensitive 60-bit document fingerprint over normalized tokens -
    * cheap exact-dup key that ignores case/whitespace differences but not
    * word order. Tokens are space-joined and md5'd: the join is
    * unambiguous because tokens are produced by splitting on whitespace
    * and so can never contain the separator, and md5 (over xxhash64)
    * makes the fingerprint recomputable in ANY engine - the DuckDB
    * correctness oracle replays it from its own md5. 60 bits (15 hex
    * chars) keeps the value positive in a signed 64-bit integer
    * everywhere.
    */
  def fingerprint(text: Column): Column =
    // NULL-preserving: concat_ws treats a NULL token array as "", which
    // would silently collide NULL docs with empty docs (and diverge from
    // the oracle's md5(NULL) = NULL)
    when(text.isNotNull,
      conv(substring(md5(concat_ws(" ", DedupOps.tokens(text))), 1, 15), 16, 10)
        .cast(LongType))

  /** Test-set decontamination: n-gram overlap between candidate training
    * documents and a held-out evaluation set - the hygiene pass every
    * pre-training pipeline runs so benchmark answers don't leak into the
    * training mix.
    *
    * Shape: inverted-index equi-join on distinct word shingles (never a
    * text cross join). The doc-frequency cap drops shingles hot across
    * the TRAINING corpus (boilerplate - near-zero signal, quadratic
    * join cost) from both sides, so overlap stays exact within the
    * shared filtered universe; with real decontamination shingle
    * lengths (n >= 8) hot shingles are rare and the cap is a pure skew
    * guard. Output: one row per (train, test) pair sharing >= 1
    * surviving shingle, with the overlap count and the fraction of the
    * test doc's shingles found in the training doc.
    */
  def contamination(
      train: DataFrame,
      trainId: String,
      trainText: String,
      test: DataFrame,
      testId: String,
      testText: String,
      shingleLen: Int = 5,
      maxShingleDocFreq: Long = Long.MaxValue
  ): DataFrame = {
    val tr0 = OpsUtil.spread(train).select(
      F.col(trainId).as("train_id"),
      explode(DedupOps.shingleStrings(F.col(trainText), shingleLen)).as("sh"))
    val te0 = OpsUtil.spread(test).select(
      F.col(testId).as("test_id"),
      explode(DedupOps.shingleStrings(F.col(testText), shingleLen)).as("sh"))
    val (tr, te) =
      if (maxShingleDocFreq == Long.MaxValue) (tr0, te0)
      else {
        // train shingles feed two consumers (hot count + join);
        // materialize once, like DedupOps.jaccardPairs' token table
        val trc = tr0.localCheckpoint()
        val hot = trc.groupBy("sh").count()
          .filter(F.col("count") > maxShingleDocFreq).select("sh")
        (trc.join(broadcast(hot), Seq("sh"), "left_anti"),
          te0.join(broadcast(hot), Seq("sh"), "left_anti"))
      }
    // test-side sizes over the SAME filtered shingle universe, so
    // test_frac is exact within it (never a systematic underestimate)
    val sizes = te.groupBy("test_id").agg(count(lit(1)).as("n_test_sh"))
    tr.join(te, "sh")
      .groupBy(F.col("train_id"), F.col("test_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .join(sizes, "test_id")
      .select(F.col("train_id"), F.col("test_id"), F.col("n_overlap"),
        round(F.col("n_overlap").cast(DoubleType) / F.col("n_test_sh"), 6)
          .as("test_frac"))
  }

  /** Deterministic md5-family hash `i` of a shingle, reduced mod `mBits`
    * - replayable in any engine with md5 (15 hex chars = 60 bits, so the
    * BIGINT is always positive and `%` == pmod).
    */
  private def bloomPos(sh: Column, i: Int, mBits: Int): Column =
    conv(substring(md5(concat(sh, lit("#" + i))), 1, 15), 16, 10)
      .cast(LongType) % mBits

  /** Bloom-filter decontamination: the broadcast-sketch alternative to
    * [[contamination]]'s inverted-index join, for the asymmetric case
    * every pre-training pipeline actually has - a SMALL held-out eval
    * set vs a HUGE training corpus.
    *
    * Build: the eval set's distinct `shingleLen`-gram shingles each set
    * `kHashes` md5-derived bits in an `mBits`-wide bitset (one mergeable
    * [[graft.functions.BitsetAgg]] pass - partials OR, never a position
    * shuffle). The finished bitset (`mBits / 8` bytes - KBs to low MBs)
    * rides the probe plan as a codegen reference object.
    *
    * Probe: ONE map-side scan of the corpus - per doc, count shingles
    * whose `kHashes` positions are all set
    * ([[graft.functions.BitsetContains]], O(1) per test). ZERO shuffle
    * of corpus data at any width; `contamination` by contrast shuffles
    * every train shingle. The price is Bloom semantics: flagged counts
    * can OVERCOUNT via hash collisions (false positives - rate
    * `(1 - e^(-k*n/m))^k`, deterministic given the hash family, so an
    * oracle replays them exactly), but never undercount: every true
    * overlap is flagged. Use it as the cheap first pass; send survivors
    * to [[contamination]] for exact overlap counts.
    *
    * Output: one row per train doc with at least one flagged shingle:
    * `(doc_id, n_sh, n_flag, hit_frac)`.
    */
  def bloomDecontam(
      train: DataFrame,
      trainId: String,
      trainText: String,
      eval: DataFrame,
      evalText: String,
      shingleLen: Int = 4,
      mBits: Int = 1 << 18,
      kHashes: Int = 3
  ): DataFrame =
    bloomProbe(bloomBuild(eval, evalText, shingleLen, mBits, kHashes),
      train, trainId, trainText)

  /** A built Bloom filter plus the parameters that define its hash
    * family - probe soundness depends on (mBits, kHashes, shingleLen)
    * matching the build, so they travel WITH the bits (and persist with
    * them, see [[bloomWrite]]). `bits.length == mBits / 8`.
    */
  case class BloomFilter(bits: Array[Byte], mBits: Int, kHashes: Int, shingleLen: Int) {
    /** OR-merge with another filter of the SAME family. Bloom filters
      * are mergeable sketches: merge(build(A), build(B)) ==
      * build(A union B) bit-for-bit - what makes incremental
      * maintenance exact (StreamOps.bloomMaintenance).
      */
    def merge(o: BloomFilter): BloomFilter = {
      require(mBits == o.mBits && kHashes == o.kHashes && shingleLen == o.shingleLen,
        s"cannot merge Bloom filters of different families: " +
          s"($mBits,$kHashes,$shingleLen) vs (${o.mBits},${o.kHashes},${o.shingleLen})")
      val out = new Array[Byte](bits.length)
      var i = 0
      while (i < out.length) { out(i) = (bits(i) | o.bits(i)).toByte; i += 1 }
      BloomFilter(out, mBits, kHashes, shingleLen)
    }
  }

  /** Build the eval-set Bloom filter: distinct shingles -> kHashes md5
    * positions each -> OR'd bitset via one mergeable
    * [[graft.functions.BitsetAgg]] pass. The `.head()` is bounded by
    * construction: mBits/8 bytes regardless of eval-set size (same
    * stance as the broadcast trie and the IVF centroid collect).
    */
  def bloomBuild(
      eval: DataFrame,
      evalText: String,
      shingleLen: Int = 4,
      mBits: Int = 1 << 18,
      kHashes: Int = 3
  ): BloomFilter = {
    require(kHashes >= 1, s"kHashes must be >= 1, got $kHashes")
    val spark = eval.sparkSession
    import spark.implicits._
    val positions = eval
      .select(explode(DedupOps.shingleStrings(F.col(evalText), shingleLen)).as("sh"))
      .distinct()
      .select(explode(array((0 until kHashes).map(i => bloomPos(F.col("sh"), i, mBits)): _*)).as("p"))
      .as[Long]
    val bits = positions.select(new graft.functions.BitsetAgg(mBits).toColumn).head()
    BloomFilter(bits, mBits, kHashes, shingleLen)
  }

  /** Probe the corpus against a built filter: per-shingle flag = AND
    * over the k probes ([[graft.functions.BitsetContains]], O(1) per
    * test); per-doc counts fold over the shingle array in the same
    * projection - the corpus row never leaves its input partition
    * (ZERO shuffle exchanges, pinned by PlanFeaturesSpec).
    */
  def bloomProbe(
      filter: BloomFilter,
      train: DataFrame,
      trainId: String,
      trainText: String
  ): DataFrame =
    train
      .select(F.col(trainId).as("doc_id"),
        DedupOps.shingleStrings(F.col(trainText), filter.shingleLen).as("__shs"))
      .select(F.col("doc_id"),
        size(F.col("__shs")).as("n_sh"),
        // the whole inner loop (|shs| x k md5 position probes) as ONE
        // codegen kernel call; FunctionsSpec pins it against the
        // equivalent md5/conv column-expression formulation
        graft.functions.GraftFunctions.bloom_flag_count(
          F.col("__shs"), filter.bits, filter.mBits, filter.kHashes).as("n_flag"))
      .filter(F.col("n_flag") > 0)
      .withColumn("hit_frac",
        round(F.col("n_flag").cast(DoubleType) / F.col("n_sh"), 6))

  /** Persist a Bloom filter: one-row parquet carrying the bits AND the
    * hash-family parameters (a probe against a filter built with
    * different parameters would be silently unsound - so they are not
    * caller-supplied on read).
    */
  def bloomWrite(filter: BloomFilter, path: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    Seq((filter.bits, filter.mBits, filter.kHashes, filter.shingleLen))
      .toDF("bits", "m_bits", "k_hashes", "shingle_len")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read a persisted Bloom filter back (see [[bloomWrite]]). */
  def bloomRead(spark: org.apache.spark.sql.SparkSession, path: String): BloomFilter = {
    import spark.implicits._
    val (bits, m, k, n) = spark.read.parquet(path)
      .select("bits", "m_bits", "k_hashes", "shingle_len")
      .as[(Array[Byte], Int, Int, Int)].head()
    BloomFilter(bits, m, k, n)
  }

  /** Exact corpus-wide top-`k` tokens by occurrence, found sketch-first:
    *
    *   phase 1: ONE pass builds a mergeable SpaceSaving summary
    *     (graft.functions.HeavyHitterAgg) - bounded memory
    *     (`capacity` entries per partial), no full-vocabulary shuffle.
    *     Guarantee: every token with true count > N/capacity is in the
    *     summary, so with capacity sized generously above the expected
    *     top-k frequency floor the candidate set certifiably contains
    *     the true top-k;
    *   phase 2: exact recount of ONLY the candidates (broadcast
    *     semi-join) -> the output is the exact deterministic top-k,
    *     not an estimate (ties broken by token).
    *
    * At 100 TB this is the difference between shuffling a multi-billion
    * -row (token, count) table and shuffling `capacity` rows: the full
    * groupBy pays the vocabulary shuffle to rank everything; the sketch
    * pays one scan plus a candidate-filtered recount.
    */
  def heavyHitterTokens(
      df: DataFrame,
      textCol: String,
      k: Int,
      capacity: Int = 8192
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = OpsUtil.spread(df)
      .select(explode(DedupOps.tokens(F.col(textCol))).as("tok")).as[String]
    val agg = new graft.functions.HeavyHitterAgg(capacity)
    val (candidates, total, lossless) = toks.select(agg.toColumn).head()
    val top = toks.toDF("tok")
      .join(broadcast(candidates.toDF("tok")), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(F.col("n").desc, F.col("tok").asc)
      .limit(k)
    // CERTIFY before claiming exactness. The sketch only guarantees that
    // items with true count > total/capacity are candidates, so the
    // recounted top-k is provably exact iff (a) nothing was ever evicted
    // (candidates = full vocabulary), or (b) the k-th recounted count
    // strictly beats total/capacity - then no non-candidate can reach
    // the top k. On a distribution flat enough to fail both, fall back
    // to the full-vocabulary groupBy: slower, never silently wrong.
    if (lossless) top
    else {
      val rows = top.collect()
      val certified = rows.length == k &&
        rows.last.getAs[Long]("n") > total / capacity
      if (certified)
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), top.schema)
      else
        toks.toDF("tok")
          .groupBy("tok").agg(count(lit(1)).as("n"))
          .orderBy(F.col("n").desc, F.col("tok").asc)
          .limit(k)
    }
  }

  /** TF-IDF top terms per document: term frequency within the doc times
    * smoothed inverse document frequency `ln((N+1)/(df+1)) + 1` across
    * the corpus, top `termsPerDoc` terms per doc by (score desc, term
    * asc). The corpus-side statistic (df) is one vocabulary-sized
    * aggregation, broadcast back; everything else is per-doc arithmetic.
    *
    * Cross-engine determinism note: tf, df and N are exact integers, and
    * the oracle replays `ln` with the same double argument - IEEE
    * division of exact integers is identical everywhere, and libm/JVM
    * `log` agreement is pinned by the round(.,6) in the query (verified
    * by hash-match at both test scale factors).
    */
  def tfIdf(
      df: DataFrame,
      idCol: String,
      textCol: String,
      termsPerDoc: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // corpus size joins in as a broadcast one-row aggregate (exactly the
    // oracle's CROSS JOIN nd): the whole operator stays ONE lazy plan -
    // no eager count() action, no second scan of the input
    val nDocs = df.filter(F.col(textCol).isNotNull)
      .agg(count(lit(1)).as("n_docs"))
    val terms = OpsUtil.spread(df)
      .select(F.col(idCol).as("id"), explode(DedupOps.tokens(F.col(textCol))).as("term"))
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val w = Window.partitionBy("id")
      .orderBy(F.col("score").desc, F.col("term").asc)
    tf.join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        F.col("tf") * (log((F.col("n_docs") + 1.0) / (F.col("df_t") + 1.0)) + 1.0))
      .withColumn("rank", row_number().over(w))
      .filter(F.col("rank") <= termsPerDoc)
      .select(F.col("id"), F.col("term"), F.col("tf"),
        F.col("df_t"), F.col("rank").cast(IntegerType).as("rank"),
        round(F.col("score"), 6).as("score"))
  }

  /** Repetition / boilerplate score per document: the highest
    * occurrence count of any word `n`-gram, as a fraction of the
    * document's n-gram count. Near 1.0 = the document is one phrase
    * repeated (spam, scraped boilerplate, degenerate generations) -
    * a standard pre-training quality filter.
    *
    * Computed entirely per-row (tokenize -> n-grams -> sort -> one
    * fold over the sorted array counting the longest equal run): a
    * per-document statistic should cost ZERO shuffles, not a
    * corpus-sized groupBy on (doc, ngram). Documents shorter than `n`
    * words count their whole token list as one n-gram (ratio 1.0),
    * matching [[DedupOps.shingleStrings]] truncation semantics.
    */
  def repetitionScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3
  ): DataFrame = {
    // ALL n-grams, duplicates kept (the duplicates ARE the signal);
    // empty docs yield one "" n-gram. NULL text is excluded (not
    // scored as maximally-repetitive boilerplate). ONE codegen kernel
    // call ([[graft.functions.RepStats]]: tokens -> gram multiset ->
    // max multiplicity, == the longest equal-run after sort) - the
    // per-row sort_array + interpreted aggregate() fold it replaced
    // measured ~1.2 ms/doc (interpreted HOF lambdas get no CSE and the
    // gram tree re-expanded per consumer)
    df.filter(F.col(textCol).isNotNull)
      .withColumn("_rs",
        graft.functions.GraftFunctions.rep_stats(F.col(textCol), n))
      .select(F.col(idCol),
        F.col("_rs.n_grams").as("n_grams"),
        F.col("_rs.max_rep").as("max_rep"),
        round(F.col("_rs.max_rep").cast(DoubleType) / F.col("_rs.n_grams"), 6)
          .as("rep_ratio"))
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    * MOSS local fingerprinting algorithm): hash every k-char shingle,
    * slide a w-hash window, and in each full window select the MINIMUM
    * hash, rightmost occurrence on ties. The selection guarantee: any
    * shared substring of length >= k + w - 1 between two documents
    * yields at least one shared fingerprint, while only ~2/(w+1) of
    * positions are kept - the robust sparse fingerprint set plagiarism /
    * near-dup span detection indexes at corpus scale.
    *
    * The tie rule is packed into ONE bigint so selection is a plain
    * numeric window-min (no argmin gymnastics, engine-portable):
    * c = h * 2^31 + (2^31 - 1 - pos); min(c) is min hash with the
    * LARGEST position among equal hashes. h is the first 8 md5 hex
    * digits of the shingle (< 2^32), so c < 2^63.
    *
    * Scale shape (round-16): the whole selection is ONE codegen kernel
    * call per row ([[graft.functions.WinnowFps]]: rolling monotonic-
    * deque window-min over the packed c = h*2^31 + (2^31-1-pos)
    * values, consecutive-run dedup) followed by a per-row explode of
    * the selected set - zero shuffles, zero distinct exchange. The
    * expression-tree spelling it replaced exploded one row per
    * CHARACTER of the corpus through a per-doc window sort (a corpus-
    * length shuffle) plus a distinct exchange; the fingerprints are
    * bit-identical (h is still the first 8 md5 hex digits of the
    * shingle, so the engine-portable SQL replay is unchanged). Output:
    * (idCol, pos, fp) - the selected fingerprints, distinct PER ROW:
    * the kernel emits each row's selected set once, so callers must
    * ensure idCol is unique per input row (the old plan-level distinct
    * also collapsed duplicate (id, pos, fp) across repeated-id rows; a
    * union of corpora with colliding ids now yields duplicated rows).
    */
  def winnowFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4
  ): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be positive, got k=$k w=$w")
    df.filter(F.col(textCol).isNotNull && length(F.col(textCol)) >= k)
      .select(F.col(idCol),
        explode(graft.functions.GraftFunctions.winnow_fps(
          F.col(textCol), k, w)).as("_s"))
      .select(F.col(idCol), F.col("_s.pos").as("pos"), F.col("_s.fp").as("fp"))
  }
}
