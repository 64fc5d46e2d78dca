package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Document-deduplication operators for large-scale training-data
  * pipelines: exact, token-set Jaccard, MinHash+LSH, and SimHash.
  *
  * Design rules (100 TB mindset):
  *   - everything is `org.apache.spark.sql.functions` expressions
  *     (whole-stage codegen) except the single SimHash kernel;
  *   - no all-pairs comparisons: candidate generation is always a
  *     key-equality self-join (shared token / LSH bucket / SimHash band),
  *     so Catalyst plans a shuffled hash join on the bucket key instead
  *     of a cross join;
  *   - exact similarity is only computed on candidate pairs.
  */
object DedupOps {

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => t =!= "")

  /** Distinct word `n`-shingles as strings ("a b c"). For n = 1 this is
    * the distinct token set. Documents shorter than `n` words yield their
    * whole token list as one (short) shingle.
    */
  def shingleStrings(c: Column, n: Int): Column = {
    val toks = tokens(c)
    if (n <= 1) array_distinct(toks)
    else
      array_distinct(
        transform(
          sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))
        )
      )
  }

  // ---------------------------------------------------------------------
  // Exact dedup
  // ---------------------------------------------------------------------

  /** Keep one row per distinct value of `col` (the min of `idCol` wins) -
    * the classic hash-groupBy dedup; one shuffle on the text hash.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(F.col(textCol))
      .agg(
        min(F.col(idCol)).as(idCol),
        count(lit(1)).as("n_copies")
      )
      .select(F.col(idCol), F.col("n_copies"))

  // ---------------------------------------------------------------------
  // Exact token-set Jaccard (the ground truth the sketches approximate)
  // ---------------------------------------------------------------------

  /** All document pairs with token-set Jaccard >= `threshold`.
    *
    * Candidate generation: explode distinct tokens, self-join on token
    * (equi-join, NOT a cross join), count shared tokens per pair, then
    * Jaccard = inter / (|A| + |B| - inter). At scale the token join is
    * the standard "inverted index" prefix filter; stop-word-like tokens
    * shared by most documents make it quadratic - callers should filter
    * hot tokens first (see `maxTokenDocFreq`).
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      maxTokenDocFreq: Long = Long.MaxValue,
      shingleLen: Int = 1
  ): DataFrame = {
    val toks = OpsUtil.spread(df)
      .select(F.col(idCol).as("id"), explode(shingleStrings(F.col(textCol), shingleLen)).as("tok"))
    val filtered =
      if (maxTokenDocFreq == Long.MaxValue) toks
      else {
        val hot = toks.groupBy("tok").count().filter(F.col("count") > maxTokenDocFreq).select("tok")
        toks.join(broadcast(hot), Seq("tok"), "left_anti")
      }
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = filtered.as("a")
      .join(filtered.as("b"), F.col("a.tok") === F.col("b.tok") && F.col("a.id") < F.col("b.id"))
      .groupBy(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard", F.col("inter").cast(DoubleType) /
        (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
      .filter(F.col("jaccard") >= threshold)
      .select(F.col("id_a"), F.col("id_b"), round(F.col("jaccard"), 6).as("jaccard"))
  }

  // ---------------------------------------------------------------------
  // MinHash + LSH (the scale path for near-dup detection)
  // ---------------------------------------------------------------------

  /** Per-document MinHash signature over hashed word `shingleLen`-shingles.
    *
    * Pure expression pipeline: shingles via `transform(sequence(...))`
    * over the token array, `numHashes` universal-hash minima via nested
    * `transform`/`array_min` - all codegen, no UDFs, no explode (the
    * signature is computed row-local, so this stage is shuffle-free).
    */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      shingleLen: Int = 3,
      seed: Int = 42
  ): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val prime = 2147483647L // 2^31 - 1, Mersenne
    val as = Array.fill(numHashes)(1 + rnd.nextInt(Int.MaxValue - 1).toLong)
    val bs = Array.fill(numHashes)(rnd.nextInt(Int.MaxValue).toLong)
    val aLit = array(as.map(lit(_)).toIndexedSeq: _*)
    val bLit = array(bs.map(lit(_)).toIndexedSeq: _*)
    val shingles = array_distinct(
      transform(
        sequence(lit(0), greatest(size(tokens(F.col(textCol))) - shingleLen, lit(0))),
        i => pmod(xxhash64(concat_ws(" ", slice(tokens(F.col(textCol)), i + 1, lit(shingleLen)))),
          lit(prime))
      )
    )
    val hashIdx = sequence(lit(0), lit(numHashes - 1))
    // Shape matters: a naive `transform(hashIdx, h -> array_min(...))`
    // re-evaluates the shingle pipeline once PER HASH FUNCTION (Catalyst
    // collapses the projection and inlines the array into the lambda).
    // Folding the other way - aggregate over shingles, element-wise min
    // against each shingle's hash vector - binds each shingle to a lambda
    // variable, so tokenize+hash runs exactly once per shingle.
    OpsUtil.spread(df).select(
      F.col(idCol).as("id"),
      aggregate(
        shingles,
        transform(hashIdx, _ => lit(prime)),
        (acc, s) => zip_with(
          acc,
          transform(hashIdx, h =>
            pmod(element_at(aLit, h + 1) * s + element_at(bLit, h + 1), lit(prime))),
          (x, y) => least(x, y)
        )
      ).as("signature")
    )
  }

  /** Candidate near-dup pairs via banded LSH over MinHash signatures:
    * split each signature into `bands` bands, hash each band to a bucket,
    * self-join on (band, bucket). Collision probability follows the
    * classic S-curve `1 - (1 - j^r)^b`. Output: (id_a, id_b, est_jaccard)
    * where est = fraction of agreeing signature positions.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleLen: Int = 3,
      threshold: Double = 0.5
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, shingleLen)
    val banded = sigs.select(
      col("id"),
      col("signature"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), xxhash64(b, slice(col("signature"), b * lit(r) + 1, lit(r))).as("bucket"))
        )
      ).as("bb")
    )
    val cand = banded.as("a")
      .join(
        banded.as("b"),
        col("a.bb.band") === col("b.bb.band") &&
          col("a.bb.bucket") === col("b.bb.bucket") &&
          col("a.id") < col("b.id")
      )
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.signature").as("sig_a"), col("b.signature").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn(
        "est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast(DoubleType) / lit(numHashes.toDouble)
      )
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  // ---------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------

  /** 64-bit SimHash over tokens: each token's xxhash64 votes +-1 per bit,
    * the sign of each bit-sum forms the fingerprint. One small kernel
    * (per-row, no state) - kept as a UDF until a codegen Expression is
    * warranted.
    */
  private val simhash64 = udf { toks: Seq[String] =>
    val counts = new Array[Int](64)
    toks.foreach { t =>
      val h = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c).toLong << 32 |
        (scala.util.hashing.MurmurHash3.stringHash(t, 0x85ebca6b).toLong & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  def simhashFingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    OpsUtil.spread(df).select(
      F.col(idCol).as("id"),
      simhash64(tokens(F.col(textCol))).as("simhash")
    )

  /** Near-dup pairs with Hamming distance <= `maxHamming`, found by the
    * block-rotation trick: split the 64-bit fingerprint into
    * `maxHamming + 1` blocks - any pair within the budget agrees on at
    * least one block (pigeonhole), so candidates come from equi-joins on
    * (blockIndex, blockValue), never a cross join.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val blocks = maxHamming + 1
    val width = 64 / blocks
    val fps = simhashFingerprints(df, idCol, textCol)
    val blockStructs = (0 until blocks).map { bIdx =>
      struct(
        lit(bIdx).as("blk"),
        shiftrightunsigned(col("simhash"), bIdx * width)
          .bitwiseAND(lit((1L << width) - 1)).as("key")
      )
    }
    val keyed = fps.select(
      col("id"),
      col("simhash"),
      explode(array(blockStructs: _*)).as("bk")
    )
    keyed.as("a")
      .join(
        keyed.as("b"),
        col("a.bk.blk") === col("b.bk.blk") &&
          col("a.bk.key") === col("b.bk.key") &&
          col("a.id") < col("b.id")
      )
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("h_a"), col("b.simhash").as("h_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast(IntegerType).as("hamming"))
  }
}
