package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** Partitioned-parquet sink/source pair: the lifecycle a 100-TB corpus
  * actually lives by - data at rest laid out hive-style on a
  * low-cardinality column (language, source, date) so every downstream
  * query that filters on it reads only the matching directories
  * (partition pruning happens at file listing, before any I/O).
  *
  * The reference's only persistence is OUTPUT + BUILDINDEX on the trie
  * (/root/reference/PrefixTree.ecl:611-613, covered by
  * PrefixTree.writeIndexed / writeIndexedTable); this module is the
  * corpus-side counterpart for the extension operators.
  */
object Sinks {

  /** Reversible line coding for raw text-lines corpora (one document
    * per line, the standard pretraining dump): double every backslash,
    * then newline -> \n and CR -> \r. [[decodeTextLine]] inverts it
    * exactly for ANY input string (SinksSpec bijection stress), so a
    * multi-line document survives the line format byte-for-byte.
    */
  def encodeTextLine(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.regexp_replace
    regexp_replace(regexp_replace(regexp_replace(
      c, "\\\\", "\\\\\\\\"), "\n", "\\\\n"), "\r", "\\\\r")
  }

  /** Inverse of [[encodeTextLine]]. Decode splits on the
    * doubled-backslash pairs FIRST - inside the resulting segments
    * every remaining backslash unambiguously starts an \n or \r
    * escape - then rejoins with single backslashes. (A sequential
    * un-replace would mis-decode a literal backslash followed by 'n'
    * as a newline.)
    */
  def decodeTextLine(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{array_join, regexp_replace, split, transform}
    array_join(
      transform(split(c, "\\\\\\\\", -1),
        s => regexp_replace(regexp_replace(s, "\\\\n", "\n"), "\\\\r", "\r")),
      "\\")
  }

  /** Write `df` as parquet partitioned by `partCols`.
    *
    * The repartition on the partition columns is the part that matters at
    * scale: without it every one of N tasks writes a file into every one
    * of V partition directories (N x V small files - the classic
    * partitioned-write explosion); with it each partition value is
    * written by exactly `filesPerValue` tasks.
    *
    * `filesPerValue` is the skew control: at 1, one task absorbs ALL
    * rows of a value - fine for balanced values, a single-task
    * bottleneck when one language/source dominates the corpus. Raising
    * it adds a deterministic salt (hash of the full row - never rand(),
    * whose per-retry reshuffling can lose/duplicate rows on partial
    * stage retries) so a hot value fans out over that many tasks/files.
    * `maxRecordsPerFile` additionally rolls oversized files within a
    * task without changing the layout.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partCols: Seq[String],
      filesPerValue: Int = 1,
      maxRecordsPerFile: Long = 5000000L
  ): Unit = {
    // salt only over hashable columns: hash() rejects MapType (and any
    // type nesting one), and a metadata map column is a perfectly legal
    // corpus shape - skip such columns rather than fail the write
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val saltCols = df.schema.fields
      .filter(f => hashable(f.dataType)).map(f => col(f.name))
    val keys =
      if (filesPerValue <= 1 || saltCols.isEmpty) partCols.map(col)
      else partCols.map(col) :+ pmod(hash(saltCols: _*), lit(filesPerValue))
    df.repartition(keys: _*)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCols: _*)
      .parquet(path)
  }

  /** Read a partitioned layout back. Filters on the partition columns
    * prune directories at planning time (PartitionFilters in the scan,
    * pinned by SinksSpec); filters on data columns still push down to
    * parquet row-group stats as usual.
    */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Z-order-clustered parquet write (the lakehouse `OPTIMIZE ZORDER BY`
    * layout pass): range-bucket two dimension columns into 16-bit
    * domains via their min/max (ONE cheap stats job), interleave the
    * buckets into a Morton value ([[graft.ops.ShardOps.zValue]]),
    * range-repartition + sort on it, write.
    *
    * Why at 100 TB: a linear sort clusters only its leading column - a
    * rectangle predicate selective in the SECOND column still reads
    * every file. The Morton order keeps every file narrow in BOTH
    * dimensions, so parquet min/max row-group/file pruning fires for
    * predicates on either column (SinksSpec pins the file-stats
    * narrowing). `nFiles` sizes the output explicitly - the write is a
    * layout pass, so file count is part of its contract.
    */
  def zOrderWrite(
      df: DataFrame,
      path: String,
      dimA: String,
      dimB: String,
      nFiles: Int
  ): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    import org.apache.spark.sql.functions.{max, min, floor, least}
    val Array(loA, hiA, loB, hiB) = df
      .agg(min(col(dimA)).cast("double"), max(col(dimA)).cast("double"),
        min(col(dimB)).cast("double"), max(col(dimB)).cast("double"))
      .head().toSeq.map(v => Option(v).fold(0.0)(_.asInstanceOf[Double])).toArray
    // bucket = floor((x - lo) / span * 65536), clamped to 65535 so the
    // max value lands in the top bucket instead of wrapping
    def bucket(c: org.apache.spark.sql.Column, lo: Double, hi: Double) = {
      val span = math.max(hi - lo, java.lang.Double.MIN_VALUE)
      least(floor((c.cast("double") - lit(lo)) / lit(span) * lit(65536.0)), lit(65535.0))
        .cast("long")
    }
    val z = graft.ops.ShardOps.zValue(
      bucket(col(dimA), loA, hiA), bucket(col(dimB), loB, hiB))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * `ceil(totalBytes / targetFileBytes)` files. The small-file problem
    * is THE operational failure mode of long-lived 100-TB tables
    * (every streaming micro-batch and partitioned write adds files;
    * listing, footer reads, and task scheduling all scale with file
    * count, not byte count). Returns the output file count.
    *
    * Uses on-disk compressed bytes for sizing (what the next reader
    * pays), and writes to a NEW directory - compaction must never
    * destroy its input on partial failure; callers swap directories
    * after success.
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024
  ): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    require(new org.apache.hadoop.fs.Path(outPath) != new org.apache.hadoop.fs.Path(inPath),
      "compact writes to a new directory; it never rewrites its input in place")
    val hPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(hPath, true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }
}
