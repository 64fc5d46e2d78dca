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
}
