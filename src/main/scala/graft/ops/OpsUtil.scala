package graft.ops

import org.apache.spark.sql.DataFrame

private[graft] object OpsUtil {

  /** Ensure at least `defaultParallelism` partitions before a
    * compute-heavy per-row stage.
    *
    * Small parquet inputs arrive as one or two file splits; a narrow
    * projection doing real work (minhash signatures, cosine arithmetic,
    * DFS traversals) then runs on one core while the rest idle. At real
    * scale (thousands of input splits) this is a no-op - it exists so
    * compute-bound stages are never accidentally serialized by file
    * layout.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // logical-stats probe, NOT df.rdd.getNumPartitions: touching .rdd
    // forces a physical-planning pass per call. Small inputs (< ~32 MB
    // per core) arrive as a handful of file splits and would serialize a
    // compute-heavy narrow stage; large inputs already carry a split per
    // ~128 MB for every splittable source, so repartitioning them would
    // only add a pointless shuffle. Caveat: a LARGE non-splittable file
    // (one multi-GB .json.gz) defeats the byte heuristic - callers
    // ingesting such sources should repartition explicitly at read time
    // (that shuffle is the unavoidable price of a non-splittable codec).
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= BigInt(Long.MaxValue)) {
      // stats unknown: LogicalRDD / localCheckpointed inputs report the
      // spark.sql.defaultSizeInBytes sentinel (Long.MaxValue; joins of
      // unknowns can exceed it). Fall back to the physical partition
      // count - these in-memory inputs are exactly the ones that arrive
      // with fewer partitions than cores after a collect-free rebuild.
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    } else if (bytes < BigInt(target.toLong) * 32L * 1024 * 1024) df.repartition(target)
    else df
  }

  /** Drop the storage blocks behind a `localCheckpoint`ed Dataset.
    * `Dataset.unpersist` only consults the cache manager, which knows
    * nothing about checkpoint RDDs - the blocks live on the RDD inside
    * the plan's `LogicalRDD` leaf, so unpersist that directly.
    */
  def unpersistCheckpoint(ds: org.apache.spark.sql.Dataset[_]): Unit =
    ds.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
