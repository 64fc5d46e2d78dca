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
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
