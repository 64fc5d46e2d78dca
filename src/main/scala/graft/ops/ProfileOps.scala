package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Corpus profiling: the per-column data-quality summary every curation
  * pipeline runs before and after a transform (null rates, cardinality,
  * value ranges) - one pass, one shuffle, any column count.
  */
object ProfileOps {

  /** Profile `cols` of `df`: one output row per column with row/null/
    * distinct counts and lexicographic min/max of the stringified
    * values (stringifying unifies the output schema; numeric columns
    * wanting numeric ranges profile fine through their own dtype
    * queries - this is the uniform overview).
    *
    * Scale shape: a single melt (explode of a k-wide struct array -
    * rows x k, columnar scan stays pruned to `cols`) feeding one
    * groupBy("col") aggregation. Exact distinct counts shuffle the
    * (col, value) pairs once; swap `countDistinct` for
    * `approx_count_distinct` when profiling at the full 100-TB corpus
    * and cardinality error is acceptable.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val melted = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("col"), F.col(c).cast(StringType).as("v"))): _*)).as("kv"))
      .select(F.col("kv.col").as("col"), F.col("kv.v").as("v"))
    melted.groupBy("col").agg(
      count(lit(1)).as("n_rows"),
      sum(when(F.col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
      countDistinct(F.col("v")).as("n_distinct"),
      min(F.col("v")).as("min_v"),
      max(F.col("v")).as("max_v"))
  }
}
