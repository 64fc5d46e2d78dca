package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Join operators beyond Spark's built-ins. */
object JoinOps {

  /** As-of join: attach to every left row the LATEST right row with the
    * same `key` and `right.ts <= left.ts` (inclusive); left rows with no
    * such match keep null right columns (left-outer semantics).
    *
    * Implemented as union + running window, not a range join: tag both
    * sides, union, sort each key's rows by (ts, side) and carry the last
    * right payload forward. One shuffle on the key and a per-partition
    * sort - cost O(|L|+|R|) regardless of time-skew, where a range join
    * on (key, ts-interval) re-pairs every hot key's rows quadratically.
    * This is the plan that survives 100 TB of events.
    *
    * Right rows order BEFORE co-timestamped left rows (side 0 < side 1),
    * making the match inclusive. If `right` contains several rows with
    * identical (key, ts), which one wins is unspecified - pre-dedup when
    * that matters (DuckDB/pandas ASOF leave it unspecified too).
    * NULL keys follow SQL join semantics: a NULL-keyed left row never
    * matches (right NULL keys are dropped before the union).
    *
    * Output: all left columns (original names) + all right columns
    * prefixed with `rightPrefix`.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightPrefix: String = "r_"
  ): DataFrame = {
    val lCols = left.columns
    val rCols = right.columns
    val lStruct = struct(lCols.map(F.col).toIndexedSeq: _*)
    val rStruct = struct(rCols.map(F.col).toIndexedSeq: _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    val l = left.select(
      F.col(key).as("__key"),
      F.col(leftTs).as("__ts"),
      lit(1).as("__side"),
      lStruct.as("__l"),
      lit(null).cast(rType).as("__r")
    )
    // SQL join semantics for NULL keys: Window.partitionBy would group
    // the NULLs together and happily "match" them; dropping NULL-keyed
    // right rows leaves NULL-keyed left rows unmatched instead. NULL
    // timestamps likewise: `left.ts >= NULL` never matches in SQL ASOF,
    // but a null-ts right row would sort first (nulls-first ascending)
    // and be carried forward into every left row of its key
    val r = right.filter(F.col(key).isNotNull && F.col(rightTs).isNotNull).select(
      F.col(key).as("__key"),
      F.col(rightTs).as("__ts"),
      lit(0).as("__side"),
      lit(null).cast(lType).as("__l"),
      rStruct.as("__r")
    )
    val w = Window
      .partitionBy("__key")
      .orderBy(F.col("__ts").asc, F.col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(F.col("__r"), ignoreNulls = true).over(w))
      .filter(F.col("__side") === 1)
      .select(
        lCols.map(c => F.col("__l").getField(c).as(c)) ++
          rCols.map(c => F.col("__match").getField(c).as(rightPrefix + c)): _*
      )
  }
}
