package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F, Column}

/** Changelog-merge operators: the warehouse-side maintenance a pipeline
  * runs between analytic passes - CDC compaction (keep the newest
  * version of every key, honoring delete markers) and SCD Type-2
  * snapshotting (explode a change stream into validity intervals).
  *
  * Scale shape: both are ONE shuffle on the merge keys followed by a
  * window pass inside each partition - the same plan MERGE INTO
  * compaction jobs run on table formats (Delta/Iceberg/Hudi), minus the
  * file-commit protocol, which is the sink's job, not the operator's.
  * No driver-side state, no skew beyond the key histogram itself (a
  * pathological hot key is one user's history, bounded by retention).
  */
object MergeOps {

  /** CDC compaction: the LATEST row per key wins, ordered by
    * (`orderCol`, `tieBreak`) - `tieBreak` makes co-timestamped
    * versions deterministic (a real changelog uses the log sequence
    * number). If `deleteMarker` is non-null and the winning row
    * matches it, the key is a tombstone and is dropped entirely -
    * upsert-then-delete compacts to absent, delete-then-upsert
    * compacts to present.
    */
  def compactChangelog(
      changelog: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieBreak: String,
      deleteMarker: Column = null
  ): DataFrame = {
    require(keyCols.nonEmpty, "compactChangelog needs at least one key column")
    require(!changelog.columns.contains("gr_rn"),
      "input already has a gr_rn column; rename it before compacting")
    val w = Window.partitionBy(keyCols.map(F.col): _*)
      .orderBy(F.col(orderCol).desc, F.col(tieBreak).desc)
    val latest = changelog
      .withColumn("gr_rn", row_number().over(w))
      .filter(F.col("gr_rn") === 1)
      .drop("gr_rn")
    // coalesce: a NULL-evaluating marker (malformed op field) must mean
    // "not a delete" - a bare !marker would be NULL and drop the key
    if (deleteMarker == null) latest
    else latest.filter(!coalesce(deleteMarker, lit(false)))
  }

  /** SCD Type-2 snapshot: each change row becomes a validity interval
    * [valid_from, valid_to) per key, ordered by (`orderCol`,
    * `tieBreak`); the newest row per key is open-ended
    * (valid_to null, is_current true). Appends columns `valid_from`,
    * `valid_to`, `is_current` to the input row.
    */
  def scd2(
      changelog: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieBreak: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    val w = Window.partitionBy(keyCols.map(F.col): _*)
      .orderBy(F.col(orderCol).asc, F.col(tieBreak).asc)
    changelog
      .withColumn("valid_from", F.col(orderCol))
      .withColumn("valid_to", lead(F.col(orderCol), 1).over(w))
      .withColumn("is_current", F.col("valid_to").isNull)
  }

  /** Corpus snapshot diff: classify every key across two corpus
    * versions as `added` / `removed` / `changed` / `unchanged` - the
    * audit every dataset release runs before shipping ("what moved
    * since v1?"), and the input to incremental index maintenance
    * (changed + added keys are exactly the delta the StreamOps
    * maintenance ops would fold in).
    *
    * Change detection compares md5 of `contentCol` (never the raw
    * content - at 100 TB the full outer join then moves two hash
    * columns, not two corpora). ONE shuffle per side on the key;
    * NULL content hashes to NULL and compares equal only to NULL
    * (null-safe equality), so a NULL-text doc is `unchanged` against a
    * NULL-text doc and `changed` against any real text.
    *
    * Output: `(id, status)` for every key in either version.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      contentCol: String
  ): DataFrame = {
    // presence flags are separate from the hash: a present row with
    // NULL content hashes to NULL, which must NOT read as "absent"
    def hashed(df: DataFrame, h: String, p: String) =
      df.select(F.col(idCol).as("id"), md5(F.col(contentCol)).as(h),
        lit(true).as(p))
    hashed(oldDf, "oh", "op").join(hashed(newDf, "nh", "np"), Seq("id"), "full_outer")
      .select(F.col("id"),
        when(F.col("op").isNull, "added")
          .when(F.col("np").isNull, "removed")
          .when(F.col("oh") <=> F.col("nh"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
