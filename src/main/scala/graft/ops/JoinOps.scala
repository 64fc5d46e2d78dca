package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.IntegerType

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
  /** Range (interval-containment) join: pair every left row's interval
    * `[loCol, hiCol]` (inclusive) with every right row whose `ptCol`
    * falls inside it, optionally also requiring equality on `keys`
    * (left name -> right name). SQL-NULL semantics: a NULL bound/point/
    * key never matches; inverted intervals (hi < lo) match nothing.
    *
    * Spark's built-in plan for this predicate shape is a broadcast
    * nested loop - a cross product that dies at scale. Binning turns it
    * into a shuffled equi-join: intervals explode to the fixed-width
    * bins they overlap, points map to their ONE bin, and the bin (plus
    * any keys) is the join key, followed by the exact containment
    * filter. A qualifying (interval, point) pair meets in exactly one
    * bin - the point's - so no post-join dedup is needed.
    *
    * `binWidth` is the knob: about the typical interval length is right
    * (each interval then explodes to ~2 bins). Degenerate wide intervals
    * (> `maxBinsPerRow` bins - the [0, MAX] row that would explode to
    * billions of bin copies) take a broadcast escape hatch instead: they
    * are assumed FEW (heavy-hitter discipline, same as the dedup skew
    * caps), broadcast whole, and matched by predicate only. Numeric
    * bounds/points only - cast timestamps to epoch millis first.
    *
    * Output: all left columns (original names) + all right columns
    * prefixed with `rightPrefix`.
    */
  def rangeJoin(
      left: DataFrame,
      loCol: String,
      hiCol: String,
      right: DataFrame,
      ptCol: String,
      keys: Seq[(String, String)] = Nil,
      binWidth: Double = 0.0,
      maxBinsPerRow: Int = 256,
      rightPrefix: String = "r_"
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive (pick ~ the typical interval length)")
    val lCols = left.columns
    val rCols = right.columns
    val outCols =
      lCols.map(c => F.col(s"l.$c").as(c)) ++
        rCols.map(c => F.col(s"r.$c").as(rightPrefix + c))
    def bin(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / binWidth).cast("long")

    val keyCond = keys
      .map { case (lk, rk) => F.col(s"l.$lk") === F.col(s"r.$rk") }
      .foldLeft(lit(true))(_ && _)
    val contains =
      F.col(s"r.$ptCol") >= F.col(s"l.$loCol") && F.col(s"r.$ptCol") <= F.col(s"l.$hiCol")

    val l = left
      .filter(F.col(loCol).isNotNull && F.col(hiCol).isNotNull && F.col(loCol) <= F.col(hiCol))
      .withColumn("__nbins", bin(F.col(hiCol)) - bin(F.col(loCol)) + 1L)
    val r = right.filter(F.col(ptCol).isNotNull).alias("r")

    // narrow intervals: explode to overlapped bins, equi-join on the bin
    val narrow = l
      .filter(F.col("__nbins") <= maxBinsPerRow)
      .withColumn("__bin", explode(sequence(bin(F.col(loCol)), bin(F.col(hiCol)))))
      .alias("l")
      .join(r, keyCond && F.col("l.__bin") === bin(F.col(s"r.$ptCol")))
      .filter(contains)
      .select(outCols: _*)

    // wide intervals: few by assumption - broadcast and match by predicate
    val wide = broadcast(l.filter(F.col("__nbins") > maxBinsPerRow).alias("l"))
      .join(r, keyCond && contains)
      .select(outCols: _*)

    narrow.unionByName(wide)
  }

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

  /** Skew-safe inner equi-join: scatter the (large, possibly skewed)
    * left side across `salts` sub-keys and replicate every right row
    * once per salt, then join on (key, salt) - a hot join key's rows
    * now land in `salts` different shuffle partitions instead of one.
    * Result is EXACTLY the plain inner join (each left row meets the
    * full right group at its salt; duplicates on either side produce
    * the same all-pairs output).
    *
    * The salt is a deterministic hash of the left row's HASHABLE
    * columns, not rand(): re-runs and retried tasks place every row
    * identically, so the join is reproducible and exactly-once-safe
    * under speculative execution. (Map-typed columns are skipped -
    * xxhash64 rejects them - so a frame whose only non-key columns are
    * maps salts on the key alone.) Caveat: rows that are fully
    * IDENTICAL on the hashable columns share a salt, so a hot key
    * consisting of duplicated rows is not spread; carry any unique id
    * column through the join to restore the spread.
    *
    * This is the MANUAL fallback for engines/paths where AQE skew-join
    * splitting can't see the skew (e.g. a skewed key feeding a
    * downstream aggregation in the same stage); with AQE on, prefer
    * letting the optimizer split first. Cost: right side is written
    * `salts` times into the shuffle - size `salts` to the skew factor,
    * not higher.
    *
    * Output: left columns then right columns (right join key dropped -
    * it equals the left key on every row).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salts: Int
  ): DataFrame = {
    require(salts >= 1, s"salts must be positive, got $salts")
    require(leftKey != rightKey,
      "leftKey and rightKey must be distinct column names (rename one side)")
    // the scratch columns are dropped from the OUTPUT but would silently
    // shadow same-named input columns through the join condition
    require(!(left.columns ++ right.columns).exists(c => c == "__lsalt" || c == "__rsalt"),
      "__lsalt/__rsalt are reserved column names in saltedJoin")
    // salt over the hashable columns only: xxhash64 fails analysis on
    // MapType, and a metadata map is a legal frame shape
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val saltSrc = left.schema.fields.filter(f => hashable(f.dataType)).map(f => F.col(f.name))
    val l = left.withColumn("__lsalt",
      if (saltSrc.isEmpty) lit(0)
      else pmod(xxhash64(saltSrc.toSeq: _*), lit(salts)).cast(IntegerType))
    val r = right.withColumn("__rsalt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r,
        l(leftKey) === r(rightKey) && F.col("__lsalt") === F.col("__rsalt"))
      .drop("__lsalt", "__rsalt", rightKey)
  }
}
