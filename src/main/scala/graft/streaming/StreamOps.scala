package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no stream processing (its Roxie side is point-query
  * serving - SURVEY.md §2.C); these extend the engine to the streaming
  * half of a training-data pipeline. Each transform is defined on a plain
  * DataFrame so the SAME code runs batch (for the DuckDB oracle) and
  * streaming (`readStream` in, `writeStream` out) - the Structured
  * Streaming contract.
  */
object StreamOps {

  /** Tumbling-window per-type aggregates with a watermark for late data.
    * Batch: plain groupBy on the window expression. Stream: incremental
    * state per window, closed `lateness` after the watermark passes.
    */
  def windowedCounts(events: DataFrame, windowLen: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(F.col("ts"), windowLen).as("w"), F.col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("sum_value")
      )
      .select(
        F.col("w.start").as("window_start"),
        F.col("event_type"),
        F.col("n_events"),
        F.col("sum_value")
      )

  /** Sessionization with custom state: per-user sessions closed after
    * `gapMinutes` of inactivity (flatMapGroupsWithState with event-time
    * timeout). Emits (user_id, session_start, session_end, n_events).
    */
  def sessionize(
      events: Dataset[org.apache.spark.sql.Row],
      gapMinutes: Int
  ): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    case class Sess(start: Long, end: Long, n: Long)
    val typed = events
      .select(F.col("user_id").cast(LongType), F.col("ts").cast(TimestampType))
      .as[(Long, java.sql.Timestamp)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[(Long, Long, Long)]) =>
          // batch-mode execution: all rows for the key arrive at once -
          // sort and split on gaps. (Streaming mode would use the event-
          // time timeout to close sessions incrementally.)
          val ts = rows.map(_._2.getTime).toArray.sorted
          val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
          var start = ts.head; var prev = ts.head; var n = 1L
          for (t <- ts.tail) {
            if (t - prev > gapMs) { out += ((uid, start, prev, n)); start = t; n = 0L }
            prev = t; n += 1
          }
          out += ((uid, start, prev, n))
          out.iterator
      }
      .toDF("user_id", "session_start_ms", "session_end_ms", "n_events")
  }

  /** Streaming exact dedup: drop rows whose normalized-text fingerprint
    * (graft.ops.TextOps.fingerprint) was already seen within the
    * watermark horizon. `dropDuplicatesWithinWatermark` expires
    * fingerprint state once the watermark passes it - bounded state at
    * any stream length, where a plain streaming dropDuplicates would
    * hold every fingerprint forever. The batch-parity counterpart is
    * `dropDuplicates` on the same fingerprint column.
    */
  def streamingDedup(
      docs: DataFrame,
      tsCol: String,
      textCol: String,
      lateness: String
  ): DataFrame =
    docs
      .withColumn("fp", graft.ops.TextOps.fingerprint(F.col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp") // working column - callers get their input schema back

  /** Continuously maintain a prefix-tree index over a stream of strings
    * (`foreachBatch` + `graft.ptree.PrefixTree.merge`): each micro-batch
    * folds into the running trie via a VOCABULARY-sized rebuild - the
    * trie decomposes losslessly into weighted end-caps, so per-batch
    * cost is O(|vocab| + |batch|) regardless of how much raw corpus the
    * stream has carried. This is the streaming half of the reference's
    * Create lifecycle (its Thor side rebuilds from the full file each
    * time - /root/reference/PrefixTree.ecl:592-613).
    *
    * `onUpdate` fires after each batch with the new trie (e.g. to
    * refresh a serving index via `Query.childrenIndex`). State lineage
    * is cut with `localCheckpoint` every batch so the plan stays flat
    * across an unbounded stream.
    */
  def trieMaintenance(
      stream: DataFrame,
      col: String,
      initial: Dataset[graft.ptree.PTNode],
      prefixLen: Int = 2,
      numPartitions: Int = 0
  )(onUpdate: Dataset[graft.ptree.PTNode] => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    @volatile var state = initial.localCheckpoint()
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          state = graft.ptree.PrefixTree
            .merge(state, batch.toDF(), col, prefixLen, numPartitions)
            .localCheckpoint()
          onUpdate(state)
        }
      }
      .start()
  }

  /** Streaming fuzzy-match: a stream of query strings against a static
    * broadcast trie (stream-static pattern). `trieIndex` is the collected
    * children map from `graft.ptree.Query.childrenIndex`.
    */
  def streamFuzzyMatch(
      queryStream: DataFrame,
      queryCol: String,
      trieIndex: Map[Long, Array[graft.ptree.PTNode]],
      maxDist: Int
  ): DataFrame = {
    val spark = queryStream.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(trieIndex)
    queryStream
      .select(F.col(queryCol).cast(StringType).as("query_string"))
      .as[String]
      .mapPartitions { it =>
        val idx = bc.value
        val lookup: Long => Array[graft.ptree.PTNode] = idx.getOrElse(_, null)
        it.flatMap { q =>
          graft.ptree.Kernels.search(q, maxDist, lookup).map { case (w, d) => (q, w, d) }
        }
      }
      .toDF("query_string", "node", "final_distance")
  }
}
