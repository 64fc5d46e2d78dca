package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{col, concat_ws, lit}
import org.apache.spark.sql.types.DataType

/** CDX(J) archive-index files - the FOURTH CommonCrawl interchange
  * artifact (after WARC/WAT/WET, sources/Warc.scala): the cluster
  * index that maps every captured URL to the archive file, offset and
  * content digest holding it. One record per line:
  *
  * {{{
  * <surt key> <timestamp14> <json fields>
  * com,example)/path?a=1 20240101000000 {"url":"https://example.com/path?a=1","mime":"text/html","status":"200","digest":"...","length":"2345","offset":"100","filename":"crawl-data/.../x.warc.gz"}
  * }}}
  *
  * The key is the SURT ([[graft.ops.WebOps.surtKey]]) so one site's
  * captures sort adjacently; the JSON fields are all STRINGS on the
  * wire (as CommonCrawl ships them) - casts belong to the consumer.
  *
  * Scale shape: CommonCrawl's index is ~300 gzip shards of sorted
  * lines; Spark's text source reads one task per gzip file (not
  * splittable - exactly the sharding the format was designed around),
  * and everything after the read is pure codegen: a limit-3 split
  * (the JSON may contain spaces; only the first two are
  * separators) and one `from_json`, both fused into the scan. No
  * custom InputFormat, no UDF, no driver-side state. Writing inherits
  * the upstream partitioning - shard count = task count, the same
  * contract as the text-lines dumps (sources/Sinks.scala).
  *
  * Refuse-don't-crash: a line with fewer than three fields, or whose
  * third field fails to parse as the expected JSON object, yields
  * NULL parsed columns and is dropped by [[parseCdxLines]] - one
  * corrupt shard tail must not kill the read.
  */
object Cdx {

  /** Wire schema of the JSON field block (all strings, as shipped). */
  val fieldsDdl: String =
    "STRUCT<url: STRING, mime: STRING, status: STRING, digest: STRING, " +
      "length: STRING, offset: STRING, filename: STRING>"

  /** One CDX(J) line from its parts - `to_json` emits the fields in
    * this exact order with no whitespace, so lines are deterministic
    * functions of their columns (the roundtrip oracle depends on it).
    * Pure codegen; fuses into whatever scan computes the inputs.
    */
  def cdxLine(
      surt: Column,
      timestamp: Column,
      url: Column,
      mime: Column,
      status: Column,
      digest: Column,
      length: Column,
      offset: Column,
      filename: Column
  ): Column =
    concat_ws(" ", surt, timestamp,
      F.to_json(F.struct(url.as("url"), mime.as("mime"), status.as("status"),
        digest.as("digest"), length.as("length"), offset.as("offset"),
        filename.as("filename"))))

  /** Parse CDX(J) lines in `lineCol` into typed columns
    * `(surt_key, cdx_ts, url, mime, status, digest, length, offset,
    * filename)` - field values stay STRING (wire fidelity; consumers
    * cast). Unframeable lines (fewer than 3 space-separated fields,
    * or a third field that is not the expected JSON object) drop.
    */
  def parseCdxLines(df: DataFrame, lineCol: String): DataFrame = {
    // try_element_at, not element_at: ANSI mode (Spark 4 default) makes
    // the latter THROW on a short split - a malformed line must drop,
    // not kill the task
    val parts = F.split(col(lineCol), " ", 3)
    val j = F.from_json(F.try_element_at(parts, lit(3)), DataType.fromDDL(fieldsDdl))
    df.select(parts.as("gr_p"), j.as("gr_j"))
      .filter(F.size(col("gr_p")) === 3 &&
        col("gr_j").isNotNull && col("gr_j").getField("url").isNotNull)
      .select(
        F.try_element_at(col("gr_p"), lit(1)).as("surt_key"),
        F.try_element_at(col("gr_p"), lit(2)).as("cdx_ts"),
        col("gr_j").getField("url").as("url"),
        col("gr_j").getField("mime").as("mime"),
        col("gr_j").getField("status").as("status"),
        col("gr_j").getField("digest").as("digest"),
        col("gr_j").getField("length").as("length"),
        col("gr_j").getField("offset").as("offset"),
        col("gr_j").getField("filename").as("filename"))
  }

  /** Write a frame of pre-built CDX lines (`lineCol`) as gzip text
    * shards at `path` - shard count = upstream partition count, the
    * CommonCrawl layout. Lines must be single-line by construction
    * ([[cdxLine]]'s JSON escapes control chars; the surt/timestamp
    * come from URL parses that never contain newlines).
    */
  def writeCdx(df: DataFrame, lineCol: String, path: String): Unit =
    df.select(col(lineCol).as("value"))
      .write.mode("overwrite").option("compression", "gzip").text(path)

  /** Read CDX shards written by [[writeCdx]] (or CommonCrawl's own
    * cdx-NNNNN.gz layout) and parse them - one task per gzip shard,
    * parse fused into the scan.
    */
  def readCdx(spark: SparkSession, path: String): DataFrame =
    parseCdxLines(spark.read.text(path), "value")

  /** Latest capture per SURT from a parsed index frame (the "current
    * state of the web" view every dedup/fetch decision joins against):
    * ONE aggregate keyed on the surt, taking the MAX of the full
    * capture struct ordered by `cdx_ts` first - timestamp14 sorts
    * lexically == chronologically ([[timestamp14]]'s invariant), and
    * the struct compare makes ties (same-second recaptures)
    * deterministic through the remaining fields instead of max_by's
    * arbitrary pick. Map-side partial aggregation does the heavy
    * lifting: the shuffle carries one candidate struct per
    * (partition, surt), never the capture history.
    */
  def latestCaptures(index: DataFrame): DataFrame = {
    val m = F.max(F.struct(col("cdx_ts"), col("url"), col("mime"),
      col("status"), col("digest"), col("length"), col("offset"),
      col("filename"))).as("gr_m")
    index.groupBy(col("surt_key")).agg(m)
      .select(col("surt_key"), col("gr_m.cdx_ts").as("cdx_ts"),
        col("gr_m.url").as("url"), col("gr_m.mime").as("mime"),
        col("gr_m.status").as("status"), col("gr_m.digest").as("digest"),
        col("gr_m.length").as("length"), col("gr_m.offset").as("offset"),
        col("gr_m.filename").as("filename"))
  }

  /** Timestamp14 (`yyyyMMddHHmmss`) from numeric parts - zero-padded,
    * pure codegen. CDX timestamps sort lexically == chronologically;
    * this builder keeps that invariant for synthetic/test captures.
    */
  def timestamp14(
      year: Column, month: Column, day: Column,
      hour: Column, minute: Column, second: Column): Column = {
    def p2(c: Column) = F.lpad(c.cast("string"), 2, "0")
    F.concat(F.lpad(year.cast("string"), 4, "0"),
      p2(month), p2(day), p2(hour), p2(minute), p2(second))
  }
}
