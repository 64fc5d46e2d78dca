package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ptree.{PrefixTree, Query}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a matching DuckDB oracle in [[oracleSql]]
  * (or is explicitly rows-only). Column names and types are aligned on both
  * sides: the driver sorts columns by name and hashes values.
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: fuzzy-match perturbed customer names against a prefix tree
    * of all customer names (the reference's end-to-end lifecycle:
    * Create + QueryThorLevenshtein, /root/reference/PrefixTree.ecl:592-660).
    * Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    ptFuzzyCustomer(spark, "/root/testdata/sf0.001")

  private def ptFuzzyCustomer(s: SparkSession, dir: String): DataFrame = {
    val cust = tbl(s, dir, "customer")
    val trie = PrefixTree.create(cust, "c_name", prefixLen = 12)
    val queries = cust
      .filter(col("c_custkey") % 7 === 0)
      .select(expr("concat(substr(c_name, 1, length(c_name)-1), 'X')").as("query_string"))
    Query
      .queryBroadcast(queries, "query_string", trie, maxDist = 2)
      .select(
        col("query_string"),
        col("node"),
        col("final_distance").cast(IntegerType).as("final_distance")
      )
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- prefix-tree core (the reference's own surface) ------------------
    "pt_fuzzy_customer" -> ((s, dir) => ptFuzzyCustomer(s, dir)),
    "pt_words_roundtrip" -> { (s, dir) =>
      // construction correctness: end-caps reconstruct the distinct word set
      val words = tbl(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
      PrefixTree.create(words, "word", prefixLen = 2)
        .filter(col("is_word"))
        .select(col("node").as("word"))
        .distinct()
    },
    // --- relational basics ----------------------------------------------
    "q1_agg" -> { (s, dir) =>
      tbl(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_base_price"),
          count(lit(1)).as("count_order")
        )
    },
    "dedup_exact" -> { (s, dir) =>
      tbl(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies"))
    },
    "text_tokens" -> { (s, dir) =>
      tbl(s, dir, "documents")
        .select(
          col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast(IntegerType).as("n_tokens")
        )
    }
  )

  def oracleSql: Map[String, String] = Map(
    "pt_fuzzy_customer" ->
      """SELECT q.query_string AS query_string, d.c_name AS node,
        |       CAST(levenshtein(q.query_string, d.c_name) AS INT) AS final_distance
        |FROM (SELECT substr(c_name, 1, length(c_name)-1) || 'X' AS query_string
        |      FROM customer WHERE c_custkey % 7 = 0) q
        |CROSS JOIN customer d
        |WHERE levenshtein(q.query_string, d.c_name) <= 2""".stripMargin,
    "pt_words_roundtrip" ->
      """SELECT DISTINCT word FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents
        |) WHERE word <> ''""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |       CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens
        |FROM documents""".stripMargin
  )
}
