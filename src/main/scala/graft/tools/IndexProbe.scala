package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown of the persisted-index lifecycle (the
  * `pt_index_roundtrip` wall): trie build, parquet index write, the
  * `_graft_stats` sidecar (stats scan + one-row write), read-back, and
  * the query itself - each timed separately, min-of-2 after a warmup,
  * so a wall regression can be attributed to ONE stage instead of
  * guessed at. Usage: runMain graft.tools.IndexProbe <sfDir>
  */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](tag: String)(f: => A): A = {
      f // warm
      val t1 = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      val t2 = { val t0 = System.nanoTime(); val r = f; println(
        f"$tag%-24s ${math.min(t1, (System.nanoTime() - t0) / 1e9)}%6.2fs"); r }
      t2
    }

    val words = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(length(col("word")) >= 2).distinct().localCheckpoint()
    val path = System.getProperty("java.io.tmpdir") + "/graft_index_probe"

    val trie = timed("create+materialize") {
      val t = graft.ptree.PrefixTree.create(words, "word", prefixLen = 2)
      t.count(); t
    }
    timed("write data only") {
      trie.repartition(32, trie("parent_id")).sortWithinPartitions("parent_id")
        .write.mode("overwrite").parquet(path + "_raw")
    }
    timed("writeIndexed (with sidecar)") {
      graft.ptree.PrefixTree.writeIndexed(trie, path)
    }
    timed("stats-shaped scan alone") {
      // the sidecar's cost shape: one aggregate over the written files
      // (count + char-length folds) plus nothing else
      spark.read.parquet(path)
        .agg(count(lit(1)), sum(length(col("node"))), max(length(col("node"))))
        .head()
    }
    val back = timed("read") { graft.ptree.PrefixTree.read(spark, path) }
    val q = spark.read.parquet(s"$sfDir/part.parquet")
      .select(explode(split(col("p_name"), " ")).as("query_string")).distinct()
      .localCheckpoint()
    timed("queryBatch") {
      graft.ptree.Query.queryBatch(q, "query_string", back, maxDist = 1).count()
    }
    spark.stop()
  }
}
