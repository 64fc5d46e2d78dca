package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe for the `web_fetch_priority` capstone's shared-subplan
  * question: the url+html shell feeds the frontier, the link graph,
  * and the robots domain list - is a localCheckpoint pin of that shell
  * worth its materialization cost, or does sum-of-stages stand?
  *
  * Interleaved A1 B1 A2 B2 (unpinned / pinned), noop-sink exhaust,
  * min-of-2 per arm - the same ambient-noise discipline as
  * `graft.Bench`'s AB mode. The verdict lives in the
  * SparkEntry.fetchPriorityPlan scaladoc; re-run this after changing
  * the plan's sharing structure.
  *
  * Usage: runMain graft.tools.FetchPriorityProbe <sfDir>
  */
object FetchPriorityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(pin: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.fetchPriorityPlan(spark, sfDir, pin)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def settle(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    once(false); settle(); once(true); settle() // warm codegen, both arms
    val walls = Seq(false, true, false, true).map { pin =>
      val w = once(pin); settle(); (pin, w)
    }
    val a = walls.filter(!_._1).map(_._2).min
    val b = walls.filter(_._1).map(_._2).min
    println(f"fetch_priority unpinned=$a%6.2fs pinned=$b%6.2fs pinned/unpinned=${b / a}%4.2fx")
    spark.stop()
  }
}
