package graft

import org.apache.spark.sql.functions._

/** Pins the two runtime-filtering features a 100-TB deployment leans on,
  * against THIS library's layouts (partitioned sinks, parquet scans):
  *
  *  - runtime bloom-filter join pruning: a selective dimension filter is
  *    turned into a bloom filter applied on the fact side BEFORE the
  *    join shuffle - the difference between shuffling a full fact table
  *    and shuffling the ~matching slice;
  *  - dynamic partition pruning: a dimension filter prunes fact
  *    PARTITION DIRECTORIES at runtime when the fact is laid out by
  *    [[graft.sources.Sinks.writePartitioned]].
  *
  * Both assertions are on the plan, not timings - at test scale the
  * effect is invisible in milliseconds but the plan shape is exactly
  * what ships to a cluster.
  */
class PlanFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString + "/data"
  }

  test("runtime bloom filter injected on the fact side of a selective join") {
    val dir = tmp("bloom")
    // parquet-backed tables: runtime filters key off file-scan statistics
    (1L to 2000L).map(i => (i, i % 97, s"payload_$i"))
      .toDF("fact_id", "key", "payload").write.parquet(s"$dir/fact")
    (0L to 96L).map(i => (i, s"dim_$i")).toDF("key", "name")
      .write.parquet(s"$dir/dim")
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // test-sized data: drop the size gates so the rewrite fires here
      // exactly as it would on a 10-GB-scan fact table in production
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    ) {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"name" === "dim_7")
      val q = fact.join(dim, "key").select("fact_id", "name")
      val plan = q.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("bloomfilter") || plan.contains("might_contain"),
        s"no runtime bloom filter in plan:\n$plan")
      // bloom pruning must not change the answer: keys 7,104,...,1947
      val ids = q.select("fact_id").as[Long].collect()
      assert(ids.length == 21 && ids.forall(_ % 97 == 7))
    }
  }

  test("dynamic partition pruning through a Sinks.writePartitioned layout") {
    val dir = tmp("dpp")
    val fact = (1L to 1000L).map(i => (i, s"lang_${i % 8}", i * 10))
      .toDF("id", "lang", "v")
    graft.sources.Sinks.writePartitioned(fact, s"$dir/fact", Seq("lang"))
    // the pruning filter must be "likely selective" (literal equality -
    // a bare boolean attribute does not qualify for DPP)
    (0 to 7).map(i => (s"lang_$i", if (i % 3 == 0) "keep" else "drop"))
      .toDF("lang", "grp").write.parquet(s"$dir/dim")
    withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      // test-sized data: the cost heuristic compares estimated pruned
      // bytes against the subquery overhead and refuses on kilobytes -
      // pin the estimate so the rewrite fires as it would on a real
      // partitioned corpus
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "1000"
    ) {
      val f = graft.sources.Sinks.readPartitioned(spark, s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"grp" === "keep")
      val q = f.join(dim, "lang").groupBy("lang").agg(sum($"v").as("sv"))
      val plan = q.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning in plan:\n$plan")
      // langs 0,3,6 survive: correctness of the pruned result
      assert(q.select("lang").as[String].collect().toSet ==
        Set("lang_0", "lang_3", "lang_6"))
    }
  }
}
