package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString + "/data"
  }

  private val docs = Seq(
    (1L, "alpha", "en", 10L), (2L, "beta", "en", 20L),
    (3L, "gamma", "de", 30L), (4L, "delta", "de", 40L),
    (5L, "epsil", "fr", 50L), (6L, "zeta", "ja", 60L)
  ).toDF("doc_id", "text", "lang", "n_chars")

  test("CSV roundtrip survives quoting hazards: newlines, quotes, commas, delimiters, nulls") {
    val nasty = Seq(
      (1L, "plain text"),
      (2L, "embedded\nnewline and\r\ncrlf"),
      (3L, "she said \"hi\", twice \"\""),
      (4L, "comma, separated, values"),
      (5L, "quote-comma \",\" mix\n\"line\""),
      (6L, null.asInstanceOf[String]),
      (7L, "trailing backslash \\ and \\\" escaped-looking"),
      (8L, ""),
      (9L, "  leading and trailing whitespace  "),
      (10L, "\ttab edges\t"),
      (11L, "\nnewline edges\n")
    ).toDF("id", "text")
    val path = tmp("csv_rt")
    nasty.write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
    val back = spark.read
      .schema("id LONG, text STRING")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)
      .as[(Long, Option[String])].collect().toMap
    val want = nasty.as[(Long, Option[String])].collect().toMap
    // CSV cannot distinguish null from empty string (both serialize to
    // an empty field) - id 8 comes back null; everything else must be
    // byte-identical
    assert(back(8L).isEmpty)
    ((1L to 7L) ++ (9L to 11L)).foreach { id =>
      assert(back(id) == want(id), s"id $id: ${back(id)} != ${want(id)}")
    }
  }

  test("writePartitioned/readPartitioned roundtrip is lossless") {
    val path = tmp("sinks_rt")
    Sinks.writePartitioned(docs, path, Seq("lang"))
    val back = Sinks.readPartitioned(spark, path)
    assert(back.count() == 6)
    // schema survives modulo column order (partition cols move last)
    assert(back.columns.toSet == docs.columns.toSet)
    val got = back.select("doc_id", "text", "lang", "n_chars")
      .as[(Long, String, String, Long)].collect().toSet
    val want = docs.as[(Long, String, String, Long)].collect().toSet
    assert(got == want)
  }

  test("partition filter prunes directories at planning time") {
    val path = tmp("sinks_prune")
    Sinks.writePartitioned(docs, path, Seq("lang"))
    val q = Sinks.readPartitioned(spark, path).filter($"lang" === "en")
    val scan = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scan.nonEmpty, "expected a FileSourceScanExec")
    // the lang predicate must land in partitionFilters (pruned at file
    // listing), not dataFilters (evaluated after reading)
    assert(scan.head.partitionFilters.nonEmpty,
      s"lang filter not recognized as a partition filter: ${scan.head}")
    // and the pruned scan must read only the one matching directory
    assert(scan.head.relation.location.inputFiles.length >= 3,
      "layout should have one dir per lang")
    val readFiles = scan.head.selectedPartitions.totalNumberOfFiles
    val allFiles = scan.head.relation.location.inputFiles.length
    assert(readFiles < allFiles,
      s"pruning read $readFiles of $allFiles files - nothing pruned")
    assert(q.count() == 2)
  }

  test("one file per partition value (no small-files explosion)") {
    val path = tmp("sinks_files")
    // 4-partition input df x 4 lang values would naively write up to 16
    // files; the repartition inside writePartitioned caps it at one per value
    Sinks.writePartitioned(docs.repartition(4), path, Seq("lang"))
    val files = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
      .toMap
    assert(files.keySet == Set("lang=en", "lang=de", "lang=fr", "lang=ja"))
    assert(files.values.forall(_ == 1), s"expected 1 file per lang dir, got $files")
  }

  test("filesPerValue salt fans a hot partition value over several files, losslessly") {
    val path = tmp("sinks_salt")
    // one hot lang (100 of 103 rows): with filesPerValue=4 the hot value
    // spreads over up to 4 tasks/files instead of one
    val hot = (1L to 100L).map(i => (i, s"text_$i", "en", i))
      .toDF("doc_id", "text", "lang", "n_chars")
      .union(Seq((101L, "a", "de", 1L), (102L, "b", "fr", 2L),
        (103L, "c", "ja", 3L)).toDF("doc_id", "text", "lang", "n_chars"))
    // (lang, salt) pairs hash into shuffle partitions - with the test
    // default of 4 partitions the 4 salt values often collide into one;
    // production shuffle-partition counts make collisions negligible
    val enFiles = withConf("spark.sql.shuffle.partitions" -> "64",
        // AQE coalescing merges these tiny test partitions back into one
        // task; at production partition sizes it would not collapse a
        // hot value's salted splits
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      Sinks.writePartitioned(hot, path, Seq("lang"), filesPerValue = 4)
      new java.io.File(path + "/lang=en").listFiles()
        .count(_.getName.endsWith(".parquet"))
    }
    assert(enFiles > 1 && enFiles <= 4, s"expected 2-4 files for hot value, got $enFiles")
    val back = Sinks.readPartitioned(spark, path)
    assert(back.count() == 103)
    assert(back.filter($"lang" === "en").count() == 100)
    // deterministic salt: a rewrite produces the same file layout
    val path2 = tmp("sinks_salt2")
    val enFiles2 = withConf("spark.sql.shuffle.partitions" -> "64",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      Sinks.writePartitioned(hot, path2, Seq("lang"), filesPerValue = 4)
      new java.io.File(path2 + "/lang=en").listFiles()
        .count(_.getName.endsWith(".parquet"))
    }
    assert(enFiles2 == enFiles)
  }

  test("filesPerValue salt tolerates unhashable (map) columns") {
    val path = tmp("sinks_map")
    // hash() rejects MapType - the salt must skip such columns, not fail
    val withMap = docs.withColumn("props", map(lit("k"), $"text"))
    Sinks.writePartitioned(withMap, path, Seq("lang"), filesPerValue = 4)
    val back = Sinks.readPartitioned(spark, path)
    assert(back.count() == 6)
    assert(back.select(map_values($"props")(0)).as[String].collect().toSet ==
      docs.select("text").as[String].collect().toSet)
  }
}
