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

  test("text-lines roundtrip: encode/decode bijection incl. backslash-n ambiguity") {
    val nasty = Seq(
      (1L, "plain text"),
      (2L, "embedded\nnewline and\r\ncrlf"),
      (3L, "literal backslash-n \\n is NOT a newline"),
      (4L, "trailing backslash \\"),
      (5L, "\\\\ doubled \\\\\\ tripled backslashes"),
      (6L, "backslash before newline \\\nfor real"),
      (7L, ""),
      (8L, "\n\n\n"),
      (9L, "\\r\\n lookalikes vs real \r\n")
    ).toDF("id", "text")
    // pure-expression bijection first: decode(encode(x)) == x row by row
    val rt = nasty.select($"id",
      Sinks.decodeTextLine(Sinks.encodeTextLine($"text")).as("rt"), $"text")
      .as[(Long, String, String)].collect()
    rt.foreach { case (id, got, want) => assert(got == want, s"id $id") }
    // and through the actual file format: every encoded doc is ONE line
    val path = tmp("text_rt")
    nasty.select(Sinks.encodeTextLine($"text").as("value"))
      .write.mode("overwrite").text(path)
    val back = spark.read.text(path)
      .select(Sinks.decodeTextLine($"value").as("text"))
      .as[String].collect().sorted.toSeq
    assert(back == nasty.as[(Long, String)].collect().map(_._2).sorted.toSeq)
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

  test("zValue == reference Morton interleave; order groups both dims") {
    // independent reference interleave
    def spread(x0: Long): Long = {
      var x = x0 & 0xFFFFL
      x = (x | x << 8) & 0x00FF00FFL
      x = (x | x << 4) & 0x0F0F0F0FL
      x = (x | x << 2) & 0x33333333L
      (x | x << 1) & 0x55555555L
    }
    def zRef(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
    val pairs = for (a <- Seq(0L, 1L, 45L, 123L, 65535L, 65536L, 70000L);
                     b <- Seq(0L, 2L, 45L, 9999L, 65535L)) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select($"a", $"b", graft.ops.ShardOps.zValue($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    for ((a, b, z) <- got)
      assert(z == zRef(a, b), s"z($a,$b)")
    // sorting by z bounds BOTH dims within any contiguous run: check the
    // defining prefix property z < 4^k => both dims < 2^k
    for ((a, b, z) <- got; k <- Seq(4, 8, 12); if z < (1L << (2 * k)))
      assert((a & 0xFFFF) < (1L << k) && (b & 0xFFFF) < (1L << k))
  }

  test("zOrderWrite: every output file is narrow in BOTH dims; rectangle prunes files") {
    val rnd = new scala.util.Random(11)
    val n = 20000
    val grid = (1 to n).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("a", "b")
    val zPath = tmp("zorder")
    Sinks.zOrderWrite(grid, zPath, "a", "b", nFiles = 16)
    val back = spark.read.parquet(zPath)
    assert(back.count() == n, "roundtrip loses nothing")
    // per-file spans: a 16-file Morton layout of a 1000x1000 uniform grid
    // keeps every file's bounding box FAR below the full domain area;
    // a linear sort on `a` alone leaves the b-span at full width
    import org.apache.spark.sql.functions.{input_file_name, min => fmin, max => fmax}
    val spans = back
      .groupBy(input_file_name().as("f"))
      .agg(fmin($"a").as("a0"), fmax($"a").as("a1"),
        fmin($"b").as("b0"), fmax($"b").as("b1"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(spans.length >= 8, s"expected a multi-file layout, got ${spans.length}")
    // a z-range straddling a major quadrant boundary can span up to half
    // the domain (Morton jumps at quadrant transitions), so the per-file
    // bound is 1/2; the MEAN box area must stay far below that
    val areas = spans.map { case (_, a0, a1, b0, b1) =>
      (a1 - a0 + 1).toDouble * (b1 - b0 + 1).toDouble
    }
    assert(areas.forall(_ <= 1000.0 * 1000.0 / 2),
      s"some file's bounding box covers more than half the domain: ${areas.max}")
    assert(areas.sum / areas.length <= 1000.0 * 1000.0 / 6,
      s"mean bounding-box area too wide: ${areas.sum / areas.length}")
    // file pruning for a rectangle selective in the SECOND dim: most
    // files' [b0, b1] must miss b <= 60 (in an a-sorted layout every
    // file would overlap it)
    val overlapping = spans.count { case (_, _, _, b0, _) => b0 <= 60 }
    assert(overlapping <= spans.length / 2,
      s"only a minority of files may overlap b <= 60, got $overlapping/${spans.length}")
  }

  test("compact: byte-targeted file count, lossless, never touches its input") {
    val rows = (1L to 5000L).map(i => (i, s"text payload number $i")).toDF("id", "t")
    val inPath = tmp("compact_in")
    rows.repartition(64).write.parquet(inPath)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    val before = parquetFiles(inPath).map(f => f.getName -> f.length).toMap
    assert(before.size == 64, "fixture should start fragmented")
    val outPath = tmp("compact_out")
    val n = Sinks.compact(spark, inPath, outPath, targetFileBytes = 256L * 1024)
    // sizing contract: ceil(totalBytes / target), and the directory agrees
    val expected = math.max(1L,
      (before.values.sum + 256L * 1024 - 1) / (256L * 1024)).toInt
    assert(n == expected, s"returned $n, expected $expected")
    assert(parquetFiles(outPath).length == n)
    // lossless rewrite, input untouched
    val back = spark.read.parquet(outPath).as[(Long, String)].collect().toSet
    assert(back == rows.as[(Long, String)].collect().toSet)
    assert(parquetFiles(inPath).map(f => f.getName -> f.length).toMap == before,
      "compaction must never rewrite its input in place")
    // in-place rewrite is refused outright
    intercept[IllegalArgumentException] {
      Sinks.compact(spark, inPath, inPath, targetFileBytes = 256L * 1024)
    }
  }
}
