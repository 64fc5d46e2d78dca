package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scratch stage-timing for docs_lang_mix. */
object LangMixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }

    val latin = "abcdefghijklmnopqrstuvwxyz"
    val cyr = "абвгдежзийклмнопрстуфхцчшщ"
    val greek = "αβγδεζηθικλμνξοπρστυφχψωϊϋ"
    val mapped =
      when(col("doc_id") % 5 === 1, translate(col("text"), latin, cyr))
        .when(col("doc_id") % 5 === 2, translate(col("text"), latin, greek))
        .when(col("doc_id") % 5 === 3, translate(col("text"), "aeiou", "01234"))
        .when(col("doc_id") % 5 === 4, translate(col("text"), "aeiout", "аеиоут"))
        .otherwise(col("text"))
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)

    t("shell checkpoint") {
      base.select(col("doc_id"), mapped.as("stext")).localCheckpoint().count()
    }
    val shell = base.select(col("doc_id"), mapped.as("stext")).localCheckpoint()
    t("langid over shell") {
      shell.select(col("doc_id"),
        graft.ops.TextOps.langId(col("stext")).as("lang")).count()
    }
    t("tokens over shell") {
      shell.select(col("doc_id"),
        size(graft.ops.DedupOps.tokens(col("stext"))).cast(LongType).as("n"))
        .count()
    }
    val docs = shell.select(col("doc_id"),
      graft.ops.TextOps.langId(col("stext")).as("lang"),
      size(graft.ops.DedupOps.tokens(col("stext"))).cast(LongType).as("n_tok"))
      .localCheckpoint()
    t("docs checkpoint (both)") { docs.count() }
    t("temperatureMix over docs") {
      graft.ops.SampleOps.temperatureMix(docs, "doc_id", "lang", "n_tok",
        totalBudget = 20000.0, temperature = 2.0).count()
    }
    t("langid over RAW text") {
      base.select(graft.ops.TextOps.langId(col("text")).as("l")).count()
    }
    val probeDocsPre = shell.select(col("doc_id"),
      graft.ops.TextOps.langId(col("stext")).as("lang"),
      size(graft.ops.DedupOps.tokens(col("stext"))).cast(LongType).as("n_tok"))
    println("PROBE_PLAN_START")
    println(probeDocsPre.queryExecution.executedPlan.toString.take(4000))
    println("PROBE_PLAN_END")
    val fn = graft.SparkEntry.queries("docs_lang_mix")
    var built: org.apache.spark.sql.DataFrame = null
    t("closure invoke (plan build)") {
      built = fn(spark, sfDir); 0L
    }
    spark.stop()
  }
}
