package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc weak-scaling probe for sketch operators: build 10 disjoint
  * copies of the sf events table (ids offset, event types suffixed per
  * copy, so the 10x run is 10 independent instances of the same
  * problem) and time each operator at 1x vs 10x with min-of-2 - the
  * same discipline as the README's measured scale curve for the
  * dedup/curation pipelines.
  *
  * Usage: runMain graft.tools.ScaleCheck <sfDir>
  */
object ScaleCheck {
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
    val ev1 = spark.read.parquet(s"$sfDir/events.parquet").localCheckpoint()
    val n1 = ev1.count()
    // offset stride derived from the DATA, not a magic 1e8: ids >= the
    // constant would make the copies collide and quietly deflate the 10x
    // workload for the id-keyed sketches
    val idStride = ev1.agg(coalesce(max(col("event_id")), lit(0L)))
      .head().getLong(0) + 1L
    val ev10 = (0 until 10).map { c =>
      ev1.withColumn("event_id", col("event_id") + lit(c.toLong * idStride))
        .withColumn("event_type", concat(col("event_type"), lit(s"_$c")))
    }.reduce(_ unionByName _).repartition(cpus.toInt).localCheckpoint()
    val n10 = ev10.count()
    println(s"rows: 1x=$n1 10x=$n10")

    def timed(tag: String)(f: DataFrame => DataFrame): Unit = {
      def once(df: DataFrame): Double = {
        val t0 = System.nanoTime(); f(df).count(); (System.nanoTime() - t0) / 1e9
      }
      once(ev1); once(ev10) // warm codegen
      val a = math.min(once(ev1), once(ev1))
      val b = math.min(once(ev10), once(ev10))
      println(f"$tag%-28s 1x=$a%6.2fs 10x=$b%6.2fs ratio=${b / a}%4.1fx")
    }
    timed("events_sample_quantiles") { df =>
      graft.ops.SketchOps.sampleQuantiles(
        graft.ops.SketchOps.sampleSketch(df, "event_id", "value", Seq("event_type"), 512),
        Seq("event_type"), Seq(0.25, 0.5, 0.9, 0.99))
    }
    timed("events_quantiles_auto") { df =>
      graft.ops.SketchOps.histogramQuantilesAuto(
        graft.ops.SketchOps.fixedHistogramAuto(df, "value", Seq("event_type"), 20),
        Seq("event_type"), Seq(0.25, 0.5, 0.9, 0.99), 20)
    }
    timed("events_hll_registers") { df =>
      graft.ops.SketchOps.hllEstimate(
        graft.ops.SketchOps.hllRegisters(df, "user_id", Seq("event_type")),
        Seq("event_type"))
    }
    spark.stop()
  }
}
