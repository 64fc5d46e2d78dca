package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: dHash-class size distribution for the media dup fixtures -
  * quantifies the self-join skew (one class of size B costs O(B^2) pairs
  * in one task). Usage: runMain graft.tools.BlockDist <sfDir>
  */
object BlockDist {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.ops.{MultimodalOps => ops}
    // same fixture as media_video_dup
    val media = ops.asMedia(
      spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id")).as[Long]
        .repartition(32)
        .mapPartitions(_.map { id =>
          val vs = id % 97
          val w = 16 + (vs % 7).toInt * 8
          val h = 16 + ((vs * 3) % 5).toInt * 8
          val n = 2 + (id % 3).toInt
          (id, ops.synthMjpegVideoBytes(
            (0 until n).map(f => 160 + (vs * 4 + f) * 31 % 96), w, h))
        }).toDF("doc_id", "payload"),
      "doc_id", "payload", "video")
    val hashed = ops.imageDHash(ops.videoFrames(media))
      .filter(col("dhash").isNotNull)
    val dist = hashed.groupBy("dhash").count().orderBy(desc("count"))
    println("== video frame dHash classes (top 20) ==")
    dist.show(20, truncate = false)
    val agg = dist.agg(count(lit(1)).as("classes"), sum("count").as("rows"),
      sum(col("count") * (col("count") - 1) / 2).as("pairs"))
    agg.show(false)
    // image fixture (media_dup_pairs): radius 2 -> 3 blocks of 21 bits
    val imedia = ops.asMedia(
      spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id")).as[Long]
        .repartition(32)
        .mapPartitions(_.map { id =>
          val seed = id % 37
          val w = 8 + (seed % 24).toInt
          val h = 8 + ((seed * 3) % 24).toInt
          (id, ops.synthPngImageBytes(seed, w, h))
        }).toDF("doc_id", "payload"),
      "doc_id", "payload", "image")
    val ih = ops.imageDHash(imedia).filter(col("dhash").isNotNull)
    val blocks = 3; val width = 64 / blocks
    val keyed = ih.select(explode(array((0 until blocks).map(b =>
      struct(lit(b).as("blk"), shiftrightunsigned(col("dhash"), b * width)
        .bitwiseAND(lit((1L << width) - 1)).as("key"))): _*)).as("bk"))
    val idist = keyed.groupBy("bk").count().orderBy(desc("count"))
    println("== image block classes (top 20) ==")
    idist.show(20, truncate = false)
    idist.agg(count(lit(1)).as("classes"), sum("count").as("rows"),
      sum(col("count") * (col("count") - 1) / 2).as("pairs")).show(false)
    spark.stop()
  }
}
