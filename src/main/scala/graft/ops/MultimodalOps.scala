package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns beside typed metadata, processed in batched
  * per-partition passes.
  *
  * The Spark-side mechanics here - schema, partition sizing, batch
  * iteration, metadata propagation - are real and tested, and so is the
  * PNG METADATA decode: [[decodeImageMeta]] parses the spec-defined
  * IHDR header of any real PNG (verified in OpsSpec against bytes
  * produced by javax.imageio's actual encoder, and exercised by the
  * `media_decode` query on [[synthPngHeader]] fixtures). What remains
  * stand-in is pixel-level work (this environment has no image/audio
  * libraries): non-PNG payloads get deterministic md5-derived
  * pseudo-dims, and `extractFeatures` computes a byte-histogram
  * "feature vector" in place of a model embedding. Swapping in a full
  * decoder changes only those function bodies, not the pipeline.
  *
  * Scale notes: payload columns dominate row size, so operators
  * repartition by byte budget, never row count ([[repartitionForPayload]]),
  * and all metadata-only transforms prune the binary column before
  * shuffling (never shuffle pixels you don't need).
  */
object MultimodalOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)
  ))

  /** Wrap raw binary + metadata into the standard media frame. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      F.col(idCol).cast(LongType).as("media_id"),
      lit(kind).as("kind"),
      F.col(payloadCol).cast(BinaryType).as("payload"),
      map(lit("src_col"), lit(payloadCol)).as("meta")
    )

  /** Partition so each task holds ~`targetBytes` of payload: row counts
    * are meaningless when one column is 10KB-10MB per row.
    */
  def repartitionForPayload(df: DataFrame, payloadCol: String, targetBytes: Long): DataFrame = {
    // coalesce: sum() is NULL on an empty frame / all-null payloads
    val total = df.agg(coalesce(sum(length(F.col(payloadCol))), lit(0L))).head().getLong(0)
    val parts = math.max(1, math.min(100000, (total / math.max(1, targetBytes)).toInt))
    df.repartition(parts)
  }

  /** Image metadata decode. REAL for the two main formats - the parse
    * any spec-compliant file satisfies, verified against javax.imageio
    * encoder output in OpsSpec:
    *
    *   - PNG: width/height from the IHDR header (fixed offsets 16/20
    *     after the 8-byte signature + chunk length/type);
    *   - JPEG: marker walk from SOI to the first SOFn frame header
    *     (C0-CF except DHT C4 / JPG C8 / DAC CC), honoring fill bytes,
    *     standalone markers, and segment lengths; height then width are
    *     the big-endian 16-bit fields after the precision byte. A JPEG
    *     stream with no frame header before SOS/EOF decodes as
    *     (0, 0, "jpeg") - deterministic, never a guess.
    *
    * Any OTHER payload gets a deterministic pseudo-size derived from its
    * md5 (hex chars 1-8 / 9-16 as unsigned ints), so the pipeline
    * behaves identically with fake payloads in tests AND the DuckDB
    * oracle can replay the pseudo-dims from its own md5. (Pixel-level
    * decoding - the part that needs an image library - slots in beside
    * this without touching the plan.)
    */
  def decodeImageMeta(payload: Array[Byte]): (Int, Int, String) = {
    if (payload == null || payload.length == 0) (0, 0, "empty")
    else if (payload.length > 24 &&
      payload(0) == 0x89.toByte && payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G') {
      def be32(o: Int) = ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
        ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)
      (be32(16), be32(20), "png")
    } else if (payload.length > 3 &&
      payload(0) == 0xff.toByte && payload(1) == 0xd8.toByte && payload(2) == 0xff.toByte) {
      def be16(o: Int) = ((payload(o) & 0xff) << 8) | (payload(o + 1) & 0xff)
      def isSof(m: Int) = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
      var i = 2
      var out = (0, 0, "jpeg")
      var walking = true
      while (walking && i + 1 < payload.length) {
        if (payload(i) != 0xff.toByte) walking = false // corrupt stream
        else {
          var j = i + 1
          while (j < payload.length && payload(j) == 0xff.toByte) j += 1 // fill bytes
          if (j >= payload.length) walking = false
          else {
            val marker = payload(j) & 0xff
            if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i = j + 1 // standalone
            else if (j + 2 >= payload.length) walking = false
            else if (isSof(marker)) {
              if (j + 7 < payload.length) out = (be16(j + 6), be16(j + 4), "jpeg")
              walking = false
            } else if (marker == 0xda) walking = false // SOS: frame header must precede
            else i = j + 1 + be16(j + 1) // skip segment (length includes itself)
          }
        }
      }
      out
    } else {
      val d = graft.functions.ExprKernels.md5OfBytes(payload)
      def be32u(o: Int): Long = ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
        ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
      (64 + (be32u(0) % 1920).toInt, 64 + (be32u(4) % 1080).toInt, "raw")
    }
  }

  /** STUB feature extraction: 16-bin byte histogram normalized to [0,1] -
    * the deterministic stand-in for an embedding model. Real models slot
    * in through [[FeatureModel]] (ONNX/JNI call per batch); the batching
    * shape is what matters: one model session per PARTITION, amortized
    * over rows.
    */
  def extractFeatures(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (payload != null) {
      var i = 0
      while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1f; i += 1 }
      val n = math.max(1, payload.length).toFloat
      var b = 0
      while (b < 16) { hist(b) /= n; b += 1 }
    }
    hist
  }

  /** The embedding-model contract for [[decodeAndFeaturize]]: a factory
    * (serialized to executors) that opens ONE [[FeatureSession]] per
    * partition. This is the seam a real encoder plugs into with zero
    * plan changes - the Spark side (schema, mapPartitions batching,
    * session lifecycle) is identical whether the session wraps the
    * byte-histogram stand-in or an ONNX runtime holding GPU buffers.
    */
  trait FeatureModel extends Serializable {
    /** Open a session. Called once per partition, on the executor;
      * expensive setup (model load, device context) belongs here.
      */
    def openSession(): FeatureSession
  }

  /** One partition's model session: embeds payload BATCHES (bounded by
    * [[decodeAndFeaturize]]'s `batchSize`), so a real runtime amortizes
    * per-invocation overhead across `batchSize` rows and controls its
    * peak device memory. Must return exactly one vector per payload,
    * in order. Closed when the partition's rows are exhausted AND on
    * task completion (belt-and-braces - a downstream `limit` can stop
    * consuming mid-partition).
    */
  trait FeatureSession extends AutoCloseable {
    def embedBatch(payloads: Array[Array[Byte]]): Array[Array[Float]]
  }

  /** Default model: the deterministic byte-histogram stand-in, wrapped
    * in the same session lifecycle a real encoder uses - so swapping in
    * a real model changes feature VALUES only, never the plan or the
    * output schema.
    */
  object ByteHistogramModel extends FeatureModel {
    def openSession(): FeatureSession = new FeatureSession {
      def embedBatch(payloads: Array[Array[Byte]]): Array[Array[Float]] =
        payloads.map(extractFeatures)
      def close(): Unit = ()
    }
  }

  /** A minimal REAL PNG header - the 8-byte signature plus the IHDR
    * chunk (length, type, width, height, bit depth 8, color type 6,
    * default compression/filter/interlace) - as a binary column built
    * from plain codegen'd string/hex functions: `lpad(hex(x), 8, '0')`
    * IS the big-endian 4-byte encoding once unhexed, so no UDF is
    * needed and any engine with md5-grade built-ins can replay the
    * bytes. Any spec-compliant PNG reader accepts this prefix as the
    * start of a valid file, which makes it the fixture generator for
    * the real-decode path ([[decodeImageMeta]]'s IHDR branch) in an
    * environment without image assets.
    */
  def synthPngHeader(width: Column, height: Column): Column = {
    // out-of-range dims must FAIL, not truncate: lpad keeps the FIRST
    // chars of an overlong hex string, which would silently encode
    // wrong dimensions into a structurally valid header
    val ok = width.between(1, Int.MaxValue) && height.between(1, Int.MaxValue)
    when(ok, unhex(concat(
      lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      lpad(F.hex(width.cast(LongType)), 8, "0"),
      lpad(F.hex(height.cast(LongType)), 8, "0"),
      lit("0806000000" + "00000000"))))
      .otherwise(raise_error(concat(
        lit("synthPngHeader: dims out of [1, 2^31-1]: "),
        width.cast(StringType), lit("x"), height.cast(StringType))))
  }

  /** A minimal REAL JPEG prefix - SOI, a JFIF APP0 segment, and a
    * baseline SOF0 frame header (8-bit precision, one component)
    * carrying the big-endian height then width - the byte sequence any
    * spec-compliant JPEG parser reads the dimensions from. Same
    * hex/lpad/unhex construction (and purpose) as [[synthPngHeader]].
    */
  def synthJpegHeader(width: Column, height: Column): Column = {
    // JPEG dims are 16-bit; same fail-loudly rule as synthPngHeader
    val ok = width.between(1, 65535) && height.between(1, 65535)
    when(ok, unhex(concat(
      lit("FFD8" + "FFE0" + "0010" + "4A46494600" + "0101" + "00" + "0001" + "0001" + "0000"),
      lit("FFC0" + "000B" + "08"),
      lpad(F.hex(height.cast(LongType)), 4, "0"),
      lpad(F.hex(width.cast(LongType)), 4, "0"),
      lit("01" + "011100"))))
      .otherwise(raise_error(concat(
        lit("synthJpegHeader: dims out of [1, 65535]: "),
        width.cast(StringType), lit("x"), height.cast(StringType))))
  }

  /** Batched decode + embed pass: mapPartitions opens ONE
    * [[FeatureModel]] session per partition (a real decoder/model
    * context loads once per task, not once per row), then feeds the
    * partition's payloads through it in `batchSize`-bounded batches -
    * the invocation shape a real inference runtime needs for
    * amortization and device-memory control. Header decode
    * ([[decodeImageMeta]]) stays per-row (it is a cheap pure function);
    * the model session owns only the feature half. Output: media frame
    * columns + (width, height, format, features).
    */
  def decodeAndFeaturize(
      media: DataFrame,
      model: FeatureModel = ByteHistogramModel,
      batchSize: Int = 64
  ): DataFrame = {
    require(batchSize > 0, s"need positive batchSize, got $batchSize")
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "payload") ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType),
      StructField("features", ArrayType(FloatType))
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      val session = model.openSession()
      // a downstream limit can abandon the iterator mid-partition, so
      // closing on exhaustion alone would leak the session
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => session.close())
      rows.grouped(batchSize).flatMap { chunk =>
        val feats = session.embedBatch(chunk.map(_.getAs[Array[Byte]]("payload")).toArray)
        require(feats.length == chunk.size,
          s"FeatureSession returned ${feats.length} vectors for ${chunk.size} payloads")
        chunk.lazyZip(feats).map { (r, f) =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h, fmt) = decodeImageMeta(payload)
          Row.fromSeq(
            r.toSeq.zip(r.schema.fieldNames).collect { case (v, n) if n != "payload" => v } ++
              Seq(w, h, fmt, f.toSeq)
          )
        }
      }
    }(enc)
  }

  /** Resize planning: fit each image into a `targetW` x `targetH` box
    * preserving aspect ratio, never upscaling. The dimension math is the
    * real, tested part (it is what a preprocessing pipeline audits and
    * what downstream batch shapes depend on); the pixel resample itself
    * is the stubbed codec call and would run inside the same
    * mapPartitions batch as [[decodeAndFeaturize]]'s decoder.
    *
    * All arithmetic is double multiply + floor + greatest - identical
    * IEEE operations in any engine, so the oracle replays it exactly.
    * Degenerate 0x0 (empty payload) rows pass through as 0x0 with
    * scale 1.0 rather than dividing by zero.
    */
  def resizeMeta(decoded: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val w = F.col("width").cast(DoubleType)
    val h = F.col("height").cast(DoubleType)
    val s = least(lit(targetW) / w, lit(targetH) / h, lit(1.0))
    val valid = F.col("width") > 0 && F.col("height") > 0
    decoded
      .withColumn("scale", round(when(valid, s).otherwise(lit(1.0)), 6))
      .withColumn("out_w",
        when(valid, greatest(lit(1), floor(w * s).cast(IntegerType)))
          .otherwise(lit(0)))
      .withColumn("out_h",
        when(valid, greatest(lit(1), floor(h * s).cast(IntegerType)))
          .otherwise(lit(0)))
  }

  /** Deterministic frame sampling plumbing for video-like payloads: emit
    * every `stride`-th chunk of `chunkBytes` as its own row (stands in
    * for keyframe extraction; the chunking/explode shape is the real
    * part). Chunk count is ceil(len / chunkBytes): a trailing partial
    * chunk is a real (short) chunk, and an empty/null payload yields
    * zero rows - no phantom chunk, no silently dropped tail.
    */
  def sampleChunks(media: DataFrame, chunkBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_chunks",
        ((length(F.col("payload")) + chunkBytes - 1) / chunkBytes).cast(IntegerType))
      .withColumn("chunk_idx",
        explode(when(F.col("n_chunks") > 0,
          filter(sequence(lit(0), F.col("n_chunks") - 1), i => i % stride === 0)
        ).otherwise(array().cast("array<int>"))))
      .withColumn("chunk",
        expr(s"substring(payload, chunk_idx * $chunkBytes + 1, $chunkBytes)"))
      .select(F.col("media_id"), F.col("kind"), F.col("chunk_idx"), F.col("chunk"))
}
