package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns beside typed metadata, processed in batched
  * per-partition passes.
  *
  * The decode surface is REAL end to end, pure JVM: PNG/JPEG metadata
  * ([[decodeImageMeta]]), WAV/MP4 container metadata ([[decodeAvMeta]]),
  * PNG PIXELS ([[decodePngPixels]]: Inflater + the spec's 5-filter
  * reconstruction) with nearest-neighbor resampling ([[resizePixels]]),
  * and PCM SAMPLES ([[decodeWavSamples]]) with integer audio features -
  * each verified against the JDK's own independent codecs
  * (javax.imageio / javax.sound) in OpsSpec, each with a spec-compliant
  * encoder ([[synthPngImageBytes]], [[synthWavPcmBytes]], the synth*
  * header fixtures) whose output any reader accepts. The embedding side
  * has a REAL fixed-weight model ([[PatchProjectionModel]]) behind the
  * [[FeatureModel]] session interface an ONNX/JNI encoder plugs into;
  * [[ByteHistogramModel]] remains only as the cheap default. The one
  * remaining deterministic stand-in: unrecognized payload formats get
  * md5-derived pseudo-dims from [[decodeImageMeta]] (documented there).
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

  /** Non-payload columns of a media-frame row, in schema order - the
    * projection every decode operator emits beside its own columns
    * (their output schemas are built with the matching
    * `filterNot(_.name == "payload")`; keep the two in one place).
    */
  private def nonPayload(r: Row): Seq[Any] =
    r.toSeq.zip(r.schema.fieldNames).collect { case (v, n) if n != "payload" => v }

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

  /** Wrap a session-backed partition iterator with the FULL close
    * contract the [[FeatureSession]] docs promise: close when the
    * iterator is exhausted (covers driver-local iteration, e.g.
    * `toLocalIterator`, where there is NO TaskContext and a listener
    * alone would leak a real JNI session) AND on task completion
    * (covers a downstream `limit` abandoning the iterator
    * mid-partition). Close is idempotent - both paths may fire.
    */
  private def sessionScoped[A](
      session: FeatureSession, out: Iterator[A]): Iterator[A] = {
    val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def closeOnce(): Unit =
      if (closed.compareAndSet(false, true)) session.close()
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeOnce())
    new Iterator[A] {
      def hasNext: Boolean = {
        val h = out.hasNext
        if (!h) closeOnce()
        h
      }
      def next(): A = out.next()
    }
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

  /** Audio/video metadata decode - the [[decodeImageMeta]] pattern for
    * the other two modalities. REAL for the two container formats any
    * spec-compliant file starts with:
    *
    *   - WAV (RIFF): validates `RIFF....WAVE`, then walks the chunk
    *     list (id + LE u32 size, odd sizes padded per spec). The
    *     `fmt ` chunk yields channels / sample rate / byte rate; the
    *     `data` chunk's DECLARED size yields duration:
    *     `data_bytes * 1000 / byte_rate` ms (truncating integer
    *     division). A truncated stream (header-only fixture, or a
    *     chunk size past EOF) decodes from whatever chunks are
    *     complete - deterministic, never a guess.
    *   - MP4 (ISO BMFF): validates an `ftyp` box at the top, then
    *     walks sibling boxes (BE u32 size + fourcc) to `moov`, inside
    *     it to `mvhd` (version 0: timescale at payload offset 12,
    *     duration at 16 -> duration_ms = dur * 1000 / timescale) and
    *     into the first `trak`'s `tkhd` (version 0: 16.16 fixed-point
    *     width/height at payload offsets 76/80). Version-1 (64-bit)
    *     headers and `size == 1` largesize boxes are skipped rather
    *     than misparsed - their fields stay 0.
    *
    * Anything else: ("empty", 0...) for null/empty payloads,
    * ("unknown", 0...) otherwise. Output tuple:
    * (format, sample_rate, channels, duration_ms, width, height).
    */
  def decodeAvMeta(payload: Array[Byte]): (String, Int, Int, Long, Int, Int) = {
    val len = if (payload == null) 0 else payload.length
    def ascii(o: Int, n: Int): String =
      if (o + n <= len) new String(payload, o, n, java.nio.charset.StandardCharsets.US_ASCII)
      else ""
    def le16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def le32(o: Int): Long = (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
      ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    def be32(o: Int): Long = ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
      ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
    if (len == 0) ("empty", 0, 0, 0L, 0, 0)
    else if (len >= 12 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") {
      var i = 12
      var sr = 0; var ch = 0; var byteRate = 0L; var dataSize = -1L
      while (i + 8 <= len) {
        val id = ascii(i, 4)
        val sz = le32(i + 4)
        if (id == "fmt " && sz >= 16 && i + 24 <= len) {
          ch = le16(i + 10); sr = le32(i + 12).toInt; byteRate = le32(i + 16)
        } else if (id == "data") dataSize = sz
        // declared size past EOF (header-only fixture, truncated stream,
        // or a crafted huge size): the fields above are already captured,
        // and the walk must STOP - advancing by sz.toInt would wrap the
        // Int index negative for sizes near 2^31 and crash the task
        if (sz > len - i - 8) i = len
        else i += 8 + sz.toInt + (sz & 1L).toInt // RIFF pads odd chunks
      }
      val dur = if (byteRate > 0 && dataSize >= 0) dataSize * 1000L / byteRate else 0L
      ("wav", sr, ch, dur, 0, 0)
    } else if (len >= 12 && ascii(4, 4) == "ftyp") {
      // find the box `target` among siblings in [start, end); -1 if absent
      def findBox(start: Int, end: Int, target: String): Int = {
        var i = start
        while (i + 8 <= end) {
          val sz = be32(i)
          if (ascii(i + 4, 4) == target) return i
          // largesize (1), corrupt, or size past this container's end:
          // stop, don't misparse (sz.toInt of a >= 2^31 size would wrap
          // the index negative)
          if (sz < 8 || sz > end - i) return -1
          i += sz.toInt
        }
        -1
      }
      var ts = 0L; var dur = 0L; var w = 0; var h = 0
      val moov = findBox(0, len, "moov")
      if (moov >= 0) {
        val moovEnd = math.min(len.toLong, moov + be32(moov)).toInt
        val mvhd = findBox(moov + 8, moovEnd, "mvhd")
        if (mvhd >= 0 && mvhd + 28 <= len && payload(mvhd + 8) == 0) {
          ts = be32(mvhd + 20); dur = be32(mvhd + 24)
        }
        val trak = findBox(moov + 8, moovEnd, "trak")
        if (trak >= 0) {
          val trakEnd = math.min(moovEnd.toLong, trak + be32(trak)).toInt
          val tkhd = findBox(trak + 8, trakEnd, "tkhd")
          if (tkhd >= 0 && tkhd + 92 <= len && payload(tkhd + 8) == 0) {
            w = (be32(tkhd + 84) >> 16).toInt // 16.16 fixed point
            h = (be32(tkhd + 88) >> 16).toInt
          }
        }
      }
      ("mp4", 0, 0, if (ts > 0) dur * 1000L / ts else 0L, w, h)
    } else ("unknown", 0, 0, 0L, 0, 0)
  }

  /** A REAL (if tiny) fixed-weight encoder - the non-stand-in
    * [[FeatureModel]]: a 1-D byte convolution, a bounded residual
    * nonlinearity, and a dense ReLU head, computed with genuine tensor
    * arithmetic (weight matrices materialized at session open, inner
    * loops accumulating byte x weight products) rather than a byte
    * histogram. Architecture:
    *
    *   - receptive field: the first [[receptiveField]] payload bytes
    *     (a fixed context window, like an image center-crop - bytes
    *     past it do not influence the embedding);
    *   - conv layer: [[patch]]-periodic kernel `W1[u][k]` over byte
    *     positions (position i uses row i mod patch), sum-pooled over
    *     the window into [[channels]] accumulators;
    *   - nonlinearity: the mod-[[modulus]] residual, mapped to
    *     [0, modulus) - bounded like a squashing activation but EXACT
    *     in integer arithmetic;
    *   - head: dense `W2[k][j]` projection to [[dims]] outputs with a
    *     ReLU.
    *
    * Every step is integer; outputs are bounded by
    * (modulus-1) x 5 x channels = 398,880 < 2^24, so the Float
    * vector is EXACT - no rounding anywhere - which is what lets the
    * DuckDB oracle (`media_features`) replay the whole forward pass
    * from `hex(payload)` byte extraction and integer sums, engine
    * independently. Weights are a fixed pseudo-random integer lattice
    * (small co-prime multipliers mod small primes, centered), the
    * moral equivalent of a fixed-seed init. A production ONNX/JNI
    * encoder replaces [[openSession]] only; [[decodeAndFeaturize]]'s
    * plan, schema, and batching are already exactly what it needs.
    */
  object PatchProjectionModel extends FeatureModel {
    val receptiveField = 256
    val patch = 8
    val channels = 8
    val dims = 8
    val modulus = 9973L
    /** conv kernel, patch x channels, values in [-6, 6] */
    def w1(u: Int, k: Int): Long = ((u * 31 + k * 17 + 7) % 13) - 6L
    /** dense head, channels x dims, values in [-5, 5] */
    def w2(k: Int, j: Int): Long = ((k * 7 + j * 5 + 1) % 11) - 5L

    def openSession(): FeatureSession = new FeatureSession {
      // "model load": materialize the weight tensors once per session
      private val k1 = Array.tabulate(patch, channels)(w1)
      private val k2 = Array.tabulate(channels, dims)(w2)
      def embedBatch(payloads: Array[Array[Byte]]): Array[Array[Float]] =
        payloads.map { p =>
          val acc = new Array[Long](channels)
          if (p != null) {
            val n = math.min(p.length, receptiveField)
            var i = 0
            while (i < n) {
              val b = (p(i) & 0xff).toLong
              val row = k1(i % patch)
              var k = 0
              while (k < channels) { acc(k) += b * row(k); k += 1 }
              i += 1
            }
          }
          val out = new Array[Float](dims)
          var j = 0
          while (j < dims) {
            var o = 0L
            var k = 0
            while (k < channels) {
              o += (((acc(k) % modulus) + modulus) % modulus) * k2(k)(j)
              k += 1
            }
            out(j) = math.max(o, 0L).toFloat // ReLU; < 2^24, Float-exact
            j += 1
          }
          out
        }
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

  /** Little-endian byte encoding of a nonnegative integer column as
    * `nBytes` hex pairs - the RIFF/WAV counterpart of the big-endian
    * `lpad(hex(x), 8, '0')` trick: byte b is `(v >> 8b) & 255`, so the
    * concatenation IS the LE byte sequence once unhexed. Codegen'd
    * built-ins only, replayable by any engine with hex/shift functions.
    */
  private def leHex(v: Column, nBytes: Int): Column =
    concat((0 until nBytes).map(b =>
      lpad(F.hex(shiftright(v.cast(LongType), 8 * b).bitwiseAND(lit(255L))), 2, "0")): _*)

  /** A minimal REAL WAV file header - `RIFF` size `WAVE`, a complete
    * 16-byte PCM `fmt ` chunk, and a `data` chunk header DECLARING
    * `dataBytes` of samples (header-only: the samples themselves are
    * not materialized, and [[decodeAvMeta]] reads only the declared
    * size - exactly how duration is computed from a real file's
    * header). Same hex/lpad/unhex construction and fail-loudly range
    * rule as [[synthPngHeader]]; all multi-byte fields little-endian
    * per RIFF. Any spec-compliant WAV parser reads sample rate,
    * channels, and data size from these 44 bytes.
    */
  def synthWavHeader(sampleRate: Column, channels: Column, dataBytes: Column): Column = {
    val sr = sampleRate.cast(LongType)
    val ch = channels.cast(LongType)
    val db = dataBytes.cast(LongType)
    val byteRate = sr * ch * lit(2L) // 16-bit PCM
    val ok = sampleRate.between(1, 1000000) && channels.between(1, 8) &&
      dataBytes.between(0, Int.MaxValue)
    when(ok, unhex(concat(
      lit("52494646"), leHex(lit(36L) + db, 4), lit("57415645"), // RIFF <size> WAVE
      lit("666D7420"), leHex(lit(16L), 4), // 'fmt ' 16
      leHex(lit(1L), 2), leHex(ch, 2), leHex(sr, 4), leHex(byteRate, 4), // PCM
      leHex(ch * 2, 2), leHex(lit(16L), 2), // block align, bits/sample
      lit("64617461"), leHex(db, 4)))) // 'data' <size>
      .otherwise(raise_error(concat(
        lit("synthWavHeader: out of range (sr [1,1e6], ch [1,8], bytes [0,2^31-1]): "),
        sampleRate.cast(StringType), lit("/"), channels.cast(StringType),
        lit("/"), dataBytes.cast(StringType))))
  }

  /** A minimal REAL MP4 (ISO BMFF) file - `ftyp` + `moov(mvhd, trak(
    * tkhd))`, 232 spec-compliant bytes: version-0 `mvhd` carrying
    * timescale/duration, version-0 `tkhd` carrying 16.16 fixed-point
    * track width/height, unity matrices, box sizes exact. Big-endian
    * `lpad(hex(x), 8, '0')` construction throughout; fail-loudly range
    * rule as the other synth fixtures. Any spec-compliant BMFF parser
    * walks these boxes to the same four fields [[decodeAvMeta]] reads.
    */
  def synthMp4Header(width: Column, height: Column,
      timescale: Column, duration: Column): Column = {
    def be32(v: Column) = lpad(F.hex(v.cast(LongType)), 8, "0")
    def be16(v: Column) = lpad(F.hex(v.cast(LongType)), 4, "0")
    val matrix = "00010000" + "00000000" + "00000000" +
      "00000000" + "00010000" + "00000000" +
      "00000000" + "00000000" + "40000000"
    val ok = width.between(1, 65535) && height.between(1, 65535) &&
      timescale.between(1, Int.MaxValue) && duration.between(0, Int.MaxValue)
    when(ok, unhex(concat(
      lit("00000010" + "66747970" + "69736F6D" + "00000200"), // ftyp isom
      lit("000000D8" + "6D6F6F76"), // moov, size 216
      lit("0000006C" + "6D766864" + "00000000" + // mvhd, size 108, v0
        "00000000" + "00000000"), // creation, modification
      be32(timescale), be32(duration),
      lit("00010000" + "0100" + "0000" + "0000000000000000" + // rate, volume, reserved
        matrix + "0" * 48 + "00000002"), // predefined, next track id
      lit("00000064" + "7472616B"), // trak, size 100
      lit("0000005C" + "746B6864" + "00000007" + // tkhd, size 92, v0, flags
        "00000000" + "00000000" + "00000001" + "00000000"), // creation, mod, track, reserved
      be32(duration),
      lit("0000000000000000" + "0000" + "0000" + "0000" + "0000" + matrix),
      be16(width), lit("0000"), be16(height), lit("0000")))) // 16.16 fixed
      .otherwise(raise_error(concat(
        lit("synthMp4Header: out of range (dims [1,65535], ts [1,2^31-1], dur [0,2^31-1]): "),
        width.cast(StringType), lit("x"), height.cast(StringType))))
  }

  /** Frame-level [[decodeAvMeta]]: the audio/video counterpart of
    * [[decodeAndFeaturize]]'s header-decode half. Per-row pure parse in
    * one mapPartitions pass (no model session - metadata only), payload
    * pruned from the output. Output: media frame columns + (format,
    * sample_rate, channels, duration_ms, width, height).
    */
  def decodeAv(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "payload") ++ Seq(
      StructField("format", StringType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("duration_ms", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val (fmt, sr, ch, dur, w, h) = decodeAvMeta(r.getAs[Array[Byte]]("payload"))
        Row.fromSeq(
          nonPayload(r) ++
            Seq(fmt, sr, ch, dur, w, h))
      }
    }(enc)
  }

  /** REAL PNG pixel decode - pure JVM, no image library: chunk walk to
    * the IHDR (8-bit depth; color types 0 gray / 2 RGB / 6 RGBA; no
    * interlace), concatenation of every IDAT chunk, `java.util.zip
    * .Inflater` for the zlib stream, then the spec's per-scanline
    * filter reconstruction (None/Sub/Up/Average/Paeth, PNG spec
    * section 9) with the correct bytes-per-pixel lookback. Verified in
    * OpsSpec pixel-for-pixel against `javax.imageio`'s own decoder on
    * images ImageIO encoded (real compressed streams, encoder-chosen
    * filters) - this is the part of the pipeline that previously
    * stopped at header metadata.
    *
    * Returns (width, height, channels, pixels row-major interleaved),
    * or None for anything that is not a supported PNG (callers fall
    * back to metadata-only handling; never a guess).
    */
  def decodePngPixels(payload: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (payload == null || payload.length < 45 ||
      !(payload(0) == 0x89.toByte && payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G'))
      return None
    def be32(o: Int): Int = ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
      ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)
    def fourcc(o: Int): String =
      new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    val w = be32(16); val h = be32(20)
    val bitDepth = payload(24) & 0xff; val colorType = payload(25) & 0xff
    val interlace = payload(28) & 0xff
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 6 => 4; case _ => return None
    }
    if (bitDepth != 8 || interlace != 0 || w <= 0 || h <= 0) return None
    // bound the raw-pixel allocation in LONG arithmetic before any Int
    // sizing: crafted/huge IHDR dims would otherwise overflow
    // (stride+1)*h into a negative array size (or a multi-GB allocation)
    // before a single data byte is validated. 256 MB decoded is far past
    // any payload this pipeline carries - refuse, don't crash.
    if ((w.toLong * channels + 1L) * h.toLong > 256L * 1024 * 1024) return None
    // gather the zlib stream across all IDAT chunks (the spec allows
    // the stream to be split arbitrarily)
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var ok = true
    while (ok && i + 8 <= payload.length) {
      val len = be32(i); val typ = fourcc(i + 4)
      // negative (>= 2^31) or past-EOF declared length: the stream is
      // truncated or crafted - stop the walk (advancing by it would wrap
      // the index); whatever IDAT bytes were complete still inflate below
      if (len < 0 || len > payload.length - i - 8) ok = false
      else {
        if (typ == "IDAT") idat.write(payload, i + 8, len)
        if (typ == "IEND") ok = false
        i += 12 + len // len + type + crc
      }
    }
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val bpp = channels // 8-bit depth: bytes per pixel == channels
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h) // +1 filter byte per line
    try {
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        // all input was handed over up front, so a zero-byte step that
        // isn't the end of stream means the inflater is stalled: either
        // truncated input (needsInput) or an FDICT preset-dictionary
        // stream (needsDictionary) this decoder doesn't supply. Refuse -
        // looping again would spin forever on the dictionary case.
        if (n == 0 && !inflater.finished()) return None
        off += n
      }
      if (off < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    // filter reconstruction, PNG spec 9.2: a = left, b = up, c = up-left
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val filter = raw(y * (stride + 1)) & 0xff
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val rx = raw(src + x) & 0xff
        val a = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
        val b = if (y > 0) out(dst - stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) out(dst - stride + x - bpp) & 0xff else 0
        val rec = filter match {
          case 0 => rx
          case 1 => rx + a
          case 2 => rx + b
          case 3 => rx + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            rx + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        out(dst + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, channels, out))
  }

  /** Zig-zag index -> natural (row-major) index, JPEG spec figure
    * A.6 - the order DQT tables and entropy-coded coefficients arrive
    * in.
    */
  private val jpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical JPEG Huffman table (spec C.2): per-length counts ->
    * (minCode, maxCode, valPtr) decode arrays. maxCode = -1 marks an
    * empty length.
    */
  private final class JpegHuff(bits: Array[Int], val vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valPtr(l) = k; minCode(l) = code
          maxCode(l) = code + bits(l) - 1
          code += bits(l); k += bits(l)
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-segment bit reader: MSB-first, 0xFF00 byte unstuffing; a
    * real marker (RSTn, EOI) ends the current run - [[decodeJpegPixels]]
    * consumes restart markers between intervals itself.
    */
  private final class JpegBits(data: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    var broken = false
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length) { broken = true; return 0 }
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val m = if (pos < data.length) data(pos) & 0xff else -1
          if (m == 0x00) pos += 1 // stuffed literal FF
          else { broken = true; pos -= 1; return 0 } // a marker: stop
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker; false if absent. */
    def restart(): Boolean = {
      cnt = 0
      if (pos + 1 < data.length && (data(pos) & 0xff) == 0xff &&
        ((data(pos + 1) & 0xff) & 0xf8) == 0xd0) { pos += 2; true }
      else false
    }
    def decodeSym(h: JpegHuff): Int = {
      var code = nextBit(); var l = 1
      while (l <= 16 && (h.maxCode(l) < 0 || code > h.maxCode(l))) {
        code = (code << 1) | nextBit(); l += 1
      }
      if (l > 16 || broken) -1
      else h.vals(h.valPtr(l) + (code - h.minCode(l))) & 0xff
    }
  }

  /** Spec F.2.2.1 EXTEND: magnitude bits -> signed coefficient. */
  private def jpegExtend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** REAL baseline JPEG pixel decode - pure JVM, no image library:
    * marker walk (DQT/DHT/SOF0/DRI/SOS), canonical Huffman entropy
    * decode with byte unstuffing and restart intervals, dequantize,
    * reference double-precision IDCT per 8x8 block, nearest-neighbor
    * chroma upsample, JFIF YCbCr->RGB for 3-component frames. Supported
    * surface: baseline sequential (SOF0), 8-bit, 1 or 3 components,
    * any sampling factors up to 2x2 - progressive (SOF2), arithmetic
    * coding, 12-bit and CMYK return None (callers fall back to
    * metadata-only handling; never a guess).
    *
    * Exactness: a DC-only block (constant 8x8 region, unit quant
    * table - exactly what [[synthJpegImageBytes]] emits) decodes
    * EXACTLY in any conformant decoder, so the fixture family
    * round-trips bit-equal through BOTH this decoder and
    * `javax.imageio` (OpsSpec pins it). On general AC-bearing images
    * decoders legitimately differ by ~1/255 per pixel (IDCT rounding
    * freedom, spec annex A); the ImageIO parity spec bounds that
    * drift.
    *
    * Returns (width, height, channels, pixels row-major interleaved),
    * or None for anything outside the supported surface.
    */
  def decodeJpegPixels(payload: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (payload == null || payload.length < 4 ||
      (payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8) return None
    def u16(o: Int): Int = ((payload(o) & 0xff) << 8) | (payload(o + 1) & 0xff)
    val qt = Array.ofDim[Int](4, 64) // natural order
    val dcTabs = new Array[JpegHuff](4)
    val acTabs = new Array[JpegHuff](4)
    var restartInterval = 0
    var w = 0; var h = 0; var nComp = 0
    // per component: id, hSamp, vSamp, quant id, dc table, ac table
    val compH = new Array[Int](3); val compV = new Array[Int](3)
    val compQ = new Array[Int](3)
    val compDc = new Array[Int](3); val compAc = new Array[Int](3)
    val compId = new Array[Int](3)
    var sosAt = -1
    var i = 2
    while (sosAt < 0 && i + 4 <= payload.length) {
      if ((payload(i) & 0xff) != 0xff) return None
      val marker = payload(i + 1) & 0xff
      if (marker == 0xd9) return None // EOI before any scan: no pixels
      else if (marker == 0xff) i += 1 // fill byte before a marker
      else if (marker == 0xd8 || marker == 0x01 ||
        (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone: no length
      else {
        val len = u16(i + 2)
        if (len < 2 || i + 2 + len > payload.length) return None
        val seg = i + 4
        marker match {
          case 0xdb => // DQT: one or more tables
            var p = seg
            while (p < i + 2 + len) {
              // every table is 65 bytes; an undersized declared length
              // must refuse, not read past the segment (and, when the
              // segment abuts payload end, past the buffer)
              if (p + 65 > i + 2 + len) return None
              val pq = (payload(p) & 0xff) >> 4
              val tq = payload(p) & 0x0f
              if (pq != 0 || tq > 3) return None // 8-bit tables only
              var k = 0
              while (k < 64) {
                qt(tq)(jpegZigzag(k)) = payload(p + 1 + k) & 0xff
                k += 1
              }
              p += 65
            }
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < i + 2 + len) {
              if (p + 17 > i + 2 + len) return None // id byte + 16 counts
              val tc = (payload(p) & 0xff) >> 4
              val th = payload(p) & 0x0f
              if (tc > 1 || th > 3) return None
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { bits(l) = payload(p + l) & 0xff; total += bits(l); l += 1 }
              if (total > 256 || p + 17 + total > i + 2 + len) return None
              val vals = java.util.Arrays.copyOfRange(payload, p + 17, p + 17 + total)
              val tab = new JpegHuff(bits, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              p += 17 + total
            }
          case 0xc0 => // SOF0 baseline
            if (len < 8) return None // precision + dims + nComp
            if ((payload(seg) & 0xff) != 8) return None
            h = u16(seg + 1); w = u16(seg + 3)
            nComp = payload(seg + 5) & 0xff
            if (w <= 0 || h <= 0 || (nComp != 1 && nComp != 3)) return None
            if (len < 8 + 3 * nComp) return None // 3 bytes per component
            if (w.toLong * h.toLong * nComp > 256L * 1024 * 1024) return None
            var c = 0
            while (c < nComp) {
              val o = seg + 6 + c * 3
              compId(c) = payload(o) & 0xff
              compH(c) = (payload(o + 1) & 0xff) >> 4
              compV(c) = payload(o + 1) & 0x0f
              compQ(c) = payload(o + 2) & 0xff
              if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2 ||
                compQ(c) > 3) return None
              c += 1
            }
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
               0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // non-baseline frame types
          case 0xdd =>
            if (len < 4) return None
            restartInterval = u16(seg)
          case 0xda => // SOS
            if (len < 3) return None
            val ns = payload(seg) & 0xff
            if (ns != nComp) return None
            if (len < 3 + 2 * ns) return None // 2 bytes per component
            var c = 0
            while (c < ns) {
              val id = payload(seg + 1 + c * 2) & 0xff
              val tt = payload(seg + 2 + c * 2) & 0xff
              val ci = compId.indexOf(id)
              if (ci < 0) return None
              compDc(ci) = tt >> 4; compAc(ci) = tt & 0x0f
              c += 1
            }
            sosAt = i + 2 + len
          case _ => () // APPn / COM / others: skip
        }
        if (sosAt < 0) i += 2 + len
      }
    }
    if (sosAt < 0 || nComp == 0) return None
    val hMax = (0 until nComp).map(compH).max
    val vMax = (0 until nComp).map(compV).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // per-component padded planes
    val planeW = (0 until nComp).map(c => mcusX * compH(c) * 8).toArray
    val planeH = (0 until nComp).map(c => mcusY * compV(c) * 8).toArray
    val planes = (0 until nComp).map(c => new Array[Byte](planeW(c) * planeH(c))).toArray
    val br = new JpegBits(payload, sosAt)
    val pred = new Array[Int](3)
    val coef = new Array[Int](64)
    val cosT = Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
    val scale = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2) else 1.0)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        br.broken = false
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var c = 0
      while (c < nComp) {
        val dcT = dcTabs(compDc(c)); val acT = acTabs(compAc(c))
        val q = qt(compQ(c))
        if (dcT == null || acT == null) return None
        var by = 0
        while (by < compV(c)) {
          var bx = 0
          while (bx < compH(c)) {
            // --- entropy-decode one block (spec F.2.2) ---
            java.util.Arrays.fill(coef, 0)
            val s0 = br.decodeSym(dcT)
            if (s0 < 0 || s0 > 11) return None
            pred(c) += jpegExtend(br.receive(s0), s0)
            coef(0) = pred(c) * q(0)
            var k = 1
            var eob = false
            while (!eob && k < 64) {
              val rs = br.decodeSym(acT)
              if (rs < 0) return None
              val r = rs >> 4; val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 else eob = true
              } else {
                k += r
                if (k > 63) return None
                coef(jpegZigzag(k)) = jpegExtend(br.receive(s), s) * q(jpegZigzag(k))
                k += 1
              }
            }
            if (br.broken) return None
            // --- reference IDCT + level shift ---
            val base = planes(c)
            val pw = planeW(c)
            val ox = (mx * compH(c) + bx) * 8
            val oy = (my * compV(c) + by) * 8
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                var sum = 0.0
                var v = 0
                while (v < 8) {
                  var u = 0
                  while (u < 8) {
                    val f = coef(v * 8 + u)
                    if (f != 0) sum += scale(u) * scale(v) * f * cosT(x)(u) * cosT(y)(v)
                    u += 1
                  }
                  v += 1
                }
                val px = math.round(sum / 4.0 + 128.0).toInt
                base((oy + y) * pw + ox + x) =
                  (if (px < 0) 0 else if (px > 255) 255 else px).toByte
                x += 1
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }
    // assemble: clip to (w, h), nearest-neighbor upsample, color convert
    val out = new Array[Byte](w * h * nComp)
    if (nComp == 1) {
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * planeW(0), out, y * w, w)
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def samp(c: Int): Int = {
            val sy = y * compV(c) / vMax; val sx = x * compH(c) / hMax
            planes(c)(sy * planeW(c) + sx) & 0xff
          }
          val yy = samp(0); val cb = samp(1) - 128; val cr = samp(2) - 128
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          val o = (y * w + x) * 3
          out(o) = clamp(yy + 1.402 * cr)
          out(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yy + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    }
    Some((w, h, nComp, out))
  }

  /** Format-dispatching pixel decode: PNG signature ->
    * [[decodePngPixels]], JPEG SOI -> [[decodeJpegPixels]], anything
    * else None. The pixel pipeline stages ([[decodeResizePixels]],
    * [[decodeResizeFeaturize]]) route through this, so a mixed-format
    * crawl column decodes without the caller caring which container
    * each row is.
    */
  def decodeImagePixels(payload: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    if (payload == null || payload.length < 4) None
    else if (payload(0) == 0x89.toByte && payload(1) == 'P') decodePngPixels(payload)
    else if ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8)
      decodeJpegPixels(payload)
    else None

  /** A REAL (if small) baseline JPEG ENCODER - the fixture generator
    * for the JPEG pixel path, [[synthPngImageBytes]]'s lossy-format
    * sibling built so the loss is ZERO: grayscale, unit quantization
    * table, and every 8x8 block CONSTANT at
    * `((bx*7 + by*13 + seed) % 256)` (bx, by = block coords). A
    * constant block has one nonzero DCT coefficient (the DC), unit
    * quantization keeps it exact, and ANY conformant IDCT reproduces
    * a constant block exactly - so the pixels are a pure integer
    * formula a SQL oracle replays per-pixel, while the byte stream
    * still exercises real marker structure, real canonical Huffman
    * coding (spec Annex K DC table + a minimal 1-code AC table), DC
    * prediction, byte stuffing, and EOB coding. OpsSpec round-trips
    * it through `javax.imageio` bit-equal.
    */
  def synthJpegImageBytes(seed: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535,
      s"need dims in [1, 65535], got ${w}x$h")
    val bos = new java.io.ByteArrayOutputStream()
    def marker(m: Int, body: Array[Byte]): Unit = {
      bos.write(0xff); bos.write(m)
      bos.write((body.length + 2) >> 8); bos.write((body.length + 2) & 0xff)
      bos.write(body, 0, body.length)
    }
    bos.write(0xff); bos.write(0xd8) // SOI
    marker(0xdb, Array[Byte](0x00) ++ Array.fill[Byte](64)(1)) // DQT: unit table
    marker(0xc0, Array[Byte](8, // SOF0: 8-bit
      (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte,
      1, 1, 0x11, 0)) // 1 component, id 1, 1x1 sampling, qtable 0
    // DC table: spec Annex K luminance (12 categories); AC table: one
    // 1-bit code for EOB - the only AC symbol a DC-only stream emits
    val dcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    marker(0xc4, Array[Byte](0x00) ++ dcBits.drop(1).map(_.toByte) ++
      (0 to 11).map(_.toByte))
    marker(0xc4, Array[Byte](0x10) ++
      (Array(1) ++ Array.fill(15)(0)).map(_.toByte) ++ Array[Byte](0x00))
    marker(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0)) // SOS
    // canonical encode codes for the DC table
    val dcCodes = new Array[(Int, Int)](12) // symbol -> (code, len)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        var c = 0
        while (c < dcBits(l)) { dcCodes(k) = (code, l); code += 1; k += 1; c += 1 }
        code <<= 1
        l += 1
      }
    }
    var acc = 0L; var accBits = 0
    def putBits(v: Int, n: Int): Unit = {
      acc = (acc << n) | (v & ((1L << n) - 1)); accBits += n
      while (accBits >= 8) {
        val b = ((acc >> (accBits - 8)) & 0xff).toInt
        bos.write(b); if (b == 0xff) bos.write(0x00)
        accBits -= 8
      }
    }
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    var pred = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        // floorMod: a negative seed must still land in [0, 255] - the
        // sign-keeping % would make |diff| exceed 2047 and index past
        // the 12-entry DC code table
        val v = Math.floorMod(bx * 7 + by * 13 + seed, 256L).toInt
        val dc = 8 * (v - 128)
        val diff = dc - pred
        pred = dc
        val cat = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        val (code, len) = dcCodes(cat)
        putBits(code, len)
        if (cat > 0) putBits(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
        putBits(0, 1) // AC: EOB (the 1-bit code)
        bx += 1
      }
      by += 1
    }
    if (accBits > 0) putBits(0xff, 8 - accBits) // pad with 1s
    bos.write(0xff); bos.write(0xd9) // EOI
    bos.toByteArray
  }

  /** 64-bit difference hash (dHash) of a decoded pixel buffer - the
    * standard perceptual fingerprint for IMAGE near-dup detection:
    * nearest-resample to a 9x8 luma grid (integer luma
    * (299r+587g+114b)/1000 for color; channel 0 for gray), one bit per
    * horizontally adjacent pair (set iff right > left), packed at bit
    * y*8+x. Pure integer arithmetic end to end, so a SQL oracle
    * replays the hash of a formula-defined image exactly.
    */
  def dhash64(px: Array[Byte], w: Int, h: Int, channels: Int): Long = {
    var hash = 0L
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var prev = 0
      var x = 0
      while (x < 9) {
        val sx = x * w / 9
        val o = (sy * w + sx) * channels
        val v =
          if (channels >= 3)
            ((px(o) & 0xff) * 299 + (px(o + 1) & 0xff) * 587 +
              (px(o + 2) & 0xff) * 114) / 1000
          else px(o) & 0xff
        if (x > 0 && v > prev) hash |= 1L << (y * 8 + (x - 1))
        prev = v
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Per-frame perceptual fingerprint: decode ([[decodeImagePixels]] -
    * PNG or baseline JPEG) -> [[dhash64]], one mapPartitions pass.
    * Undecodable payloads carry a NULL dhash (and never pair).
    * Output: media frame columns + (dhash).
    */
  def imageDHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(
      media.schema.fields.filterNot(_.name == "payload") :+
        StructField("dhash", LongType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val d = decodeImagePixels(r.getAs[Array[Byte]]("payload"))
          .map { case (w, h, ch, px) => dhash64(px, w, h, ch) }
        Row.fromSeq(nonPayload(r) :+ d.orNull)
      }
    }(enc)
  }

  /** Image near-dup pairs: [[imageDHash]] fingerprints through the
    * shared pigeonhole Hamming join
    * ([[graft.ops.DedupOps.hammingPairs]]) - lossless for the radius,
    * never all-pairs, same skew cap as every candidate generator.
    * Output: (id_a, id_b, hamming) over `media_id`.
    */
  def imageDupPairs(
      media: DataFrame,
      maxHamming: Int = 2,
      maxBlockSize: Long = Long.MaxValue
  ): DataFrame =
    graft.ops.DedupOps.hammingPairs(
      imageDHash(media).select(F.col("media_id"), F.col("dhash"))
        .filter(F.col("dhash").isNotNull),
      "media_id", "dhash", maxHamming, maxBlockSize)

  /** 64-bit audio difference fingerprint - [[dhash64]]'s 1-D sibling
    * for AUDIO near-dup detection (the chromaprint idea at its
    * integer-exact core): split the sample stream into 65 equal
    * windows - sample i belongs to window floor(i*65/n), the
    * PER-SAMPLE assignment both engines compute identically (window
    * START boundaries floor(k*n/65) are NOT the same partition under
    * integer floors; that off-by-one was caught by the oracle) -
    * sum |amplitude| per window, one bit per adjacent window pair
    * (set iff the later window is louder). Every window is non-empty
    * once n >= 65 (w advances by at most 1 per sample and reaches
    * 64). Pure integer arithmetic, so a SQL oracle replays the hash
    * of a formula-defined signal exactly. None for streams too short
    * to carry 65 windows.
    */
  def audioFingerprint64(samples: Array[Short]): Option[Long] = {
    val n = samples.length
    if (n < 65) return None
    val e = new Array[Long](65)
    var i = 0
    while (i < n) {
      e((i.toLong * 65 / n).toInt) += math.abs(samples(i).toInt)
      i += 1
    }
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (e(k + 1) > e(k)) hash |= 1L << k
      k += 1
    }
    Some(hash)
  }

  /** Per-frame audio fingerprint: WAV decode ([[decodeWavSamples]])
    * -> [[audioFingerprint64]] in one mapPartitions pass; non-WAV or
    * too-short payloads carry NULL (and never pair). Output: media
    * frame columns + (afp).
    */
  def audioDHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(
      media.schema.fields.filterNot(_.name == "payload") :+
        StructField("afp", LongType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val fp = decodeWavSamples(r.getAs[Array[Byte]]("payload"))
          .flatMap { case (_, _, samples) => audioFingerprint64(samples) }
        Row.fromSeq(nonPayload(r) :+ fp.orNull)
      }
    }(enc)
  }

  /** Audio near-dup pairs: [[audioDHash]] fingerprints through the
    * shared pigeonhole Hamming join
    * ([[graft.ops.DedupOps.hammingPairs]]) - the same lossless,
    * never-all-pairs engine as text SimHash and image dHash.
    * Output: (id_a, id_b, hamming) over `media_id`.
    */
  def audioDupPairs(
      media: DataFrame,
      maxHamming: Int = 2,
      maxBlockSize: Long = Long.MaxValue
  ): DataFrame =
    graft.ops.DedupOps.hammingPairs(
      audioDHash(media).select(F.col("media_id"), F.col("afp"))
        .filter(F.col("afp").isNotNull),
      "media_id", "afp", maxHamming, maxBlockSize)

  // ---------------------------------------------------------------------
  // Video frames: ISO BMFF sample-table walk -> per-frame JPEG decode
  // ---------------------------------------------------------------------

  /** Pull the video track's SAMPLES (frames) out of an ISO BMFF (MP4)
    * container - the sample-table walk [[decodeAvMeta]]'s metadata
    * box-walk stopped short of: moov -> trak -> mdia -> minf -> stbl,
    * then stsd (codec fourcc), stsz (per-sample byte sizes), stsc
    * (samples-per-chunk runs), stco (chunk offsets) resolve every
    * sample to its byte range in the file, exactly as the spec's
    * chunk-offset algorithm prescribes. Returns (codec, frames) or
    * None; refuse-don't-crash on any malformed box, truncated table,
    * or out-of-file sample range (corrupt crawl media must never kill
    * the task). 32-bit `stco` only (co64 archives refuse cleanly);
    * frame count capped at 65536 per file.
    */
  def decodeVideoSamples(payload: Array[Byte]): Option[(String, Seq[Array[Byte]])] = {
    val len = if (payload == null) 0 else payload.length
    if (len < 16) return None
    def ascii(o: Int, n: Int): String =
      if (o >= 0 && o + n <= len)
        new String(payload, o, n, java.nio.charset.StandardCharsets.US_ASCII)
      else ""
    def be32(o: Int): Long =
      if (o < 0 || o + 4 > len) -1L
      else ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
        ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
    if (ascii(4, 4) != "ftyp") return None
    def findBox(start: Int, end: Int, target: String): Int = {
      var i = start
      while (i + 8 <= end) {
        val sz = be32(i)
        if (ascii(i + 4, 4) == target) return i
        if (sz < 8 || sz > end - i) return -1
        i += sz.toInt
      }
      -1
    }
    def child(at: Int, end: Int, target: String): (Int, Int) =
      if (at < 0) (-1, -1)
      else {
        val c = findBox(at + 8, end, target)
        if (c < 0) (-1, -1)
        else (c, math.min(end.toLong, c + be32(c)).toInt)
      }
    val moov = findBox(0, len, "moov")
    if (moov < 0) return None
    val moovEnd = math.min(len.toLong, moov + be32(moov)).toInt
    val (trak, trakEnd) = child(moov, moovEnd, "trak")
    val (mdia, mdiaEnd) = child(trak, trakEnd, "mdia")
    val (minf, minfEnd) = child(mdia, mdiaEnd, "minf")
    val (stbl, stblEnd) = child(minf, minfEnd, "stbl")
    if (stbl < 0) return None
    val (stsd, _) = child(stbl, stblEnd, "stsd")
    if (stsd < 0 || be32(stsd + 12) < 1) return None
    val codec = ascii(stsd + 20, 4)
    if (codec.isEmpty) return None
    val (stsz, stszEnd) = child(stbl, stblEnd, "stsz")
    val (stsc, stscEnd) = child(stbl, stblEnd, "stsc")
    val (stco, stcoEnd) = child(stbl, stblEnd, "stco")
    if (stsz < 0 || stsc < 0 || stco < 0) return None
    val uniform = be32(stsz + 12)
    val nSamples = be32(stsz + 16)
    if (nSamples < 0 || nSamples > 65536) return None
    val n = nSamples.toInt
    if (uniform == 0 && stsz + 20 + 4L * n > stszEnd) return None
    def sampleSize(s: Int): Long =
      if (uniform != 0) uniform else be32(stsz + 20 + 4 * s)
    val nScEntries = be32(stsc + 12)
    if (nScEntries < 1 || stsc + 16 + 12L * nScEntries > stscEnd) return None
    val nChunks = be32(stco + 12)
    if (nChunks < 1 || stco + 16 + 4L * nChunks > stcoEnd) return None
    // the spec's chunk walk: chunk c uses the samples-per-chunk of the
    // LAST stsc entry whose first_chunk <= c; samples lay out back to
    // back from the chunk's stco offset
    val frames = Seq.newBuilder[Array[Byte]]
    var s = 0
    var c = 1
    var e = 0
    while (s < n && c <= nChunks.toInt) {
      while (e + 1 < nScEntries.toInt &&
        be32(stsc + 16 + 12 * (e + 1)) <= c) e += 1
      val spc = be32(stsc + 16 + 12 * e + 4)
      if (spc < 1) return None
      var off = be32(stco + 16 + 4 * (c - 1))
      var k = 0L
      while (s < n && k < spc) {
        val sz = sampleSize(s)
        if (sz < 1 || off < 0 || off + sz > len) return None
        frames += java.util.Arrays.copyOfRange(payload, off.toInt, (off + sz).toInt)
        off += sz
        s += 1; k += 1
      }
      c += 1
    }
    if (s < n) return None // sample table promises more than the chunks hold
    Some((codec, frames.result()))
  }

  /** Explode a video media frame into per-FRAME media rows: one output
    * row per sample of the MP4's video track, `payload` replaced by
    * the frame's bytes and `frame_idx` (0-based) appended beside the
    * carried columns. Non-MP4 / malformed payloads emit nothing
    * (refuse-don't-crash). The result is itself a media frame - JPEG
    * tracks pipe straight into [[decodeResizePixels]] /
    * [[imageDHash]] / [[decodeResizeFeaturize]], which all preserve
    * the extra column.
    */
  def videoFrames(media: DataFrame): DataFrame = {
    val keep = media.schema.fields.filterNot(_.name == "payload")
    val outSchema = StructType(keep ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val base = nonPayload(r)
        decodeVideoSamples(r.getAs[Array[Byte]]("payload")).toSeq.flatMap {
          case (_, frames) =>
            frames.iterator.zipWithIndex.map { case (f, i) =>
              // schema-carrying rows: a downstream mapPartitions (the
              // per-frame decoders) may receive these rows OBJECT-pipelined
              // (no serialization boundary) and look fields up by name
              new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
                (base ++ Seq(i, f)).toArray, outSchema): Row
            }
        }
      }
    }(enc)
  }

  /** Video near-dup pairs across the corpus: every frame gets the
    * image dHash, frame pairs within `maxHamming` surface through the
    * shared pigeonhole engine ([[graft.ops.DedupOps.hammingPairs]] -
    * the same lossless, never-all-pairs join as text SimHash, image
    * dHash, and audio fingerprints), and matches fold to the video
    * pair with the shared-frame count. Frame identity rides a
    * composite key `media_id * 65536 + frame_idx` (frame_idx is
    * already capped at 65536 by [[decodeVideoSamples]]); intra-video
    * matches are dropped - self-similar videos are repetition, not
    * duplication. Any frame may match any frame of the other video
    * (trimmed/shifted copies still pair), so the count is over frame
    * PAIRS within the radius.
    *
    * The packing steals 16 low bits, so media ids must fit 47 bits
    * (non-negative): an id past that would overflow the Long SILENTLY
    * and the shiftright decomposition would attribute matches to the
    * wrong videos - so out-of-range ids fail the task loudly
    * (raise_error) instead. 2^47 ~ 1.4e14 ids is comfortably past any
    * real corpus; a caller with synthetic/hashed ids that wide should
    * densify them first.
    *
    * Output: (id_a, id_b, n_frame_matches) with id_a < id_b.
    */
  def videoDupPairs(
      media: DataFrame,
      maxHamming: Int = 2,
      maxBlockSize: Long = Long.MaxValue
  ): DataFrame = {
    val mid = F.col("media_id").cast(LongType)
    val fid = when(mid >= 0L && mid < (1L << 47),
        mid * 65536L + F.col("frame_idx"))
      .otherwise(F.raise_error(F.format_string(
        "videoDupPairs: media_id %d outside [0, 2^47) - the 16-bit frame " +
          "packing would overflow; densify ids first", mid)).cast(LongType))
    val hashed = imageDHash(videoFrames(media))
      .filter(F.col("dhash").isNotNull)
      .select(fid.as("fid"), F.col("dhash"))
    graft.ops.DedupOps.hammingPairs(hashed, "fid", "dhash", maxHamming, maxBlockSize)
      .select(shiftright(F.col("id_a").cast(LongType), 16).as("vid_a"),
        shiftright(F.col("id_b").cast(LongType), 16).as("vid_b"))
      .filter(F.col("vid_a") =!= F.col("vid_b"))
      .groupBy(F.col("vid_a").as("id_a"), F.col("vid_b").as("id_b"))
      .agg(count(lit(1)).as("n_frame_matches"))
  }

  /** Scene-change detection over video frames: consecutive-frame dHash
    * Hamming distance >= `threshold` marks a cut (the cheap shot-
    * boundary detector every video curation pass runs before sampling
    * frames for captioning/embedding - one frame per SCENE beats one
    * frame per second on redundant content). Frame 0 always opens a
    * scene. The demux + per-frame decode is embarrassingly parallel;
    * the only shuffle is the per-video window (frame counts are capped
    * at 65536 by the demuxer, so no partition outgrows a single video's
    * frames).
    *
    * Output: (media_id, frame_idx, hamming_prev - NULL on frame 0,
    * scene_change).
    */
  def videoSceneChanges(media: DataFrame, threshold: Int = 16): DataFrame = {
    require(threshold >= 0 && threshold <= 64,
      s"threshold must be in [0, 64], got $threshold")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    imageDHash(videoFrames(media))
      .filter(F.col("dhash").isNotNull)
      .select(F.col("media_id"), F.col("frame_idx"), F.col("dhash"))
      .withColumn("gr_pdh", F.lag(F.col("dhash"), 1).over(w))
      .withColumn("hamming_prev",
        when(F.col("gr_pdh").isNull, lit(null).cast(IntegerType))
          .otherwise(F.bit_count(
            F.col("dhash").bitwiseXOR(F.col("gr_pdh"))).cast(IntegerType)))
      .withColumn("scene_change",
        F.col("gr_pdh").isNull || F.col("hamming_prev") >= threshold)
      .drop("gr_pdh", "dhash")
  }

  /** A REAL (if minimal) MJPEG-in-MP4 WRITER - the fixture generator
    * for the video frame path, [[synthJpegImageBytes]]' container
    * sibling: a spec-compliant ISO BMFF file (ftyp + mdat + moov with
    * the full mvhd/tkhd/mdhd/hdlr/vmhd/dinf/stbl box tree) whose video
    * track is `jpeg`-coded with one baseline JPEG per frame, all
    * frames in ONE chunk (stsc 1->n), per-sample sizes in stsz, the
    * chunk offset in stco. Frame f's pixels follow
    * [[synthJpegImageBytes]]' exact block formula with
    * `frameSeeds(f)`, so a SQL oracle replays every frame's pixels -
    * and any conformant MP4 demuxer finds the same frame bytes.
    */
  def synthMjpegVideoBytes(frameSeeds: Seq[Long], w: Int, h: Int): Array[Byte] = {
    require(frameSeeds.nonEmpty && frameSeeds.length <= 65536,
      s"need 1..65536 frames, got ${frameSeeds.length}")
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535,
      s"need dims in [1, 65535], got ${w}x$h")
    val frames = frameSeeds.map(synthJpegImageBytes(_, w, h))
    val n = frames.length
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def fourcc(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def box(typ: String, body: Array[Byte]*): Array[Byte] = {
      val size = 8L + body.map(_.length.toLong).sum
      be32(size) ++ fourcc(typ) ++ body.flatten
    }
    val v0 = Array[Byte](0, 0, 0, 0) // version + flags
    val matrix = be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)
    val dur = 40L * n // 25 fps at timescale 1000
    val ftyp = box("ftyp", fourcc("isom"), be32(0x200), fourcc("isom"))
    val mdat = box("mdat", frames.flatten.toArray)
    val chunkOffset = ftyp.length + 8L // mdat payload starts after its header
    val mvhd = box("mvhd", v0, be32(0), be32(0), be32(1000), be32(dur),
      be32(0x00010000L), be16(0x0100), new Array[Byte](10), matrix,
      new Array[Byte](24), be32(2))
    val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7), be32(0), be32(0), be32(1),
      be32(0), be32(dur), new Array[Byte](8), be16(0), be16(0), be16(0), be16(0),
      matrix, be32(w.toLong << 16), be32(h.toLong << 16))
    val mdhd = box("mdhd", v0, be32(0), be32(0), be32(1000), be32(dur),
      be16(0x55c4), be16(0))
    val hdlr = box("hdlr", v0, be32(0), fourcc("vide"), new Array[Byte](12),
      fourcc("VideoHandler") ++ Array[Byte](0))
    val vmhd = box("vmhd", Array[Byte](0, 0, 0, 1), be16(0), be16(0), be16(0), be16(0))
    val dinf = box("dinf", box("dref", v0, be32(1),
      box("url ", Array[Byte](0, 0, 0, 1))))
    val entry = be32(86) ++ fourcc("jpeg") ++ new Array[Byte](6) ++ be16(1) ++
      be16(0) ++ be16(0) ++ new Array[Byte](12) ++ be16(w) ++ be16(h) ++
      be32(0x00480000L) ++ be32(0x00480000L) ++ be32(0) ++ be16(1) ++
      new Array[Byte](32) ++ be16(24) ++ be16(0xffff)
    val stsd = box("stsd", v0, be32(1), entry)
    val stts = box("stts", v0, be32(1), be32(n), be32(40))
    val stsc = box("stsc", v0, be32(1), be32(1), be32(n), be32(1))
    val stsz = box("stsz", v0, be32(0), be32(n),
      frames.toArray.flatMap(f => be32(f.length)))
    val stco = box("stco", v0, be32(1), be32(chunkOffset))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  /** REAL nearest-neighbor pixel resample - the resample
    * [[resizeMeta]] only PLANNED: output pixel (i, j) reads source
    * pixel (i*h/outH, j*w/outW) (integer division - the standard
    * nearest mapping, and pure integer arithmetic any engine
    * replays). Channels are preserved.
    */
  def resizePixels(pixels: Array[Byte], w: Int, h: Int, channels: Int,
      outW: Int, outH: Int): Array[Byte] = {
    require(outW > 0 && outH > 0, s"need positive output dims, got ${outW}x$outH")
    val out = new Array[Byte](outW * outH * channels)
    var i = 0
    while (i < outH) {
      val sy = i * h / outH
      var j = 0
      while (j < outW) {
        val sx = j * w / outW
        var ch = 0
        while (ch < channels) {
          out((i * outW + j) * channels + ch) = pixels((sy * w + sx) * channels + ch)
          ch += 1
        }
        j += 1
      }
      i += 1
    }
    out
  }

  /** A REAL (if small) PNG ENCODER - the fixture generator for the
    * pixel path: signature, IHDR, one IDAT holding the actual
    * deflate-compressed filter-0 scanlines (`java.util.zip.Deflater`),
    * IEND, with correct CRC32s and zlib adler - a spec-compliant file
    * any PNG reader decodes (OpsSpec round-trips it through
    * `javax.imageio`). Grayscale 8-bit; pixel (x, y) carries
    * `(x*7 + y*13 + seed) % 256`, a formula a SQL oracle replays
    * per-pixel without touching the compressed representation.
    */
  def synthPngImageBytes(seed: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"need positive dims, got ${w}x$h")
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    def chunk(typ: String, body: Array[Byte]): Unit = {
      out.writeInt(body.length)
      val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      out.write(tb); out.write(body); out.writeInt(crc.getValue.toInt)
    }
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(0.toByte) // depth 8, gray
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
    chunk("IHDR", ihdr.array())
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      raw(y * (w + 1)) = 0 // filter: None
      var x = 0
      while (x < w) {
        raw(y * (w + 1) + 1 + x) = ((x * 7 + y * 13 + seed) % 256).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.empty)
    bos.toByteArray
  }

  /** Frame-level pixel pipeline: decode ([[decodeImagePixels]] - PNG
    * or baseline JPEG, dispatched on signature) -> nearest-neighbor
    * resample ([[resizePixels]]) in one mapPartitions pass, emitting
    * resampled-pixel STATISTICS (integer sum + the four corners)
    * beside the dims - the oracle-checkable shape (a binary pixel
    * column can't hash-compare engine-independently, integer stats of
    * a formula-defined image can). Unsupported payloads emit NULL
    * stats with (0, 0) dims - deterministic fallback, mirroring the
    * metadata decoders.
    */
  def decodeResizePixels(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "payload") ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("px_sum", LongType),
      StructField("px_tl", IntegerType),
      StructField("px_tr", IntegerType),
      StructField("px_bl", IntegerType),
      StructField("px_br", IntegerType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val keep = nonPayload(r)
        val stats = decodeImagePixels(r.getAs[Array[Byte]]("payload")).map {
          case (w, h, ch, px) =>
            val rp = resizePixels(px, w, h, ch, outW, outH)
            var s = 0L; var k = 0
            while (k < rp.length) { s += rp(k) & 0xff; k += 1 }
            def p(i: Int, j: Int) = rp((i * outW + j) * ch) & 0xff
            // Seq[Any]: a plain Seq would numerically widen the Int dims
            // to Long beside the Long sum and break the row encoder
            Seq[Any](w, h, ch, s, p(0, 0), p(0, outW - 1), p(outH - 1, 0),
              p(outH - 1, outW - 1))
        }.getOrElse(Seq[Any](0, 0, 0, null, null, null, null, null))
        Row.fromSeq(keep ++ stats)
      }
    }(enc)
  }

  /** REAL WAV sample decode - the audio counterpart of
    * [[decodePngPixels]]: the same RIFF chunk walk as [[decodeAvMeta]],
    * but reading the `data` chunk's actual 16-bit little-endian PCM
    * samples (mono or interleaved multichannel; the declared chunk size
    * clamped to the bytes present, so a truncated stream decodes its
    * complete prefix). Verified in OpsSpec against `javax.sound`'s own
    * decoder on streams `javax.sound` encoded. Returns
    * (sample_rate, channels, samples) or None for non-WAV / non-PCM-16
    * payloads.
    */
  def decodeWavSamples(payload: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    val len = if (payload == null) 0 else payload.length
    def ascii(o: Int): String =
      if (o >= 0 && o + 4 <= len)
        new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      else ""
    def le16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def le32(o: Int): Long = (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
      ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    if (len < 12 || ascii(0) != "RIFF" || ascii(8) != "WAVE") return None
    var i = 12
    var sr = 0; var ch = 0; var bits = 0; var fmt = 0
    var out: Array[Short] = null
    while (i + 8 <= len) {
      val id = ascii(i); val sz = le32(i + 4)
      if (id == "fmt " && sz >= 16 && i + 24 <= len) {
        fmt = le16(i + 8); ch = le16(i + 10); sr = le32(i + 12).toInt; bits = le16(i + 22)
      } else if (id == "data" && out == null) {
        if (fmt != 1 || bits != 16 || ch <= 0) return None // PCM-16 only
        val avail = math.min(sz, (len - i - 8).toLong).toInt
        val n = avail / 2
        out = new Array[Short](n)
        var k = 0
        while (k < n) { out(k) = le16(i + 8 + 2 * k).toShort; k += 1 }
      }
      // same truncation stop as decodeAvMeta: a declared size past EOF
      // ends the walk (the complete prefix is already decoded); never
      // advance by a wrapped Int
      if (sz > len - i - 8) i = len
      else i += 8 + sz.toInt + (sz & 1L).toInt
    }
    if (out == null) None else Some((sr, ch, out))
  }

  /** A REAL (if small) WAV ENCODER with actual PCM payload - the audio
    * fixture generator: [[synthWavHeader]]'s 44 header bytes followed by
    * `nSamples` mono 16-bit samples carrying
    * `((i * 37 + seed * 11) % 4096) - 2048` - a formula a SQL oracle
    * replays per-sample. `javax.sound` reads the file back sample for
    * sample (OpsSpec).
    */
  def synthWavPcmBytes(seed: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    require(sampleRate > 0 && nSamples >= 0, s"bad args $sampleRate/$nSamples")
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 2 * nSamples).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1) // PCM, mono
    bb.putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(2 * nSamples)
    var i = 0
    while (i < nSamples) {
      bb.putShort((((i * 37L + seed * 11L) % 4096L) - 2048L).toShort)
      i += 1
    }
    bb.array()
  }

  /** Magic-byte MIME sniffing - the trust-the-bytes half of content
    * typing (declared Content-Type headers LIE routinely; every
    * production ingest sniffs before dispatching decoders, which is
    * exactly what [[decodeImagePixels]] does per-format - this is the
    * corpus-wide column form). Pure codegen: hex-prefix compares on
    * binary slices, no UDF, fuses into the scan. Signatures covered:
    * PNG, JPEG, GIF, RIFF/WAVE, ISO-BMFF ftyp (mp4), gzip, zip, PDF,
    * and the `<html`/`<!DOCTYPE`/`<HTML` HTML openers (the
    * casings that occur; full case-folding of markup belongs to the
    * HTML tier, not the sniffer). Anything else - including payloads
    * too short for their would-be signature - reads
    * application/octet-stream; NULL stays NULL.
    */
  def sniffMime(payload: Column): Column = {
    def hx(from: Int, len: Int): Column = F.hex(F.substring(payload, from, len))
    when(payload.isNull, lit(null).cast(org.apache.spark.sql.types.StringType))
      .when(hx(1, 8) === "89504E470D0A1A0A", lit("image/png"))
      .when(hx(1, 3) === "FFD8FF", lit("image/jpeg"))
      .when(hx(1, 3) === "474946", lit("image/gif"))
      .when(hx(1, 4) === "52494646" && hx(9, 4) === "57415645", lit("audio/wav"))
      .when(hx(5, 4) === "66747970", lit("video/mp4"))
      .when(hx(1, 2) === "1F8B", lit("application/gzip"))
      .when(hx(1, 4) === "504B0304", lit("application/zip"))
      .when(hx(1, 4) === "25504446", lit("application/pdf"))
      .when(hx(1, 4) === "3C68746D" || hx(1, 4) === "3C48544D" ||
        hx(1, 4) === "3C21444F" || hx(1, 4) === "3C21646F", lit("text/html"))
      .otherwise(lit("application/octet-stream"))
  }

  /** [[synthWavPcmBytes]] with SILENCE GATES: every third
    * `gate`-sample block is all-zero, the rest carry the same
    * deterministic ramp formula - the fixture shape for segmentation
    * (real speech is bursts separated by silence).
    */
  def synthWavPcmGatedBytes(
      seed: Long, sampleRate: Int, nSamples: Int, gate: Int): Array[Byte] = {
    require(sampleRate > 0 && nSamples >= 0 && gate > 0,
      s"bad args $sampleRate/$nSamples/$gate")
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 2 * nSamples).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1) // PCM, mono
    bb.putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(2 * nSamples)
    var i = 0
    while (i < nSamples) {
      val v = if ((i / gate) % 3 == 2) 0L
      else ((i * 37L + seed * 11L) % 4096L) - 2048L
      bb.putShort(v.toShort)
      i += 1
    }
    bb.array()
  }

  /** Silence-based audio segmentation (the VAD-lite every speech
    * pipeline runs before transcription/embedding: windows below the
    * energy floor are silence; maximal runs of voiced windows are the
    * SEGMENTS). One decode pass emits per-window energies (windows of
    * exactly `windowSamples`; a trailing partial window drops -
    * deterministic), then ONE per-media window computes the
    * gaps-and-islands fold: `segment_id` numbers each voiced run
    * 0-based within its media, NULL on silent windows. The decode is
    * embarrassingly parallel; window counts are bounded by clip
    * length, so no partition outgrows one clip.
    *
    * Output: (media frame columns minus payload) + (win_idx, energy,
    * is_silent, segment_id).
    */
  def audioSegments(
      media: DataFrame,
      windowSamples: Int,
      silenceEnergy: Long
  ): DataFrame = {
    require(windowSamples > 0, s"windowSamples must be positive, got $windowSamples")
    require(silenceEnergy >= 0, s"silenceEnergy must be >= 0, got $silenceEnergy")
    val outSchema = StructType(
      media.schema.fields.filterNot(_.name == "payload") ++ Seq(
        StructField("win_idx", IntegerType, nullable = false),
        StructField("energy", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val wins = media.mapPartitions { rows =>
      rows.flatMap { r =>
        val keep = nonPayload(r)
        decodeWavSamples(r.getAs[Array[Byte]]("payload")).toSeq.flatMap {
          case (_, _, s) =>
            (0 until s.length / windowSamples).map { w0 =>
              var e = 0L
              var i = w0 * windowSamples
              val end = i + windowSamples
              while (i < end) { val v = s(i).toLong; e += v * v; i += 1 }
              // Seq[Any], not Seq(w0, e): the latter infers Seq[Long]
              // and silently WIDENS the Int window index
              Row.fromSeq(keep ++ Seq[Any](w0, e))
            }
        }
      }
    }(enc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("win_idx")
    // two projections: a lag nested inside the running SUM's argument
    // would be an illegal nested window call (both engines)
    wins.withColumn("is_silent", F.col("energy") < silenceEnergy)
      .withColumn("gr_prev",
        coalesce(F.lag(F.col("is_silent"), 1).over(w), lit(true)))
      .withColumn("gr_seg",
        sum(when(!F.col("is_silent") && F.col("gr_prev"), 1).otherwise(0)).over(w))
      .withColumn("segment_id",
        when(F.col("is_silent"), lit(null).cast(IntegerType))
          .otherwise((F.col("gr_seg") - 1).cast(IntegerType)))
      .drop("gr_prev", "gr_seg")
  }

  /** Frame-level audio feature extraction: decode
    * ([[decodeWavSamples]]) -> integer signal statistics in one
    * mapPartitions pass - energy (sum of squared samples), zero
    * crossings (strict sign flips, `s[i-1] * s[i] < 0`), and peak
    * (max |sample|) - the classic cheap audio-quality/VAD signals, all
    * integer so the oracle replays them exactly. Non-WAV payloads emit
    * NULL stats with 0 rates - the deterministic fallback every decoder
    * here uses. Output: media frame columns + (sample_rate, channels,
    * n_samples, energy, zero_crossings, peak).
    */
  def decodeAudioFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "payload") ++ Seq(
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("energy", LongType),
      StructField("zero_crossings", IntegerType),
      StructField("peak", IntegerType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val keep = nonPayload(r)
        val stats = decodeWavSamples(r.getAs[Array[Byte]]("payload")).map {
          case (sr, ch, s) =>
            var energy = 0L; var zc = 0; var peak = 0
            var i = 0
            while (i < s.length) {
              val v = s(i).toInt
              energy += v.toLong * v
              if (i > 0 && s(i - 1) * v < 0) zc += 1
              if (math.abs(v) > peak) peak = math.abs(v)
              i += 1
            }
            Seq[Any](sr, ch, s.length, energy, zc, peak)
        }.getOrElse(Seq[Any](0, 0, 0, null, null, null))
        Row.fromSeq(keep ++ stats)
      }
    }(enc)
  }

  /** The full real inference shape: pixel decode
    * ([[decodeImagePixels]] - PNG or baseline JPEG, dispatched on the
    * signature) -> nearest-neighbor resample to the model's
    * input size ([[resizePixels]]) -> batched embed through a
    * [[FeatureModel]] session - i.e. the model sees DECODED PIXELS,
    * not the compressed container bytes ([[decodeAndFeaturize]]'s
    * payload-featurize is the container-level variant). Same session
    * lifecycle: one per partition, `batchSize`-bounded batches,
    * closed on exhaustion AND task completion. Undecodable payloads
    * embed a null buffer (the model's zero vector) with (0, 0) dims -
    * deterministic fallback. Output: media frame columns +
    * (width, height, channels, features).
    */
  def decodeResizeFeaturize(
      media: DataFrame,
      outW: Int,
      outH: Int,
      model: FeatureModel = ByteHistogramModel,
      batchSize: Int = 64
  ): DataFrame = {
    require(batchSize > 0, s"need positive batchSize, got $batchSize")
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "payload") ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("features", ArrayType(FloatType))
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      val session = model.openSession()
      sessionScoped(session, rows.grouped(batchSize).flatMap { chunk =>
        val decoded = chunk.map(r => decodeImagePixels(r.getAs[Array[Byte]]("payload")))
        val buffers = decoded.map {
          case Some((w, h, ch, px)) => resizePixels(px, w, h, ch, outW, outH)
          case None => null
        }.toArray
        val feats = session.embedBatch(buffers)
        require(feats.length == chunk.size,
          s"FeatureSession returned ${feats.length} vectors for ${chunk.size} payloads")
        chunk.lazyZip(decoded).lazyZip(feats).map { (r, dec, f) =>
          val (w, h, ch) = dec.map(d => (d._1, d._2, d._3)).getOrElse((0, 0, 0))
          Row.fromSeq(
            nonPayload(r) ++
              Seq(w, h, ch, f.toSeq))
        }
      })
    }(enc)
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
      sessionScoped(session, rows.grouped(batchSize).flatMap { chunk =>
        val feats = session.embedBatch(chunk.map(_.getAs[Array[Byte]]("payload")).toArray)
        require(feats.length == chunk.size,
          s"FeatureSession returned ${feats.length} vectors for ${chunk.size} payloads")
        chunk.lazyZip(feats).map { (r, f) =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h, fmt) = decodeImageMeta(payload)
          Row.fromSeq(
            nonPayload(r) ++
              Seq(w, h, fmt, f.toSeq)
          )
        }
      })
    }(enc)
  }

  /** Resize planning: fit each image into a `targetW` x `targetH` box
    * preserving aspect ratio, never upscaling - the metadata-only audit
    * pass (what a preprocessing pipeline budgets batch shapes from,
    * without touching pixels). The pixel-level resample itself is REAL
    * too: [[resizePixels]], run inside [[decodeResizePixels]] /
    * [[decodeResizeFeaturize]]'s mapPartitions batches.
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
