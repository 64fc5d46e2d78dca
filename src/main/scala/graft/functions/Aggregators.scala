package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable SpaceSaving summary (Metwally et al.; merge rule per
  * Agarwal et al., "Mergeable Summaries"): tracks at most `capacity`
  * items with overestimated counts. Guarantee used downstream: any item
  * whose TRUE count exceeds N/capacity (N = stream length, carried in
  * `processed`) is present in the summary - so a generously-sized
  * summary is a certified candidate superset for exact top-k, found in
  * ONE pass with bounded memory instead of a full-vocabulary groupBy.
  */
final class SpaceSaving(val capacity: Int) extends Serializable {
  val counts = new scala.collection.mutable.HashMap[String, Long]
  var processed: Long = 0L
  private var everEvicted: Boolean = false

  // Eviction support: cached minimum count + the tokens that held it at
  // the last scan (key-sorted for determinism). Between rescans the pool
  // only loses members (an increment lifts a token above minVal; an
  // eviction replaces it with count minVal + w > minVal - minVal never
  // decreases and nothing new ever drops TO it), so popping the pool is
  // exactly `minBy((count, token))` amortized O(1) instead of a full
  // O(capacity) scan per eviction.
  private var minVal: Long = 0L
  private var minPool: List[String] = Nil

  @annotation.tailrec
  private def victim(): String = {
    minPool match {
      case h :: t =>
        minPool = t
        if (counts.get(h).contains(minVal)) h else victim()
      case Nil =>
        minVal = counts.values.min
        minPool = counts.iterator.collect { case (k, c) if c == minVal => k }
          .toList.sorted
        victim()
    }
  }

  private[functions] def minCount: Long =
    if (counts.size < capacity) 0L else counts.values.min

  def add(x: String, w: Long = 1L): this.type = {
    processed += w
    counts.get(x) match {
      case Some(c) => counts.update(x, c + w)
      case None if counts.size < capacity => counts.update(x, w)
      case None =>
        // evict a minimal item; the newcomer inherits its count (the
        // canonical overestimate that preserves the frequent-item
        // guarantee). Deterministic victim: smallest (count, token).
        everEvicted = true
        val vk = victim()
        val vc = counts.remove(vk).get
        counts.update(x, vc + w)
    }
    this
  }

  /** Merge per mergeable-summaries: items missing from one side take
    * that side's min count (keeps every estimate an overestimate), then
    * the union is trimmed back to `capacity` by estimated count.
    * Deterministic trim order so partial-aggregation plans reproduce.
    */
  def merge(o: SpaceSaving): SpaceSaving = {
    val mA = minCount
    val mB = o.minCount
    val out = new SpaceSaving(capacity)
    out.processed = processed + o.processed
    val keys = counts.keySet ++ o.counts.keySet
    val est = keys.iterator.map { k =>
      k -> (counts.getOrElse(k, mA) + o.counts.getOrElse(k, mB))
    }.toSeq
    val kept =
      if (est.size <= capacity) est
      else est.sortBy { case (k, c) => (-c, k) }.take(capacity)
    kept.foreach { case (k, c) => out.counts.update(k, c) }
    out.everEvicted = everEvicted || o.everEvicted || est.size > capacity
    out
  }

  /** Candidate items, deterministically ordered. */
  def items: Seq[String] = counts.keys.toSeq.sorted

  /** True iff no item was ever dropped on any path into this summary
    * (no eviction in any partial, no trim in any merge) - the item set
    * IS the full vocabulary, so a recount over it is trivially exact.
    * NOT derivable from counts.size: a merged summary can be small yet
    * lossy if an input evicted.
    */
  def lossless: Boolean = !everEvicted
}

/** Typed UDAF: one-pass SpaceSaving summary over a token stream.
  * Buffer rides the object-aggregation path (kryo buffer encoder ->
  * ObjectHashAggregate): partial summaries per partition, merged at the
  * single reducer - never a full-vocabulary shuffle. Output carries
  * (candidates, streamLength, lossless) so callers can certify
  * downstream exactness (see TextOps.heavyHitterTokens).
  */
final class HeavyHitterAgg(capacity: Int)
    extends Aggregator[String, SpaceSaving, (Seq[String], Long, Boolean)] {
  override def zero: SpaceSaving = new SpaceSaving(capacity)
  override def reduce(b: SpaceSaving, a: String): SpaceSaving = b.add(a)
  override def merge(a: SpaceSaving, b: SpaceSaving): SpaceSaving = a.merge(b)
  override def finish(r: SpaceSaving): (Seq[String], Long, Boolean) =
    (r.items, r.processed, r.lossless)
  override def bufferEncoder: Encoder[SpaceSaving] = Encoders.kryo[SpaceSaving]
  override def outputEncoder: Encoder[(Seq[String], Long, Boolean)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[String], Long, Boolean)]()
}

/** Bounded min-k-by-hash state: the k (hash, value) pairs with the
  * smallest hashes seen so far, one entry per distinct hash. With the
  * hash an md5 of a unique row id, the kept values are a UNIFORM
  * k-sample of the rows - deterministic (a pure function of the id
  * set, independent of partitioning or arrival order) and mergeable
  * (union + re-trim = the sketch of the union), which is what makes it
  * a one-pass rank sketch: sample quantiles estimate true quantiles
  * within the standard DKW O(1/sqrt(k)) rank error.
  *
  * A re-seen hash keeps the SMALLEST value, so even a caller that
  * violates id uniqueness gets a deterministic result (one entry per
  * id, min value) instead of a partitioning-dependent one.
  */
final class MinKByHash(val k: Int) extends Serializable {
  val entries = new java.util.TreeMap[String, Double]()

  def add(hash: String, v: Double): this.type = {
    if (entries.containsKey(hash)) {
      if (v < entries.get(hash)) entries.put(hash, v)
    } else if (entries.size < k) entries.put(hash, v)
    else if (hash < entries.lastKey) {
      entries.put(hash, v)
      entries.remove(entries.lastKey)
    }
    this
  }

  def merge(o: MinKByHash): MinKByHash = {
    o.entries.forEach((h, v) => add(h, v))
    this
  }

  /** The sample values, sorted ascending - the canonical order the
    * quantile reader and the oracle both use.
    */
  def values: Seq[Double] = {
    val out = new Array[Double](entries.size)
    var i = 0
    val it = entries.values.iterator
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }
}

/** Typed UDAF over (md5-hex-hash, value) pairs: one-pass bounded
  * uniform sampling per group. Each partial carries at most k entries,
  * merges are union + re-trim - the map-side-combinable shape that
  * keeps a 100-TB scan from ever shuffling rows for a quantile
  * profile (contrast: any windowed row_number sample shuffles the
  * corpus).
  */
final class MinKAgg(k: Int)
    extends Aggregator[(String, Double), MinKByHash, Seq[Double]] {
  require(k > 0, s"need positive k, got $k")
  override def zero: MinKByHash = new MinKByHash(k)
  override def reduce(b: MinKByHash, a: (String, Double)): MinKByHash =
    b.add(a._1, a._2)
  override def merge(a: MinKByHash, b: MinKByHash): MinKByHash = a.merge(b)
  override def finish(r: MinKByHash): Seq[Double] = r.values
  override def bufferEncoder: Encoder[MinKByHash] = Encoders.kryo[MinKByHash]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** Mergeable byte-packed bitset over long positions in `[0, mBits)`:
  * the build half of the broadcast Bloom filter (probe half:
  * graft.functions.BitsetContains). Partials OR together, so the build
  * is one pass with `mBits / 8`-byte bounded state per partial - never
  * a position shuffle. Out-of-range positions throw: the filter's
  * soundness (every inserted item probes true) depends on build and
  * probe agreeing on the modulus.
  */
final class BitsetAgg(mBits: Int)
    extends Aggregator[Long, Array[Byte], Array[Byte]] {
  require(mBits > 0 && mBits % 8 == 0, s"mBits must be a positive multiple of 8, got $mBits")
  override def zero: Array[Byte] = new Array[Byte](mBits / 8)
  override def reduce(b: Array[Byte], pos: Long): Array[Byte] = {
    require(pos >= 0 && pos < mBits, s"position $pos outside [0, $mBits)")
    b((pos >>> 3).toInt) = (b((pos >>> 3).toInt) | (1 << (pos & 7).toInt)).toByte
    b
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }
  override def finish(r: Array[Byte]): Array[Byte] = r
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
