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
