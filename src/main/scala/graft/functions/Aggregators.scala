package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable SpaceSaving summary (Metwally et al.; merge rule per
  * Agarwal et al., "Mergeable Summaries"): tracks at most `capacity`
  * items with overestimated counts. Guarantee used downstream: any item
  * whose TRUE count exceeds N/capacity (N = stream length) is present
  * in the summary - so a generously-sized summary is a certified
  * candidate superset for exact top-k, found in ONE pass with bounded
  * memory instead of a full-vocabulary groupBy.
  */
final class SpaceSaving(val capacity: Int) extends Serializable {
  val counts = new scala.collection.mutable.HashMap[String, Long]
  var processed: Long = 0L

  private def minCount: Long = if (counts.size < capacity) 0L else counts.values.min

  def add(x: String, w: Long = 1L): this.type = {
    processed += w
    counts.get(x) match {
      case Some(c) => counts.update(x, c + w)
      case None if counts.size < capacity => counts.update(x, w)
      case None =>
        // evict a minimal item; the newcomer inherits its count (the
        // canonical overestimate that preserves the frequent-item
        // guarantee). Deterministic victim: smallest (count, token).
        val (vk, vc) = counts.minBy { case (k, c) => (c, k) }
        counts.remove(vk)
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
    out
  }

  /** Candidate items, deterministically ordered. */
  def items: Seq[String] = counts.keys.toSeq.sorted
}

/** Typed UDAF: one-pass SpaceSaving summary over a token stream.
  * Buffer rides the object-aggregation path (kryo buffer encoder ->
  * ObjectHashAggregate): partial summaries per partition, merged at the
  * single reducer - never a full-vocabulary shuffle.
  */
final class HeavyHitterAgg(capacity: Int)
    extends Aggregator[String, SpaceSaving, Seq[String]] {
  override def zero: SpaceSaving = new SpaceSaving(capacity)
  override def reduce(b: SpaceSaving, a: String): SpaceSaving = b.add(a)
  override def merge(a: SpaceSaving, b: SpaceSaving): SpaceSaving = a.merge(b)
  override def finish(r: SpaceSaving): Seq[String] = r.items
  override def bufferEncoder: Encoder[SpaceSaving] = Encoders.kryo[SpaceSaving]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
