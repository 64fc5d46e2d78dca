package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Graph operators over relational edge lists (the shape dedup pipelines
  * produce: near-dup PAIRS in, duplicate CLUSTERS out).
  */
object GraphOps {

  /** Connected components of an undirected edge list by iterative
    * min-label propagation: every vertex starts labeled with its own id
    * and repeatedly adopts the minimum label among itself and its
    * neighbors, until a fixpoint.
    *
    * Scale notes: converges in O(component diameter) rounds, each round
    * one equi-join + one aggregation; `localCheckpoint` truncates lineage
    * per round (the same driver-loop discipline as the trie traversal's
    * join mode). Near-dup graphs are overwhelmingly many tiny components,
    * where diameter is small and this loop beats the O(log n)-round
    * large-star/small-star algorithm on constant factors; a giant-
    * component graph would want the latter behind the same edge-list API.
    *
    * Output: one row per distinct vertex appearing in `edges`:
    * (id, cluster_id = min vertex id in its component).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // materialize the (possibly expensive) edge computation ONCE before
    // symmetrizing: union(sym, sym.swapped) would otherwise execute the
    // upstream pair-generation plan twice
    val sym = edges.select(
      F.col(srcCol).cast(LongType).as("a"),
      F.col(dstCol).cast(LongType).as("b"))
      .localCheckpoint()
    val und = sym.union(sym.select(F.col("b").as("a"), F.col("a").as("b")))
      .distinct()
      .localCheckpoint()

    var labels = und.select(F.col("a").as("id")).distinct()
      .withColumn("label", F.col("id"))
      .localCheckpoint()

    // empty edge list: no vertices, and sum(label) below would be NULL
    if (labels.isEmpty)
      return labels.select(F.col("id"), F.col("label").as("cluster_id"))

    // labels only ever decrease, so the fixpoint test is one cheap
    // aggregate per round (sum through DECIMAL: ANSI mode would throw on
    // a Long overflow for large id spaces)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(F.col("label").cast(DecimalType(38, 0)))).head()
        .getDecimal(0)

    var prevSum = labelSum(labels)
    var converged = false
    while (!converged) {
      val nbrMin = und
        .join(labels, und("a") === labels("id"))
        .groupBy(und("b").as("nid"))
        .agg(min(F.col("label")).as("nbr_label"))
      val next = labels
        .join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(
          F.col("id"),
          least(F.col("label"), coalesce(F.col("nbr_label"), F.col("label"))).as("label"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
    }
    labels.select(F.col("id"), F.col("label").as("cluster_id"))
  }
}
