package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Graph operators over relational edge lists (the shape dedup pipelines
  * produce: near-dup PAIRS in, duplicate CLUSTERS out).
  */
object GraphOps {

  /** Connected components of an undirected edge list by iterative
    * min-label propagation: every vertex starts labeled with its own id
    * and repeatedly adopts the minimum label among itself and its
    * neighbors, until a fixpoint. Vertex ids may be any orderable
    * column type (long ids, strings, ...) - "min" is the column type's
    * ordering.
    *
    * Scale notes: converges in O(component diameter) rounds, each round
    * one equi-join + one aggregation + one vertex-sized convergence
    * probe; `localCheckpoint` truncates lineage per round (the same
    * driver-loop discipline as the trie traversal's join mode). Near-dup graphs are overwhelmingly many tiny components,
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
    val sym = edges.select(F.col(srcCol).as("a"), F.col(dstCol).as("b"))
      .localCheckpoint()
    val und = sym.union(sym.select(F.col("b").as("a"), F.col("a").as("b")))
      .distinct()
      .localCheckpoint()

    var labels = und.select(F.col("a").as("id")).distinct()
      .withColumn("label", F.col("id"))
      .localCheckpoint()

    var converged = labels.isEmpty // empty edge list: nothing to propagate
    while (!converged) {
      val nbrMin = und
        .join(labels, und("a") === labels("id"))
        .groupBy(und("b").as("nid"))
        .agg(min(F.col("label")).as("nbr_label"))
      // old and new labels are both in hand here, so the any-type
      // fixpoint test is a flag column, not another join
      val next = labels
        .join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(
          F.col("id"),
          least(F.col("label"), coalesce(F.col("nbr_label"), F.col("label"))).as("label"),
          (coalesce(F.col("nbr_label"), F.col("label")) < F.col("label")).as("changed"))
        .localCheckpoint()
      converged = next.filter(F.col("changed")).isEmpty
      labels = next.drop("changed")
    }
    labels.select(F.col("id"), F.col("label").as("cluster_id"))
  }
}
