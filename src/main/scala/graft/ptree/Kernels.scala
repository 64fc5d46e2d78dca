package graft.ptree

import scala.collection.mutable.ArrayBuffer

/** Pure-Scala kernels (no Spark imports): unit-testable in isolation and
  * callable from `mapPartitions` with zero UDF/serde overhead.
  *
  * The reference implements these as embedded C++ kernels
  * (/root/reference/PrefixTree.ecl:315-394 `CalculateLevenshteinVector`,
  * `GetMinDistance`, `GetFinalDistance`). We keep the same math - an
  * incremental Levenshtein DP row threaded down trie edges, with the row
  * minimum as a branch-and-bound lower bound - but fix the reference's
  * first-call bug on multi-char root edges (stale initial row memcpy,
  * ecl:368; see SURVEY.md B.q1) and lift its 255-char/255-distance cap
  * (ecl:322-326) by using Int cells.
  */
object Kernels {

  /** Initial DP row for `query` vs the empty trie path: row(j) = j
    * (= cost of deleting j query chars).
    */
  def initRow(queryLen: Int): Array[Int] = Array.tabulate(queryLen + 1)(identity)

  /** Extend a Levenshtein DP row across a multi-character trie edge.
    *
    * `row(j)` = edit distance between the trie path consumed so far and
    * `query.substring(0, j)`; `consumed` = number of trie-path chars that
    * produced `row`. Returns `(newRow, newRowMin)` after consuming every
    * char of `edge`. `newRowMin` is a lower bound on the distance of ANY
    * word extending this path - the branch-and-bound prune key
    * (ecl:364-372).
    */
  def extendRow(
      query: String,
      edge: String,
      row: Array[Int],
      consumed: Int
  ): (Array[Int], Int) = {
    val n = query.length
    // never alias the caller's row: the DFS reuses it across sibling edges
    var prev = java.util.Arrays.copyOf(row, n + 1)
    var cur = new Array[Int](n + 1)
    var i = 0
    var rowMin = Int.MaxValue
    while (i < edge.length) {
      val c = edge.charAt(i)
      rowMin = consumed + i + 1
      cur(0) = rowMin
      var j = 1
      while (j <= n) {
        val cost = if (query.charAt(j - 1) == c) 0 else 1
        var v = prev(j - 1) + cost // substitute / match
        val del = cur(j - 1) + 1 // delete from query
        val ins = prev(j) + 1 // insert into query
        if (del < v) v = del
        if (ins < v) v = ins
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (edge.isEmpty) {
      var j = 0
      rowMin = Int.MaxValue
      while (j <= n) { if (row(j) < rowMin) rowMin = row(j); j += 1 }
      (row, rowMin)
    } else (prev, rowMin)
  }

  /** Exact distance(query, path-so-far): the last DP cell. */
  @inline def finalDistance(row: Array[Int]): Int = row(row.length - 1)

  /** Depth-first pruned traversal of a trie held as a children index,
    * emitting every dictionary word within `maxDist` edits of `query`.
    *
    * This is the broadcast-mode ("Roxie-style",
    * /root/reference/PrefixTree.ecl:459-588) query kernel: the whole LOOP
    * of ecl:572-584 runs locally against an in-memory `Map[parentId ->
    * children]`, so a batch of queries is a single `mapPartitions` with no
    * per-iteration Spark jobs.
    *
    * Prunes (same two as the reference's join predicates, ecl:434,
    * 440-441, kept deliberately un-combined - see SURVEY.md B.q3):
    *   1. branch-and-bound: expand a child only if the row-min after its
    *      edge is <= maxDist;
    *   2. subtree length window: `len(query) <= _max + maxDist` and
    *      `len(query) >= _min - maxDist`.
    */
  def search(
      query: String,
      maxDist: Int,
      children: Long => Array[PTNode]
  ): List[(String, Int)] = {
    val n = query.length
    var out: List[(String, Int)] = Nil
    // stack of (nodeId, dpRow, consumedChars)
    var stack: List[(Long, Array[Int], Int)] = List((0L, initRow(n), 0))
    while (stack.nonEmpty) {
      val (nodeId, row, consumed) = stack.head
      stack = stack.tail
      val kids = children(nodeId)
      if (kids != null) {
        var i = 0
        while (i < kids.length) {
          val child = kids(i)
          if (child.is_word) {
            val d = finalDistance(row)
            if (d <= maxDist) out = (child.node, d) :: out
          } else if (n <= child._max + maxDist && n >= child._min - maxDist) {
            val (newRow, rowMin) = extendRow(query, child.node, row, consumed)
            if (rowMin <= maxDist)
              stack = (child.id, newRow, consumed + child.node.length) :: stack
          }
          i += 1
        }
      }
    }
    out
  }

  /** Streaming radix-trie builder over one partition's SORTED, DISTINCT
    * word iterator. Single ascending pass, O(max word length) state.
    *
    * Spark-first redesign of the reference's construction pipeline (two
    * directional `ITERATE` boundary-marking passes + id assignment +
    * NORMALIZE + ROLLUP, /root/reference/PrefixTree.ecl:101-299): because
    * words arrive sorted, all words sharing a prefix are contiguous, so a
    * stack of "open" nodes along the current path builds the identical
    * path-compressed trie in one scan. Each node is emitted exactly once,
    * already carrying its final `_max`/`_min` subtree aggregates - the
    * reference's SORT+ROLLUP dedup stage (ecl:289-299) disappears
    * entirely.
    *
    * Invariants on the emitted table (checked by PrefixTreeSpec):
    * end-caps == input word set; every parent id exists (or 0); edge
    * labels along a path concatenate to the word; `_min <= len <= _max`
    * along each word's path.
    */
  def buildTrie(partitionId: Int, sortedDistinctWords: Iterator[String]): Iterator[PTNode] = {
    val pidBase = partitionId.toLong << PTNode.PART_SHIFT
    var counter = 0L
    def nextId(): Long = { counter += 1; pidBase | counter }

    // Open node on the current path: label spans depths [start, start+label.length)
    final class Open(
        var start: Int,
        var label: String,
        var id: Long,
        var parentId: Long,
        var minLen: Int,
        var maxLen: Int
    )
    var stack: List[Open] = Nil
    val out = new ArrayBuffer[PTNode]()
    var prev: String = null

    def emit(o: Open): Unit =
      out += PTNode(o.id, o.parentId, o.maxLen, o.minLen, is_word = false, partitionId, o.label)

    def lcp(a: String, b: String): Int = {
      val m = math.min(a.length, b.length)
      var i = 0
      while (i < m && a.charAt(i) == b.charAt(i)) i += 1
      i
    }

    def insert(w: String): Unit = {
      val div = if (prev == null) 0 else lcp(prev, w)
      // 1. finalize open nodes lying entirely beyond the divergence point
      while (stack.nonEmpty && stack.head.start >= div) {
        emit(stack.head); stack = stack.tail
      }
      // 2. split an open node whose span crosses the divergence point:
      //    the deep part [div, end) belongs only to already-seen words ->
      //    finalize it now, keeping the ORIGINAL id (already referenced as
      //    parent by emitted descendants); the shallow part [start, div)
      //    stays open under a fresh id and becomes the new branch point.
      if (stack.nonEmpty) {
        val top = stack.head
        val end = top.start + top.label.length
        if (end > div) {
          val shallowId = nextId()
          out += PTNode(top.id, shallowId, top.maxLen, top.minLen,
            is_word = false, partitionId, top.label.substring(div - top.start))
          top.label = top.label.substring(0, div - top.start)
          top.id = shallowId
        }
      }
      // 3. every remaining open node is an ancestor of w: fold in its length
      var s = stack
      while (s.nonEmpty) {
        val o = s.head
        if (w.length < o.minLen) o.minLen = w.length
        if (w.length > o.maxLen) o.maxLen = w.length
        s = s.tail
      }
      // 4. open the new edge for w's suffix (div < w.length always holds
      //    for sorted distinct input) and emit w's end-cap under it
      val parent = if (stack.isEmpty) 0L else stack.head.id
      val fresh = new Open(div, w.substring(div), nextId(), parent, w.length, w.length)
      stack = fresh :: stack
      out += PTNode(nextId(), fresh.id, w.length, w.length, is_word = true, partitionId, w)
      prev = w
    }

    new Iterator[PTNode] {
      private var idx = 0
      private var done = false
      private def fill(): Unit = {
        if (idx >= out.length) { out.clear(); idx = 0 }
        while (idx >= out.length && !done) {
          var moved = false
          while (!moved && sortedDistinctWords.hasNext) {
            val w = sortedDistinctWords.next()
            if (prev == null || w != prev) { insert(w); moved = true }
          }
          if (!moved) { // input exhausted: finalize the remaining path
            while (stack.nonEmpty) { emit(stack.head); stack = stack.tail }
            done = true
          }
        }
      }
      def hasNext: Boolean = { fill(); idx < out.length }
      def next(): PTNode = { fill(); val r = out(idx); idx += 1; r }
    }
  }
}
