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

  /** Unicode code points of `s`. ALL edit-distance units in these
    * kernels are CODE POINTS, matching Spark SQL's `length()` and
    * `levenshtein()` - a surrogate pair (emoji, astral CJK) is one
    * edit, not two. (DuckDB's `levenshtein` is byte-based and disagrees
    * with Spark on any non-ASCII input; the DuckDB oracles therefore
    * only bind on ASCII corpora, while the in-repo brute-force oracle -
    * Spark's own `levenshtein` - binds everywhere, spec'd with an
    * astral-plane fixture.)
    */
  private[ptree] def codePoints(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val out = new Array[Int](n)
    var ci = 0
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(ci)
      out(i) = cp
      ci += Character.charCount(cp)
      i += 1
    }
    out
  }

  @inline private[ptree] def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Extend a Levenshtein DP row across a multi-character trie edge,
    * restricted to the Ukkonen band.
    *
    * `row(j)` = edit distance between the trie path consumed so far and
    * `query.substring(0, j)`; `consumed` = number of trie-path chars that
    * produced `row`. Returns `(newRow, newRowMin)` after consuming every
    * char of `edge`. `newRowMin` is a lower bound on the distance of ANY
    * word extending this path - the branch-and-bound prune key
    * (ecl:364-372).
    *
    * Banding: any DP cell (i, j) with |i - j| > maxDist is >= maxDist + 1,
    * so only the 2*maxDist+1 cells around the diagonal are computed per
    * path char; everything else is pinned at the saturation value
    * `maxDist + 1`. All distances this function returns are therefore
    * `min(true distance, maxDist + 1)` - exact whenever they matter
    * (<= maxDist) and "too far" otherwise. For k << |query| this cuts the
    * inner loop from O(|query|) to O(k) per char.
    */
  def extendRow(
      query: String,
      edge: String,
      row: Array[Int],
      consumed: Int,
      maxDist: Int
  ): (Array[Int], Int) = {
    val qcp = codePoints(query)
    val n = qcp.length
    // never alias the caller's row: the DFS reuses it across sibling edges
    val src = java.util.Arrays.copyOf(row, n + 1)
    val (res, mn) = extendRowBuffers(qcp, edge, src, consumed, maxDist,
      new Array[Int](n + 1), new Array[Int](n + 1))
    // this row may be stored/serialized (join mode): saturate every
    // out-of-band cell so no stale garbage escapes
    val d = consumed + cpLen(edge)
    val inf = maxDist + 1
    var j = 0
    while (j <= n) {
      if (j < d - maxDist || j > d + maxDist) res(j) = inf
      j += 1
    }
    (res, mn)
  }

  /** Allocation-free core of [[extendRow]]: ping-pongs between the two
    * caller-owned scratch buffers (the hot DFS pools one pair per
    * recursion level). Only band cells are written per char; the cells
    * one past each band end are pinned to the saturation value so a
    * REUSED buffer never leaks stale values into the next char's reads
    * (band ends shift by at most 1 per char, so those two guards cover
    * every out-of-band read). Cells further outside the band are
    * garbage: callers must treat any cell `j` with |consumed' - j| >
    * maxDist as saturated rather than reading it (see the end-cap check
    * in [[search]]).
    */
  def extendRowBuffers(
      queryCp: Array[Int],
      edge: String,
      src: Array[Int],
      consumed: Int,
      maxDist: Int,
      bufA: Array[Int],
      bufB: Array[Int]
  ): (Array[Int], Int) = {
    val n = queryCp.length
    val inf = maxDist + 1
    var prev = src
    var cur = bufA
    var spare = bufB
    if (edge.isEmpty) {
      var j = 0
      var mn = Int.MaxValue
      while (j <= n) { if (prev(j) < mn) mn = prev(j); j += 1 }
      return (prev, mn)
    }
    // edge code points are streamed via codePointAt stepping (ei = char
    // index, k = code-point ordinal): no per-call allocation on the hot
    // DFS path; the query side IS materialized (queryCp) because the DP
    // inner loop random-accesses it by column index
    var ei = 0
    var k = 0
    var rowMin = inf
    while (ei < edge.length) {
      val c = edge.codePointAt(ei)
      val d = consumed + k + 1 // path code points consumed after this one
      val lo = if (d - maxDist > 0) d - maxDist else 0
      val hi = if (d + maxDist < n) d + maxDist else n
      // band has moved past the query's end: every cell from here on is
      // > maxDist, for this char and all deeper ones - saturate and bail
      if (lo > hi) return (prev, inf)
      if (lo > 0) cur(lo - 1) = inf // guard below the band
      rowMin = inf
      var j = lo
      while (j <= hi) {
        var v =
          if (j == 0) d
          else {
            val cost = if (queryCp(j - 1) == c) 0 else 1
            var m = prev(j - 1) + cost // substitute / match
            val del = cur(j - 1) + 1 // delete from query
            val ins = prev(j) + 1 // insert into query
            if (del < m) m = del
            if (ins < m) m = ins
            m
          }
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < n) cur(hi + 1) = inf // guard above the band
      if (k == 0) { // src is read-only: rotate through the two scratch bufs
        prev = cur; cur = spare; spare = null
      } else {
        val tmp = prev; prev = cur; cur = tmp
      }
      ei += Character.charCount(c)
      k += 1
    }
    (prev, rowMin)
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
  ): ArrayBuffer[(String, Int)] =
    searchCounted(query, maxDist, children)._1.map { case (w, d, _) => (w, d) }

  /** [[search]] plus the number of trie nodes examined - the measurable
    * form of the branch-and-bound claim: examined nodes should be far
    * fewer than |dictionary| per query (brute force examines every word).
    * Hits carry the end-cap's `n_occurrences` (corpus multiplicity).
    */
  def searchCounted(
      query: String,
      maxDist: Int,
      children: Long => Array[PTNode]
  ): (ArrayBuffer[(String, Int, Long)], SearchStats) = {
    val qcp = codePoints(query)
    val n = qcp.length
    var visited = 0L
    var cells = 0L
    val band = 2L * maxDist + 1
    val out = new ArrayBuffer[(String, Int, Long)]()
    // two pooled scratch rows per recursion level: zero allocation on the
    // hot path (a query visits thousands of nodes; rows live only along
    // the current DFS path)
    val pool = new ArrayBuffer[Array[Int]]()
    def buf(i: Int): Array[Int] = {
      while (pool.length <= i) pool += new Array[Int](n + 1)
      pool(i)
    }
    def go(nodeId: Long, row: Array[Int], consumed: Int, level: Int): Unit = {
      val kids = children(nodeId)
      if (kids == null) return
      var i = 0
      while (i < kids.length) {
        val child = kids(i)
        visited += 1
        if (child.is_word) {
          // row(n) is only valid inside the band; outside it the true
          // distance exceeds maxDist by the banding argument
          if (consumed - n <= maxDist && n - consumed <= maxDist) {
            val d = row(n)
            if (d <= maxDist) out += ((child.node, d, child.n_occurrences))
          }
        } else if (n <= child._max + maxDist && n >= child._min - maxDist) {
          val edgeLen = cpLen(child.node)
          cells += edgeLen * band // banded DP work for this edge
          val (newRow, rowMin) = extendRowBuffers(
            qcp, child.node, row, consumed, maxDist,
            buf(2 * level), buf(2 * level + 1))
          if (rowMin <= maxDist)
            go(child.id, newRow, consumed + edgeLen, level + 1)
        }
        i += 1
      }
    }
    go(0L, initRow(n), 0, 0)
    (out, SearchStats(visited, cells))
  }

  /** All dictionary words extending `prefix`, via trie descent: follow
    * the unique edge path matching the prefix (path compression: an edge
    * may consume part of the prefix or extend past its end), then
    * enumerate every end-cap in the matched subtree. O(|prefix| +
    * |answer|) node visits - the classic trie autocomplete; a flat scan
    * is O(|dictionary|). Because the trie is a per-partition forest with
    * shared shallow paths duplicated, the descent naturally fans out
    * over each partition's root children; identical words colocate, so
    * no result is ever duplicated.
    *
    * Output: (word, n_occurrences) per matching dictionary word.
    */
  def prefixSearch(
      prefix: String,
      children: Long => Array[PTNode]
  ): ArrayBuffer[(String, Long)] = {
    val out = new ArrayBuffer[(String, Long)]()
    def collect(nodeId: Long): Unit = {
      val kids = children(nodeId)
      if (kids == null) return
      var i = 0
      while (i < kids.length) {
        val k = kids(i)
        if (k.is_word) out += ((k.node, k.n_occurrences)) else collect(k.id)
        i += 1
      }
    }
    def go(nodeId: Long, consumed: Int): Unit = {
      val kids = children(nodeId)
      if (kids == null) return
      val rest = prefix.substring(consumed)
      var i = 0
      while (i < kids.length) {
        val k = kids(i)
        // end-caps during descent spell words of length == consumed <
        // |prefix|, which can never extend the prefix - only internal
        // edges participate until the prefix is fully consumed
        if (!k.is_word) {
          val edge = k.node
          if (rest.length <= edge.length) {
            if (edge.startsWith(rest)) collect(k.id) // subtree fully matches
          } else if (rest.startsWith(edge)) {
            go(k.id, consumed + edge.length)
          }
        }
        i += 1
      }
    }
    if (prefix.isEmpty) collect(0L) else go(0L, 0)
    out
  }

  /** Streaming radix-trie builder over one partition's SORTED word
    * iterator (duplicates allowed - they arrive adjacent and collapse
    * into one end-cap carrying `n_occurrences`, preserving the
    * reference's per-occurrence multiplicity, ecl:205-208, without
    * duplicate rows). Single ascending pass, O(max word length) state.
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
  def buildTrie(partitionId: Int, sortedWords: Iterator[String]): Iterator[PTNode] =
    buildTrieCounted(partitionId, sortedWords.map((_, 1L)))

  /** Weighted form of [[buildTrie]]: each input row carries a
    * pre-aggregated occurrence count (runs of equal words SUM their
    * counts into one end-cap). This is what makes incremental
    * maintenance cheap: a trie decomposes losslessly into
    * (word, n_occurrences) end-caps, so merging new corpus slices
    * rebuilds from vocabulary-sized weighted words, never the raw
    * corpus (PrefixTree.merge).
    */
  def buildTrieCounted(
      partitionId: Int,
      sortedWordCounts: Iterator[(String, Long)]
  ): Iterator[PTNode] = {
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
      // never split a surrogate pair: if the divergence lands on the low
      // half (both strings share the high half at i-1), back up so the
      // edge boundary stays on a code-point boundary
      if (i > 0 && i < m && Character.isHighSurrogate(a.charAt(i - 1))) i -= 1
      i
    }

    def insert(w: String, count: Long): Unit = {
      val wlen = cpLen(w) // _max/_min are code-point lengths (query parity)
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
        if (wlen < o.minLen) o.minLen = wlen
        if (wlen > o.maxLen) o.maxLen = wlen
        s = s.tail
      }
      // 4. open the new edge for w's suffix (div < w.length always holds
      //    for sorted distinct input) and emit w's end-cap under it
      val parent = if (stack.isEmpty) 0L else stack.head.id
      val fresh = new Open(div, w.substring(div), nextId(), parent, wlen, wlen)
      stack = fresh :: stack
      out += PTNode(nextId(), fresh.id, wlen, wlen, is_word = true, partitionId, w,
        n_occurrences = count)
      prev = w
    }

    new Iterator[PTNode] {
      private var idx = 0
      private var done = false
      private var lookahead: (String, Long) = null
      private def fill(): Unit = {
        if (idx >= out.length) { out.clear(); idx = 0 }
        while (idx >= out.length && !done) {
          var w = lookahead
          lookahead = null
          if (w == null && sortedWordCounts.hasNext) w = sortedWordCounts.next()
          if (w == null) { // input exhausted: finalize the remaining path
            while (stack.nonEmpty) { emit(stack.head); stack = stack.tail }
            done = true
          } else {
            // sorted input: all rows of this word are adjacent - consume
            // the whole run and fold the counts into one end-cap
            var count = w._2
            while (lookahead == null && sortedWordCounts.hasNext) {
              val nxt = sortedWordCounts.next()
              if (nxt._1 == w._1) count += nxt._2 else lookahead = nxt
            }
            insert(w._1, count)
          }
        }
      }
      def hasNext: Boolean = { fill(); idx < out.length }
      def next(): PTNode = { fill(); val r = out(idx); idx += 1; r }
    }
  }
}
