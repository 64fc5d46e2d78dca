package graft.ptree

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Pure-kernel tests: no Spark. Oracle = textbook full-matrix Levenshtein. */
object BruteLev {
  def lev(a: String, b: String): Int = {
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    for (j <- 0 to b.length) prev(j) = j
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  def bruteSearch(dict: Set[String], q: String, k: Int): Set[(String, Int)] =
    dict.map(w => (w, lev(q, w))).filter(_._2 <= k)

  def trieOf(dict: Set[String]): Map[Long, Array[PTNode]] =
    Kernels
      .buildTrie(0, dict.toSeq.sorted.iterator)
      .toArray
      .groupBy(_.parent_id)

  def trieSearch(dict: Set[String], q: String, k: Int): Set[(String, Int)] = {
    val idx = trieOf(dict)
    Kernels.search(q, k, idx.getOrElse(_, null)).toSet
  }
}

class KernelsSpec extends AnyFunSuite {
  import BruteLev._

  test("extendRow matches full-matrix levenshtein char by char") {
    val cases = Seq(("kitten", "sitting"), ("dog", "drop"), ("", "abc"), ("abc", ""), ("abc", "abc"))
    for ((q, w) <- cases) {
      var row = Kernels.initRow(q.length)
      var consumed = 0
      for (c <- w) {
        val (r2, _) = Kernels.extendRow(q, c.toString, row, consumed, 100)
        row = r2; consumed += 1
      }
      assert(Kernels.finalDistance(row) == lev(w, q), s"q=$q w=$w")
    }
  }

  test("extendRow over a multi-char edge == char-by-char") {
    val q = "dogma"
    val whole = Kernels.extendRow(q, "drops", Kernels.initRow(q.length), 0, 100)
    var row = Kernels.initRow(q.length); var c = 0
    for (ch <- "drops") { row = Kernels.extendRow(q, ch.toString, row, c, 100)._1; c += 1 }
    assert(whole._1.toSeq == row.toSeq)
    assert(whole._2 == row.min)
  }

  test("banded extendRow: saturated cells never hide a true match") {
    // band k=1 over a long query: exact distances <= k survive; cells
    // outside the band report k+1 (saturation), never an undercount
    val q = "abcdefgh"
    for (k <- 0 to 3; w <- Seq("abcdefgh", "abcdefg", "abcdefghx", "abxdefgh", "zzzzzzzz")) {
      val (row, mn) = Kernels.extendRow(q, w, Kernels.initRow(q.length), 0, k)
      val d = Kernels.finalDistance(row)
      val truth = lev(w, q)
      if (truth <= k) assert(d == truth, s"k=$k w=$w")
      else assert(d > k, s"k=$k w=$w")
      assert(mn <= d)
    }
  }

  // FIXTURES.md §2 micro-corpora -------------------------------------------

  test("no-share: multi-char root edges (reference bug B.q1 fixed)") {
    // reference computes d(dog, dog)=2 here via its stale-row bug; must be 0
    assert(trieSearch(Set("dog", "cat"), "dog", 1) == Set(("dog", 0)))
  }

  test("dup-prefix: dog/drop double-count guard") {
    assert(trieSearch(Set("dog", "drop"), "dog", 1) == Set(("dog", 0)))
    assert(trieSearch(Set("dog", "drop"), "dog", 2) == Set(("dog", 0), ("drop", 2)))
  }

  test("nested-prefix: words ending inside a path") {
    val d = Set("a", "ab", "abc")
    assert(trieSearch(d, "ab", 1) == Set(("a", 1), ("ab", 0), ("abc", 1)))
  }

  test("duplicates collapse to one end-cap") {
    val nodes = Kernels.buildTrie(0, Seq("cat", "dog", "dog").sorted.iterator).toArray
    assert(nodes.count(_.is_word) == 2)
  }

  test("trie structural invariants on a mixed corpus") {
    val dict = Set("a", "ab", "abc", "abd", "b", "bcd", "dog", "drop", "door", "doors")
    val nodes = Kernels.buildTrie(7, dict.toSeq.sorted.iterator).toArray
    val byId = nodes.map(n => n.id -> n).toMap
    // ids unique
    assert(byId.size == nodes.length)
    // every parent exists or is root
    assert(nodes.forall(n => n.parent_id == 0 || byId.contains(n.parent_id)))
    // end-caps reconstruct the word set
    assert(nodes.filter(_.is_word).map(_.node).toSet == dict)
    // edge labels along each end-cap's path concatenate to the word;
    // _min/_max bound the word length along the path
    for (cap <- nodes.filter(_.is_word)) {
      var acc = ""
      var cur = cap.parent_id
      while (cur != 0) {
        val n = byId(cur)
        acc = n.node + acc
        assert(n._min <= cap.node.length && cap.node.length <= n._max)
        cur = n.parent_id
      }
      assert(acc == cap.node, s"path of ${cap.node}")
    }
    // partition id seeding
    assert(nodes.forall(n => (n.id >> PTNode.PART_SHIFT) == 7))
  }

  test("band walks past a short query on a long edge (regression)") {
    // parent survives at the band edge, then a long edge pushes the band
    // entirely past the query end - must saturate, not overflow
    assert(trieSearch(Set("kaminski", "ka"), "ab", 2) == bruteSearch(Set("kaminski", "ka"), "ab", 2))
    assert(trieSearch(Set("abcdefghij"), "ab", 2) == Set.empty)
  }

  test("property: trie search == brute force") {
    val wordGen = for {
      n <- Gen.choose(1, 10)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString
    val dictGen = Gen.containerOfN[Set, String](12, wordGen)
    val prop = Prop.forAll(dictGen, wordGen, Gen.choose(0, 3)) {
      (dict: Set[String], q: String, k: Int) =>
        trieSearch(dict, q, k) == bruteSearch(dict, q, k)
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(300)
        .withInitialSeed(Seed(42L)),
      prop
    )
    assert(res.passed, res.status.toString)
  }
}
