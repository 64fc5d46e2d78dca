package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardOpsSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("globalOrderIndex: positions are exactly the in-memory sort ranks") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(500)(i => (i.toLong, rnd.nextInt(40)))
    val df = rows.toDF("id", "v").repartition(7) // scrambled input layout
    val got = ShardOps.globalOrderIndex(df, Seq($"v", $"id"))
      .select($"id", $"position").as[(Long, Long)].collect().toMap
    val expected = rows.sortBy { case (id, v) => (v, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> i.toLong }.toMap
    assert(got === expected)
  }

  test("epochShuffle: a permutation, epoch-dependent, layout-independent") {
    val df = (1L to 300L).toDF("doc_id")
    def positions(d: org.apache.spark.sql.DataFrame, epoch: Int): Map[Long, Long] =
      ShardOps.epochShuffle(d, "doc_id", epoch)
        .select($"doc_id", $"position").as[(Long, Long)].collect().toMap
    val e7 = positions(df, 7)
    // permutation: every position 0..n-1 exactly once
    assert(e7.values.toSeq.sorted === (0L until 300L))
    // reproducible under a different physical layout
    assert(positions(df.repartition(13), 7) === e7)
    // a different epoch is a different permutation
    assert(positions(df, 8) !== e7)
    // and matches the md5 order computed in-memory
    val expected = (1L to 300L).sortBy(id => (md5Hex(s"epoch7:$id"), id))
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(e7 === expected)
  }

  test("balancedShards: round-robin by size rank; cardinality within 1; totals tight") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(333)(i => (i.toLong, 50L + rnd.nextInt(5000)))
    val got = ShardOps.balancedShards(
        rows.toDF("doc_id", "n_chars").repartition(5), "n_chars", "doc_id", numShards = 8)
      .select($"doc_id", $"shard").as[(Long, Int)].collect().toMap
    val expected = rows.sortBy { case (id, n) => (-n, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i % 8) }.toMap
    assert(got === expected)
    val byShard = rows.groupBy(r => got(r._1))
    val cards = byShard.values.map(_.size)
    assert(cards.max - cards.min <= 1)
    // dealing neighbors in the size order into different shards keeps
    // totals within one max-document of each other
    val totals = byShard.values.map(_.map(_._2).sum)
    assert(totals.max - totals.min <= rows.map(_._2).max)
  }

  test("quantizeInt8: codes in range, extremes saturate, reconstruction within half-step") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector
      (3L, Array(3.0f, -3.0f, 1.5f, -0.1f))
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.quantizeInt8(vecs, "vec_id", "embedding")
      .select($"vec_id", $"scale", $"q").as[(Long, Double, Seq[Int])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // zero vector: scale 0, all-zero codes
    assert(got(2L)._1 === 0.0 && got(2L)._2.forall(_ == 0))
    // the max-magnitude element maps exactly to +-127
    assert(got(1L)._2(1) === -127 && got(3L)._2(0) === 127)
    for ((id, (scale, q)) <- got if scale > 0) {
      assert(q.forall(c => c >= -127 && c <= 127))
      val v = vecs.filter($"vec_id" === id).as[(Long, Seq[Float])].head()._2
      v.zip(q).foreach { case (x, c) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-9, s"vec $id elem $x -> $c")
      }
    }
  }

  /** In-memory winnowing reference (Schleimer et al. fig. 5 semantics:
    * window min, rightmost on ties), for cross-checking the distributed
    * window-function formulation.
    */
  private def winnowRef(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    // code-point shingles (Spark substr counts code points, not UTF-16
    // units - an emoji is ONE position), hashed over their UTF-8 bytes
    val cps = text.codePoints().toArray
    if (cps.length < k + w - 1) return Set.empty
    val hs = (1 to cps.length - k + 1).map { p =>
      p -> java.lang.Long.parseLong(md5Hex(new String(cps, p - 1, k)).take(8), 16)
    }
    (w to hs.length).map { e =>
      val win = hs.slice(e - w, e)
      val mn = win.map(_._2).min
      val (pos, h) = win.filter(_._2 == mn).last // rightmost minimum
      (pos, h)
    }.toSet
  }

  test("winnowFingerprints == in-memory reference; shared-substring guarantee") {
    val rnd = new scala.util.Random(31)
    val alpha = "abcd" // small alphabet forces hash ties within windows
    def randStr(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val shared = "the quick brown fox jumps"
    val texts = Seq(
      1L -> (randStr(30) + shared + randStr(25)),
      2L -> (randStr(40) + shared + randStr(10)),
      3L -> randStr(90),
      4L -> "tiny", // shorter than k: no fingerprints
      5L -> "aaaaaaaaaaaaaaaaaaaaaaaa", // all-equal hashes: pure tie-break path
      6L -> "abcdefghij", // k <= len < k + w - 1: shingles but NO full window
      // multi-byte path: 2-byte BMP chars and a 4-byte non-BMP emoji -
      // positions count CODE POINTS (Spark substr semantics), hashes
      // cover the shingle's UTF-8 bytes
      7L -> ("café y niño 😀 jalapeño " + randStr(20))
    )
    val got = TextOps.winnowFingerprints(texts.toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id", $"pos", $"fp").as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(r => (r._2, r._3)).toSet }
    for ((id, text) <- texts) {
      val exp = winnowRef(text, k = 8, w = 4)
      assert(got.getOrElse(id, Set.empty) === exp, s"doc $id")
    }
    // guarantee: a shared substring of length >= k + w - 1 (here 25 >= 11)
    // yields at least one common fingerprint hash
    val common = got(1L).map(_._2) intersect got(2L).map(_._2)
    assert(common.nonEmpty)
  }
}
