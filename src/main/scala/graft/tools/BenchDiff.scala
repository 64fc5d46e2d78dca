package graft.tools

/** Cross-run bench adjudicator: compares two bench_last.json artifacts
  * and flags a regression ONLY when the delta clears BOTH the 30%
  * threshold AND each run's own measured noise floor (the per-query
  * "spread" graft.Bench now persists - in A/B mode the disagreement of
  * two interleaved passes through identical code). This is the gate
  * that stops host-jitter 1.3-1.9x phantoms (observed repeatedly in
  * cross-round diffs, where re-runs land between the two readings)
  * from costing an adjudication re-run: identical code benched twice
  * back-to-back must flag ZERO queries.
  *
  * Usage: runMain graft.tools.BenchDiff <old.json> <new.json>
  * Exit 1 iff any flagged regression.
  */
object BenchDiff {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: BenchDiff <old.json> <new.json>")
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def load(p: String): (Map[String, Double], Map[String, Double]) = {
      val j = JsonMethods.parse(java.nio.file.Files.readString(java.nio.file.Paths.get(p)))
      def num(v: JValue): Double = v match {
        case JDouble(d) => d
        case JInt(i) => i.toDouble
        case JDecimal(d) => d.toDouble
        case JLong(l) => l.toDouble
        case other => sys.error(s"non-numeric bench value: $other")
      }
      def field(name: String): Map[String, Double] = j \ name match {
        case JObject(fs) => fs.map { case (k, v) => k -> num(v) }.toMap
        case _ => Map.empty
      }
      (field("queries"), field("spread"))
    }
    val (oldQ, oldS) = load(args(0))
    val (newQ, newS) = load(args(1))
    val flagged = newQ.keySet.intersect(oldQ.keySet).toSeq.sorted.flatMap { q =>
      val (o, n) = (oldQ(q), newQ(q))
      if (o <= 0 || n <= 0) None // errored in either run: not a timing diff
      else {
        val delta = n / o - 1.0
        // the delta of two independent minima carries BOTH runs' noise,
        // so the relative floor is the sum of the spreads (each one the
        // run's best-two disagreement); an artifact without spreads
        // (pre-round-9) gates on the 30% bar alone. The 0.5s ABSOLUTE
        // floor is scheduler/GC granularity on this host: sub-half-
        // second deltas on sub-second queries flip sign between
        // identical-code runs (measured: 13/159 spurious >30% flags in
        // one back-to-back pair, every one under 0.35s of delta) -
        // adjudicating those needs a bigger scale factor, not a diff
        val noise = oldS.getOrElse(q, 0.0) + newS.getOrElse(q, 0.0)
        if (delta > 0.30 && delta > noise && n - o > 0.5)
          Some(f"$q%-28s ${o}%7.2fs -> ${n}%7.2fs  +${delta * 100}%.0f%% (noise floor ${noise * 100}%.0f%%)")
        else None
      }
    }
    if (flagged.isEmpty) println(s"BenchDiff: 0 regressions across ${newQ.size} queries")
    else {
      println(s"BenchDiff: ${flagged.size} regression(s):")
      flagged.foreach(println)
      sys.exit(1)
    }
  }
}
