package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contended-outlier rule (`Bench.contendedOutliers`):
  * driver artifacts in r8 (3 queries) and r9 (4 queries) carried 3-11×
  * phantom readings that all reproduced at neighborhood-normal times in
  * isolation — sustained machine contention that min-of-two timed runs
  * cannot defeat. The rule flags a query whose warm time exceeds 2.5×
  * the median of its 10-query alphabetical neighborhood for an
  * end-of-pass re-measure. */
class BenchSelfCorrectSpec extends AnyFunSuite {

  private def uniform(n: Int, t: Double): Seq[(String, Double)] =
    (0 until n).map(i => (f"q_$i%03d", t))

  test("a 3x spike over a uniform neighborhood is flagged") {
    val timings = uniform(30, 0.5).updated(14, ("q_014", 1.6))
    assert(Bench.contendedOutliers(timings) == Set("q_014"))
  }

  test("round-over-round drift: a sub-second 2.1x move invisible to " +
      "the neighborhood median is flagged against the prior round") {
    // the r12 q_dedup_url shape: 0.38 -> 0.80 s in a ~0.5 s
    // neighborhood — median-normal, still a real drift candidate
    val timings = uniform(30, 0.5).updated(14, ("q_014", 0.80))
    assert(Bench.contendedOutliers(timings).isEmpty)
    val prior = timings.map { case (n, _) => n -> 0.38 }.toMap
    assert(Bench.driftOutliers(timings, prior) == Set("q_014"))
    // the 0.2 s floor keeps micro-query jitter out, and a query with
    // no prior reading (new this round) is never flagged
    assert(Bench.driftOutliers(Seq(("q_new", 0.15)),
      Map("q_new" -> 0.05)).isEmpty)
    assert(Bench.driftOutliers(Seq(("q_added", 5.0)), prior).isEmpty)
  }

  test("priorWarmMap ignores files at a different sf and parses the " +
      "hand-written single-line format") {
    // exercised against the repo's real committed artifacts: the
    // newest BENCH_full_r*.json is an sf0.1 record, so an sf0.1 lookup
    // finds it and a bogus-sf lookup finds nothing
    val real = Bench.priorWarmMap("/root/testdata/sf0.1")
    assert(real.nonEmpty && real.values.forall(_ >= 0.0))
    assert(Bench.priorWarmMap("/no/such/sf").isEmpty)
  }

  test("r9's actual driver artifact shape: four contended phantoms " +
      "flagged, the genuinely expensive queries are not") {
    // modeled on BENCH_full_r10.json: ~0.5s neighborhood, 1.5-2.9s
    // phantoms (isolated reproductions 0.42-0.65s), plus a real 2.3s
    // classifier query sitting in a neighborhood of other 1.4-2.4s
    // heavy queries
    val base = uniform(40, 0.5)
    val withPhantoms = base
      .updated(5, ("q_005", 2.86)) // q_rpm_cmp_native's 4.5x reading
      .updated(17, ("q_017", 1.95))
      .updated(29, ("q_029", 1.61))
    // a heavy-but-real block: neighbors are also expensive, so the
    // neighborhood median rises and nothing in the block is flagged
    val heavyBlock = withPhantoms ++ Seq(
      ("q_h00", 2.30), ("q_h01", 1.50), ("q_h02", 1.40), ("q_h03", 2.40),
      ("q_h04", 1.45), ("q_h05", 1.80), ("q_h06", 1.60), ("q_h07", 2.10),
      ("q_h08", 1.55), ("q_h09", 1.90))
    val flagged = Bench.contendedOutliers(heavyBlock)
    assert(Set("q_005", "q_017", "q_029").subsetOf(flagged))
    // interior heavy queries (neighborhood is itself heavy) are not
    // flagged — only the block-boundary query may pick up a harmless
    // extra re-measure from its half-cheap neighborhood
    assert((flagged & Set("q_h03", "q_h05", "q_h07", "q_h09")).isEmpty)
  }

  test("edge windows clamp instead of shrinking: first and last " +
      "queries still compare against a full 10-wide neighborhood") {
    val first = uniform(20, 0.4).updated(0, ("q_000", 1.5))
    assert(Bench.contendedOutliers(first) == Set("q_000"))
    val last = uniform(20, 0.4).updated(19, ("q_019", 1.5))
    assert(Bench.contendedOutliers(last) == Set("q_019"))
  }

  test("sub-noise timings never flag each other (50ms median floor)") {
    // 10ms neighborhood with one 40ms query: 4x the median but under
    // the floor x factor
    val tiny = uniform(15, 0.01).updated(7, ("q_007", 0.04))
    assert(Bench.contendedOutliers(tiny).isEmpty)
  }

  test("only a re-measure that beats the first reading is reported " +
      "contended; a confirmed expensive query is not") {
    // r9's actual phantom ratios (driver vs isolated)
    assert(Bench.confirmedContended(2.86, 0.63))
    assert(Bench.confirmedContended(1.61, 0.42))
    // a flagged-but-confirmed heavy query: re-measure within noise of
    // the first reading must NOT be reported
    assert(!Bench.confirmedContended(2.15, 2.10))
    assert(!Bench.confirmedContended(0.69, 0.66))
    // boundary: exactly 25% faster is the first reported margin
    assert(Bench.confirmedContended(1.25, 0.99))
    assert(!Bench.confirmedContended(1.25, 1.01))
  }

  test("tiny suites are left alone") {
    assert(Bench.contendedOutliers(Seq(("a", 0.1), ("b", 9.9))).isEmpty)
  }
}
