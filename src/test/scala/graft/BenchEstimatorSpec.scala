package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contention-robust bench estimator (VERDICT r10 §next-3): runs
  * beyond 2× a query's own fastest successful run are sandbox
  * contention, not plan cost, and must not own the reported value.
  */
class BenchEstimatorSpec extends AnyFunSuite {

  test("the r10 contention series reports its fast mode, not 8.65 s") {
    // q_merge_classify_tally, BENCH_r10: plan unchanged since r9
    // (0.51 s), first two runs reproduce it, yet the plain median billed
    // the slow mode
    val (reported, raw) =
      Bench.robustMedian(Seq(0.75, 0.85, 16.9, 12.8, 8.6), nRuns = 5)
    assert(raw == 8.6)
    assert(reported == 0.85)
  }

  test("uncontended series: reported equals the plain median") {
    val (reported, raw) =
      Bench.robustMedian(Seq(1.0, 1.1, 0.9, 1.05, 0.95), nRuns = 5)
    assert(reported == raw && raw == 1.0)
  }

  test("slow warm-up mode (contended head): fast tail wins") {
    // q_sim_ivf_append, BENCH_r10: 21.5/19.3/2.1/2.4/1.9 -> medianed 2.4
    // while the warm ran 24.6; the robust form stays on the fast mode
    val (reported, _) =
      Bench.robustMedian(Seq(21.5, 19.3, 2.1, 2.4, 1.9), nRuns = 5)
    assert(reported == 2.1)
  }

  test("failed runs: NaN never counted; majority-failure reports -1") {
    val (r1, m1) = Bench.robustMedian(
      Seq(Double.NaN, 1.0, 1.2, Double.NaN, 1.1), nRuns = 5)
    assert(r1 == 1.1 && m1 == 1.1)
    assert(Bench.robustMedian(
      Seq(Double.NaN, Double.NaN, Double.NaN, 1.0, 1.1), nRuns = 5) ==
      ((-1.0, -1.0)))
  }

  test("property: reported value is within [min, 2*min] of successful runs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val runsGen = Gen.nonEmptyListOf(Gen.chooseNum(0.01, 100.0))
    val prop = Prop.forAll(runsGen) { runs =>
      val (reported, _) = Bench.robustMedian(runs, runs.length)
      reported < 0 || (reported >= runs.min && reported <= runs.min * 2.0)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
