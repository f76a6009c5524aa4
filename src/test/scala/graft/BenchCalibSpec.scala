package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards for the PINNED bench calibration (r16, closing the r15
  * verdict's finding 2): the two-class statistic is comparable across
  * sessions only if both Bench and the CALIB probe read the SAME
  * committed class membership — so a new query must declare its class,
  * a removed query must not leave a stale row, and a hand-edited class
  * must not contradict the byte pair that justifies it. */
class BenchCalibSpec extends AnyFunSuite {

  test("every registered query declares a pinned bench class; no stale rows") {
    val qs = SparkEntry.queries.keySet
    val pinnedKeys = BenchCalib.pinned.keySet
    val missing = qs -- pinnedKeys
    assert(missing.isEmpty,
      "queries without a pinned bench class (regenerate " +
        s"src/main/resources/graft/bench_classes.tsv with graft.scale.PinClasses): ${missing.toSeq.sorted}")
    val stale = pinnedKeys -- qs
    assert(stale.isEmpty,
      s"pinned classes for queries that no longer exist: ${stale.toSeq.sorted}")
  }

  test("each pinned class agrees with its committed byte pair") {
    // the class must remain DERIVED (shuffle_write_bytes > input_bytes on
    // the pinned idle run), never hand-assigned against its own evidence
    val bad = BenchCalib.pinned.collect {
      case (n, p) if p.shuffle != (p.shuffleWriteBytes > p.inputBytes) => n
    }
    assert(bad.isEmpty,
      s"pinned class contradicts its committed byte pair: ${bad.toSeq.sorted}")
  }

  test("calibration constants are sane and pre-registered in-range") {
    assert(BenchCalib.RefScanWall > 0 && BenchCalib.RefShuffleWall > 0)
    // dampening exponents: 0 < lambda (a zero or negative exponent would
    // disable or invert the correction); scan's must DAMPEN (< 1, the
    // probe over-reacts) and shuffle's AMPLIFY (> 1, the probe
    // under-reacts) — the signs CALIB_r15 measured
    assert(BenchCalib.LambdaScan > 0 && BenchCalib.LambdaScan < 1,
      s"lambda_scan=${BenchCalib.LambdaScan} must dampen (CALIB_r15: scan probe over-reacts)")
    assert(BenchCalib.LambdaShuffle > 1 && BenchCalib.LambdaShuffle < 2,
      s"lambda_shuffle=${BenchCalib.LambdaShuffle} must amplify (CALIB_r15: shuffle probe under-reacts)")
  }
}
