package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Bench noise-disclosure arithmetic (r10 VERDICT ask #1): the
  * mid-sweep control blind spot is closed by bracketing controls plus
  * per-family micro ratios — this pins the pure math those fields are
  * computed with, including a synthetic-load scenario. */
class BenchMathSpec extends AnyFunSuite {

  test("median: true median on odd and even rep counts") {
    assert(BenchMath.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    // even N averages the middle pair — the lower-middle pick would
    // bias even-rep runs fast vs an odd-N baseline
    assert(BenchMath.median(Seq(4.0, 1.0, 2.0, 3.0)) === 2.5)
    assert(BenchMath.median(Seq(7.5)) === 7.5)
    intercept[IllegalArgumentException](BenchMath.median(Seq.empty))
  }

  test("familyOf: letter prefix + ordinal groups variant clusters") {
    assert(BenchMath.familyOf("l02h_probe_near_dedup") === "l02")
    assert(BenchMath.familyOf("l02d_minhash_planted_recall") === "l02")
    assert(BenchMath.familyOf("l04e_probe_indexed_topk") === "l04")
    assert(BenchMath.familyOf("q01_flagship") === "q01")
    assert(BenchMath.familyOf("w03_running") === "w03")
    assert(BenchMath.familyOf("a01_groupby") !== BenchMath.familyOf("a02_global"))
  }

  test("ratio: degenerate denominators and readings report 0.0, never Inf/NaN") {
    assert(BenchMath.ratio(2.0, 0.0) === 0.0)
    assert(BenchMath.ratio(0.0, 2.0) === 0.0)
    assert(BenchMath.ratio(-1.0, 2.0) === 0.0)
    assert(BenchMath.ratio(3.0, 2.0) === 1.5)
  }

  test("synthetic load: a mid-sweep episode elevates exactly the covered families") {
    // quiet box baseline 0.1 s; co-tenant lands during families l13/l14
    // (3x micro), then clears — the l13b-class spike row is covered by
    // its own family's ratio while the bracketing start/end controls
    // could both read quiet
    val microBase = 0.1
    val familyMicro = Seq(
      "a01" -> 0.10, "l02" -> 0.11, "l13" -> 0.30, "l14" -> 0.33,
      "l15" -> 0.10, "w03" -> 0.09)
    val ratios = BenchMath.familyRatios(familyMicro, microBase).toMap
    assert(math.abs(ratios("a01") - 1.0) < 1e-9)
    assert(math.abs(ratios("l13") - 3.0) < 1e-9)
    assert(math.abs(ratios("l14") - 3.3) < 1e-9)
    assert(math.abs(ratios("l15") - 1.0) < 1e-9)
    // the episode is disclosed: covered families > 2x, quiet ones ~1x
    assert(ratios.filter(_._2 > 2.0).keySet === Set("l13", "l14"))
  }

  test("parseFamilyRatio: extracts exactly the Bench-written shape, degrades to empty on anything else") {
    val line = """{"metric":"total","value":1.0,"family_micro":{"a01":0.1},"family_ratio":{"a01":1.25,"l02":2.0,"w03":0.9},"sf":"x"}"""
    assert(BenchMath.parseFamilyRatio(line) ===
      Map("a01" -> 1.25, "l02" -> 2.0, "w03" -> 0.9))
    // missing key / empty object / foreign content → empty, not a throw
    assert(BenchMath.parseFamilyRatio("""{"metric":"total"}""") === Map.empty)
    assert(BenchMath.parseFamilyRatio("""{"family_ratio":{}}""") === Map.empty)
    assert(BenchMath.parseFamilyRatio("not json at all") === Map.empty)
    // scientific notation round-trips
    assert(BenchMath.parseFamilyRatio("""{"family_ratio":{"a01":1.5E-1}}""")
      === Map("a01" -> 0.15))
  }

  test("familyVsQuiet: quiet signature divides out the stable teardown residue; new families pass raw") {
    // the canonical quiet run already read l14 at 2.0x (the documented
    // post-heavy-boundary teardown) — a fresh run reading l14 at 2.2x
    // is ~1.1 vs quiet (NOT an episode), while l16 jumping from a
    // quiet 1.0 to 4.0 IS one; l99 is new since the promotion and
    // passes through raw
    val quiet = Map("a01" -> 1.0, "l14" -> 2.0, "l16" -> 1.0)
    val current = Seq("a01" -> 1.1, "l14" -> 2.2, "l16" -> 4.0, "l99" -> 1.3)
    val vs = BenchMath.familyVsQuiet(current, quiet).toMap
    assert(math.abs(vs("a01") - 1.1) < 1e-9)
    assert(math.abs(vs("l14") - 1.1) < 1e-9)
    assert(math.abs(vs("l16") - 4.0) < 1e-9)
    assert(math.abs(vs("l99") - 1.3) < 1e-9)
    assert(vs.filter(_._2 >= 2.0).keySet === Set("l16"))
  }

  test("calibratedBase: median of all observations — neither the warm-up start nor one lucky minimum skews it") {
    // start median read 0.24 (JIT still warming), quiet sweep micros
    // center on 0.08 with one lucky 0.04 and a real 3x episode at 0.24:
    // a start-only base would report the episode as 1.0, a MIN base
    // (first r11 attempt) would flag every quiet family as 2x hot —
    // the median does neither
    val obs = Seq(0.08, 0.04, 0.24, 0.08, 0.09, 0.07, 0.08)
    val base = BenchMath.calibratedBase(0.24, obs)
    assert(base === 0.08)
    assert(math.abs(BenchMath.ratio(0.24, base) - 3.0) < 1e-9)
    assert(BenchMath.ratio(0.08, base) === 1.0)
    // the lucky minimum reads LOW, not everything else high
    assert(BenchMath.ratio(0.04, base) === 0.5)
    // zero (failed) readings are excluded, not adopted as a base
    assert(BenchMath.calibratedBase(0.0, Seq(0.0, 0.1)) === 0.1)
    assert(BenchMath.calibratedBase(0.0, Seq(0.0)) === 0.0)
  }
}
