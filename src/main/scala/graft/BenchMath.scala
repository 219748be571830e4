package graft

/** Pure arithmetic behind [[Bench]]'s environment-noise disclosure —
  * extracted so the ratio/median/family logic is unit-testable without
  * running a sweep (BenchMathSpec).
  *
  * Why this exists: four straight rounds of judge adjudication went to
  * single-row driver spikes (r7 p04, r8 f07, r9 p04/p05/s16b/l16, r10
  * l13b 87 s in-sweep vs 2.9 s same-HEAD solo) that the START-only
  * `control_ratio` could not disclose — the controls ran before the
  * sweep, so a mid-sweep co-tenant episode was invisible. Bench now
  * (a) re-runs the controls AFTER the sweep (`controls_end` /
  * `control_ratio_end`) and (b) interleaves one ~0.1 s CPU-bound
  * micro-control at every query-family boundary (`family_ratio`), so a
  * spike row is covered by the ratio of its own family. The read
  * protocol (BASELINE.md): a row is environment noise if EITHER
  * bracketing control ratio OR its family's micro ratio is elevated. */
object BenchMath {

  /** True median — lower-middle picks on even N would bias even-rep
    * runs toward their faster half vs an odd-N baseline. */
  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of empty")
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** Query family = letter prefix + its 2-digit ordinal: `l02h_probe`
    * and `l02d_minhash_planted_recall` are both family `l02`, so one
    * micro-control prices each variant cluster (~45 families over the
    * 140-row registry ≈ 4-5 s of sweep overhead) — fine-grained enough
    * to bracket a single spiking row, coarse enough not to tax the
    * sweep. */
  def familyOf(name: String): String = {
    val letters = name.takeWhile(_.isLetter)
    letters + name.drop(letters.length).takeWhile(_.isDigit)
  }

  /** measured/base with the degenerate-denominator guard: 0.0 signals
    * "no reading", never Infinity/NaN into the driver's JSON parse. */
  def ratio(measured: Double, base: Double): Double =
    if (base <= 0.0 || measured <= 0.0) 0.0 else measured / base

  /** Per-family micro ratios against the start-of-run micro baseline —
    * self-calibrating (same JVM, same shape, no canonical constant):
    * family X's queries ran under ~familyRatios(X)× environment load. */
  def familyRatios(familyMicro: Seq[(String, Double)],
      microBase: Double): Seq[(String, Double)] =
    familyMicro.map { case (f, t) => f -> ratio(t, microBase) }

  /** The effective micro baseline: the MEDIAN positive reading across
    * the start-of-run median and every in-sweep observation. Both
    * extremes were tried and measured wrong on this box: the start-only
    * median reads 2-4x the warm in-sweep micros (JIT, post-BPE load
    * decay) and masks real episodes, while the global MINIMUM (first
    * r11 attempt) adopts one lucky scheduler outcome as "quiet" and
    * flags EVERY family ~2x hot — the ~0.1 s micro's own task-launch
    * jitter spans 2x. The median of all ~90 observations is robust to
    * both: a quiet run centers family ratios on ~1.0, an episode
    * covering less than half the sweep cannot move the denominator,
    * and an episode covering MORE than half is exactly what the
    * bracketing start/end control ratios disclose. Read threshold:
    * treat a family as hot at >= 2x (the residual micro jitter band is
    * ~0.5-2x; the adjudicated real episodes read 8-30x). */
  def calibratedBase(startBase: Double, observations: Seq[Double]): Double = {
    val pos = (startBase +: observations).filter(_ > 0.0)
    if (pos.isEmpty) 0.0 else median(pos)
  }

  /** Extract the `"family_ratio":{...}` map from a canonical
    * BENCH_FULL.json line. No JSON library on the classpath, so this
    * targets exactly the shape [[Bench]] itself writes (flat string →
    * number pairs, no nesting inside the object); anything else —
    * missing file content, missing key, foreign format — parses to
    * empty, which downgrades the vs-quiet comparison to neutral rather
    * than failing the bench. */
  def parseFamilyRatio(json: String): Map[String, Double] = {
    val obj = "\"family_ratio\":\\{([^}]*)\\}".r
    obj.findFirstMatchIn(json).map(_.group(1)) match {
      case None => Map.empty
      case Some(body) =>
        val pair = "\"([A-Za-z0-9_]+)\":(-?[0-9][-+0-9.eE]*)".r
        pair.findAllMatchIn(body)
          .flatMap(m => m.group(2).toDoubleOption.map(m.group(1) -> _)).toMap
    }
  }

  /** This run's family micro ratios divided by the QUIET (canonical)
    * run's — the field a judge diffs instead of re-deriving the stable
    * teardown signature from BASELINE prose: ~1 means the family ran
    * under the same residual load as the canonical promotion, >= 2
    * flags a disclosed episode over that family's stretch. Families
    * with no quiet reading (added since the promotion) divide by 1.0 —
    * their raw ratio IS the comparison until the next promotion. A
    * STORED quiet value <= 0.0 is [[ratio]]'s own "no reading" sentinel
    * (parseFamilyRatio happily parses it) and counts as missing too:
    * dividing by it would make ratio() return 0.0 and a genuinely hot
    * family read as "no reading", masking the episode. */
  def familyVsQuiet(current: Seq[(String, Double)],
      quiet: Map[String, Double]): Seq[(String, Double)] =
    current.map { case (f, r) =>
      f -> ratio(r, quiet.get(f).filter(_ > 0.0).getOrElse(1.0)) }
}
