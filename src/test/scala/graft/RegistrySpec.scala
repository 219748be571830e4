package graft

/** Regression guard for the eager-side-effect / lazy-read hazard class:
  * a registry query whose construction mutates storage (builds an
  * index, appends a delta, compacts) while the frame it RETURNS reads
  * that storage lazily. Spark 4 defers data-source resolution to final
  * analysis, so such a query constructs fine and only explodes when
  * someone analyzes the result — which Verify does inside a NonFatal
  * catch, i.e. the broken query silently drops out of CORRECTNESS
  * instead of failing loudly. Forcing `queryExecution.analyzed`
  * immediately after construction turns that whole class into a red
  * test at build time (this sweep reproduces the round-8 l04g break).
  *
  * Analysis resolves every source and name without executing the plan,
  * so the sweep stays cheap for the lazy majority; queries with eager
  * construction side effects pay their build once, at sf0.001. */
class RegistrySpec extends SparkSpec {

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"registry: $name analyzes immediately after construction") {
      val df = SparkEntry.queries(name)(spark, sf0001)
      // analysis (not execution): resolves relations, names, types —
      // exactly the step a storage-mutating construction can invalidate
      val analyzed = df.queryExecution.analyzed
      assert(analyzed.resolved, s"$name returned an unresolved plan")
      assert(df.columns.nonEmpty, s"$name produced a zero-column frame")
    }
  }

  test("registry: every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty,
      s"oracleSql entries without a query (driver would dump nothing): $orphans")
  }

  test("registry: flagship entry analyzes and keeps its driver contract") {
    val df = SparkEntry.entry(spark)
    assert(df.queryExecution.analyzed.resolved)
    assert(df.columns.nonEmpty)
  }
}
