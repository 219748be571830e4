package graft.tools

import org.apache.spark.sql.DataFrame

/** Same-JVM attribution for the two suspect BENCH_r04 rows (VERDICT r4
  * "what's wrong" #2): `l05_text_stats` 8.6x and `l05b_langid` 5.4x over
  * baseline, with sibling `l05c_quality` (same tokenizer pipeline) UNDER
  * baseline — the noise hypothesis. Times all three registry queries plus
  * the flagship as a cross-check, medians of N in one JVM, so the
  * comparison is attributable to code rather than co-tenant load. */
object L05Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // same warm-up as Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.SparkEntry.queries("q01_flagship")(spark, d).count()
    val names = Seq("l05_text_stats", "l05b_langid", "l05c_quality", "q01_flagship")
    val results = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        noop(fn(spark, d))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.size / 2)
      println(f"[l05probe] $name%-22s median=${med}%.3f s  all=${times.map(t => f"$t%.2f").mkString(",")}")
      name -> med
    }
    println(s"[l05probe] baseline(BASELINE.md quiet-box): l05=0.42 l05b=0.63 l05c=0.90")
    results.foreach { case (n, m) => println(f"[l05probe] RATIO $n%-22s ${m}%.3f") }
    spark.stop()
  }
}
