package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` of named registry queries to files —
  * the plans/<round>/ evidence the optimization rounds commit
  * (`<outDir>/<query>_<tag>.txt`). Queries run their fixture side
  * effects (history/index builds) at the given SF while the plan is
  * resolved, so the dumped plan is the steady-state one the bench
  * times.
  *
  * Usage: PlanDump <outDir> <tag> <sfDir> <query> [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <outDir> <tag> <sfDir> <query>...")
    val Array(outDir, tag, sfDir) = args.take(3)
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (q <- args.drop(3)) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${q}_$tag.txt"), txt)
      println(s"[plandump] wrote $outDir/${q}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
