package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the physical plan of named registry queries (all of them when
  * no args) — the .explain feedback loop the scale notes are based on. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      println(s"==== $q ====")
      println(df.queryExecution.executedPlan.toString.linesIterator.take(45).mkString("\n"))
    }
    spark.stop()
  }
}
