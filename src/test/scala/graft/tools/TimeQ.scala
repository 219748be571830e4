package graft.tools
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    spark.range(10).count()
    for (name <- args; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d).write.format("noop").mode("overwrite").save()
      println(f"[timeq] $name rep$rep ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
