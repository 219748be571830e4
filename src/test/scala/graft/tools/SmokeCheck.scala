object SmokeCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n (driver requires > 0)")
    spark.stop()
  }
}
