package graft.tools

import graft.operators.Layout
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the z-order family at sf0.1: equi-width vs
  * quantile write cost (and the quantile approxQuantile share). */
object ZProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))
    time("warm")(li.count())
    val base = java.nio.file.Files.createTempDirectory("zprobe").toString
    for (rep <- 1 to 3) {
      time(s"equi-width write rep$rep")(
        Layout.writeZOrdered(li, s"$base/eq$rep", Seq("l_partkey", "l_suppkey"), 32))
      time(s"quantile  sketch rep$rep") {
        val d = li.select(col("l_partkey").cast("double").as("a"),
          col("l_suppkey").cast("double").as("b"))
        d.stat.approxQuantile("a", (1 to 63).map(_ / 64.0).toArray, 0.01)
        d.stat.approxQuantile("b", (1 to 63).map(_ / 64.0).toArray, 0.01)
      }
      time(s"quantile   write rep$rep")(
        Layout.writeZOrderedQuantile(li, s"$base/q$rep", Seq("l_partkey", "l_suppkey"), 32))
    }
  }
}
