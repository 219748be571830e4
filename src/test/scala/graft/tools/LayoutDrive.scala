package graft.tools

import graft.operators.Layout
import graft.sources.Tables
import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Scratch driver: show the bucketed-join plan and salted-join spread
  * through the live engine (dev-only, test scope). */
object LayoutDrive {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, d).select(col("o_custkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, d)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    Layout.writeBucketed(orders, "drv_orders_b", Seq("o_custkey"), 8)
    Layout.writeBucketed(cust, "drv_cust_b", Seq("o_custkey"), 8)
    val j = Layout.bucketedJoin(spark, "drv_orders_b", "drv_cust_b", Seq("o_custkey"))
    println("bucketed join rows = " + j.count())
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    println("plan contains Exchange? " + plan.contains("Exchange"))
    println(plan.linesIterator.filter(l => l.contains("Join") || l.contains("Scan") || l.contains("Exchange")).take(6).mkString("\n"))
    // plain (non-bucketed) comparison: same join MUST shuffle
    val plain = orders.join(cust, Seq("o_custkey"))
    plain.collect()
    println("non-bucketed plan contains Exchange? " +
      plain.queryExecution.executedPlan.toString.contains("Exchange"))
    // salted join: key spread across salts
    val salted = Layout.saltedJoin(Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey")), cust, "o_custkey", 7)
    println("salted rows = " + salted.count() + " vs plain = " + plain.count())
    spark.sql("DROP TABLE IF EXISTS drv_orders_b")
    spark.sql("DROP TABLE IF EXISTS drv_cust_b")
    spark.stop()
  }
}
