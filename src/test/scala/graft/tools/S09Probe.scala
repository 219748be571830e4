package graft.tools
import graft.sources.{ConnectorConfig, JdbcBridge, Tables}
import org.apache.spark.sql.functions._
object S09Probe {
  def time[T](l: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[s09probe] $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    spark.range(10).count()
    val url = "jdbc:derby:memory:graft_probe;create=true"
    for (rep <- 1 to 2) {
      val base = Tables.customer(spark, d)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))
      time(s"rep$rep overwrite")(JdbcBridge.overwrite(base, url, "customer_t", Seq("c_custkey")))
      val changes = base.where(col("c_custkey") % 10 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 1000.0)
        .unionByName(base.where(col("c_custkey") % 17 === 0)
          .withColumn("c_custkey", col("c_custkey") + 1000000L))
      time(s"rep$rep upsert")(JdbcBridge.upsert(changes, url, "customer_t", Seq("c_custkey")))
      time(s"rep$rep delete")(JdbcBridge.deleteKeys(base.where(col("c_custkey") % 100 === 0),
        url, "customer_t", Seq("c_custkey")))
      val cfg = ConnectorConfig.Config("s09", Map(
        "connection.url" -> url,
        "connection.driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
        "table" -> "customer_t", "partition.column" -> "c_custkey",
        "partition.lower.bound" -> "1", "partition.upper.bound" -> "2000000",
        "tasks.max" -> "4"))
      time(s"rep$rep read")(JdbcBridge.read(spark, cfg).orderBy(col("c_custkey"))
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
