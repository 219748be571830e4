package graft.tools

import graft.sources.ConnectorConfig
import org.apache.spark.sql.SparkSession

/** Scratch driver: feed the engine the reference's exact env contract
  * and watch the dispatched scans run (dev-only, test scope). */
object ConfigDrive {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val env = Map(
      "CONNECTOR_NAMES" -> "BULK INCR TSINC QUERY GHOST",
      "CONNECTOR_BULK" -> """{"mode": "bulk", "table": "nation"}""",
      "CONNECTOR_INCR" -> """{"mode": "incrementing", "table": "events", "incrementing.column.name": "event_id"}""",
      "CONNECTOR_TSINC" -> """{"mode": "timestamp+incrementing", "table": "events", "timestamp.column.name": "ts", "incrementing.column.name": "event_id"}""",
      "CONNECTOR_QUERY" -> """{"query": "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1"}""")
    val cfgs = ConnectorConfig.fromEnv(env)
    println("parsed connectors: " + cfgs.map(_.name).mkString(", ") + " (GHOST skipped: no config)")
    val d = "/root/testdata/sf0.001"
    cfgs.foreach { c =>
      val df = ConnectorConfig.sourceScan(spark, d, c,
        lastId = 500L, lastTs = java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      println(s"${c.name}: rows=${df.count()}")
    }
    // probe: malformed config fails loudly, unknown mode names itself
    try ConnectorConfig.parseFlatJson("""{"a": }""")
    catch { case e: IllegalArgumentException => println("malformed JSON → " + e.getMessage.take(60)) }
    try ConnectorConfig.sourceScan(spark, d, ConnectorConfig.Config("x", Map("mode" -> "wat", "table" -> "nation")))
    catch { case e: IllegalArgumentException => println("unknown mode → " + e.getMessage) }
    spark.stop()
  }
}
