package graft.tools

import org.apache.spark.sql._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamOps

/** Scratch driver: exercises the cdcSink versioned-snapshot store through
  * the real MemoryStream micro-batch runtime (dev-only, test scope). */
object CdcDrive {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq: SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long, Boolean)]
    val df = ms.toDF.toDF("id", "v", "seq", "tomb")
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString
    val q = StreamOps.cdcSink(df, dir + "/state", Seq("id"), Seq(col("seq")),
      col("tomb"), dir + "/ckpt").start()
    ms.addData((1L, "a", 1L, false), (2L, "b", 1L, false))
    q.processAllAvailable()
    ms.addData((1L, "a2", 2L, false), (2L, null, 2L, true), (3L, "c", 2L, false))
    q.processAllAvailable()
    q.stop()
    println("STATE AFTER 2 BATCHES:")
    StreamOps.readState(spark, dir + "/state", df.schema).orderBy("id").show()
    println("LAYOUT: " + new java.io.File(dir + "/state").listFiles.map(_.getName).sorted.mkString(", "))
    val replay = Seq((1L, "STALE", 1L, false)).toDF("id", "v", "seq", "tomb")
    println("REPLAY APPLIED? " + StreamOps.applyBatch(replay, 1L, dir + "/state",
      Seq("id"), Seq(col("seq")), col("tomb")))
    println("STATE AFTER REPLAY (must be unchanged):")
    StreamOps.readState(spark, dir + "/state", df.schema).orderBy("id").show()
    // schema drift: next batch carries a NEW column -> state widens
    val evolved = Seq((9L, "z", 3L, false, 9.5)).toDF("id", "v", "seq", "tomb", "score")
    StreamOps.applyBatch(evolved, 2L, dir + "/state", Seq("id"), Seq(col("seq")), col("tomb"))
    println("STATE AFTER SCHEMA-EVOLVING BATCH (old rows read NULL score):")
    StreamOps.readState(spark, dir + "/state", evolved.schema).orderBy("id").show()
    spark.stop()
  }
}
