package graft.tools

import graft.operators.Joins
import graft.sources.{SchemaEvolution, TestSources}
import graft.streaming.{FileSink, Stateful}
import org.apache.spark.sql._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.sql.Timestamp

/** Scratch driver (dev-only, test scope): drives the new streaming
  * operators through the live micro-batch runtime and prints what the
  * running engine produced. */
object StreamingDrive {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq: SQLContext = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)

    // T7: stateful running aggregate across micro-batches
    val ms7 = TestSources.memory[(Long, Double)]
    val q7 = Stateful.runningPerKey(ms7.toDS())
      .writeStream.format("memory").queryName("drive_t7")
      .outputMode(OutputMode.Update).start()
    ms7.addData((1L, 1.0), (1L, 2.0), (2L, 10.0)); q7.processAllAvailable()
    ms7.addData((1L, 3.0)); q7.processAllAvailable()
    q7.stop()
    println("T7 updates:")
    spark.table("drive_t7").orderBy("key", "n").show()

    // J10: stream-stream join with event-time bound
    val clicks = TestSources.memory[(Long, Timestamp)]
    val buys = TestSources.memory[(Long, Timestamp)]
    val j = Joins.streamStreamJoin(clicks.toDF.toDF("k", "click_ts"),
      buys.toDF.toDF("k", "buy_ts"), "k", "click_ts", "buy_ts",
      "10 minutes", "0 minutes", "30 minutes")
    val q10 = j.select(col("k"), col("click_ts"), col("buy_ts"))
      .writeStream.format("memory").queryName("drive_j10")
      .outputMode(OutputMode.Append).start()
    clicks.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:00")))
    buys.addData((1L, ts("2024-01-01 00:10:00")), (2L, ts("2024-01-01 02:00:00")))
    q10.processAllAvailable(); q10.stop()
    println("J10 joined rows (expect only k=1; k=2 buy is outside the 30-min bound):")
    spark.table("drive_j10").show()

    // S12+S13: schema drift across two landed batches, merged read
    val dir = java.nio.file.Files.createTempDirectory("drive_evo").toString
    FileSink.writeBatch(Seq((1L, "a")).toDF("id", "s"), "parquet", s"$dir/t")
    FileSink.writeBatch(Seq((2L, "b", 9.5)).toDF("id", "s", "score"), "parquet", s"$dir/t")
    println("S12 merged read over drifted files (old row reads NULL score):")
    SchemaEvolution.readEvolved(spark, s"$dir/t").orderBy("id").show()

    // S13 streaming file sink
    val msF = TestSources.memory[(Long, String)]
    msF.addData((10L, "x"), (11L, "y"))
    val qF = FileSink.writer(msF.toDF.toDF("id", "s"), "parquet",
      s"$dir/sink", s"$dir/ckpt", trigger = Trigger.AvailableNow()).start()
    qF.awaitTermination()
    println("S13 file-sink landed rows:")
    spark.read.parquet(s"$dir/sink").orderBy("id").show()
    println("S13 files: " + new java.io.File(s"$dir/sink").listFiles
      .map(_.getName).filter(_.endsWith(".parquet")).length + " parquet file(s)")

    // probe: J10 with a key that never matches + duplicate addData replay
    val out = spark.table("drive_j10").count()
    println(s"J10 row count: $out (k=99 never added on buy side)")
    spark.stop()
  }
}
