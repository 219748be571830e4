package graft.tools

import graft.operators.Dedup
import graft.streaming.StreamOps
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Diagnostic: Spark jobs launched by ONE steady-state intakeBatch —
  * the driver-overhead number ask #6 is about (jobs × micro-batches ×
  * streams multiplies at production cadence). */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val table = "jcp_hist"
    val outDir = spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") + "/jcp_out"
    val outP = new org.apache.hadoop.fs.Path(outDir)
    outP.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(outP, true)
    Dedup.dropIntakeHistory(spark, table)
    def docs(ids: Range) = ids.map(_.toLong).toDF("doc_id")
      .select($"doc_id", concat(lit("<p>"),
        array_join(transform(sequence(lit(0), lit(39)),
          i => concat(lit("tok"), $"doc_id", lit("w"), i)), " "),
        lit("</p>")).as("html"))
    // seed + fold so the measured batch is steady-state
    StreamOps.intakeBatch(docs(0 until 3000), 0L, table, 8, "html", "doc_id", outDir)
    Dedup.compactIntakeDelta(spark, table)
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = names.synchronized {
        names += s"job ${js.jobId}: [${js.stageInfos.map(si => si.name.takeWhile(_ != '(')).mkString(" | ")}] desc=${Option(js.properties.getProperty("spark.job.description")).getOrElse("").take(80)}"
      }
    }
    spark.sparkContext.addSparkListener(listener)
    StreamOps.intakeBatch(docs(3000 until 4500), 1L, table, 8, "html", "doc_id", outDir)
    Thread.sleep(2000) // let the listener bus drain
    spark.sparkContext.removeSparkListener(listener)
    println(s"[jobcount] intakeBatch steady-state jobs = ${names.size}")
    names.foreach(n => println(s"[jobcount]   $n"))
    spark.stop()
  }
}
