package graft.tools

import graft.operators.Dedup
import graft.streaming.StreamOps
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Diagnostic: Spark jobs launched by ONE steady-state intakeBatch —
  * the driver-overhead number ask #6 is about (jobs × micro-batches ×
  * streams multiplies at production cadence).
  *
  * `main("multimodal")` probes [[StreamOps.multimodalIntakeBatch]]
  * instead, and additionally reports the bytes held by cached
  * (localCheckpoint) blocks right after the measured batch — the
  * resident-blob-bytes number behind the r12 ask #5 barrier slimming. */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("multimodal")) { multimodal(); return }
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

  private def multimodal(): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Multimodal
    val table = "jcp_mm_hist"
    val outDir = spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") + "/jcp_mm_out"
    val outP = new org.apache.hadoop.fs.Path(outDir)
    outP.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(outP, true)
    StreamOps.dropMultimodalHistory(spark, table)
    // a mixed batch: one third each of images, audio clips, video clips
    def mixed(ids: Range) = {
      val f = ids.map(_.toLong).toDF("doc_id").select($"doc_id", $"doc_id".as("__seed"))
      Multimodal.syntheticPpmMixed(f.where($"doc_id" % 3 === 0), "__seed", 32, 32)
        .unionByName(Multimodal.syntheticWavPcm16(f.where($"doc_id" % 3 === 1), "__seed"))
        .unionByName(Multimodal.syntheticY4mBlocks(f.where($"doc_id" % 3 === 2), "__seed", 64, 32, 4))
        .select($"doc_id", $"payload")
    }
    // seed + fold every history so the measured batch is steady-state
    StreamOps.multimodalIntakeBatch(mixed(0 until 900), 0L, table, 8,
      "payload", "doc_id", outDir)
    graft.operators.Dedup.compactImageDelta(spark, table)
    graft.operators.Dedup.compactAudioDelta(spark, table)
    graft.operators.Dedup.compactVideoDelta(spark, table)
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = names.synchronized {
        names += s"job ${js.jobId}: [${js.stageInfos.map(si => si.name.takeWhile(_ != '(')).mkString(" | ")}] desc=${Option(js.properties.getProperty("spark.job.description")).getOrElse("").take(80)}"
      }
    }
    spark.sparkContext.addSparkListener(listener)
    StreamOps.multimodalIntakeBatch(mixed(900 until 1350), 1L, table, 8,
      "payload", "doc_id", outDir)
    // resident checkpoint bytes BEFORE the frames go out of scope —
    // the number the one-payload-checkpoint design bounds
    val cached = spark.sparkContext.getRDDStorageInfo
    val bytes = cached.map(i => i.memSize + i.diskSize).sum
    Thread.sleep(2000) // let the listener bus drain
    spark.sparkContext.removeSparkListener(listener)
    println(s"[jobcount] multimodalIntakeBatch steady-state jobs = ${names.size}")
    println(f"[jobcount] resident checkpoint blocks = ${cached.length}, bytes = $bytes%,d")
    cached.sortBy(-_.memSize).take(12).foreach(i =>
      println(f"[jobcount]   rdd ${i.id}: ${i.memSize + i.diskSize}%,d B  ${i.name}"))
    names.foreach(n => println(s"[jobcount]   $n"))
    spark.stop()
  }
}
