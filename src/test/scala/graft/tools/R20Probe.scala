package graft.tools

import graft.operators.{Dedup, Multimodal}
import graft.streaming.StreamOps
import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Round-20 attribution probe: where the multimodal intake rows'
  * seconds actually go at sf0.1 scale (guide §1.1) — fixture synthesis,
  * the fused identity pass, each dedup stage, the survivor write, the
  * history appends. Each leg runs twice; read the SECOND number
  * (codegen/JIT warm). */
object R20Probe {
  def time[T](label: String)(f: => T): Unit = {
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      f
      println(f"[r20] $label rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, d).select(col("doc_id"))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    if (args.headOption.contains("text")) { text(spark, d); return }
    // the l31 fixture's batch-1 shape (fresh + re-encode plants)
    def modal(ids: DataFrame, reencode: Boolean): DataFrame = {
      val m0 = col("__seed") % 3 === 0
      val m1 = col("__seed") % 3 === 1
      val m2 = col("__seed") % 3 === 2
      val img =
        if (reencode) Multimodal.syntheticPngMixed(ids.where(m0), "__seed", 16, 16)
        else Multimodal.syntheticPpmMixed(ids.where(m0), "__seed", 16, 16)
      val aud =
        if (reencode) Multimodal.syntheticWavMulawTone(ids.where(m1), "__seed")
        else Multimodal.syntheticWavPcm16(ids.where(m1), "__seed")
      val vid =
        if (reencode) Multimodal.syntheticAviMjpegBlocks(ids.where(m2), "__seed", 64, 32, 4)
        else Multimodal.syntheticY4mBlocks(ids.where(m2), "__seed", 64, 32, 4)
      img.select(col("doc_id"), col("payload"))
        .unionByName(aud.select(col("doc_id"), col("payload")))
        .unionByName(vid.select(col("doc_id"), col("payload")))
    }
    val fresh = docs.where(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("doc_id").as("__seed"))
    val vsHist = docs.where(col("doc_id") % 2 === 0 && col("doc_id") % 10 === 0)
      .select((col("doc_id") + 200000).as("doc_id"), col("doc_id").as("__seed"))
    val within = docs.where(col("doc_id") % 2 === 1 && col("doc_id") % 7 === 0)
      .select((col("doc_id") + 300000).as("doc_id"), col("doc_id").as("__seed"))
    val batchPlan = modal(fresh, reencode = false)
      .unionByName(modal(vsHist, reencode = true))
      .unionByName(modal(within, reencode = true))
    println(s"[r20] batch rows = ${batchPlan.count()}")
    time("batch synthesis (noop)")(noop(batchPlan))
    val batch0 = batchPlan.localCheckpoint(true)
    time("identity pass (noop)")(noop(
      Multimodal.multimodalIdentities(batch0, "payload", "doc_id")))
    val ident0 = Multimodal.multimodalIdentities(batch0, "payload", "doc_id")
      .localCheckpoint(true)
    // history exists from a prior l31 run? Build a fresh one here.
    val table = "r20p_hist"
    StreamOps.dropMultimodalHistory(spark, table)
    val histIds = docs.where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("doc_id").as("__seed"))
    val hist0 = modal(histIds, reencode = false).localCheckpoint(true)
    Dedup.ensureImageHistory(spark, hist0, "payload", "doc_id", table, 8)
    Dedup.ensureAudioHistory(spark, hist0, "payload", "doc_id", table, 8)
    Dedup.ensureVideoHistory(spark, hist0, "payload", "doc_id", table, 8)
    val histIdent = Multimodal.multimodalIdentities(hist0, "payload", "doc_id")
      .localCheckpoint(true)
    Dedup.appendImageHistoryDeltaIdent(spark, histIdent, "doc_id", table, 0L)
    Dedup.appendAudioHistoryDeltaIdent(spark, histIdent, "doc_id", table, 0L)
    Dedup.appendVideoHistoryDeltaIdent(spark, histIdent, "doc_id", table, 0L)
    Dedup.compactImageDelta(spark, table)
    Dedup.compactAudioDelta(spark, table)
    Dedup.compactVideoDelta(spark, table)
    def keepMinIds(clusters: DataFrame): DataFrame =
      clusters.where(col("doc_id") === col("cluster")).select(col("doc_id"))
    def step(ids: DataFrame): DataFrame =
      ident0.join(broadcast(ids.select(col("doc_id"))
        .localCheckpoint(eager = true)), Seq("doc_id"), "left_semi")
    time("s2 image exact+incremental")(
      step(Dedup.imageIncrementalDeltaIdent(spark,
        Dedup.imageExactIdent(ident0, "doc_id"), table, "doc_id")).count(): Unit)
    val s2 = step(Dedup.imageIncrementalDeltaIdent(spark,
      Dedup.imageExactIdent(ident0, "doc_id"), table, "doc_id"))
    time("s3 audio clusters")(
      step(keepMinIds(Dedup.audioNearDupClustersIdent(s2, "doc_id"))).count(): Unit)
    val s3 = step(keepMinIds(Dedup.audioNearDupClustersIdent(s2, "doc_id")))
    time("s4 audio incremental")(
      step(Dedup.audioIncrementalDeltaIdent(spark, s3, table, "doc_id")).count(): Unit)
    val s4 = step(Dedup.audioIncrementalDeltaIdent(spark, s3, table, "doc_id"))
    time("s5 video clusters")(
      step(keepMinIds(Dedup.videoNearDupClustersIdent(s4, "doc_id"))).count(): Unit)
    val s5 = step(keepMinIds(Dedup.videoNearDupClustersIdent(s4, "doc_id")))
    time("s6 video incremental")(
      step(Dedup.videoIncrementalDeltaIdent(spark, s5, table, "doc_id")).count(): Unit)
    val s6 = step(Dedup.videoIncrementalDeltaIdent(spark, s5, table, "doc_id"))
    val outDir = spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") + "/r20p_out"
    time("survivor write")(
      batch0.join(broadcast(s6.select(col("doc_id"))), Seq("doc_id"), "left_semi")
        .write.mode("overwrite").parquet(s"$outDir/batch-1"))
    time("append image (ident)")(
      Dedup.appendImageHistoryDeltaIdent(spark, s6, "doc_id", table, 1L))
    time("append audio (ident)")(
      Dedup.appendAudioHistoryDeltaIdent(spark, s6, "doc_id", table, 1L))
    time("append video (ident)")(
      Dedup.appendVideoHistoryDeltaIdent(spark, s6, "doc_id", table, 1L))
    // the whole loop, steady state, both histories folded
    time("multimodalIntakeBatch (whole)")({
      val hconf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(s"$outDir/_LATEST")
      p.getFileSystem(hconf).delete(p, false)
      StreamOps.multimodalIntakeBatch(batchPlan, 1L, table, 8, "payload",
        "doc_id", outDir): Unit
    })
    StreamOps.dropMultimodalHistory(spark, table)
    spark.stop()
  }

  /** Piece-wise attribution of ONE steady-state text intake micro-batch
    * (the l23b shape): clean/score front half, exact legs, LSH legs,
    * survivor write, the three history-delta appends. */
  private def text(spark: SparkSession, d: String): Unit = {
    import graft.functions.{TextFunctions => TF}
    val docs = graft.sources.Tables.documents(spark, d).select(col("doc_id"))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val clean = when(col("doc_id") % 11 === 0, lit("tiny low quality"))
      .otherwise(array_join(transform(sequence(lit(0), lit(39)),
        i => concat(lit("tok"), col("doc_id").cast("string"),
          lit("word"), i.cast("string"))), " "))
    val fx = docs.select(col("doc_id"), clean.as("__clean"))
    def wrap(c: org.apache.spark.sql.Column) = concat(lit("<p class=\"x\">"), c,
      lit("</p><script>var j = \"<q>\";</script>"))
    val table = "r20p_text_hist"
    val outDir = spark.conf.get("spark.sql.warehouse.dir")
      .stripSuffix("/") + "/r20p_text_out"
    Dedup.dropIntakeHistory(spark, table)
    val outP = new org.apache.hadoop.fs.Path(outDir)
    outP.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(outP, true)
    StreamOps.intakeBatch(fx.where(col("doc_id") % 3 =!= 1)
        .select(col("doc_id"), wrap(col("__clean")).as("html")),
      0L, table, 8, "html", "doc_id", outDir)
    Dedup.compactIntakeDelta(spark, table)
    val b1 = fx.where(col("doc_id") % 3 === 1)
      .select(col("doc_id"), wrap(col("__clean")).as("html"))
      .unionByName(fx.where(col("doc_id") % 3 === 0 && col("doc_id") % 5 === 0)
        .select((col("doc_id") + 300000).as("doc_id"), wrap(col("__clean")).as("html")))
      .unionByName(fx.where(col("doc_id") % 3 === 0 && col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          wrap(concat(col("__clean"), lit(" zzextra"))).as("html")))
    println(s"[r20] text batch rows = ${b1.count()}")
    // the front half: strip -> normalize -> quality gate
    val cleaned = b1.select(col("doc_id"),
      TF.normalizeText(TF.stripHtml(col("html"))).as("text"))
    time("clean front half (noop)")(noop(cleaned))
    val scored = TF.withQualityOnly(cleaned, "text")
      .where(col("quality") >= 0.75)
    time("clean+score (noop)")(noop(scored))
    val scored0 = scored.localCheckpoint(true)
    time("exact within (noop)")(noop(Dedup.exact(scored0, "text", "doc_id")))
    val exactW = Dedup.exact(scored0, "text", "doc_id")
    time("exact incremental + ckpt")(
      Dedup.exactIncrementalDelta(spark, exactW, table, "text", "doc_id")
        .localCheckpoint(true): Unit)
    val exactNew = Dedup.exactIncrementalDelta(spark, exactW, table,
      "text", "doc_id").localCheckpoint(true)
    time("near within (noop)")(
      noop(Dedup.nearDedupMinhash(exactNew, "text", "doc_id", 0.8)))
    val nearW = Dedup.nearDedupMinhash(exactNew, "text", "doc_id", 0.8)
    time("near incremental (noop)")(
      noop(Dedup.nearDedupIncremental(spark, nearW, table, "text", "doc_id", 0.8)))
    val outFrame = Dedup.nearDedupIncremental(spark, nearW, table,
      "text", "doc_id", 0.8)
    time("survivor write")(
      outFrame.write.mode("overwrite").parquet(s"$outDir/batch-9"))
    val survivors = spark.read.schema(outFrame.schema).parquet(s"$outDir/batch-9")
    time("append band+sh delta")(
      Dedup.appendBandHistoryDelta(spark, survivors, "text", "doc_id", table, 9L))
    time("append hash delta")(
      Dedup.appendHashHistoryDelta(spark, survivors, "text", "doc_id", table, 9L))
    time("intakeBatch (whole, steady)")({
      val hconf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(s"$outDir/_LATEST")
      p.getFileSystem(hconf).delete(p, false)
      StreamOps.intakeBatch(b1, 1L, table, 8, "html", "doc_id", outDir): Unit
    })
    Dedup.dropIntakeHistory(spark, table)
    spark.stop()
  }
}
