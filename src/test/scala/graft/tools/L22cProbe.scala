package graft.tools

import graft.functions.{TextFunctions => TF}
import graft.operators.{Dedup, NgramLm}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Segment timing for the l22c composition at sf0.1. */
object L22cProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[l22c] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.range(10).count()
    for (rep <- 1 to 2) {
      println(s"[l22c] --- rep $rep ---")
      val base = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      val mixed = base.select(col("doc_id"),
        when(col("doc_id") % 11 === 0,
          translate(col("text"), "abcdefghijklmnopqrstuvwxyz",
            "zyxwvutsrqponmlkjihgfedcba")).otherwise(col("text")).as("text"))
      val page = concat(lit("""<div class="nav"><ul><li><a href="/">Home</a></li></ul></div><div class="content"><p>"""),
        col("text"), lit("""</p></div><script>var n = 1;</script>"""))
      val cleaned = mixed.select(col("doc_id"),
        TF.normalizeText(TF.stripHtml(TF.extractContent(page))).as("clean"))
      val q = t("extract+quality+checkpoint") {
        cleaned.withColumn("quality", TF.qualityScore(col("clean")))
          .where(col("quality") >= 0.75).localCheckpoint(true)
      }
      val lm = t("train") {
        NgramLm.trainCharBigram(base.where(col("doc_id") % 3 === 0)
          .select(TF.normalizeText(col("text")).as("text")), "text")
      }
      val gated = NgramLm.scoreDocs(q, "clean", "doc_id", lm)
        .where(col("avg_logp") >= -3.0)
      t("score+gate materialize") { gated.write.format("noop").mode("overwrite").save() }
      val out = Dedup.exact(gated, "clean", "doc_id")
        .select(col("doc_id"), col("quality"), col("avg_logp"),
          TF.bpeishTokenCount(col("clean")).as("n_tok"))
        .orderBy(col("doc_id"))
      t("full tail (exact+tok+sort)") { out.write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
