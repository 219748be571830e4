package graft.tools

import graft.operators.{Decontaminate, Dedup, Multimodal, NgramLm, Similarity}
import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-command demo of the composed five-family intake loop — the
  * runnable form of README's operations runbook:
  *
  *   sbt "Test/runMain graft.tools.IntakeDemo"
  *
  * Seeds the frozen reference artifacts (clean-corpus char-bigram LM +
  * perplexity-bucket thresholds, eval n-gram table, eval multimodal
  * identity tables), streams three mixed micro-batches through
  * `mixedIntakeBatch` with every optional leg ON (boilerplate
  * extraction, paragraph dedup, bucket routing, text + multimodal
  * decontamination, the embedding SemDeDup leg), folds the histories,
  * and prints each batch's survivors against the expected outcome.
  *
  * Text uses a two-letter alphabet so the LM arithmetic is legible:
  * "ab" runs are what the clean reference teaches, "zq" runs are
  * gibberish the model has never seen — the score separation between
  * the head/middle/tail constructions is orders of magnitude wider
  * than the 1e-6 quantization grid, so the routing is deterministic. */
object IntakeDemo {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val hist = "demo_corpus"
    val evalGrams = "demo_eval_grams"
    val evalIds = "demo_eval_ids"
    val outDir = java.nio.file.Files.createTempDirectory("intake_demo_out").toString
    StreamOps.dropMixedHistory(spark, hist)
    Decontaminate.dropEvalGrams(spark, evalGrams)
    Decontaminate.dropEvalIdentities(spark, evalIds)

    // ---- frozen reference artifacts (step 1 of the runbook) --------
    println("== seeding frozen reference artifacts ==")
    val cleanRef = (900L until 910L).map(id => (id, "ab" * 30)).toDF("doc_id", "text")
    val lm = NgramLm.trainCharBigram(cleanRef, "text")
    // threshold reference: ten head-, ten middle-, ten tail-class docs
    val spread = ((0 until 10).map(i => (i.toLong, "ab" * 30)) ++
      (10 until 20).map(i => (i.toLong, "ab" * 10 + "zq" * 15)) ++
      (20 until 30).map(i => (i.toLong, "ab" * 2 + "zq" * 20)))
      .toDF("doc_id", "text")
    val th = NgramLm.bucketThresholds(
      NgramLm.scoreDocs(spread, "text", "doc_id", lm), "doc_id", ringPct = 100)
    println(s"  perplexity tercile boundaries: $th")
    val evalDocs = Seq((9001L, "secret eval answer tokens here")).toDF("doc_id", "text")
    Decontaminate.writeEvalGrams(spark, evalDocs, "text", evalGrams, n = 5)
    def ppm(id: Long, seed: Long) = Multimodal.syntheticPpmMixed(
      Seq((id, seed)).toDF("doc_id", "__seed"), "__seed", 16, 16)
    def png(id: Long, seed: Long) = Multimodal.syntheticPngMixed(
      Seq((id, seed)).toDF("doc_id", "__seed"), "__seed", 16, 16)
    def v(xs: Float*) = xs.toArray
    val evalVec = v(9f, 0f, 0f, 0f)
    val evalRows = ppm(9002L, 42L)
      .select($"doc_id", $"payload", lit(null).cast("array<float>").as("embedding"))
      .unionByName(Seq((9003L, evalVec)).toDF("doc_id", "embedding")
        .select($"doc_id", lit(null).cast("binary").as("payload"), $"embedding"))
    Decontaminate.writeEvalIdentities(spark, evalRows, "payload", "doc_id",
      evalIds, embCol = Some("embedding"))
    // trained quality classifier (the GPT-3/DCLM leg): positives = the
    // clean "ab"-run vocabulary, negatives = a spam vocabulary; docs of
    // unknown vocabulary score ~0.5 (bias) and pass the 0.3 gate
    val clf = graft.operators.QualityClassifier.train(
      ((970L to 975L).map(id => (id, "ab" * 30, 1)) ++
        (980L to 985L).map(id => (id, "spam offer click " * 10, 0)))
        .toDF("id", "text", "y"), "text", "id", "y",
      dim = 256, epochs = 2, lr = 0.5)
    println("  eval gram table + eval identity tables + quality classifier ready\n")

    // ---- the mixed batches (step 2: the stream) --------------------
    def page(paras: String*) = paras.map(p => s"<p>$p</p>").mkString
    def textRow(id: Long, html: String, url: String = null) =
      Seq((id, html, Option(url).getOrElse(s"http://demo$id.example.com/")))
        .toDF("doc_id", "html", "url")
        .select($"doc_id", $"html", $"url",
          lit(null).cast("binary").as("payload"),
          lit(null).cast("array<float>").as("embedding"))
    def payRow(df: DataFrame) = df.select($"doc_id",
      lit(null).cast("string").as("html"),
      lit(null).cast("string").as("url"), $"payload",
      lit(null).cast("array<float>").as("embedding"))
    def vecRow(id: Long, e: Array[Float]) = Seq((id, e)).toDF("doc_id", "embedding")
      .select($"doc_id", lit(null).cast("string").as("html"),
        lit(null).cast("string").as("url"),
        lit(null).cast("binary").as("payload"), $"embedding")
    def runBatch(n: Long, b: DataFrame): Set[Long] = {
      StreamOps.mixedIntakeBatch(b, n, hist, 4, "html", "payload", "doc_id",
        outDir, minQuality = 0.1, extractBoilerplate = true,
        paragraphDedup = true, lmBuckets = Some((lm, th, Set("head", "middle"))),
        decontaminate = Some((evalGrams, 5)), embCol = Some("embedding"),
        decontaminateMm = Some(evalIds), urlDedupCol = Some("url"),
        qualityModel = Some((clf, 300000L)))
      spark.read.parquet(s"$outDir/batch-$n")
        .select($"doc_id").as[Long].collect().toSet
    }
    def report(name: String, got: Set[Long], expect: Set[Long]): Unit = {
      val ok = if (got == expect) "OK " else "MISMATCH "
      println(s"  $ok$name survivors: ${got.toSeq.sorted.mkString(", ")}" +
        (if (got == expect) "" else s"  (expected ${expect.toSeq.sorted.mkString(", ")})"))
    }

    println("== batch 0: seeds every family ==")
    val footer = "ab" * 30 // the site-wide boilerplate paragraph
    val b0 = textRow(1L, page("ab" * 31, footer))
      .unionByName(textRow(2L, page(footer, "ab" * 32)))  // sheds the shared footer
      .unionByName(payRow(ppm(3L, 100L)))
      .unionByName(vecRow(4L, v(0f, 1f, 0f, 0f)))
    report("batch 0", runBatch(0L, b0), Set(1L, 2L, 3L, 4L))
    println("  (doc 1 keeps the shared footer paragraph; doc 2 reassembled without it)\n")

    println("== batch 1: one plant per leg ==")
    val b1 = textRow(10L, page("ab" * 33))                  // fresh → survives
      .unionByName(textRow(11L, page("ab" * 31)))           // exact copy of doc 1's body → hash history
      .unionByName(textRow(12L, page("ab" * 34, footer)))   // fresh body, shared footer → survives footer-less
      .unionByName(textRow(13L, page("ab" + "zq" * 10)))    // gibberish → tail bucket
      .unionByName(textRow(14L, page("ab" * 30 + " secret eval answer tokens here"))) // eval 5-gram
      .unionByName(payRow(png(15L, 100L)))                  // PNG re-encode of history image → _ph
      .unionByName(payRow(png(16L, 42L)))                   // PNG re-encode of the EVAL image
      .unionByName(payRow(ppm(17L, 200L)))                  // fresh image → survives
      .unionByName(vecRow(18L, v(0f, 2f, 0f, 0f)))          // 2x of history vector → _ei
      .unionByName(vecRow(19L, v(18f, 0f, 0f, 0f)))         // 2x of the EVAL vector
      .unionByName(vecRow(20L, v(0f, 0f, 3f, 0f)))          // fresh vector → survives
      .unionByName(textRow(21L, page("ab" * 36),            // canonical-URL dup of
        url = "HTTP://Demo10.example.com/#frag"))           //  doc 10 → url leg
      .unionByName(textRow(22L, page("spam offer click " * 12))) // trained-negative
                                                            //  vocabulary → classifier
    report("batch 1", runBatch(1L, b1), Set(10L, 12L, 17L, 20L))
    println("  (11 exact-dup, 13 tail-bucket, 14 eval-gram, 15 image-dup," +
      " 16 eval-image, 18 vector-dup, 19 eval-vector, 21 url-dup," +
      " 22 classifier-negative all dropped)\n")

    println("== maintenance (steps 3-4 of the runbook) ==")
    val folded = StreamOps.maintainMixedHistories(spark, hist, maxDeltaRatio = 1e-9)
    println(s"  folded families: ${folded.mkString(", ")}")
    val drift = Similarity.reclusterIfDrifted(spark, s"${hist}_ei", tau = 0.5)
    println(s"  embedding quantizer recluster triggered: ${drift._2}\n")

    println("== batch 2: replay-and-fold safety ==")
    val b2 = textRow(30L, page("ab" * 35))
      .unionByName(textRow(31L, page("ab" * 33)))           // copy of batch-1 survivor → post-fold history kill
      .unionByName(vecRow(32L, v(0f, 0f, 6f, 0f)))          // 2x of batch-1 vector → post-fold _ei kill
    report("batch 2", runBatch(2L, b2), Set(30L))
    println("  (31/32 died against the FOLDED histories)\n")

    println(s"survivor batches under $outDir; histories in spark-warehouse/${hist}_*")
    StreamOps.dropMixedHistory(spark, hist)
    Decontaminate.dropEvalGrams(spark, evalGrams)
    Decontaminate.dropEvalIdentities(spark, evalIds)
    spark.stop()
  }
}
