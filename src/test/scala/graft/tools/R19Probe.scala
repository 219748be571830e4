package graft.tools

import graft.functions.{TextFunctions => TF}
import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Round-19 attribution probe: same-JVM timings of the sub-expressions
  * behind the slowest bench rows, so optimization effort lands where
  * the time actually goes (guide §1.1). Each leg runs twice; read the
  * SECOND number (codegen/JIT warm). */
object R19Probe {
  def time[T](label: String)(f: => T): Unit = {
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      f
      println(f"[r19] $label rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("docs scan")(noop(docs))
    time("tokens only")(noop(docs.select(col("doc_id"), TF.tokens(col("text")).as("t"))))
    time("gopher metrics")(noop(docs.select(col("doc_id"),
      graft.operators.GopherRules.metrics(col("text")).as("m"))))
    // l38 fixture + stages
    def own(a: Int, b: Int) = array_join(transform(sequence(lit(a), lit(b)),
      i => concat(lit("Tok"), col("doc_id").cast("string"),
        lit("w"), i.cast("string"))), " ")
    val sp = (0 until 60).map(j => s"SpanW$j").mkString(" ")
    val fix = docs.select(col("doc_id"),
      when(col("doc_id") % 10 === 0, concat(own(0, 39), lit(s" $sp "), own(40, 79)))
        .otherwise(own(0, 79)).as("text")).localCheckpoint(true)
    val k = 50
    val toks = col("__toks")
    // spelled "\u0001" (was a raw 0x01 byte — same string, invisible
    // in review; ADVICE r19 read it as the empty separator): the
    // timed expression is byte-identical to repeatedSpanDedup's
    val ghs = when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => xxhash64(concat_ws("\u0001", slice(toks, i + 1, lit(k))))))
      .otherwise(array().cast("array<bigint>"))
    time("l38 anchors only")(noop(fix.where(col("text").isNotNull)
      .withColumn("__toks", TF.tokens(col("text")))
      .select(col("doc_id"), posexplode(ghs))))
    time("l38 full operator")(noop(
      Dedup.repeatedSpanDedup(fix, "text", "doc_id", k = 50)))
    // minhash signature + candidates (the l02/l22b front)
    time("minhash candidates")(
      Dedup.minhashCandidates(docs, "text", "doc_id").count(): Unit)
    time("nearDupClusters")(noop(
      Dedup.nearDupClusters(docs, "text", "doc_id", 0.8)))
    // langid: training vs scoring split (l42 = train + score per rep)
    val langs = Seq("en", "de", "fr")
    val fx = docs.select(col("doc_id"), col("text"),
      concat(lit("l"), (col("doc_id") % 3).cast("string")).as("lang"))
      .withColumn("lang", element_at(typedLit(langs), (col("doc_id") % 3).cast("int") + 1))
      .localCheckpoint(true)
    time("langid train (K=3, dim 256, 2 epochs)") {
      graft.operators.LangId.train(fx, "text", "doc_id", "lang", langs,
        dim = 256, epochs = 2, lr = 0.5, ngram = 2): Unit
    }
    val m = graft.operators.LangId.train(fx, "text", "doc_id", "lang", langs,
      dim = 256, epochs = 2, lr = 0.5, ngram = 2)
    time("langid score corpus")(noop(fx.select(col("doc_id"),
      graft.operators.LangId.scoresMicro(col("text"), m).as("p"))))
    spark.stop()
  }
}
