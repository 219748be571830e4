package graft.tools

import graft.operators.Dedup
import graft.sources.Tables
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Same-JVM A/B timings for candidate optimizations — co-tenant load on
  * this box shifts absolute numbers 3-5× across the day, so only
  * within-run comparisons are attributable to code. */
object AbProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    time("warm")(docs.count())

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // -- minhash signature: one-shot Column (hash subtree inlined 16x)
    //    vs materialized hash column (hash pass once per row) --
    val shingled = docs
      .withColumn("__toks", TF.tokens(col("text")))
      .select(col("doc_id"), TF.shingleSetOfTokens(col("__toks"), 3).as("sh"))
    for (rep <- 1 to 3) {
      time(s"sig one-shot   rep$rep")(
        noop(shingled.select(col("doc_id"),
          Dedup.minhashSignature(col("sh"), 16).as("sig"))))
      time(s"sig two-project rep$rep")(
        noop(shingled
          .withColumn("__hashes", Dedup.shingleHashes(col("sh")))
          .select(col("doc_id"),
            Dedup.minhashSignatureOfHashes(col("__hashes"), 16).as("sig"))))
    }
    // full candidate path (uses the two-project form internally now);
    // noop write, not count(): count() lets Catalyst prune the projected
    // jaccard column and undermeasure the verify join
    for (rep <- 1 to 2)
      time(s"minhash candidates rep$rep")(
        noop(Dedup.minhashCandidates(docs, "text", "doc_id")))

    // -- a04b formulations --
    val orders = Tables.orders(spark, d)
    for (rep <- 1 to 3) {
      time(s"a04b expand (approx+countDistinct one agg) rep$rep")(
        noop(orders.groupBy(col("o_orderstatus"))
          .agg(approx_count_distinct(col("o_custkey"), 0.01).as("approx_cust"),
            countDistinct(col("o_custkey")).as("exact_cust"))))
      time(s"a04b dedup-first rep$rep")(
        noop(orders.select(col("o_orderstatus"), col("o_custkey")).distinct()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("exact_cust"),
            approx_count_distinct(col("o_custkey"), 0.01).as("approx_cust"))))
    }
    // -- langId: scalar column (tokenizer re-inlined ~35x) vs the
    //    DataFrame-level form (tokens/hits/argmax materialized once) --
    for (rep <- 1 to 3) {
      time(s"langid scalar   rep$rep")(
        noop(docs.select(col("doc_id"), TF.langId(col("text")).as("pred_lang"))))
      time(s"langid df-level rep$rep")(
        noop(TF.withLangId(docs, "text").select(col("doc_id"), col("pred_lang"))))
      time(s"quality scalar   rep$rep")(
        noop(docs.select(col("doc_id"), TF.qualityScore(col("text")).as("q"),
          TF.fingerprint(col("text")).as("fp"))))
      time(s"quality df-level rep$rep")(
        noop(TF.withQuality(docs, "text").select(col("doc_id"), col("quality"), col("fp"))))
    }

    // -- charNgrams: substr-per-position (O(len^2) char scans) vs
    //    materialized char array + slice (O(len)) --
    println("[probe] split semantics: " + docs.select(split(lit("abc"), "")).head())
    for (rep <- 1 to 3) {
      time(s"char3 substr rep$rep")(
        noop(docs.select(col("doc_id"),
          size(array_distinct(TF.charNgramsHof(col("text"), 3))).as("n"))))
      time(s"char3 native rep$rep")(
        noop(docs.select(col("doc_id"),
          size(array_distinct(TF.charNgrams(col("text"), 3))).as("n"))))
    }
    spark.stop()
  }
}
