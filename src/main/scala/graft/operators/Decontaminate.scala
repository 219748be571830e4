package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval DECONTAMINATION against a FROZEN eval-set n-gram table —
  * the intake-side counterpart of the l11 batch contamination check: a
  * document is contaminated when ANY of its token n-grams appears in
  * the eval set (the standard public rule — the GPT-3 appendix-C /
  * Dolma decontamination pass), and contaminated documents are dropped
  * before they can enter a training corpus.
  *
  * Unlike the dedup histories, the eval gram table is a REFERENCE set:
  * written once from the frozen eval corpus, never appended per batch —
  * so there is no delta/fold machinery here, just a bucketed table and
  * a probe.
  *
  * Scale shape (the probe, per micro-batch): the batch explodes to its
  * distinct per-doc grams (bounded by batch tokens), those BROADCAST
  * into a semi-join against the bucketed gram table (eval side never
  * exchanges), the matching grams broadcast back to tag contaminated
  * doc ids, and a final broadcast anti-join drops them. At 100 TB of
  * accumulated corpus the eval set stays eval-sized (thousands of
  * benchmark docs), so every join side that moves is batch-bounded. */
object Decontaminate {

  /** Persist the eval corpus's DISTINCT token n-grams, bucketed on the
    * gram — one pass over the (eval-sized) corpus; rebuild whenever the
    * eval set itself changes. Tokens are the portable lowercase
    * whitespace split ([[TF.tokens]]), grams space-joined — the exact
    * representation the l11 oracle restates in SQL. */
  def writeEvalGrams(spark: org.apache.spark.sql.SparkSession,
      evalDocs: DataFrame, textCol: String, table: String, n: Int = 5,
      numBuckets: Int = 16): Unit = {
    val grams = evalDocs
      .select(explode(array_distinct(
        TF.ngramsOfTokens(TF.tokens(col(textCol)), n))).as("gram"))
      .distinct()
    Layout.writeBucketed(grams, table, Seq("gram"), numBuckets)
  }

  /** Drop every `docs` row sharing at least one token n-gram with the
    * persisted eval set. Documents with fewer than `n` tokens have no
    * grams and PASS (no evidence — the multimodal identity convention);
    * NULL text likewise. `n` must match the build. */
  def dropContaminated(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, textCol: String, idCol: String, table: String,
      n: Int = 5): DataFrame = {
    val g = graft.Cols.fresh(docs.columns :+ "gram", "__gram")
    val batchGrams = docs.select(col(idCol), explode(array_distinct(
        TF.ngramsOfTokens(TF.tokens(col(textCol)), n))).as(g))
      // barrier: the gram frame feeds the eval semi-join AND the
      // contaminated-id tagging — without it the tokenizer + explode
      // run once per consumer. Batch-sized (distinct grams per doc).
      .localCheckpoint(eager = true)
    val hits = spark.table(table)
      .join(broadcast(batchGrams.select(col(g)).distinct()),
        col("gram") === col(g), "left_semi")
    val contaminated = batchGrams
      .join(broadcast(hits), col(g) === col("gram"), "left_semi")
      .select(col(idCol)).distinct()
    docs.join(broadcast(contaminated), Seq(idCol), "left_anti")
  }

  /** Drop an eval gram table (and its warehouse location). */
  def dropEvalGrams(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit =
    Layout.dropTableAndLocation(spark, table)
}
