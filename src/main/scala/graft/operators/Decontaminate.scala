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
  * Grams are stored and probed as 64-bit hashes (`xxhash64`), the
  * standard production form (Dolma uses a Bloom filter over hashed
  * grams): 8 bytes per gram cross the shuffle instead of the gram
  * string, and the only cost is a 2^-64-per-pair false-positive rate —
  * astronomically below the fixture's and any real corpus's pair
  * counts (a false positive merely over-drops one doc).
  *
  * Scale shape (the probe, per micro-batch): the batch explodes to its
  * distinct per-doc gram HASHES and shuffles those (id, hash) pairs —
  * uniform key, 16 bytes a row — into a semi-join against the
  * hash-bucketed eval table, which reads its bucket files with NO
  * exchange; the surviving ids (≤ batch docs) broadcast into the final
  * anti-join. One pass over the batch, nothing driver-side, and the
  * eval side never moves no matter how large the accumulated corpus
  * gets. */
object Decontaminate {

  /** Persist the eval corpus's DISTINCT token n-gram hashes, bucketed
    * on the hash — one pass over the (eval-sized) corpus; rebuild
    * whenever the eval set itself changes. Tokens are the portable
    * lowercase whitespace split ([[TF.tokens]]), grams space-joined —
    * the exact representation the l11 oracle restates in SQL. */
  def writeEvalGrams(spark: org.apache.spark.sql.SparkSession,
      evalDocs: DataFrame, textCol: String, table: String, n: Int = 5,
      numBuckets: Int = 16): Unit = {
    val grams = evalDocs
      .select(explode(array_distinct(
        TF.ngramsOfTokens(TF.tokens(col(textCol)), n))).as("__g"))
      .select(xxhash64(col("__g")).as("gramh"))
      .distinct()
    Layout.writeBucketed(grams, table, Seq("gramh"), numBuckets)
  }

  /** Drop every `docs` row sharing at least one token n-gram with the
    * persisted eval set. Documents with fewer than `n` tokens have no
    * grams and PASS (no evidence — the multimodal identity convention);
    * NULL text likewise. `n` must match the build. */
  def dropContaminated(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, textCol: String, idCol: String, table: String,
      n: Int = 5): DataFrame = {
    val g = graft.Cols.fresh(docs.columns :+ "gramh", "__gramh")
    val batchGrams = docs
      .select(col(idCol), explode(array_distinct(
        TF.ngramsOfTokens(TF.tokens(col(textCol)), n))).as(g))
      .select(col(idCol), xxhash64(col(g)).as(g))
    val contaminated = batchGrams
      .join(spark.table(table), col(g) === col("gramh"), "left_semi")
      .select(col(idCol)).distinct()
    docs.join(broadcast(contaminated), Seq(idCol), "left_anti")
  }

  /** Drop an eval gram table (and its warehouse location). */
  def dropEvalGrams(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit =
    Layout.dropTableAndLocation(spark, table)
}
