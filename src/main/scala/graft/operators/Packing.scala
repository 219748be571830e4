package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the assembly stage of a training-data pipeline
  * (after dedup/filter/split): documents are laid end-to-end in a
  * deterministic order and cut into fixed-length token windows
  * ("concat-and-chunk"), so every training sequence is full and the
  * token budget is spent on content, not padding. The reference stack
  * has no assembly stage; this is part of the LLM-pipeline surface
  * (SURVEY §2.9).
  *
  * Scale shape, chosen for 100 TB corpora:
  *   - Packing is per-SHARD: docs are ring-hashed into `shards`
  *     independent streams and each stream is packed by one window
  *     cumulative sum. A single global concatenation order would be one
  *     window partition = one task holding the whole corpus; shards make
  *     it embarrassingly parallel, and sequence ids are namespaced by
  *     shard so the result is still globally unique.
  *   - The order within a shard is the portable deterministic shuffle
  *     (ring key, id tie-break — [[Sampling.shuffleKey]]), NOT
  *     `rand()`: the same corpus packs into byte-identical sequences on
  *     every run, engine and partitioning, which makes training runs
  *     reproducible and lets a checkpointed run resume mid-epoch.
  *   - A document whose tokens straddle a boundary belongs to the
  *     sequence where it STARTS (start-offset assignment). The split
  *     itself happens downstream at tokenization; what the engine owns
  *     is the deterministic (shard, seq, offset) layout.
  */
object Packing {

  /** Split each document into fixed-size token windows with a stride —
    * the context-window preprocessing step (embedding indexing,
    * long-document training): window `k` covers tokens
    * `[k*stride, k*stride + chunkTokens)`, 0-based; the last window
    * truncates at the document's end, and starts run while
    * `k*stride < nTokens` (so every token is covered and a short tail
    * still emits). Stride < chunkTokens gives overlapping windows
    * (standard for retrieval indexes so no phrase straddles a cut).
    *
    * Scale shape: tokens materialize ONCE per document, then one narrow
    * `explode(sequence)` per row — no shuffle, no window function, no
    * driver involvement; composable with [[packSequences]] downstream.
    * Output: the id column + `chunk_id` (0-based), `chunk_start`
    * (token offset), `n_chunk_tokens`, `chunk` (space-joined text).
    * Empty/NULL documents emit no rows. */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(stride > 0 && stride <= chunkTokens,
      "stride must be in [1, chunkTokens] (larger would skip tokens)")
    val toks = graft.Cols.fresh(df.columns, "__toks")
    df.withColumn(toks, graft.functions.TextFunctions.tokens(col(textCol)))
      .where(size(col(toks)) > 0)
      // k*stride <= nTok-1 ⇔ k <= (nTok-1)/stride; Spark `/` is double
      // division, so floor+cast spells the integer division (exact:
      // size is non-negative)
      .withColumn("chunk_id",
        explode(sequence(lit(0),
          floor((size(col(toks)) - 1) / stride).cast("int"), lit(1))))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride).as("chunk_start"),
        size(slice(col(toks), col("chunk_id") * stride + 1, lit(chunkTokens)))
          .as("n_chunk_tokens"),
        concat_ws(" ",
          slice(col(toks), col("chunk_id") * stride + 1, lit(chunkTokens)))
          .as("chunk"))
  }

  /** Assign every row a (shard, seq_in_shard, start_in_seq) packing
    * coordinate from its token count.
    *
    * @param nTokCol token count column (precomputed — counting is the
    *                tokenizer's job, see TextFunctions.tokens)
    * @param seqLen  tokens per packed training sequence
    * @param shards  independent packing streams; sequences per shard
    *                differ by at most one doc's tokens / seqLen */
  def packSequences(df: DataFrame, idCol: String, nTokCol: String,
      seqLen: Int, shards: Int = 256): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(shards > 0, "shards must be positive") // pmod(_, 0) is NULL
    // one ring-hash surface: hashBucket = pmod(shuffleKey, shards), the
    // same arithmetic every other bucketed operator (and oracle) uses
    val w = Window.partitionBy(col("shard"))
      .orderBy(Sampling.shuffleKey(idCol), col(idCol))
      // explicit ROWS frame: the default RANGE frame sums over ORDER-BY
      // peers, so duplicate ids would each absorb the other's tokens and
      // leave a hole in the layout; ROWS matches the oracle's spelling
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", Sampling.hashBucket(idCol, shards))
      .withColumn("__end", sum(col(nTokCol)).over(w))
      .withColumn("__start", col("__end") - col(nTokCol))
      // integral `div`, not floor(a/b): the double detour is only exact
      // below 2^53 cumulative tokens per shard
      .withColumn("seq_in_shard", expr(s"__start div $seqLen"))
      .withColumn("start_in_seq", col("__start") % seqLen)
      .drop("__end", "__start")
  }

  /** Per-sequence summary — the sanity frame a pipeline materializes
    * next to the packed corpus (docs per sequence, fill level). */
  def sequenceStats(packed: DataFrame, nTokCol: String): DataFrame =
    packed.groupBy(col("shard"), col("seq_in_shard"))
      .agg(count(lit(1)).alias("n_docs"),
        sum(col(nTokCol)).alias("n_tokens"))

  /** BIN packing — the OTHER public assembly recipe (Krell et al.
    * 2021, "Efficient Sequence Packing without Cross-contamination",
    * the padding-free-BERT paper): documents are never split; each doc
    * (truncated to `seqLen` tokens, the paper's convention) goes WHOLE
    * into a fixed-capacity bin, so a trainer that forbids cross-doc
    * attention gets one attention mask per doc instead of a split
    * straddling two sequences. [[packSequences]] is the concat-and-
    * chunk sibling that splits.
    *
    * The packing rule is next-fit over the DESCENDING length order —
    * the deterministic baseline of the paper's histogram family (equal
    * lengths fill consecutive bins ⌊C/L⌋ at a time, adjacent lengths
    * mix into the remainder): within a ring shard, docs sort by
    * (capped length DESC, shuffle key, id — a total order), and a doc
    * opens a new bin exactly when it does not fit in the current one.
    * Every coordinate is a pure integer function of the rows, so the
    * layout is engine- and partitioning-invariant and restates in SQL
    * as a recursive walk (the l14b oracle).
    *
    * Scale shape (the [[packSequences]] contract): one shuffle to
    * (shard), an in-partition sort, and a sequential per-shard fold
    * with O(1) state (current bin, fill) — parallelism = `shards`,
    * which the caller sizes to the cluster; no global order, no
    * driver-side work, no window over a hot partition.
    *
    * Output: `idCol`, `shard`, `n_tok_packed` (capped), `bin_in_shard`
    * (0-based), `slot` (0-based position within the bin). */
  def packBins(df: DataFrame, idCol: String, nTokCol: String,
      seqLen: Int, shards: Int = 256): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(shards > 0, "shards must be positive")
    val idField = df.schema(idCol)
    val prep = df.select(col(idCol),
        least(col(nTokCol).cast("long"), lit(seqLen.toLong)).as("__cap"),
        Sampling.hashBucket(idCol, shards).as("shard"),
        Sampling.shuffleKey(idCol).as("__key"))
      .where(col("__cap").isNotNull)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("__cap").desc, col("__key"),
        col(idCol))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      idField,
      org.apache.spark.sql.types.StructField("shard",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_tok_packed",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bin_in_shard",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("slot",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val cap = seqLen.toLong
    prep.mapPartitions { rows =>
      // shards are contiguous under the (shard, ...) sort; the fold
      // resets at each shard boundary — O(1) state per task
      var curShard = Long.MinValue
      var seenShard = false
      var bin = 0L
      var fill = 0L
      var slot = 0L
      rows.map { r =>
        val sh = r.getLong(2)
        val c = r.getLong(1)
        if (!seenShard || sh != curShard) {
          seenShard = true; curShard = sh; bin = 0L; fill = c; slot = 0L
        } else if (fill + c <= cap) {
          fill += c; slot += 1
        } else {
          bin += 1; fill = c; slot = 0L
        }
        org.apache.spark.sql.Row(r.get(0), sh, c, bin, slot)
      }
    }(enc)
  }

  /** Per-bin summary for [[packBins]] — docs, tokens, and the padding
    * a fixed-`seqLen` trainer would burn on the bin (the number the
    * paper optimizes). */
  def binStats(packed: DataFrame, seqLen: Int): DataFrame =
    packed.groupBy(col("shard"), col("bin_in_shard"))
      .agg(count(lit(1)).alias("n_docs"),
        sum(col("n_tok_packed")).alias("n_tokens"),
        (lit(seqLen.toLong) - sum(col("n_tok_packed"))).alias("n_padding"))
}
