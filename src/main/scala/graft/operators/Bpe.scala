package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding vocabulary training and application (SURVEY §2.9
  * text family — the learned sibling of the regex token counter): the
  * public BPE algorithm of Sennrich et al. 2016 ("Neural Machine
  * Translation of Rare Words with Subword Units"), re-expressed
  * Spark-first.
  *
  * Scale shape — the part that matters at 100 TB:
  *
  *  - Training runs on the DISTINCT-WORD DICTIONARY, not the corpus:
  *    one `groupBy(word)` shuffle reduces 100 TB of text to the
  *    vocabulary (bounded by content, typically millions of rows, each
  *    carrying its corpus count), and every later step touches only
  *    that persisted frame. This is the standard reduction from the
  *    paper, and it is what makes iterative training tractable —
  *    pair statistics weighted by word count are identical to counting
  *    over the raw corpus.
  *  - Each merge iteration is one partial-aggregated pair-count over
  *    the dictionary (map-side combine, then a k=1 TakeOrdered — the
  *    driver pulls ONE row per iteration, never a distribution), then a
  *    narrow conditional rewrite of only the words containing the
  *    winning pair. Lineage is truncated with `localCheckpoint` every
  *    few rounds (the [[Graph]] connected-components discipline) so k
  *    iterations do not stack k plans.
  *  - Application broadcasts the learned merge list (k entries — bytes,
  *    not data) and tokenizes per partition; nothing about apply
  *    shuffles payload text.
  *
  * Determinism: pair selection breaks frequency ties lexicographically
  * on (left, right), so the same corpus always learns the same merges —
  * the property the registry queries and the reconstruction oracle
  * stand on.
  */
object Bpe {

  /** One learned merge, in rank order: `left` + `right` → `left+right`. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Whitespace-tokenized distinct-word dictionary with corpus counts —
    * training's input contract. `textCol` splits on `\s+` (the same
    * tokenizer the oracle SQL uses); empty strings drop. */
  def wordDict(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("count"))

  /** Learn `k` BPE merges from a (word, count) dictionary. Returns the
    * merge table in rank order. Symbols start as single characters;
    * each iteration merges the globally most frequent adjacent pair
    * (count-weighted, ties broken lexicographically) wherever it
    * occurs, greedy left-to-right within a word. Stops early when no
    * adjacent pair remains. */
  def learnMerges(dict: DataFrame, k: Int): Seq[Merge] = {
    require(k >= 1, "learnMerges needs k >= 1")
    // split each word into single-character symbols; keep only words
    // long enough to ever produce a pair
    var words = dict
      .select(col("count").cast(LongType).as("count"),
        filter(split(col("word"), ""), s => s =!= "").as("syms"))
      .where(size(col("syms")) >= 2)
      .localCheckpoint() // training input is re-read every iteration
    var prevPersisted: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    var exhausted = false
    while (round < k && !exhausted) {
      val syms = col("syms")
      // adjacent-pair counts, weighted by word frequency; partial
      // aggregation combines map-side, and the k=1 sort is a
      // TakeOrderedAndProject — one row crosses to the driver
      val top = words
        .select(col("count"), explode(
          transform(sequence(lit(0), size(syms) - 2), i => struct(
            element_at(syms, i + 1).as("l"), element_at(syms, i + 2).as("r"))))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("count")).as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getString(0); val r = top(0).getString(1)
        val freq = top(0).getLong(2)
        merges += Merge(merges.length, l, r, freq)
        // greedy left-to-right merge as a single-pass fold: the running
        // array's last element merges with the current symbol iff they
        // are exactly (l, r) — the merged symbol is a new string, so an
        // overlapping second occurrence correctly does NOT re-merge.
        // Words without the pair skip the rewrite entirely (the `when`).
        val hasPair = exists(sequence(lit(0), size(syms) - 2), i =>
          element_at(syms, i + 1) === lit(l) && element_at(syms, i + 2) === lit(r))
        val fold = aggregate(syms, array().cast("array<string>"), (acc, s) =>
          when(size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(s))))
        val applied = words
          .withColumn("syms", when(hasPair, fold).otherwise(syms))
          .where(size(col("syms")) >= 2) // fully-merged words leave training
        // truncate lineage so k rounds do not stack k fold-plans; drop
        // the previous round's cache once the new one is materialized
        val next =
          if ((round + 1) % 4 == 0) applied.localCheckpoint()
          else { applied.persist(); applied.count(); applied }
        if (prevPersisted != null) prevPersisted.unpersist(false)
        prevPersisted = if ((round + 1) % 4 == 0) null else next
        words = next
        round += 1
      }
    }
    if (prevPersisted != null) prevPersisted.unpersist(false)
    merges.toSeq
  }

  /** Apply learned merges to a text column: adds
    * `bpe_tokens array<string>` (whitespace words tokenized to learned
    * subwords, concatenated in word order) and `bpe_merge_events long`
    * (how many merge APPLICATIONS happened — counted independently of
    * the token arithmetic, which is what makes the reconstruction
    * contract `chars == tokens' total length` AND
    * `chars_count == tokens_count + merge_events` a real check and not
    * an identity). Merge list is captured in the closure — Spark
    * broadcasts it with the task (k entries), nothing shuffles. */
  def applyBpe(df: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val ranked = merges.sortBy(_.rank).map(m => (m.left, m.right)).toArray
    val outSchema = df.schema
      .add(StructField("bpe_tokens", ArrayType(StringType)))
      .add(StructField("bpe_merge_events", LongType))
    val enc = RowEncoder.encoderFor(outSchema)
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      // per-partition word→tokenization cache: natural text repeats
      // words heavily, and the cache turns apply into a dictionary
      // lookup (the same reduction training uses)
      val cache = new java.util.HashMap[String, (Array[String], Long)]()
      rows.map { r =>
        val text = r.getString(textIdx)
        var events = 0L
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        if (text != null) text.split("\\s+").foreach { w =>
          if (w.nonEmpty) {
            var hit = cache.get(w)
            if (hit == null) {
              var syms = w.toCharArray.map(_.toString)
              var e = 0L
              ranked.foreach { case (l, mr) =>
                if (syms.length >= 2) {
                  val buf = scala.collection.mutable.ArrayBuffer.empty[String]
                  var i = 0
                  while (i < syms.length) {
                    if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == mr) {
                      buf += l + mr; e += 1; i += 2
                    } else { buf += syms(i); i += 1 }
                  }
                  syms = buf.toArray
                }
              }
              hit = (syms, e)
              cache.put(w, hit)
            }
            out ++= hit._1
            events += hit._2
          }
        }
        Row.fromSeq(r.toSeq :+ out.toSeq :+ events)
      }
    }(enc)
  }

  /** Merge table as a DataFrame — the registry/rows-only surface. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "left", "right", "freq")
  }

  /** Persist a learned vocabulary as a managed table — the BPE sibling
    * of the persisted IVF index / band history: train once on the
    * dictionary reduction of the full corpus, then every downstream
    * tokenization job loads k rows from the catalog instead of
    * re-training. Overwrites (a vocabulary is a versioned artifact —
    * write a new table name for a new recipe). */
  def writeVocab(spark: SparkSession, merges: Seq[Merge], table: String): Unit =
    mergesDf(spark, merges).write.mode("overwrite").format("parquet")
      .saveAsTable(table)

  /** Load a persisted vocabulary ([[writeVocab]]) — a bounded k-row
    * driver pull, rank-ordered. */
  def readVocab(spark: SparkSession, table: String): Seq[Merge] =
    spark.table(table).select(col("rank"), col("left"), col("right"), col("freq"))
      .orderBy(col("rank")).collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  /** [[applyBpe]] against a persisted vocabulary: the production
    * tokenize path — k catalog rows in, broadcast with the task,
    * nothing about the corpus shuffles. */
  def applyBpeFromTable(spark: SparkSession, df: DataFrame, textCol: String,
      table: String): DataFrame =
    applyBpe(df, textCol, readVocab(spark, table))
}
