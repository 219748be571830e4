package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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

  /** Character-class pre-tokenizer regex (the GPT-2 pre-tokenizer's
    * class structure, public scheme): maximal runs of letters, of
    * digits, or of non-space-non-alphanumeric characters; whitespace
    * separates and drops. Unicode classes, so CJK ideographs are
    * letter runs. */
  private val PretokRegex = "\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+"

  /** Class-run pre-tokens of `text`, each run CHUNKED to at most
    * `maxWordLen` characters — the guard [[wordDict]] lacks for
    * whitespace-free scripts: a CJK document splits on `\s+` into one
    * whole-line "word", every line is distinct, and the
    * distinct-word-dictionary reduction that makes training
    * corpus-scale-independent collapses back to the corpus itself.
    * Bounding run length restores it: the dictionary is then bounded
    * by |alphabet|^maxWordLen ∩ corpus n-grams — in practice the
    * script's common character n-grams, which is exactly the unit BPE
    * wants to learn over (the GPT-2 scheme's byte-level analogue).
    * Pure per-row expressions; used by [[wordDictPretokenized]] and
    * mirrored exactly by the executor-side splitter in
    * [[applyBpePretokenized]]. */
  private[graft] def preTokens(text: Column, maxWordLen: Int): Column =
    flatten(transform(
      regexp_extract_all(text, lit(PretokRegex), lit(0)),
      r => transform(
        sequence(lit(0), floor((length(r) - 1) / maxWordLen).cast("int")),
        i => r.substr(i * maxWordLen + 1, lit(maxWordLen)))))

  /** [[wordDict]] over the bounded class-run pre-tokens — the
    * dictionary builder for corpora where whitespace does not
    * segment. On whitespace-segmented text with maxWordLen above the
    * longest word it degenerates to [[wordDict]] minus intra-word
    * punctuation splits. */
  def wordDictPretokenized(df: DataFrame, textCol: String,
      maxWordLen: Int = 16): DataFrame = {
    require(maxWordLen >= 2, "maxWordLen must be >= 2 (a 1-char word cannot merge)")
    df.select(explode(preTokens(col(textCol), maxWordLen)).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("count"))
  }

  /** Learn `k` BPE merges from a (word, count) dictionary — BATCHED
    * driver rounds, bit-identical to [[learnMergesSerial]] (the paper's
    * one-merge-per-round loop). A realistic 32k-merge vocabulary costs
    * ~14 h under the serial loop (BASELINE.md measured ~1.6 s of driver
    * round-trip per merge at a 1M-row dictionary); batching folds many
    * merges into one distributed pair-count pass, cutting rounds
    * without changing a single learned merge.
    *
    * Batch selection — and why it is EXACT, not approximate. Per round,
    * pull the top-`window` pairs in the serial total order (freq desc,
    * then (left, right) lexicographic) and walk that prefix in order,
    * accepting pairs until the FIRST pair that either
    *
    *  (a) shares a symbol with an already-accepted pair (its count
    *      would change under the earlier merge),
    *  (b) has a merged string `l+r` equal to an accepted pair's merged
    *      string or one of its symbols (two creators of one string
    *      would double-count its pairs), or
    *  (c) has a merged string that already exists as a dictionary
    *      symbol (a pre-existing symbol with that spelling would be
    *      indistinguishable from the merge's output, letting pairs in
    *      the hazard class start above zero) — `knownSymbols` below
    *      over-approximates the live symbol set as
    *      initial-characters ∪ merges-so-far, both driver-resident, so
    *      this check is a set lookup, not a job.
    *
    * The accepted prefix is then truncated to pairs with freq STRICTLY
    * above the HAZARD BOUND `H` (at least the top pair always
    * survives — applying it alone is literally the serial round).
    * Serial equivalence, by induction over the batch m_1..m_M: when
    * serial has applied m_1..m_{i-1},
    *
    *  - counts of m_i..m_M are unchanged (pairwise symbol-disjoint, and
    *    no m_j creates a string equal to another member's symbol), so
    *    their freqs and tie-break order are the original ones;
    *  - every NON-HAZARD other pair only loses occurrences, and its
    *    original count is ≤ the first violator's (nothing conflicting
    *    can precede the first violation in an ordered walk) ≤ each
    *    accepted freq — with TIES decided in the batch's favor: equal
    *    counts fall back to (left, right) lexicographic, the very
    *    order the walk consumed, and the accepted pair came first;
    *  - every HAZARD pair — one side spelled like an accepted merge's
    *    output s_j — started at zero by rule (c) and grows through
    *    exactly one adjacency pattern (each side's provenance is
    *    unique by rules (b)+(c)): occurrences of `x s_j` are created
    *    only from `x l_j r_j`, bounded by the original count of
    *    (x, l_j); of `s_j y` only from `l_j r_j y`, bounded by
    *    (r_j, y); of `s_j s_j'` bounded by (r_j, l_j'). Every such
    *    FEEDING pair carries an accepted LEFT symbol on its right or
    *    an accepted RIGHT symbol on its left — so
    *    `H = max(count of non-accepted pulled pairs of that shape,
    *    window-tail freq if the table runs deeper)` bounds every
    *    hazard's count at every serial step, and feeding counts
    *    cannot themselves have grown (a feeder contains an accepted
    *    symbol, which by (b)+(c) no merge output spells — feeders are
    *    non-hazard, decrease-only). Lexicographic ties are NOT safe
    *    against hazards (a hazard pair is new — its tie-break
    *    position is arbitrary), hence strictly-above-H.
    *
    * So serial's next pick is exactly m_i, with the same recorded
    * frequency. ∎  H ≤ the first violator's freq (a violator shares a
    * symbol with the accepted set; when it feeds no hazard it does not
    * even count), so this truncation dominates the naive
    * cutoff-at-violator rule — and a DEEPER window only shrinks H
    * (pulled pairs are bounded exactly instead of by the tail freq,
    * and the tail freq itself falls), so `window` trades a slightly
    * larger TakeOrdered pull for strictly larger proven-exact batches.
    * The batch applies in rank order as ONE narrow dictionary rewrite
    * (symbol-disjointness makes the order immaterial, but rank order
    * keeps the within-word greedy semantics textually identical to
    * serial).
    *
    * Early character-level rounds batch poorly (top pairs share
    * letters — the walk stops fast and degrades to serial, which is
    * also why the classic-fixture tests still see serial-identical
    * per-round behavior); the long multi-character tail where the 14 h
    * lives batches well. Measured round reduction is in BASELINE.md.
    *
    * Driver pulls per round: one `window`-row TakeOrdered (versus
    * serial's 1 row), plus one alphabet-sized distinct pull at start —
    * all bounded by construction. */
  def learnMerges(dict: DataFrame, k: Int, maxBatch: Int = 256,
      window: Int = 1024): Seq[Merge] =
    learnMergesCounted(dict, k, maxBatch, window)._1

  /** [[learnMerges]] plus the number of driver rounds it took — the
    * measured quantity behind the batching claim (BASELINE.md records
    * rounds-per-merge; BpeSpec asserts rounds < merges on a Zipf
    * dictionary). */
  def learnMergesCounted(dict: DataFrame, k: Int, maxBatch: Int = 256,
      window: Int = 1024): (Seq[Merge], Int) = {
    require(k >= 1, "learnMerges needs k >= 1")
    require(maxBatch >= 1 && window >= maxBatch,
      "learnMerges needs maxBatch >= 1 and window >= maxBatch")
    var words = dict
      .select(col("count").cast(LongType).as("count"),
        filter(split(col("word"), ""), s => s =!= "").as("syms"))
      .where(size(col("syms")) >= 2)
      .localCheckpoint()
    // the symbol universe only ever holds initial characters plus merge
    // outputs, so rule (c)'s membership test stays driver-side: seed
    // with the (alphabet-bounded) distinct character pull, grow with
    // each accepted merge. Symbols that later merge away make the set
    // an over-approximation — conservative, never wrong.
    val knownSymbols = scala.collection.mutable.HashSet.empty[String]
    words.select(explode(col("syms")).as("s")).distinct()
      .collect().foreach(r => knownSymbols += r.getString(0))
    // components of learned merges — the strings a FORCED singleton's
    // output must never spell (validateMinRankSafe's reject class);
    // the normal walk is already covered because every component is a
    // known symbol, but the forced path bypasses that guard
    val learnedComponents = scala.collection.mutable.HashSet.empty[String]
    // Round-t's input frame is LAZILY persisted (no eager count — that
    // would spend one full dictionary pass per round purely on
    // materialization): the round's own pair-count job materializes it,
    // and the frame it was derived FROM stays cached until then — so a
    // lazy frame is released one round after it stopped being `words`.
    // Checkpointed frames are never unpersisted (their blocks anchor
    // the lineage of everything after them; the ContextCleaner reclaims
    // them when the reference drops).
    var releasable: DataFrame = null // ex-`words`, lazy, awaiting successor's materialization
    var wordsLazy = false            // current `words` persisted lazily (vs checkpointed)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    var round = 0
    while (merges.length < k && !exhausted) {
      val syms = col("syms")
      val top = words
        .select(col("count"), explode(
          transform(sequence(lit(0), size(syms) - 2), i => struct(
            element_at(syms, i + 1).as("l"), element_at(syms, i + 2).as("r"))))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("count")).as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(window)
        .collect()
      // this collect materialized `words` — its predecessor can go
      if (releasable != null) { releasable.unpersist(false); releasable = null }
      if (top.isEmpty) exhausted = true
      else {
        val pulled = top.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        val batch = selectBatch(pulled,
          math.min(maxBatch, k - merges.length), knownSymbols,
          windowFull = top.length == window,
          learnedComponent = learnedComponents)
        // empty ONLY when every pulled pair's output spells a learned
        // component (selectBatch scaladoc) — continuing would spin the
        // loop without progress; the vocabulary is complete as-is
        if (batch.isEmpty) exhausted = true
        else {
        batch.foreach { case (l, r, f) =>
          merges += Merge(merges.length, l, r, f)
          knownSymbols += (l + r)
          learnedComponents += l
          learnedComponents += r
        }
        val applied = applyMergesToDict(words, batch.map(b => (b._1, b._2)).toSeq)
        // localCheckpoint (eager) every 4th round truncates lineage; in
        // between, a LAZY persist — the next round's aggregation
        // materializes it in the same job that consumes it
        val cp = (round + 1) % 4 == 0
        val next =
          if (cp) applied.localCheckpoint() // eager: reads `words` NOW
          else { applied.persist(); applied }
        if (cp) { if (wordsLazy) words.unpersist(false) }
        else if (wordsLazy) releasable = words
        wordsLazy = !cp
        words = next
        round += 1
        }
      }
    }
    if (releasable != null) releasable.unpersist(false)
    if (wordsLazy) words.unpersist(false)
    (merges.toSeq, round)
  }

  /** Select the proven-exact merge batch from one window pull. Pure and
    * driver-side — extracted from the training loop so the collision
    * paths are unit-testable without engineering a triggering corpus.
    *
    * Ordered walk first: accept the clean conflict-free prefix (the
    * lex-tie argument needs every non-accepted pair to FOLLOW every
    * accepted one in the total order, so the walk must stop at the
    * first violation — skipping it and continuing would leave a
    * partially-decayed conflict ranked between members). Then the
    * hazard bound H (scaladoc proof on [[learnMergesCounted]]): the max
    * count a pair spelled with an accepted merge's output can GROW to =
    * max original count of the feeding shapes — accepted-left on the
    * right or accepted-right on the left — over the non-accepted pulled
    * pairs, plus the window tail for pairs never pulled. A full
    * violation-free table pull leaves H = 0: no feeder exists.
    *
    * NEVER empty for a non-empty pull — with ONE exception: when even
    * the FIRST pulled pair's output already spells a known symbol (a
    * double-creator, e.g. ("ab","c") after ("a","bc") both make
    * "abc"), the walk rejects it, `accepted` is empty, and an empty
    * batch would spin the training loop forever. Serial has no
    * knownSymbols guard and simply learns that pair, so it is forced
    * through as a singleton: a 1-merge batch IS one serial round
    * verbatim — progress and bit parity both hold. The exception
    * (ADVICE r11): a forced pair whose output spells a COMPONENT of an
    * already-learned (lower-ranked) merge would train a vocabulary
    * that [[validateMinRankSafe]] rejects at every apply — emitting it
    * makes the tokenizer refuse its own training output. Such a pair
    * is skipped in favor of the highest-frequency component-safe
    * pulled pair (a divergence from serial order, which would have
    * learned the unusable merge; the usable prefix up to that point is
    * identical). When EVERY pulled pair collides, the batch is empty
    * and training terminates — the residual case: a corpus whose
    * remaining pair mass all spells learned components cannot be
    * extended without breaking min-rank apply. */
  private[graft] def selectBatch(pulled: Array[(String, String, Long)],
      wanted: Int, knownSymbols: String => Boolean,
      windowFull: Boolean,
      learnedComponent: String => Boolean = _ => false)
      : collection.Seq[(String, String, Long)] = {
    val used = scala.collection.mutable.HashSet.empty[String]
    val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var violated = false
    val it = pulled.iterator
    while (!violated && accepted.length < wanted && it.hasNext) {
      val (l, r, f) = it.next()
      val s = l + r
      if (used(l) || used(r) || used(s) || knownSymbols(s)) violated = true
      else { accepted += ((l, r, f)); used += l; used += r; used += s }
    }
    val lefts = accepted.map(_._1).toSet
    val rights = accepted.map(_._2).toSet
    var h = if (windowFull) pulled.last._3 else 0L
    var j = accepted.length // first non-accepted index (cap or violator)
    while (j < pulled.length) {
      val (a, b, f) = pulled(j)
      if (f <= h) j = pulled.length // desc order: no later pair can raise H
      else { if (rights(a) || lefts(b)) h = f; j += 1 }
    }
    val strict = accepted.takeWhile(_._3 > h)
    if (strict.nonEmpty) strict
    else if (accepted.nonEmpty) accepted.take(1)
    else {
      // forced serial round — but never one validateMinRankSafe would
      // refuse (see scaladoc): first component-safe pair by the serial
      // total order, or empty when none exists
      pulled.find { case (l, r, _) => !learnedComponent(l + r) } match {
        case Some(p) => scala.collection.mutable.ArrayBuffer(p)
        case None => scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      }
    }
  }

  /** One batched dictionary rewrite: apply `batch` merges in rank order
    * to every word's symbol array (the greedy left-to-right pass of
    * [[applyBpe]], per merge), dropping words that fully merge. Narrow —
    * nothing shuffles; one pass regardless of batch size (the Catalyst
    * fold [[learnMergesSerial]] uses would stack one nested `aggregate`
    * per merge and blow past codegen limits at 64 merges). */
  private def applyMergesToDict(words: DataFrame,
      batch: Seq[(String, String)]): DataFrame = {
    val enc = RowEncoder.encoderFor(words.schema)
    val symsIdx = words.schema.fieldIndex("syms")
    words.mapPartitions { rows =>
      rows.flatMap { row =>
        var syms: Array[String] = row.getSeq[String](symsIdx).toArray
        batch.foreach { case (l, r) =>
          if (syms.length >= 2) {
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                buf += l + r; i += 2
              } else { buf += syms(i); i += 1 }
            }
            syms = buf.toArray
          }
        }
        if (syms.length >= 2)
          Iterator(Row.fromSeq(row.toSeq.updated(symsIdx, syms.toSeq)))
        else Iterator.empty
      }
    }(enc)
  }

  /** The paper's serial loop — one merge per driver round, the parity
    * oracle [[learnMerges]]'s batching is tested against (BpeSpec
    * batched-vs-serial at k=64). Kept as the reference semantics; use
    * [[learnMerges]] for real training. */
  def learnMergesSerial(dict: DataFrame, k: Int): Seq[Merge] = {
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
    * broadcasts it with the task (k entries), nothing shuffles.
    *
    * Per word, tokenization iterates MIN-RANK-FIRST: find the
    * lowest-rank adjacent pair present (one rank-map lookup per
    * position), apply it greedily left-to-right, repeat until no
    * learned pair remains. Identical to applying every merge fully in
    * rank order — a rank-r pair's components are outputs of merges
    * ranked BELOW r (that is when the pair was learnable), so passing
    * rank r can never create a new site for a rank < r merge — but the
    * cost is O(applicable-ranks × length) per word instead of
    * O(k × length): at a realistic 32k-merge vocabulary the rank-order
    * scan would spend 32k array passes on every distinct word, the
    * min-rank walk only touches ranks the word actually uses.
    *
    * PRECONDITION (validated, fails loudly): no merge's output string
    * may spell a component of a LOWER-ranked merge — otherwise passing
    * rank q creates a fresh site for rank p < q and min-rank-first
    * re-fires p where the rank-order reference pass would not.
    * [[learnMerges]]' rule (c) enforces this within a batch and its
    * knownSymbols guard across batches (the forced-singleton collision
    * path and [[learnMergesSerial]] can emit a duplicate OUTPUT, which
    * is still safe — only output-equals-earlier-component diverges);
    * arbitrary persisted tables ([[applyBpeFromTable]]) get no such
    * guarantee, hence the check here at every entry point. */
  def applyBpe(df: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame =
    applyBpeCore(df, textCol, merges, pretokLen = None)

  /** [[applyBpe]] with the bounded class-run pre-tokenizer instead of
    * the whitespace splitter — the apply-side mirror of
    * [[wordDictPretokenized]] (train and apply MUST segment
    * identically, or apply meets "words" training never saw). Same
    * merge semantics, same reconstruction contract: the pre-tokens
    * cover exactly the non-whitespace characters, so
    * `sum(token lengths) == chars minus whitespace`. */
  def applyBpePretokenized(df: DataFrame, textCol: String,
      merges: Seq[Merge], maxWordLen: Int = 16): DataFrame = {
    require(maxWordLen >= 2, "maxWordLen must be >= 2")
    applyBpeCore(df, textCol, merges, pretokLen = Some(maxWordLen))
  }

  /** Split a word into single CODE-POINT symbols — the executor-side
    * mirror of training's `split(word, "")` (Java regex boundaries are
    * code-point-grained, so a supplementary character is ONE symbol on
    * both sides; a UTF-16 `toCharArray` split would hand apply lone
    * surrogates that never match any learned merge — ADVICE r17). */
  private def codePointSymbols(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var k = 0
    while (i < w.length) {
      val c = Character.charCount(w.codePointAt(i))
      out(k) = w.substring(i, i + c); i += c; k += 1
    }
    out
  }

  private def applyBpeCore(df: DataFrame, textCol: String,
      merges: Seq[Merge], pretokLen: Option[Int]): DataFrame = {
    validateMinRankSafe(merges)
    val ranked = merges.sortBy(_.rank).map(m => (m.left, m.right)).toArray
    val outSchema = df.schema
      .add(StructField("bpe_tokens", ArrayType(StringType)))
      .add(StructField("bpe_merge_events", LongType))
    val enc = RowEncoder.encoderFor(outSchema)
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      // per-task rank map; built once per partition, shared by words.
      // Boxed Integer values: a Scala-Int-valued java HashMap would
      // silently unbox a missing key's null to rank 0
      val rank = new java.util.HashMap[(String, String), Integer]()
      var ri = 0
      while (ri < ranked.length) { rank.put(ranked(ri), Integer.valueOf(ri)); ri += 1 }
      // per-partition word→tokenization cache: natural text repeats
      // words heavily, and the cache turns apply into a dictionary
      // lookup (the same reduction training uses)
      val cache = new java.util.HashMap[String, (Array[String], Long)]()
      // pre-tokenized mode: same class-run regex + chunking as the
      // Column-side preTokens (train/apply segmentation parity)
      val pretok = pretokLen.map(_ => java.util.regex.Pattern.compile(PretokRegex))
      def wordsOf(text: String): Iterator[String] = pretok match {
        case None => text.split("\\s+").iterator
        case Some(p) =>
          val maxLen = pretokLen.get
          val m = p.matcher(text)
          new Iterator[String] {
            private var run: String = null
            private var off = 0
            def hasNext: Boolean = {
              if (run == null || off >= run.length) {
                if (!m.find()) return false
                run = m.group(); off = 0
              }
              true
            }
            def next(): String = {
              if (!hasNext) throw new NoSuchElementException
              // stride by CODE POINTS: the Column-side preTokens chunks
              // with substr (code-point-grained), so a UTF-16 stride
              // here could cut a surrogate pair at a chunk boundary and
              // diverge from training segmentation (ADVICE r17)
              var end = off
              var k = 0
              while (k < maxLen && end < run.length) {
                end += Character.charCount(run.codePointAt(end)); k += 1
              }
              val w = run.substring(off, end); off = end; w
            }
          }
      }
      rows.map { r =>
        val text = r.getString(textIdx)
        var events = 0L
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        if (text != null) wordsOf(text).foreach { w =>
          if (w.nonEmpty) {
            var hit = cache.get(w)
            if (hit == null) {
              var syms = codePointSymbols(w)
              var e = 0L
              var more = syms.length >= 2
              while (more) {
                // lowest-rank pair present anywhere in the word
                var best = Int.MaxValue
                var i = 0
                while (i + 1 < syms.length) {
                  val rk = rank.get((syms(i), syms(i + 1)))
                  if (rk != null && rk < best) best = rk
                  i += 1
                }
                if (best == Int.MaxValue) more = false
                else {
                  val (l, mr) = ranked(best)
                  val buf = scala.collection.mutable.ArrayBuffer.empty[String]
                  i = 0
                  while (i < syms.length) {
                    if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == mr) {
                      buf += l + mr; e += 1; i += 2
                    } else { buf += syms(i); i += 1 }
                  }
                  syms = buf.toArray
                  more = syms.length >= 2
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

  /** The unique-creator precondition behind [[applyBpe]]'s
    * min-rank-first equivalence proof: walking merges in ascending
    * rank, a merge whose output string equals a component (left or
    * right) of a STRICTLY lower rank is rejected — applying the later
    * merge would manufacture a new adjacency for the earlier pair,
    * letting min-rank re-fire it at a site the rank-order pass never
    * sees. O(k) driver-side; duplicate outputs and output==later
    * component are both fine (they cannot create back-edges). */
  private[graft] def validateMinRankSafe(merges: Seq[Merge]): Unit = {
    val compFirstRank = new java.util.HashMap[String, Integer]()
    merges.sortBy(_.rank).foreach { m =>
      val out = m.left + m.right
      val hit = compFirstRank.get(out)
      if (hit != null && hit < m.rank)
        throw new IllegalArgumentException(
          s"BPE vocab violates the min-rank-first precondition: merge " +
          s"rank ${m.rank} output '$out' spells a component of merge " +
          s"rank $hit — applying it would create new sites for the " +
          s"earlier pair, diverging from rank-order apply semantics. " +
          s"Retrain with learnMerges or apply with a rank-order pass.")
      if (!compFirstRank.containsKey(m.left))
        compFirstRank.put(m.left, Integer.valueOf(m.rank))
      if (!compFirstRank.containsKey(m.right))
        compFirstRank.put(m.right, Integer.valueOf(m.rank))
    }
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
