package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
  * the SentencePiece unigram model, the OTHER public subword family
  * next to BPE/[[Bpe]]): a vocabulary of pieces with unigram
  * probabilities; tokenization is the Viterbi-best segmentation of
  * each word under the model; training seeds a large candidate set
  * from frequent substrings, fits probabilities by EM, and prunes
  * toward a target size.
  *
  * From-scratch engineering choices (each deterministic and
  * documented, the quantized-GD discipline of [[QualityClassifier]]):
  *  - training runs on the DISTINCT-WORD DICTIONARY with corpus
  *    counts ([[Bpe.wordDict]] / [[Bpe.wordDictPretokenized]]) — the
  *    reduction that makes it corpus-scale-independent;
  *  - BOTH E-steps are available: [[train]] runs HARD EM (Viterbi
  *    counts — piece log-probabilities on the 1e-6 integer grid,
  *    exact Long Viterbi sums, ties prefer the LONGER piece then the
  *    earlier split, bit-deterministic on any engine and any
  *    partitioning); [[trainSoft]] runs the paper's forward-backward
  *    expectations ([[expectedPieces]] — partition-invariant, masses
  *    quantized to the same grid before the distributed sum);
  *  - pruning keeps every single-character piece (coverage: any word
  *    always segments) and shrinks the multi-character set by
  *    `shrink` per round toward `targetSize`, dropping the
  *    lowest-Viterbi-count pieces (count ties break lexicographic) —
  *    the paper's likelihood-loss prune replaced by its
  *    used-mass proxy;
  *  - characters outside the vocabulary score a fixed UNK penalty 10
  *    ln-units below the worst piece (apply-time robustness; training
  *    vocabularies always cover their own dictionary).
  *
  * Scale shape (the L17 discipline): seeding is one explode of the
  * dictionary into bounded substrings (≤ maxPieceLen per position) +
  * one partial-agg groupBy reduced to candidate grain; every EM round
  * is ONE distributed Viterbi pass over the dictionary plus a groupBy
  * partial-agged to ≤ |vocab| rows — the only driver pulls are
  * model-sized (seed set, then per-round counts). Apply (the 100 TB
  * path) broadcasts the piece table with the task closure and walks
  * each word once with a per-partition word→pieces cache
  * ([[Bpe.applyBpe]]'s reduction); no join, no shuffle.
  */
object Unigram {

  /** Quantization grid: ln-probabilities in 1e-6 units. */
  private val Scale = 1e6

  /** A trained model: piece → quantized ln p (micro), the max piece
    * length, and the UNK per-character penalty. With `byteFallback`
    * (SentencePiece's `byte_fallback`, off by default) an unseen code
    * point is emitted as its UTF-8 bytes spelled as the 256 reserved
    * `<0xNN>` tokens instead of as itself — apply becomes TOTAL over
    * the FIXED vocabulary `pieces ∪ byteTokens`, the property a
    * downstream trainer's embedding table needs ([[decodePieces]]
    * restores the original text, so the reconstruction contract
    * survives in decoded form). The `<0xNN>` spellings are reserved:
    * a corpus whose TEXT contains that literal 6-char sequence decodes
    * it as a byte (the SentencePiece meta-piece caveat). */
  final case class Model(pieces: Map[String, Long], maxPieceLen: Int,
      qUnk: Long, byteFallback: Boolean = false) {
    require(pieces.nonEmpty, "empty unigram vocabulary")
  }

  /** The 256 reserved byte pieces, `<0x00>`..`<0xFF>`. */
  val byteTokens: IndexedSeq[String] =
    (0 until 256).map(b => f"<0x$b%02X>")

  /** Turn byte-fallback on for a trained model (train covers its own
    * corpus, so the flag only changes APPLY-time behavior on novel
    * characters). */
  def withByteFallback(m: Model): Model = m.copy(byteFallback = true)

  /** Append `sub` to a REVERSED piece buffer: under byte-fallback an
    * out-of-vocabulary piece (always a single code point — multi-char
    * subs never win at Long.MinValue) emits its UTF-8 bytes as
    * `<0xNN>` tokens, in reverse order so the caller's final reverse
    * restores byte order. */
  private def emitReversed(out: scala.collection.mutable.ArrayBuffer[String],
      sub: String, pieces: Map[String, Long], byteFallback: Boolean): Unit = {
    if (byteFallback && !pieces.contains(sub)) {
      val bs = sub.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var b = bs.length - 1
      while (b >= 0) { out += byteTokens(bs(b) & 0xff); b -= 1 }
    } else out += sub
  }

  /** Invert a piece stream back to text: `<0xNN>` byte tokens decode
    * as UTF-8 (runs are gathered so multi-byte characters reassemble);
    * every other piece concatenates verbatim. Total: any token
    * sequence decodes (a lone malformed byte run decodes with the
    * charset's replacement character — crawl-bytes tolerance, not an
    * exception). */
  def decodePieces(tokens: Seq[String]): String = {
    if (tokens == null) return null
    val sb = new java.lang.StringBuilder()
    val run = new java.io.ByteArrayOutputStream()
    def flush(): Unit = if (run.size() > 0) {
      sb.append(new String(run.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8))
      run.reset()
    }
    tokens.foreach { t =>
      val b = byteTokenValue(t)
      if (b >= 0) run.write(b)
      else { flush(); sb.append(t) }
    }
    flush()
    sb.toString
  }

  /** `<0xNN>` → NN, else -1. */
  private def byteTokenValue(t: String): Int =
    if (t != null && t.length == 6 && t.charAt(0) == '<' &&
      t.charAt(1) == '0' && t.charAt(2) == 'x' && t.charAt(5) == '>' &&
      Character.digit(t.charAt(3), 16) >= 0 &&
      Character.digit(t.charAt(4), 16) >= 0)
      (Character.digit(t.charAt(3), 16) << 4) | Character.digit(t.charAt(4), 16)
    else -1

  private def qln(p: Double): Long = math.round(math.log(p) * Scale)

  /** Viterbi-best segmentation of one word under quantized piece
    * scores. Exact Long sums; ties prefer the LONGER last piece, then
    * the earlier split (both fixed by the scan order below). Returns
    * the piece list; unknown single characters emit themselves at the
    * UNK penalty, so every word segments and the pieces always
    * concatenate back to the word (the reconstruction contract).
    *
    * Positions are CODE POINTS, not UTF-16 units (ADVICE r17): the
    * split positions come from the code-point boundary table below,
    * so a supplementary character (emoji, rare CJK) is one atomic
    * position — never two lone-surrogate "pieces", which would be
    * invalid UTF-8 in [[writeVocab]] and would break the l46b
    * piece-char-count oracle (Spark's `length`/`substr` and DuckDB's
    * `length` all count code points; the seed explode is therefore
    * code-point-grained already, and this keeps apply aligned with
    * it). On BMP-only text the boundary table is the identity and
    * the walk is unchanged. */
  private[graft] def viterbi(word: String, pieces: Map[String, Long],
      maxLen: Int, qUnk: Long, byteFallback: Boolean = false): Array[String] = {
    val nu = word.length
    if (nu == 0) return Array.empty
    // offs(k) = UTF-16 index of code point k; offs(m) = word end
    val offs = new Array[Int](nu + 1)
    var m = 0
    var u = 0
    while (u < nu) {
      offs(m) = u; u += Character.charCount(word.codePointAt(u)); m += 1
    }
    offs(m) = nu
    val best = new Array[Long](m + 1)
    val back = new Array[Int](m + 1) // start position of the winning last piece
    java.util.Arrays.fill(best, 1, m + 1, Long.MinValue)
    var i = 1
    while (i <= m) {
      // j ascending from the LONGEST candidate: later (shorter) pieces
      // must be STRICTLY better to win, so equal scores keep the
      // longest piece and, transitively, the earliest split
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (best(j) != Long.MinValue) {
          val sub = word.substring(offs(j), offs(i))
          val q = pieces.get(sub) match {
            case Some(v) => v
            case None => if (i - j == 1) qUnk else Long.MinValue
          }
          if (q != Long.MinValue && best(j) + q > best(i)) {
            best(i) = best(j) + q
            back(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    // walk back
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = m
    while (k > 0) {
      emitReversed(out, word.substring(offs(back(k)), offs(k)), pieces,
        byteFallback)
      k = back(k)
    }
    out.reverseIterator.toArray
  }

  /** Seed candidates: every substring of every dictionary word up to
    * `maxPieceLen` chars, weighted by the word's corpus count — one
    * bounded explode + one partial-agg groupBy. Single characters are
    * seeded unconditionally (coverage); multi-char candidates keep the
    * top `nMulti` by (count·len, piece) — the SentencePiece seed
    * heuristic (frequent long substrings are the valuable pieces). */
  private def seed(dict: DataFrame, maxPieceLen: Int,
      nMulti: Int): (Seq[(String, Long)], Seq[(String, Long)]) = {
    val subs = dict.select(col("word"), col("count").cast("long").as("c"))
      .select(explode(transform(
        sequence(lit(0), length(col("word")) - 1), i =>
          transform(sequence(lit(1),
            least(lit(maxPieceLen), length(col("word")) - i)), l =>
            col("word").substr(i + 1, l)))).as("row"), col("c"))
      .select(explode(col("row")).as("piece"), col("c"))
      .groupBy("piece").agg(sum(col("c")).as("freq"))
    val chars = subs.where(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy(_._1)
    val multi = subs.where(length(col("piece")) > 1)
      .select(col("piece"), col("freq"),
        (col("freq") * length(col("piece"))).as("w"))
      .orderBy(col("w").desc, col("piece"))
      .limit(nMulti)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    (chars, multi)
  }

  /** Normalize counts into quantized ln-probabilities (+1 smoothing so
    * kept-but-unused pieces stay finite; deterministic given the
    * count map). */
  private def toProbs(counts: Seq[(String, Long)]): Map[String, Long] = {
    val total = counts.map(_._2 + 1L).sum.toDouble
    counts.map { case (p, c) => p -> qln((c + 1L) / total) }.toMap
  }

  private def unkOf(pieces: Map[String, Long]): Long =
    pieces.values.min - 10L * 1000000L

  /** One distributed hard-EM E-step: Viterbi-segment every dictionary
    * word under the current model, emit per-piece used mass
    * (occurrences × word count), partial-agged to ≤ |vocab| rows. */
  private def viterbiCounts(dict: DataFrame, m: Model): Map[String, Long] = {
    val spark = dict.sparkSession
    import spark.implicits._
    val pieces = m.pieces; val maxLen = m.maxPieceLen; val qUnk = m.qUnk
    dict.select(col("word"), col("count").cast("long").as("c"))
      .as[(String, Long)]
      .flatMap { case (w, c) =>
        viterbi(w, pieces, maxLen, qUnk).iterator.map(p => (p, c)) }
      .toDF("piece", "c")
      .groupBy("piece").agg(sum(col("c")).as("used"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Forward-backward expected piece counts for one word under the
    * model — the paper's ACTUAL E-step (Kudo 2018 §3.2 marginalizes
    * over every segmentation; [[viterbi]] counts only the best one).
    * Lattice positions are code points, edges are pieces (unknown
    * single code points ride the UNK penalty, so Z is always finite
    * and coverage never fails); posteriors come from one forward and
    * one backward log-sum-exp pass over the same bounded edge set the
    * Viterbi walk scans (≤ maxLen per position). Per-word arithmetic
    * runs in a FIXED order, so the result is partition-invariant;
    * cross-engine bit-identity is not claimed for the Double
    * transcendentals (same caveat as [[qln]]) — the distributed sum
    * quantizes each word's masses to the 1e-6 grid first. Pairs
    * return sorted by piece for deterministic downstream folds. */
  private[graft] def expectedPieces(word: String, pieces: Map[String, Long],
      maxLen: Int, qUnk: Long): Seq[(String, Double)] = {
    val nu = word.length
    if (nu == 0) return Nil
    val offs = new Array[Int](nu + 1)
    var m = 0
    var u = 0
    while (u < nu) {
      offs(m) = u; u += Character.charCount(word.codePointAt(u)); m += 1
    }
    offs(m) = nu
    val NegInf = Double.NegativeInfinity
    def lp(j: Int, i: Int): Double = {
      val sub = word.substring(offs(j), offs(i))
      pieces.get(sub) match {
        case Some(v) => v / Scale
        case None => if (i - j == 1) qUnk / Scale else NegInf
      }
    }
    def lse(a: Double, b: Double): Double =
      if (a == NegInf) b else if (b == NegInf) a
      else {
        val hi = math.max(a, b)
        hi + math.log1p(math.exp(math.min(a, b) - hi))
      }
    val alpha = new Array[Double](m + 1)
    java.util.Arrays.fill(alpha, NegInf); alpha(0) = 0.0
    var i = 1
    while (i <= m) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (alpha(j) != NegInf) {
          val l = lp(j, i)
          if (l != NegInf) alpha(i) = lse(alpha(i), alpha(j) + l)
        }
        j += 1
      }
      i += 1
    }
    val z = alpha(m) // finite: UNK single-char edges always connect
    val beta = new Array[Double](m + 1)
    java.util.Arrays.fill(beta, NegInf); beta(m) = 0.0
    var j = m - 1
    while (j >= 0) {
      var i2 = j + 1
      val hi = math.min(m, j + maxLen)
      while (i2 <= hi) {
        if (beta(i2) != NegInf) {
          val l = lp(j, i2)
          if (l != NegInf) beta(j) = lse(beta(j), l + beta(i2))
        }
        i2 += 1
      }
      j -= 1
    }
    val acc = scala.collection.mutable.HashMap.empty[String, Double]
    i = 1
    while (i <= m) {
      var j2 = math.max(0, i - maxLen)
      while (j2 < i) {
        if (alpha(j2) != NegInf && beta(i) != NegInf) {
          val l = lp(j2, i)
          if (l != NegInf) {
            val w = math.exp(alpha(j2) + l + beta(i) - z)
            if (w > 0.0) {
              val p = word.substring(offs(j2), offs(i))
              acc.update(p, acc.getOrElse(p, 0.0) + w)
            }
          }
        }
        j2 += 1
      }
      i += 1
    }
    acc.toSeq.sortBy(_._1)
  }

  /** One distributed SOFT E-step: forward-backward expectations per
    * dictionary word ([[expectedPieces]]) × corpus count, quantized to
    * the 1e-6 grid per (word, piece) emission, partial-agged to
    * ≤ |vocab| rows — the same model-sized pull as the hard step.
    * Mass headroom: the Long micro grid caps total expected
    * occurrences near 9 × 10^12 per vocabulary; normalization is
    * scale-free, so a corpus beyond that re-grids the masses, not the
    * algorithm. */
  private def softCounts(dict: DataFrame, m: Model): Map[String, Long] = {
    val spark = dict.sparkSession
    import spark.implicits._
    val pieces = m.pieces; val maxLen = m.maxPieceLen; val qUnk = m.qUnk
    dict.select(col("word"), col("count").cast("long").as("c"))
      .as[(String, Long)]
      .flatMap { case (w, c) =>
        expectedPieces(w, pieces, maxLen, qUnk).iterator.map { case (p, e) =>
          (p, math.round(e * c * Scale)) } }
      .toDF("piece", "cmicro")
      .groupBy("piece").agg(sum(col("cmicro")).as("used"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Train a unigram vocabulary of (about) `targetSize` pieces on a
    * word dictionary ([[Bpe.wordDict]] shape: word, count). Rounds:
    * seed `seedMult`× over-complete, then EM-count + prune by `shrink`
    * until the multi-char set fits the target, then one final
    * re-estimation — every round one dictionary pass. Single-char
    * pieces are never pruned, so `targetSize` is a floor at the
    * alphabet size. */
  def train(dict: DataFrame, targetSize: Int, maxPieceLen: Int = 8,
      seedMult: Int = 4, shrink: Double = 0.75): Model =
    trainCounted(dict, targetSize, maxPieceLen, seedMult, shrink)._1

  /** [[train]] with probe instrumentation: also returns the number of
    * EM prune rounds and the LARGEST driver pull (rows) any step made
    * — the quantity that must stay model-sized for the 100 TB story
    * (UnigramProbe records it in BASELINE at realistic vocab sizes).
    * Identical arithmetic to the uninstrumented path (train IS this). */
  def trainCounted(dict: DataFrame, targetSize: Int, maxPieceLen: Int = 8,
      seedMult: Int = 4, shrink: Double = 0.75): (Model, Int, Long) =
    trainLoop(dict, targetSize, maxPieceLen, seedMult, shrink, viterbiCounts)

  /** [[train]] with the paper's SOFT E-step ([[expectedPieces]] —
    * forward-backward expectations instead of Viterbi counts): pieces
    * that lose every argmax tie still accumulate the marginal mass
    * the paper's likelihood-loss prune would see, so plausible
    * alternatives survive pruning where hard EM starves them
    * (UnigramSpec plants exactly that case). Same seeding, same
    * deterministic prune order, same quantized output grid, same
    * model-sized driver pulls; the l46 reconstruction/persistence
    * contracts hold for both trainers (`l46e` is the soft sibling).
    * Cost: one extra lattice pass per word per round — priced next to
    * the hard trainer in BASELINE (UnigramProbe). */
  def trainSoft(dict: DataFrame, targetSize: Int, maxPieceLen: Int = 8,
      seedMult: Int = 4, shrink: Double = 0.75): Model =
    trainSoftCounted(dict, targetSize, maxPieceLen, seedMult, shrink)._1

  /** [[trainSoft]] with the [[trainCounted]] instrumentation. */
  def trainSoftCounted(dict: DataFrame, targetSize: Int, maxPieceLen: Int = 8,
      seedMult: Int = 4, shrink: Double = 0.75): (Model, Int, Long) =
    trainLoop(dict, targetSize, maxPieceLen, seedMult, shrink, softCounts)

  /** The shared EM skeleton: seed, count-prune rounds under the given
    * E-step, final re-estimation. The hard path ([[trainCounted]])
    * goes through here unchanged — the E-step is the only moving
    * part, so hard/soft differ in nothing else. */
  private def trainLoop(dict: DataFrame, targetSize: Int, maxPieceLen: Int,
      seedMult: Int, shrink: Double,
      counts: (DataFrame, Model) => Map[String, Long]): (Model, Int, Long) = {
    require(targetSize >= 1 && maxPieceLen >= 2, "bad unigram params")
    require(shrink > 0 && shrink < 1, s"shrink in (0,1), got $shrink")
    val (chars, multi0) = seed(dict, maxPieceLen,
      nMulti = math.max(targetSize * seedMult, 1))
    var maxPull = chars.size.toLong + multi0.size
    var multi = multi0
    var model = {
      val p = toProbs(chars ++ multi)
      Model(p, maxPieceLen, unkOf(p))
    }
    val targetMulti = math.max(targetSize - chars.size, 0)
    var rounds = 0
    while (multi.size > targetMulti && rounds < 32) {
      val used = counts(dict, model)
      maxPull = math.max(maxPull, used.size.toLong)
      val keepN = math.max(targetMulti,
        math.floor(multi.size * shrink).toInt)
      // prune the least-used multi pieces (never the single chars);
      // count ties break lexicographic — fully deterministic
      multi = multi.map { case (p, _) => (p, used.getOrElse(p, 0L)) }
        .sortBy { case (p, c) => (-c, p) }.take(keepN)
      val charCounts = chars.map { case (p, _) =>
        (p, used.getOrElse(p, 0L)) }
      model = {
        val p = toProbs(charCounts ++ multi)
        Model(p, maxPieceLen, unkOf(p))
      }
      rounds += 1
    }
    // final re-estimation on the pruned vocabulary
    val used = counts(dict, model)
    maxPull = math.max(maxPull, used.size.toLong)
    val fin = (chars.map(_._1) ++ multi.map(_._1)).distinct
      .map(p => (p, used.getOrElse(p, 0L)))
    val probs = toProbs(fin)
    (Model(probs, maxPieceLen, unkOf(probs)), rounds, maxPull)
  }

  /** SplitMix64 step — the deterministic uniform stream behind
    * [[sampleSegmentation]] (the l09 hash-derived-randomness
    * discipline: no JVM RNG state, same draw on any executor). */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Sample ONE segmentation of `word` from q(seg) ∝ P(seg)^alpha —
    * the subword-regularization draw that is Kudo 2018's actual
    * namesake (§3.1: training-data augmentation samples segmentations
    * instead of always taking the argmax). Forward-filtering
    * backward-sampling over the same bounded lattice as
    * [[expectedPieces]], with every edge score scaled by `alpha`:
    * alpha → ∞ concentrates on the Viterbi best, alpha = 1 samples the
    * true posterior, alpha = 0 is uniform over segmentations. Unknown
    * single code points ride the UNK penalty, so every draw still
    * concatenates back to the word (the reconstruction contract holds
    * for ANY sample — that is what makes l46f oracle-able).
    * Deterministic given (word, seed): uniforms come from a SplitMix64
    * stream keyed by both, so replays and retries reproduce the same
    * corpus. */
  private[graft] def sampleSegmentation(word: String,
      pieces: Map[String, Long], maxLen: Int, qUnk: Long,
      alpha: Double, seed: Long, byteFallback: Boolean = false): Array[String] = {
    val nu = word.length
    if (nu == 0) return Array.empty
    val offs = new Array[Int](nu + 1)
    var m = 0
    var u = 0
    while (u < nu) {
      offs(m) = u; u += Character.charCount(word.codePointAt(u)); m += 1
    }
    offs(m) = nu
    val NegInf = Double.NegativeInfinity
    def lp(j: Int, i: Int): Double = {
      val sub = word.substring(offs(j), offs(i))
      pieces.get(sub) match {
        case Some(v) => alpha * (v / Scale)
        case None => if (i - j == 1) alpha * (qUnk / Scale) else NegInf
      }
    }
    def lse(a: Double, b: Double): Double =
      if (a == NegInf) b else if (b == NegInf) a
      else {
        val hi = math.max(a, b)
        hi + math.log1p(math.exp(math.min(a, b) - hi))
      }
    val fwd = new Array[Double](m + 1)
    java.util.Arrays.fill(fwd, NegInf); fwd(0) = 0.0
    var i = 1
    while (i <= m) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (fwd(j) != NegInf) {
          val l = lp(j, i)
          if (l != NegInf) fwd(i) = lse(fwd(i), fwd(j) + l)
        }
        j += 1
      }
      i += 1
    }
    // backward sampling: at position i, edge (j, i) has posterior
    // exp(fwd(j) + lp(j,i) - fwd(i)) — the weights sum to 1 by the
    // forward recurrence, so one uniform walks the cumulative sum
    var state = mix64(seed ^ ((word.##.toLong << 32) | word.length.toLong))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    i = m
    while (i > 0) {
      state = mix64(state)
      val u01 = (state >>> 11).toDouble / (1L << 53).toDouble
      var acc = 0.0
      var pick = -1
      var j = math.max(0, i - maxLen)
      while (pick < 0 && j < i) {
        if (fwd(j) != NegInf) {
          val l = lp(j, i)
          if (l != NegInf) {
            acc += math.exp(fwd(j) + l - fwd(i))
            if (u01 < acc) pick = j
          }
        }
        j += 1
      }
      if (pick < 0) pick = i - 1 // fp round-off tail: the last edge
      emitReversed(out, word.substring(offs(pick), offs(i)), pieces,
        byteFallback)
      i = pick
    }
    out.reverseIterator.toArray
  }

  /** Sample-tokenize `textCol` (the subword-regularization apply:
    * each word OCCURRENCE draws its own segmentation from
    * q ∝ P^alpha) — appends `uni_tokens`. `seedCol` keys the draw per
    * row (a doc id: stable across replays, different across docs);
    * the occurrence index within the row extends the key, so repeated
    * words in one doc sample independently. No word cache — sampling
    * is the point; the piece table still rides the closure and the
    * corpus never shuffles. */
  def applyUnigramSampled(df: DataFrame, textCol: String, m: Model,
      alpha: Double, seedCol: String): DataFrame = {
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    val outSchema = df.schema
      .add(StructField("uni_tokens", ArrayType(StringType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val textIdx = df.schema.fieldIndex(textCol)
    val seedIdx = df.schema.fieldIndex(seedCol)
    val pieces = m.pieces; val maxLen = m.maxPieceLen; val qUnk = m.qUnk
    val bf = m.byteFallback
    df.mapPartitions { rows =>
      rows.map { r =>
        val text = r.getString(textIdx)
        val rowSeed = if (r.isNullAt(seedIdx)) 0L else r.getLong(seedIdx)
        val toks: Seq[String] =
          if (text == null) null
          else {
            var k = 0L
            text.split("\\s+").iterator.filter(_.nonEmpty).flatMap { w =>
              k += 1
              sampleSegmentation(w, pieces, maxLen, qUnk, alpha,
                mix64(rowSeed * 31L + k), bf)
            }.toSeq
          }
        Row.fromSeq(r.toSeq :+ toks)
      }
    }(enc)
  }

  /** Viterbi-tokenize `textCol` (whitespace words, the [[Bpe.wordDict]]
    * tokenizer) — appends `uni_tokens`. The piece table rides the task
    * closure (model-sized); a per-partition word cache turns repeated
    * words into lookups ([[Bpe.applyBpe]]'s reduction). */
  def applyUnigram(df: DataFrame, textCol: String, m: Model): DataFrame = {
    val outSchema = df.schema
      .add(StructField("uni_tokens", ArrayType(StringType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val textIdx = df.schema.fieldIndex(textCol)
    val pieces = m.pieces; val maxLen = m.maxPieceLen; val qUnk = m.qUnk
    val bf = m.byteFallback
    df.mapPartitions { rows =>
      val cache = new java.util.HashMap[String, Array[String]]()
      rows.map { r =>
        val text = r.getString(textIdx)
        val toks: Seq[String] =
          if (text == null) null
          else text.split("\\s+").iterator.filter(_.nonEmpty).flatMap { w =>
            var t = cache.get(w)
            if (t == null) {
              t = viterbi(w, pieces, maxLen, qUnk, bf); cache.put(w, t)
            }
            t
          }.toSeq
        Row.fromSeq(r.toSeq :+ toks)
      }
    }(enc)
  }

  /** Append `decoded` = [[decodePieces]] of a token-array column —
    * the inverse apply (mapPartitions like the apply tiers: the walk
    * is imperative, the frame never shuffles). */
  def decodeUnigram(df: DataFrame, tokensCol: String,
      outCol: String = "decoded"): DataFrame = {
    val outSchema = df.schema.add(StructField(outCol, StringType))
    val enc = RowEncoder.encoderFor(outSchema)
    val tokIdx = df.schema.fieldIndex(tokensCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val toks = if (r.isNullAt(tokIdx)) null else r.getSeq[String](tokIdx)
        Row.fromSeq(r.toSeq :+ decodePieces(toks))
      }
    }(enc)
  }

  /** Persist a vocabulary as a managed table (piece, q_logp,
    * max_piece_len, q_unk — the [[Bpe.writeVocab]] discipline: train
    * once, tokenize forever). */
  def writeVocab(spark: SparkSession, m: Model, table: String): Unit = {
    import spark.implicits._
    m.pieces.toSeq.sortBy(_._1)
      .map { case (p, q) => (p, q, m.maxPieceLen, m.qUnk, m.byteFallback) }
      .toDF("piece", "q_logp", "max_piece_len", "q_unk", "byte_fallback")
      .write.mode("overwrite").saveAsTable(table)
  }

  /** Load a [[writeVocab]] table back into a model (exact on the
    * integer grid — the round trip changes nothing). Tables written
    * before the byte-fallback column read back with the flag off. */
  def readVocab(spark: SparkSession, table: String): Model = {
    val t = spark.table(table)
    val hasBf = t.columns.contains("byte_fallback")
    val rows = t.select(col("piece"), col("q_logp"), col("max_piece_len"),
        col("q_unk"),
        (if (hasBf) col("byte_fallback") else lit(false)).as("bf"))
      .collect()
    require(rows.nonEmpty, s"empty unigram vocab table $table")
    Model(rows.map(r => r.getString(0) -> r.getLong(1)).toMap,
      rows.head.getInt(2), rows.head.getLong(3), rows.head.getBoolean(4))
  }
}
