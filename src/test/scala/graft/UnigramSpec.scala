package graft

import graft.operators.{Bpe, Unigram}
import org.apache.spark.sql.functions._

/** Unit contracts for the unigram-LM tokenizer (Kudo 2018 / the
  * SentencePiece unigram family — the l46 registry rows carry the
  * reconstruction differential; these pin the Viterbi segmentation
  * arithmetic, tie rules, training determinism, coverage, and the
  * persistence round trip — the BpeSpec discipline). */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def m(ps: (String, Long)*): Unigram.Model =
    Unigram.Model(ps.toMap, maxPieceLen = 8, qUnk = -100000000L)

  private def viterbi(w: String, model: Unigram.Model): Seq[String] =
    Unigram.viterbi(w, model.pieces, model.maxPieceLen, model.qUnk).toSeq

  test("L51: Viterbi picks the max-score segmentation under exact integer sums") {
    // "abc": ab+c = -3-5 = -8 beats a+b+c = -4-4-4 = -12 and abc = -9
    val model = m("a" -> -4000000L, "b" -> -4000000L, "c" -> -5000000L,
      "ab" -> -3000000L, "abc" -> -9000000L)
    assert(viterbi("abc", model) === Seq("ab", "c"))
    // flip: make the whole-word piece win
    val model2 = m("a" -> -4000000L, "b" -> -4000000L, "c" -> -5000000L,
      "ab" -> -3000000L, "abc" -> -7000000L)
    assert(viterbi("abc", model2) === Seq("abc"))
  }

  test("L51: score ties prefer the LONGER piece, then the earlier split") {
    // ab+c and abc tie at -8 → the longer last piece (abc) wins
    val model = m("a" -> -4000000L, "b" -> -4000000L, "c" -> -5000000L,
      "ab" -> -3000000L, "abc" -> -8000000L)
    assert(viterbi("abc", model) === Seq("abc"))
    // a+bc ties ab+c at -8 → longer LAST piece bc wins (earlier split)
    val model3 = m("a" -> -4000000L, "b" -> -4000000L, "c" -> -4000000L,
      "ab" -> -4000000L, "bc" -> -4000000L)
    assert(viterbi("abc", model3) === Seq("a", "bc"))
  }

  test("L51: unknown characters emit themselves at the UNK penalty; coverage never fails") {
    val model = m("a" -> -1000000L)
    assert(viterbi("axa", model) === Seq("a", "x", "a"))
    assert(viterbi("zzz", model) === Seq("z", "z", "z"))
    assert(viterbi("", model) === Seq.empty)
    // a known piece always beats the UNK route
    val model2 = m("a" -> -1000000L, "xy" -> -50000000L)
    assert(viterbi("xy", model2) === Seq("xy"))
  }

  test("L51: supplementary characters segment as whole code points — never lone surrogates (ADVICE r17)") {
    // U+1D11E (𝄞) and U+1F600 (😀) are two UTF-16 units each; a
    // unit-indexed walk would emit invalid lone-surrogate "pieces"
    val clef = "𝄞"
    val smile = "😀"
    val model = m("a" -> -1000000L, "b" -> -1000000L)
    // unknown supplementary chars: ONE UNK piece per code point
    assert(viterbi(s"a${clef}b", model) === Seq("a", clef, "b"))
    assert(viterbi(s"$smile$smile", model) === Seq(smile, smile))
    // every emitted piece is a valid UTF-8 round trip (writeVocab safety)
    viterbi(s"a$clef$smile", model).foreach { p =>
      assert(new String(p.getBytes("UTF-8"), "UTF-8") === p,
        s"piece '$p' must survive a UTF-8 round trip")
    }
    // a known multi-char piece containing a supplementary char wins,
    // and maxLen counts CODE POINTS (matching the seed side's substr)
    val model2 = m("a" -> -1000000L, s"$clef$clef" -> -1500000L)
    assert(viterbi(s"$clef${clef}a", model2) === Seq(s"$clef$clef", "a"))
    // reconstruction contract holds on non-BMP text
    val word = s"ab$clef${smile}ba"
    assert(viterbi(word, model).mkString === word)
    // end-to-end: train + apply on a non-BMP corpus — pieces are
    // valid code-point strings and concatenate back per word
    val texts = Seq.fill(6)(s"$clef$clef $clef$clef $smile") :+ s"ab $smile$clef"
    val trained = Unigram.train(dictOf(texts), targetSize = 8, maxPieceLen = 4)
    trained.pieces.keys.foreach { p =>
      assert(!(p.length == 1 && Character.isSurrogate(p.charAt(0))),
        s"vocab piece '$p' is a lone surrogate")
      assert(new String(p.getBytes("UTF-8"), "UTF-8") === p)
    }
    val toks = Unigram.applyUnigram(texts.toDF("text"), "text", trained)
      .select(col("uni_tokens")).as[Seq[String]].collect()
    toks.zip(texts).foreach { case (ts, t) =>
      assert(ts.mkString === t.replaceAll("\\s+", ""),
        s"pieces must reconstruct '$t'")
    }
  }

  // ---- soft EM (the paper's forward-backward E-step; round 18) ----

  private def expected(w: String, model: Unigram.Model): Map[String, Double] =
    Unigram.expectedPieces(w, model.pieces, model.maxPieceLen, model.qUnk).toMap

  test("L51d: forward-backward posteriors — hand-computed two-path lattice") {
    // "ab": path {ab} has ln-score -1.5, path {a,b} has -2.0; the
    // posterior splits exp(-1.5) : exp(-2.0)
    val model = m("a" -> -1000000L, "b" -> -1000000L, "ab" -> -1500000L)
    val e = expected("ab", model)
    val pAb = math.exp(-1.5) / (math.exp(-1.5) + math.exp(-2.0))
    assert(math.abs(e("ab") - pAb) < 1e-9)
    assert(math.abs(e("a") - (1 - pAb)) < 1e-9)
    assert(math.abs(e("b") - (1 - pAb)) < 1e-9)
  }

  test("L51d: expectations conserve coverage — Σ count·len(piece) equals the word's code-point length") {
    val model = m("a" -> -1000000L, "b" -> -2000000L, "ab" -> -1800000L,
      "ba" -> -2500000L, "aba" -> -4000000L)
    for (w <- Seq("a", "ab", "aba", "abab", "ababa", "xqz", "a𝄞b😀")) {
      val e = expected(w, model)
      val covered = e.map { case (p, c) =>
        c * p.codePointCount(0, p.length) }.sum
      assert(math.abs(covered - w.codePointCount(0, w.length)) < 1e-9,
        s"'$w': covered $covered")
    }
  }

  test("L51d: an argmax-tie loser keeps marginal mass under soft EM where hard EM starves it") {
    // q(ab) == q(a) + q(b): Viterbi's longer-piece tie rule ALWAYS
    // picks 'ab', so hard counts for a and b are zero; the true
    // marginal gives each path half the mass
    val model = m("a" -> -1000000L, "b" -> -1000000L, "ab" -> -2000000L)
    assert(viterbi("ab", model) === Seq("ab"))
    val e = expected("ab", model)
    assert(math.abs(e("ab") - 0.5) < 1e-9 &&
      math.abs(e("a") - 0.5) < 1e-9 && math.abs(e("b") - 0.5) < 1e-9,
      s"soft mass must split the tie: $e")
  }

  test("L51f: subword-regularization sampling — every draw reconstructs; frequencies track the posterior^alpha; deterministic per seed") {
    def sample(w: String, model: Unigram.Model, alpha: Double, seed: Long) =
      Unigram.sampleSegmentation(w, model.pieces, model.maxPieceLen,
        model.qUnk, alpha, seed).toSeq
    // two-path lattice: {ab} at -1.5, {a,b} at -2.0
    val model = m("a" -> -1000000L, "b" -> -1000000L, "ab" -> -1500000L)
    // 1) ANY draw reconstructs (incl. unknown and non-BMP words)
    for (w <- Seq("ab", "abab", "xyz", "a𝄞b"); s <- 0L until 50L)
      assert(sample(w, model, 0.7, s).mkString === w, s"'$w' seed $s")
    // 2) determinism: same (word, seed) → same draw
    assert(sample("abab", model, 1.0, 7L) === sample("abab", model, 1.0, 7L))
    // 3) frequency of the {ab} path over many seeds ≈ its posterior:
    //    alpha=1 → exp(-1.5)/(exp(-1.5)+exp(-2)) ≈ 0.622
    val n = 4000
    def fracAb(alpha: Double) = (0 until n).count(s =>
      sample("ab", model, alpha, s.toLong) == Seq("ab")).toDouble / n
    val p1 = math.exp(-1.5) / (math.exp(-1.5) + math.exp(-2.0))
    assert(math.abs(fracAb(1.0) - p1) < 0.03, s"alpha=1: ${fracAb(1.0)} vs $p1")
    //    alpha=0 → uniform over the two segmentations
    assert(math.abs(fracAb(0.0) - 0.5) < 0.03, s"alpha=0: ${fracAb(0.0)}")
    //    alpha large → concentrates on the Viterbi best
    assert(fracAb(16.0) > 0.99, s"alpha=16: ${fracAb(16.0)}")
    // 4) the DataFrame apply: per-occurrence draws, reconstruction per
    //    doc, replay-deterministic via the seed column
    val docs = Seq((1L, "ab ab ab ab"), (2L, "abab ab"), (3L, null))
      .toDF("doc_id", "text")
    val trained = m("a" -> -1000000L, "b" -> -1000000L, "ab" -> -1500000L)
    def run() = Unigram.applyUnigramSampled(docs, "text", trained,
        alpha = 1.0, seedCol = "doc_id")
      .select(col("doc_id"), col("uni_tokens")).collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    val a = run(); val b = run()
    assert(a === b, "sampling must be replay-deterministic")
    assert(a(3L) === None) // NULL passthrough
    assert(a(1L).get.mkString === "abababab")
    assert(a(2L).get.mkString === "ababab")
  }

  test("L51d: trainSoft is deterministic, partition-invariant, covered, and reconstructs") {
    val a = Unigram.trainSoft(dictOf(corpus), targetSize = 24, maxPieceLen = 6)
    val b = Unigram.trainSoft(dictOf(corpus).repartition(7),
      targetSize = 24, maxPieceLen = 6)
    assert(a.pieces === b.pieces && a.qUnk === b.qUnk)
    // single chars all covered (the prune floor), target respected
    val chars = corpus.flatMap(_.replaceAll("\\s+", "").toSeq).toSet
    assert(chars.forall(c => a.pieces.contains(c.toString)))
    assert(a.pieces.size <= math.max(24, chars.size))
    // apply is Viterbi argmax under the soft-fit probabilities: the
    // reconstruction contract is E-step-independent
    val toks = Unigram.applyUnigram(corpus.toDF("text"), "text", a)
      .select(col("uni_tokens")).as[Seq[String]].collect()
    toks.zip(corpus).foreach { case (ts, t) =>
      assert(ts.mkString === t.replaceAll("\\s+", ""))
    }
  }

  private def dictOf(texts: Seq[String]) =
    Bpe.wordDict(texts.toDF("text"), "text")

  private val corpus = Seq.fill(20)(
    "internationalization and internationalization again") ++
    Seq.fill(10)("the nation spoke of nationalization") ++
    Seq.fill(5)("other words appear here too")

  test("L51: training is deterministic and partition-invariant; single chars always covered") {
    val d1 = dictOf(corpus)
    val m1 = Unigram.train(d1, targetSize = 40, maxPieceLen = 6)
    val m2 = Unigram.train(d1.repartition(7), targetSize = 40, maxPieceLen = 6)
    assert(m1 === m2, "training must not depend on partitioning")
    val alphabet = corpus.flatMap(_.split("\\s+")).flatMap(_.toSeq).toSet
    assert(alphabet.forall(c => m1.pieces.contains(c.toString)),
      "every corpus character must be a piece")
    // the over-complete seed pruned down: multi-char pieces fit the target
    val nMulti = m1.pieces.keys.count(_.length > 1)
    assert(nMulti <= 40, s"multi pieces must respect the target: $nMulti")
    assert(nMulti > 0, "frequent substrings must survive as pieces")
  }

  test("L51: tokenization compresses — frequent words use far fewer pieces than characters") {
    val model = Unigram.train(dictOf(corpus), targetSize = 40, maxPieceLen = 6)
    val toks = viterbi("internationalization", model)
    assert(toks.mkString === "internationalization", "pieces must concatenate back")
    assert(toks.size <= 6,
      s"a 20-char word the corpus repeats must compress well: $toks")
  }

  test("L51: applyUnigram — reconstruction covers every non-space char; NULL text passes through") {
    val model = Unigram.train(dictOf(corpus), targetSize = 40, maxPieceLen = 6)
    val df = (corpus.zipWithIndex.map { case (t, i) => (i.toLong, Option(t)) } :+
      ((999L, Option.empty[String]))).toDF("id", "text")
    val out = Unigram.applyUnigram(df, "text", model)
      .select($"id", $"text",
        aggregate(transform($"uni_tokens", t => length(t).cast("long")),
          lit(0L), (a, x) => a + x).as("n_chars"),
        length(regexp_replace($"text", "\\s", "")).cast("long").as("raw_chars"),
        $"uni_tokens".isNull.as("null_toks"))
      .collect()
    out.foreach { r =>
      if (r.getBoolean(4)) assert(r.getLong(0) === 999L, "only NULL text yields NULL tokens")
      else assert(r.getLong(2) === r.getLong(3),
        s"id ${r.getLong(0)}: piece chars ${r.getLong(2)} != raw ${r.getLong(3)}")
    }
  }

  test("L51: persisted vocabulary round-trips exactly (the l17c discipline)") {
    val table = "t_unigram_vocab"
    graft.operators.Layout.dropTableAndLocation(spark, table)
    try {
      val model = Unigram.train(dictOf(corpus), targetSize = 30, maxPieceLen = 5)
      Unigram.writeVocab(spark, model, table)
      val back = Unigram.readVocab(spark, table)
      assert(back === model, "write→read must be exact on the integer grid")
    } finally graft.operators.Layout.dropTableAndLocation(spark, table)
  }

  test("L51g: byte-fallback — apply is TOTAL over the fixed vocab, novel chars round-trip through <0xNN> pieces, the flag persists (SentencePiece byte_fallback)") {
    val base = Unigram.train(dictOf(corpus), targetSize = 40, maxPieceLen = 6)
    val model = Unigram.withByteFallback(base)
    val fixedVocab = model.pieces.keySet ++ Unigram.byteTokens
    // é (2 UTF-8 bytes) after corpus-covered chars: the tail expands
    val toks = Unigram.viterbi("nationé", model.pieces,
      model.maxPieceLen, model.qUnk, byteFallback = true).toSeq
    assert(toks.takeRight(2) === Seq("<0xC3>", "<0xA9>"), toks.toString)
    assert(Unigram.decodePieces(toks) === "nationé")
    // a supplementary code point expands to its 4 bytes and reassembles
    val globe = "🌍" // U+1F30D
    val em = Unigram.viterbi(globe, model.pieces, model.maxPieceLen,
      model.qUnk, byteFallback = true).toSeq
    assert(em.size === 4 && em.forall(Unigram.byteTokens.contains), em.toString)
    assert(Unigram.decodePieces(em) === globe)
    // apply over a mixed doc: EVERY token is in the fixed vocabulary
    // (the embedding-table totality the recipe exists for) and the
    // decode column helper restores the whitespace-free text
    val novel = s"nationé 中文 $globe word"
    val df = Seq((1L, novel)).toDF("id", "text")
    val out = Unigram.applyUnigram(df, "text", model)
    val tokens = out.select($"uni_tokens").as[Seq[String]].head()
    assert(tokens.forall(fixedVocab),
      s"out-of-vocab tokens: ${tokens.filterNot(fixedVocab)}")
    assert(Unigram.decodePieces(tokens) === novel.replaceAll("\\s", ""))
    assert(Unigram.decodeUnigram(out, "uni_tokens")
      .select($"decoded").as[String].head() === novel.replaceAll("\\s", ""))
    // the sampled path honors the flag with the same round trip
    val samp = Unigram.sampleSegmentation("nationé", model.pieces,
      model.maxPieceLen, model.qUnk, alpha = 0.5, seed = 7L,
      byteFallback = true).toSeq
    assert(samp.forall(fixedVocab), samp.toString)
    assert(Unigram.decodePieces(samp) === "nationé")
    // off by default: the old emit-itself UNK behavior is unchanged
    val off = Unigram.viterbi("nationé", base.pieces, base.maxPieceLen,
      base.qUnk).toSeq
    assert(off.last === "é")
    // the flag survives the vocabulary table round trip
    val table = "t_unigram_vocab_bf"
    graft.operators.Layout.dropTableAndLocation(spark, table)
    try {
      Unigram.writeVocab(spark, model, table)
      assert(Unigram.readVocab(spark, table) === model)
    } finally graft.operators.Layout.dropTableAndLocation(spark, table)
  }
}
