package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE vocabulary training (Sennrich 2016 re-expressed Spark-first):
  * hand-computed merge sequences on the paper-style fixture, greedy
  * overlap semantics, early exhaustion, determinism, and the
  * reconstruction contract the l17b oracle stands on. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus =
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  test("learnMerges: hand-computed sequence on the classic fixture, ties broken lexicographically") {
    val docs = Seq(corpus.mkString(" ")).toDF("content")
    val merges = Bpe.learnMerges(Bpe.wordDict(docs, "content"), k = 8)
    val expected = Seq(
      ("e", "s", 9L), // ties (e,s)/(s,t) at 9 → lexicographic
      ("es", "t", 9L),
      ("l", "o", 7L), // ties (l,o)/(o,w) at 7
      ("lo", "w", 7L),
      ("e", "w", 6L), // ties (e,w)/(n,e)/(w,est) at 6
      ("ew", "est", 6L),
      ("n", "ewest", 6L),
      ("d", "est", 3L)) // ties (d,est)/(i,d)/(w,i) at 3
    assert(merges.map(m => (m.left, m.right, m.freq)) == expected)
    assert(merges.map(_.rank) == (0 until 8))
  }

  test("learnMerges: greedy left-to-right — an overlapping pair does not re-merge") {
    val docs = Seq("aaa").toDF("content")
    val merges = Bpe.learnMerges(Bpe.wordDict(docs, "content"), k = 2)
    // "aaa" has pairs (a,a) twice but greedy merging yields [aa, a], so
    // round 2 sees exactly one (aa, a) pair
    assert(merges.map(m => (m.left, m.right, m.freq)) ==
      Seq(("a", "a", 2L), ("aa", "a", 1L)))
  }

  test("learnMerges: stops early when every word is fully merged") {
    val docs = Seq("ab ab ab").toDF("content")
    val merges = Bpe.learnMerges(Bpe.wordDict(docs, "content"), k = 5)
    assert(merges.map(m => (m.left, m.right, m.freq)) == Seq(("a", "b", 3L)))
  }

  test("learnMerges is deterministic across runs") {
    val docs = Seq(corpus.mkString(" "), "the quick brown fox the quick").toDF("content")
    val a = Bpe.learnMerges(Bpe.wordDict(docs, "content"), k = 6)
    val b = Bpe.learnMerges(Bpe.wordDict(docs, "content"), k = 6)
    assert(a == b)
  }

  test("applyBpe: tokenizes unseen words with the learned vocabulary; events counted independently") {
    val train = Seq(corpus.mkString(" ")).toDF("content")
    val merges = Bpe.learnMerges(Bpe.wordDict(train, "content"), k = 8)
    val out = Bpe.applyBpe(Seq((1L, "lowest")).toDF("id", "content"), "content", merges)
      .select($"bpe_tokens", $"bpe_merge_events").collect().head
    // lowest = l,o,w,e,s,t → (e,s) → (es,t) → (l,o) → (lo,w) → [low, est]
    assert(out.getSeq[String](0) == Seq("low", "est"))
    assert(out.getLong(1) == 4L) // 6 chars → 2 tokens in 4 merge events
  }

  test("supplementary characters: apply-side symbols are code points, matching training's split (ADVICE r17)") {
    // training splits words Spark-side with split(word, '') — Java
    // regex boundaries are code-point-grained — so the executor-side
    // splitter must stride code points too, or merges learned over
    // '𝄞' never match apply's lone-surrogate halves
    val clef = "𝄞" // U+1D11E, two UTF-16 units
    val docs = Seq.fill(8)(s"$clef$clef$clef$clef").toDF("content")
    val merges = Bpe.learnMerges(Bpe.wordDict(docs, "content"), k = 2)
    assert(merges.nonEmpty, "a merge over the supplementary char must be learnable")
    assert(merges.head.left === clef && merges.head.right === clef)
    val out = Bpe.applyBpe(Seq((1L, s"$clef$clef ab")).toDF("id", "content"),
      "content", merges)
      .select($"bpe_tokens").as[Seq[String]].collect().head
    assert(out.contains(s"$clef$clef"),
      s"the learned merge must fire at apply time: $out")
    out.foreach { t =>
      assert(!(t.length == 1 && Character.isSurrogate(t.charAt(0))),
        s"token '$t' is a lone surrogate")
    }
    // pretokenized chunking strides code points: a maxWordLen boundary
    // must not cut a surrogate pair in half
    val longRun = clef * 10
    val outP = Bpe.applyBpePretokenized(
      Seq((1L, longRun)).toDF("id", "content"), "content", merges, maxWordLen = 3)
      .select($"bpe_tokens").as[Seq[String]].collect().head
    assert(outP.mkString === longRun, s"chunked tokens must reconstruct: $outP")
    outP.foreach(t => assert(new String(t.getBytes("UTF-8"), "UTF-8") === t))
  }

  test("reconstruction contract: token chars and tokens+events both equal the whitespace-free char count") {
    val docs = Seq(
      (1L, corpus.mkString(" ")),
      (2L, "  leading and   irregular\tspacing around words  "),
      (3L, "singleword"),
      (4L, "")).toDF("doc_id", "content")
    val merges = Bpe.learnMerges(Bpe.wordDict(docs, "content"), k = 5)
    val rows = Bpe.applyBpe(docs, "content", merges)
      .select($"doc_id", $"content", $"bpe_tokens", $"bpe_merge_events")
      .collect()
    for (r <- rows) {
      val chars = r.getString(1).replaceAll("\\s", "").length.toLong
      val tokens = r.getSeq[String](2)
      assert(tokens.map(_.length).sum.toLong == chars, s"char total, doc ${r.getLong(0)}")
      assert(tokens.size + r.getLong(3) == chars, s"token+event total, doc ${r.getLong(0)}")
      // concatenated tokens reproduce the original non-whitespace text
      assert(tokens.mkString == r.getString(1).replaceAll("\\s+", ""),
        s"reconstruction, doc ${r.getLong(0)}")
    }
  }

  test("persisted vocab: write->read round-trips exactly; apply-from-table equals direct apply") {
    import graft.operators.Layout
    val table = "t_bpe_vocab"
    Layout.dropTableAndLocation(spark, table)
    try {
      val train = Seq(corpus.mkString(" ")).toDF("content")
      val merges = Bpe.learnMerges(Bpe.wordDict(train, "content"), k = 8)
      Bpe.writeVocab(spark, merges, table)
      assert(Bpe.readVocab(spark, table) == merges) // ranks, pairs, freqs
      val docs = Seq((1L, "lowest"), (2L, "newest widest")).toDF("id", "content")
      val direct = Bpe.applyBpe(docs, "content", merges)
        .select($"id", $"bpe_tokens", $"bpe_merge_events").collect().toSeq
      val fromTable = Bpe.applyBpeFromTable(spark, docs, "content", table)
        .select($"id", $"bpe_tokens", $"bpe_merge_events").collect().toSeq
      assert(fromTable == direct)
      // overwrite semantics: a retrained vocab replaces, never appends
      Bpe.writeVocab(spark, merges.take(3), table)
      assert(Bpe.readVocab(spark, table) == merges.take(3))
    } finally Layout.dropTableAndLocation(spark, table)
  }

  // ---- batched training (the 32k-vocab round-count fix) ------------

  /** Zipf-ish deterministic dictionary: 300 pseudo-random words over a
    * 12-letter alphabet with 1/rank counts — diverse enough that the
    * batched walk finds conflict-free prefixes, adversarial enough
    * (shared letters, repeated substrings, count ties in the tail) to
    * exercise every batch-selection rule. */
  private def zipfDict = {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghijkl"
    (1 to 300).map { i =>
      val w = (0 until (3 + rnd.nextInt(9)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      (w + i.toString, 1L + 3000L / i) // rank suffix keeps words distinct
    }.toDF("word", "count")
  }

  test("batched learnMerges is bit-identical to the serial loop at k=64") {
    val dict = zipfDict
    val serial = Bpe.learnMergesSerial(dict, k = 64)
    assert(serial.length == 64)
    for (mb <- Seq(2, 8, 64)) {
      val batched = Bpe.learnMerges(dict, k = 64, maxBatch = mb,
        window = math.max(mb * 4, 16))
      assert(batched == serial, s"maxBatch=$mb diverged from serial")
    }
  }

  test("batched learnMerges at maxBatch=1 degrades exactly to serial") {
    val docs = Seq(corpus.mkString(" ")).toDF("content")
    val dict = Bpe.wordDict(docs, "content")
    assert(Bpe.learnMerges(dict, k = 8, maxBatch = 1, window = 16) ==
      Bpe.learnMergesSerial(dict, k = 8))
  }

  test("batching takes measurably fewer driver rounds on a Zipf dictionary") {
    val (merges, rounds) = Bpe.learnMergesCounted(zipfDict, k = 64)
    assert(merges.length == 64)
    // exactness caps how hard a flat-tied tail can batch, but a Zipf
    // head must fold several merges per round — the whole point
    assert(rounds < 40, s"expected < 40 rounds for 64 merges, got $rounds")
  }

  test("applyBpe min-rank iteration equals the full rank-order pass") {
    // reference semantics: every merge applied fully, in rank order —
    // the paper's (and the training rewrite's) formulation. applyBpe
    // walks min-rank-first instead (O(used-ranks) not O(k) per word);
    // this pins the equivalence on 300 diverse pseudo-random words.
    val dict = zipfDict
    val merges = Bpe.learnMerges(dict, k = 64)
    def ref(w: String): Seq[String] = {
      var syms = w.toCharArray.map(_.toString).toSeq
      merges.sortBy(_.rank).foreach { m =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == m.left && syms(i + 1) == m.right) {
            buf += m.left + m.right; i += 2
          } else { buf += syms(i); i += 1 }
        }
        syms = buf.toSeq
      }
      syms
    }
    val rows = Bpe.applyBpe(dict.select($"word".as("content")), "content", merges)
      .select($"content", $"bpe_tokens").collect()
    assert(rows.length == 300)
    rows.foreach { r =>
      assert(r.getSeq[String](1) == ref(r.getString(0)),
        s"tokenization diverged on '${r.getString(0)}'")
    }
  }

  test("selectBatch: never empty — a first-pair knownSymbols collision is forced through as the serial singleton") {
    // the r10 ADVICE hang: top pulled pair's output already a known
    // symbol (double-creator class) → the walk rejects position 0,
    // accepted is empty, and an empty batch would spin the training
    // loop forever. The forced singleton IS the serial round.
    val pulled = Array(("ab", "c", 10L), ("x", "y", 9L), ("p", "q", 8L))
    val batch = Bpe.selectBatch(pulled, wanted = 8,
      knownSymbols = Set("abc"), windowFull = false)
    assert(batch == Seq(("ab", "c", 10L)))
    // sanity on the normal path: no collision → clean prefix accepted
    val clean = Bpe.selectBatch(pulled, wanted = 8,
      knownSymbols = Set.empty[String], windowFull = false)
    assert(clean == pulled.toSeq)
  }

  test("selectBatch: a forced singleton never spells a learned component — skips to the next safe pair, empty when none") {
    // the r11 ADVICE case: pulled.head's output "abc" is BOTH a known
    // symbol (forcing the singleton path) AND a component of an
    // already-learned merge — emitting it would train a vocabulary
    // validateMinRankSafe rejects at applyBpe time. The forced path
    // must skip to the highest-frequency component-safe pair instead.
    val pulled = Array(("ab", "c", 10L), ("x", "y", 9L), ("p", "q", 8L))
    val batch = Bpe.selectBatch(pulled, wanted = 8,
      knownSymbols = Set("abc"), windowFull = false,
      learnedComponent = Set("abc"))
    assert(batch == Seq(("x", "y", 9L)))
    // every pulled pair colliding → empty batch (training terminates
    // instead of emitting an unusable merge or spinning)
    val none = Bpe.selectBatch(Array(("ab", "c", 10L)), wanted = 8,
      knownSymbols = Set("abc"), windowFull = false,
      learnedComponent = Set("abc"))
    assert(none.isEmpty)
    // end-to-end: the emitted vocabulary always passes its own apply
    // path's precondition (the exact failure the ADVICE described)
    Bpe.validateMinRankSafe(
      Seq(Bpe.Merge(0, "a", "abc", 5L), Bpe.Merge(1, "x", "y", 9L)))
  }

  test("selectBatch: hazard bound can strip the whole accepted prefix — still emits the serial singleton") {
    // accepted = [(a,b,5)]; violator (b,z,5) feeds a hazard with the
    // same count, so H=5 and the strict prefix (freq > H) is empty —
    // accepted.take(1) must carry the round, not an empty batch
    val pulled = Array(("a", "b", 5L), ("b", "z", 5L))
    val batch = Bpe.selectBatch(pulled, wanted = 8,
      knownSymbols = Set.empty[String], windowFull = false)
    assert(batch == Seq(("a", "b", 5L)))
  }

  test("validateMinRankSafe: rejects a vocab whose later output spells an earlier component") {
    import graft.operators.Bpe.Merge
    // rank 0 uses component "bc"; rank 2 output "bc" would create new
    // rank-0 sites after the fact → min-rank-first diverges → loud fail
    val bad = Seq(Merge(0, "a", "bc", 9L), Merge(1, "x", "y", 8L),
      Merge(2, "b", "c", 7L))
    val e = intercept[IllegalArgumentException] {
      Bpe.applyBpe(Seq((1L, "abc")).toDF("id", "content"), "content", bad)
    }
    assert(e.getMessage.contains("min-rank-first"))
    // duplicate OUTPUTS are fine (the forced-singleton/serial class):
    // ("a","bc") and ("ab","c") both spell "abc" — no back-edge
    val dup = Seq(Merge(0, "b", "c", 9L), Merge(1, "a", "bc", 8L),
      Merge(2, "a", "b", 7L), Merge(3, "ab", "c", 6L))
    Bpe.validateMinRankSafe(dup) // must not throw
  }

  test("pre-tokenized dictionary: a whitespace-free (CJK) corpus keeps the dictionary reduction, trains, and reconstructs") {
    // a pseudo-CJK corpus: no whitespace anywhere, heavy character
    // n-gram repetition across lines (the structure BPE exploits)
    val phrases = Seq("数据处理引擎", "数据处理管道", "分布式数据处理",
      "引擎与管道", "数据引擎")
    val docs = (0 until 60).map(i => phrases(i % phrases.size) * 3 + phrases((i + 1) % phrases.size))
      .toDF("content")
    // whitespace splitting DEGENERATES: every distinct line is one
    // "word" — dictionary ≈ corpus, the reduction is gone
    val flat = Bpe.wordDict(docs, "content").collect()
    assert(flat.forall(_.getString(0).length > 16),
      "whitespace splitting should yield whole-line words on CJK")
    // the bounded pre-tokenizer restores it: every word ≤ maxWordLen,
    // and the dictionary is shared n-gram chunks, far fewer than a
    // per-line vocabulary of the same corpus under distinct ids
    val dict = Bpe.wordDictPretokenized(docs, "content", maxWordLen = 8)
    val words = dict.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(words.forall(_._1.length <= 8), "chunking must bound word length")
    assert(words.map(_._2).sum > words.length * 3,
      "pre-tokens must REPEAT across lines (the dictionary reduction)")
    // trains and round-trips: total reconstruction over non-whitespace
    // chars, and merge events account exactly for the length reduction
    val merges = Bpe.learnMerges(dict, k = 24, maxBatch = 8, window = 64)
    assert(merges.nonEmpty)
    val rows = Bpe.applyBpePretokenized(docs, "content", merges, maxWordLen = 8)
      .select($"content", $"bpe_tokens", $"bpe_merge_events").collect()
    rows.foreach { r =>
      val text = r.getString(0)
      val toks = r.getSeq[String](1)
      assert(toks.map(_.length).sum === text.length,
        "pre-tokens must cover every non-whitespace char exactly once")
      assert(toks.length.toLong + r.getLong(2) === text.length,
        "token count + merge events must equal the char count")
      assert(toks.exists(_.length > 1), "no merge ever applied")
    }
    // mixed content: whitespace still separates, punctuation splits off
    val mixed = Seq("数据abc处理 def!引擎").toDF("content")
    val mts = Bpe.applyBpePretokenized(mixed, "content", merges, maxWordLen = 8)
      .select($"bpe_tokens").collect()(0).getSeq[String](0)
    assert(mts.mkString === "数据abc处理def!引擎".replace(" ", ""))
  }

  test("wordDict: one row per distinct word with corpus counts") {
    val docs = Seq("a b a", "b  c").toDF("content")
    val dict = Bpe.wordDict(docs, "content").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dict == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }
}
