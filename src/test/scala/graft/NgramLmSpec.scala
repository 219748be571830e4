package graft

import graft.operators.NgramLm
import org.apache.spark.sql.functions._

/** Char-bigram LM training + scoring (the CCNet-style quality leg).
  * The registry rows (l27/l27b) cover the full DuckDB differential;
  * these cases pin the arithmetic on a hand-checkable fixture and the
  * contracts the oracle cannot see (NULL/short texts, unseen classes,
  * plan shape). */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // "abab" + "ab": bigrams ab=3, ba=1; chars {a,b} → V=3.
  // ctx a: ab(3) → cc=3; ctx b: ba(1) → cc=1.
  private lazy val lm = NgramLm.trainCharBigram(
    Seq("abab", "ab").toDF("text"), "text")

  test("training counts and smoothing on a hand-checked fixture") {
    assert(lm.vocab === 3L)
    val big = lm.big.as[(String, Long)].collect().toMap
    // P(b|a) = (3+1)/(3+3); P(a|b) = (1+1)/(1+3)
    assert(big("ab") === math.round(math.log(4.0 / 6.0) * 1e6))
    assert(big("ba") === math.round(math.log(2.0 / 4.0) * 1e6))
    val ctx = lm.ctx.as[(String, Long)].collect().toMap
    // unseen after a: 1/(3+3); after b: 1/(1+3)
    assert(ctx("a") === math.round(math.log(1.0 / 6.0) * 1e6))
    assert(ctx("b") === math.round(math.log(1.0 / 4.0) * 1e6))
    assert(lm.qUnseen === math.round(math.log(1.0 / 3.0) * 1e6))
  }

  test("scoring: seen, unseen-in-context, unseen-context, short and NULL texts") {
    val docs = Seq(
      (1L, "aba"),   // ab + ba: both seen
      (2L, "aa"),    // unseen bigram, seen context a → q0(a)
      (3L, "xy"),    // unseen context → qUnseen
      (4L, "a"),     // no bigram → n_big 0, NULL score
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = NgramLm.scoreDocs(docs, "text", "doc_id", lm)
      .select($"doc_id", $"n_big", $"q_sum", $"avg_logp")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val qAb = math.round(math.log(4.0 / 6.0) * 1e6)
    val qBa = math.round(math.log(2.0 / 4.0) * 1e6)
    val q0a = math.round(math.log(1.0 / 6.0) * 1e6)
    assert(out(1L) === ((2L, Some(qAb + qBa), Some((qAb + qBa) / 2e6))))
    assert(out(2L) === ((1L, Some(q0a), Some(q0a / 1e6))))
    assert(out(3L) === ((1L, Some(lm.qUnseen), Some(lm.qUnseen / 1e6))))
    assert(out(4L) === ((0L, None, None)))
    assert(out(5L) === ((0L, None, None)))
  }

  test("perplexity column and the clean-vs-gibberish contrast direction") {
    val clean = Seq.tabulate(40)(i => (i.toLong, "the table scans rows fast and the query joins the table"))
      .toDF("doc_id", "text")
    val model = NgramLm.trainCharBigram(clean, "text")
    val probe = Seq((100L, "the table scans rows"), (101L, "qjz xvk wqq zzj pqx"))
      .toDF("doc_id", "text")
    val rows = NgramLm.withPerplexity(probe, "text", "doc_id", model)
      .select($"doc_id", $"avg_logp", $"ppl").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows(100L)._1 > rows(101L)._1, s"clean must outscore gibberish: $rows")
    assert(rows(100L)._2 < rows(101L)._2, s"clean perplexity must be lower: $rows")
    assert(rows(100L)._2 === math.round(math.exp(-rows(100L)._1) * 1e6) / 1e6)
  }

  test("persisted model: write/read round-trips and scores identically to the in-memory model") {
    val docs = Seq((1L, "aba"), (2L, "xy"), (3L, "aa")).toDF("doc_id", "text")
    val direct = NgramLm.scoreDocs(docs, "text", "doc_id", lm)
      .select($"doc_id", $"q_sum", $"n_big").collect().map(_.toSeq).toSet
    NgramLm.writeLm(spark, lm, "t_lm_rt")
    try {
      assert(NgramLm.lmExists(spark, "t_lm_rt"))
      val loaded = NgramLm.readLm(spark, "t_lm_rt")
      assert(loaded.vocab === lm.vocab && loaded.qUnseen === lm.qUnseen)
      val viaTable = NgramLm.scoreDocs(docs, "text", "doc_id", loaded)
        .select($"doc_id", $"q_sum", $"n_big").collect().map(_.toSeq).toSet
      assert(viaTable === direct, "persisted model diverged from in-memory")
    } finally Seq("_lmb", "_lmc", "_lmm").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS t_lm_rt$s"))
    assert(!NgramLm.lmExists(spark, "t_lm_rt"))
  }

  test("L27c buckets: ring-sampled terciles split roughly in thirds, unscored routes evidence-free docs, result is partitioning-invariant") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
      .unionByName(Seq((90001L, ""), (90002L, "x"),
        (90003L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val lmBig = NgramLm.trainCharBigram(docs.where($"doc_id" % 3 === 0), "text")
    val scored = NgramLm.scoreDocs(docs, "text", "doc_id", lmBig)
    val buckets = NgramLm.perplexityBuckets(scored, "doc_id", ringPct = 50)
      .select($"doc_id", $"bucket").as[(Long, String)].collect().toMap
    // evidence-free docs (empty / 1-char / NULL text) route to unscored
    assert(Seq(90001L, 90002L, 90003L).forall(buckets(_) == "unscored"),
      s"${buckets.view.filterKeys(_ >= 90000L).toMap}")
    // thresholds from a 50% ring sample split the scored corpus into
    // rough thirds — each bucket holds at least a sixth of the docs
    val counts = buckets.values.groupBy(identity).view.mapValues(_.size).toMap
    val scoredN = buckets.size - 3
    Seq("head", "middle", "tail").foreach { b =>
      assert(counts.getOrElse(b, 0) >= scoredN / 6,
        s"bucket $b degenerate: $counts")
    }
    // head really is the highest-avg_logp (lowest-perplexity) slice
    val lp = scored.where($"n_big" > 0).select($"doc_id", $"avg_logp")
      .as[(Long, Double)].collect().toMap
    val minHead = lp.collect { case (id, v) if buckets(id) == "head" => v }.min
    val maxTail = lp.collect { case (id, v) if buckets(id) == "tail" => v }.max
    assert(minHead > maxTail, s"head/tail overlap: $minHead <= $maxTail")
    // partitioning-invariant: same buckets from a 7-way repartition
    val re = NgramLm.perplexityBuckets(
        NgramLm.scoreDocs(docs.repartition(7), "text", "doc_id", lmBig),
        "doc_id", ringPct = 50)
      .select($"doc_id", $"bucket").as[(Long, String)].collect().toMap
    assert(re === buckets, "buckets changed under repartitioning")
  }

  test("L27c escape hatch: approxQuantile thresholds bucket identically to the exact nearest-rank path on the fixture") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val lmBig = NgramLm.trainCharBigram(docs.where($"doc_id" % 3 === 0), "text")
    val scored = NgramLm.scoreDocs(docs, "text", "doc_id", lmBig)
      .localCheckpoint(true)
    val thExact = NgramLm.bucketThresholds(scored, "doc_id", ringPct = 50)
    val thApprox = NgramLm.bucketThresholds(scored, "doc_id", ringPct = 50,
      exact = false)
    // on a sample where approxErr × n < 1 the GK summary is exact and
    // the centered probabilities land on the same nearest-rank rows
    assert(thApprox.b1Logp === thExact.b1Logp &&
      thApprox.b2Logp === thExact.b2Logp,
      s"approx ($thApprox) vs exact ($thExact) boundary values differ")
    def bucketsOf(th: NgramLm.PplThresholds) = scored
      .withColumn("bucket", NgramLm.bucketColumn(
        $"avg_logp", $"doc_id".cast("long"), $"n_big", th))
      .select($"doc_id", $"bucket").as[(Long, String)].collect().toMap
    assert(bucketsOf(thApprox) === bucketsOf(thExact),
      "both threshold paths must bucket the fixture identically")
  }

  test("plan shape: model joins broadcast; one exchange (doc agg), none for the corpus text") {
    val docs = Seq.tabulate(50)(i => (i.toLong, s"doc $i text sample")).toDF("doc_id", "text")
    val scored = NgramLm.scoreDocs(docs, "text", "doc_id", lm)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"model join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffle join anywhere:\n$plan")
  }
}
