package graft

import graft.operators.{Dsir => DS}
import org.apache.spark.sql.functions._

/** Planted contracts for DSIR importance resampling (the l43 registry
  * row carries the cross-engine retrain differential; these pin the
  * SELECTION behavior): hand-computed λ on a tiny fixture, held-out
  * target-like docs out-weigh gibberish, Gumbel top-k equals the
  * brute-force ranking and plans as TakeOrderedAndProject, plus
  * determinism, the NULL conventions, and the persistence round-trip. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val targetDocs = Seq(
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a short story about the history of science and the people in it",
    "many readers enjoy long books that explain ideas in plain words",
    "the weather in the north was cold and the days were short",
    "good food and good friends make the evening pass quickly",
    "she walked to the market in the morning to buy fresh bread")

  private def gibberish(t: String): String =
    t.map(c => if (c >= 'a' && c <= 'z') ('z' - (c - 'a')).toChar else c)

  test("L47: hand-computed λ on a one-token fixture") {
    // target = 2×"aa", raw = 1×"aa" + 1×"bb": single-token docs carry
    // no bigrams, so the feature space is {aa, bb} and every count is
    // visible by hand. dim large enough that aa/bb cannot collide
    // (polynomial fold: aa → ((7*31+97)*31+97) % 1000003 = 7041,
    // bb → 7073 — distinct mod 8192).
    val target = Seq((1L, "aa"), (2L, "aa")).toDF("id", "text")
    val raw = Seq((3L, "aa"), (4L, "bb")).toDF("id", "text")
    val m = DS.train(target, raw, "text", dim = 8192)
    assert(m.lambdaMicro.size == 2, s"expected 2 observed buckets: $m")
    val np = 2L; val nq = 2L; val dim = 8192
    def lam(cp: Long, cq: Long): Long = {
      // half-away-from-zero, matching the operator (math.round would
      // pull a negative .5 tie toward +∞)
      val v = (math.log((cp + 1.0) / (np + dim)) -
        math.log((cq + 1.0) / (nq + dim))) * 1e6
      (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
    }
    val bAa = ((7L * 31 + 97) * 31 + 97) % 1000003 % dim
    val bBb = ((7L * 31 + 98) * 31 + 98) % 1000003 % dim
    assert(m.lambdaMicro(bAa.toInt) == lam(2, 1), s"λ(aa) wrong: $m")
    assert(m.lambdaMicro(bBb.toInt) == lam(0, 1), s"λ(bb) wrong: $m")
    assert(m.lambda0Micro == lam(0, 0), s"λ0 wrong: $m")
    // a doc scores the sum of its per-occurrence λs: unigrams aa,aa,bb
    // plus bigrams "aa aa","aa bb" (unobserved in training → λ0)
    val scored = Seq((9L, "aa aa bb")).toDF("id", "text")
      .select(DS.logWeightMicro($"text", m)).head.getLong(0)
    val bAaAa = "aa aa".foldLeft(7L)((a, c) => (a * 31 + c) % 1000003) % dim
    val bAaBb = "aa bb".foldLeft(7L)((a, c) => (a * 31 + c) % 1000003) % dim
    val expected = 2 * lam(2, 1) + lam(0, 1) +
      m.lambdaMicro.getOrElse(bAaAa.toInt, m.lambda0Micro) +
      m.lambdaMicro.getOrElse(bAaBb.toInt, m.lambda0Micro)
    assert(scored == expected, s"logw $scored != hand $expected")
  }

  test("L47: held-out target-like docs out-weigh gibberish twins; scoring is partition-invariant") {
    val target = targetDocs.take(4).zipWithIndex
      .map { case (t, i) => (i * 10L, t) }.toDF("id", "text")
    val heldOut = targetDocs.drop(4)
    val rawRows = heldOut.zipWithIndex.flatMap { case (t, i) =>
      Seq((1000L + i, t), (2000L + i, gibberish(t))) }
    val m = DS.train(target, rawRows.toDF("id", "text"), "text", dim = 2048)
    def weights(parts: Int) = rawRows.toDF("id", "text").repartition(parts)
      .select($"id", DS.logWeightMicro($"text", m).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = weights(3)
    heldOut.indices.foreach { i =>
      assert(w(1000L + i) > w(2000L + i),
        s"held-out original $i (${w(1000L + i)}) must out-weigh its twin (${w(2000L + i)})")
    }
    assert(weights(1) == w, "log-weights must not depend on partitioning")
  }

  test("L47: Gumbel top-k equals the brute-force ranking, skips NULL text, and plans as TakeOrderedAndProject") {
    val target = targetDocs.take(3).zipWithIndex
      .map { case (t, i) => (i * 10L, t) }.toDF("id", "text")
    val corpus = (targetDocs.zipWithIndex.map { case (t, i) => (100L + i, t) } ++
      targetDocs.zipWithIndex.map { case (t, i) => (200L + i, gibberish(t)) })
      .toDF("id", "text")
      .unionByName(Seq((999L, Option.empty[String])).toDF("id", "text"))
    val m = DS.train(target, corpus.where($"text".isNotNull), "text", dim = 2048)
    val k = 5
    val top = DS.selectTopK(corpus, "text", "id", m, k)
    val got = top.select($"id").collect().map(_.getLong(0)).toSet
    val brute = corpus.where($"text".isNotNull)
      .select($"id", DS.keyMicro($"text", $"id", m).as("key"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sortBy { case (key, id) => (-key, id) }.take(k).map(_._2).toSet
    assert(got == brute, s"top-k $got != brute-force $brute")
    assert(!got.contains(999L), "NULL text must never be selected")
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as bounded heaps, not a global sort:\n$plan")
  }

  test("L47: NULL conventions — NULL text scores NULL, keeps() passes it; zero-token text scores 0") {
    val target = Seq((1L, "aa bb")).toDF("id", "text")
    val m = DS.train(target, Seq((2L, "cc dd")).toDF("id", "text"), "text",
      dim = 1024)
    val rows = Seq((1L, Option("aa")), (2L, None), (3L, Option("   ")))
      .toDF("id", "text")
      .select($"id", DS.logWeightMicro($"text", m).as("w"),
        DS.keeps($"text", $"id", m, Long.MaxValue).as("keep"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getBoolean(2)))
      .toMap
    assert(rows(2L)._1.isEmpty, "NULL text must score NULL")
    assert(rows(2L)._2, "NULL text must PASS the gate (no evidence)")
    assert(rows(3L)._1.contains(0L), "zero-token text scores the empty fold (0)")
    assert(!rows(1L)._2 && !rows(3L)._2,
      "scored rows must fail an unreachable bar")
  }

  test("L47: training is deterministic; the persisted model round-trips bit-for-bit") {
    val target = targetDocs.take(4).zipWithIndex
      .map { case (t, i) => (i * 10L, t) }.toDF("id", "text")
    val raw = targetDocs.drop(2).zipWithIndex
      .map { case (t, i) => (500L + i, gibberish(t)) }.toDF("id", "text")
    val m1 = DS.train(target, raw, "text", dim = 512)
    val m2 = DS.train(target.repartition(4), raw.repartition(3), "text",
      dim = 512)
    assert(m1 == m2, "training must be deterministic and partition-invariant")
    assert(m1.lambdaMicro.keys.forall(b => b >= 0 && b < 512),
      "buckets must lie in [0, dim)")
    DS.dropModel(spark, "t_dsir_rt")
    try {
      DS.writeModel(spark, m1, "t_dsir_rt")
      assert(DS.modelExists(spark, "t_dsir_rt"))
      assert(DS.readModel(spark, "t_dsir_rt") == m1,
        "persisted model must round-trip exactly")
    } finally DS.dropModel(spark, "t_dsir_rt")
  }
}
