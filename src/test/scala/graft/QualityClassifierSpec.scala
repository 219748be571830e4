package graft

import graft.operators.{QualityClassifier => QC}
import org.apache.spark.sql.functions._

/** Planted contracts for the trained quality classifier (the l39
  * registry row carries the cross-engine train+score differential;
  * these pin the CLASSIFICATION behavior itself): clean text must
  * outscore its alphabet-permuted gibberish sibling AND repeated
  * boilerplate — including on HELD-OUT documents the model never
  * trained on — plus determinism and the NULL conventions. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val clean = Seq(
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a short story about the history of science and the people in it",
    "many readers enjoy long books that explain ideas in plain words",
    "the weather in the north was cold and the days were short",
    "good food and good friends make the evening pass quickly",
    "she walked to the market in the morning to buy fresh bread",
    "the teacher explained the lesson and the students asked questions",
    "music from the old radio filled the quiet room with warmth")

  private val boiler =
    Iterator.fill(5)("home login search menu copyright contact").mkString(" ")

  private def gibberish(t: String): String =
    t.map(c => if (c >= 'a' && c <= 'z') ('z' - (c - 'a')).toChar else c)

  /** Train on the first 6 clean docs (y=1) vs their gibberish siblings
    * and two boilerplate rows (y=0). */
  private def trainModel(): QC.LrModel = {
    val pos = clean.take(6).zipWithIndex.map { case (t, i) => (i * 10L, t, 1) }
    val neg = clean.take(6).zipWithIndex.map { case (t, i) =>
      (i * 10L + 1, gibberish(t), 0) }
    val bp = Seq((900L, boiler, 0), (901L, boiler + " home login", 0))
    val train = (pos ++ neg ++ bp).toDF("id", "text", "y")
    QC.train(train, "text", "id", "y", dim = 256, epochs = 2, lr = 0.5)
  }

  test("L42: held-out clean outscores its gibberish sibling and boilerplate") {
    val model = trainModel()
    val holdout = clean.drop(6)
    val rows = (holdout.zipWithIndex.map { case (t, i) => (1000L + i, t) } ++
      holdout.zipWithIndex.map { case (t, i) => (2000L + i, gibberish(t)) } ++
      Seq((3000L, boiler)))
      .toDF("id", "text")
      .select($"id", QC.scoreMicroColumn($"text", model).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    holdout.indices.foreach { i =>
      assert(rows(1000L + i) > rows(2000L + i),
        s"held-out clean $i (${rows(1000L + i)}) must outscore its gibberish sibling (${rows(2000L + i)})")
    }
    assert(holdout.indices.forall(i => rows(1000L + i) > rows(3000L)),
      s"held-out clean must outscore boilerplate (${rows(3000L)})")
  }

  test("L42: train frees its checkpoint scratch (no block accumulation across retrains)") {
    // the trainers localCheckpoint their feature/label scratch; the
    // finally-block must return the session to its pre-train persistent
    // RDD census, or a long-lived session retraining in a loop leaks
    // block-manager storage (round-16 advice)
    trainModel() // warm any lazily-registered session state first
    val before = spark.sparkContext.getPersistentRDDs.keySet
    (1 to 3).foreach(_ => trainModel())
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"retrains left ${(after -- before).size} persistent RDDs behind")
  }

  test("L42: training is deterministic and the model is bounded by dim") {
    val m1 = trainModel()
    val m2 = trainModel()
    assert(m1 === m2, "same input must train the identical quantized model")
    assert(m1.wMicro.keys.forall(b => b >= 0 && b < m1.dim))
    assert(m1.wMicro.nonEmpty && m1.wMicro.values.exists(_ != 0L))
  }

  test("L42: NULL conventions — score NULL on NULL text, keeps() passes it") {
    val model = trainModel()
    val out = Seq((1L, "the quick brown fox"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select($"id", QC.scoreMicroColumn($"text", model).as("p"),
        QC.keeps($"text", model, 500000L).as("k"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2))).toMap
    assert(out(2L)._1.isEmpty, "NULL text must score NULL")
    assert(out(2L)._2, "NULL text must pass keeps() (no-evidence convention)")
    assert(out(1L)._1.nonEmpty)
  }

  test("L42: Pareto-noisy keep — deterministic, keeps high scorers at ~(1+x)^-9 odds, keeps a small tail of low scorers") {
    // more epochs than the default: the keep probability (2−score)^−9
    // is brutally sensitive to score, and this 14-doc fixture needs the
    // extra passes to push positives near 1 (the sf fixtures get there
    // in 2 — 500 docs of gradient signal)
    val pos = clean.take(6).zipWithIndex.map { case (t, i) => (i * 10L, t, 1) }
    val neg = clean.take(6).zipWithIndex.map { case (t, i) =>
      (i * 10L + 1, gibberish(t), 0) }
    val model = QC.train((pos ++ neg).toDF("id", "text", "y"),
      "text", "id", "y", dim = 256, epochs = 20, lr = 2.0)
    // many ids per text so the ring draw spans [0,1): clean texts score
    // near 1 (kept unless β lands tiny), gibberish near 0 (kept only
    // when β > ~1, probability ≈ 2^-9)
    val rows = (0 until 2000).map { i =>
      (i.toLong, if (i % 2 == 0) clean(i % 6) else gibberish(clean(i % 6)))
    }.toDF("id", "text")
    def keptIds = rows.where(QC.paretoKeeps($"text", $"id", model))
      .select($"id").as[Long].collect().toSet
    val k1 = keptIds
    assert(k1 === keptIds, "the noisy threshold must be deterministic")
    val cleanKept = k1.count(_ % 2 == 0)
    val gibKept = k1.count(_ % 2 == 1)
    // 1000 of each — assert the separation with wide margins
    assert(cleanKept >= 700, s"clean keep rate too low: $cleanKept/1000")
    assert(gibKept <= 60, s"gibberish keep rate too high: $gibKept/1000")
    // the tail-diversity property: the rule is NOISY, not a hard gate —
    // on a large enough draw some low scorers do get through; assert
    // only that the mechanism CAN pass one (β > 1 exists in the ring)
    // without pinning which (that is the fixture's business)
    val nullKeeps = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .where(QC.paretoKeeps($"text", $"id", model)).count()
    assert(nullKeeps === 1L, "NULL text must pass the noisy gate")
  }

  test("L42: persisted model round-trips exactly and scores identically from the catalog") {
    val table = "t_qc_model"
    QC.dropModel(spark, table)
    try {
      val m = trainModel()
      QC.writeModel(spark, m, table)
      assert(QC.modelExists(spark, table))
      val back = QC.readModel(spark, table)
      assert(back === m, "integer-grid model must round-trip bit-exact")
      val probe = Seq((1L, clean.head)).toDF("id", "text")
      val a = probe.select(QC.scoreMicroColumn($"text", m)).head().getLong(0)
      val b = probe.select(QC.scoreMicroColumn($"text", back)).head().getLong(0)
      assert(a === b)
    } finally QC.dropModel(spark, table)
  }

  test("L42: empty-weight model scores sigmoid(bias) and survives the map-literal path") {
    val model = QC.LrModel(dim = 8, biasMicro = 0L, wMicro = Map.empty)
    val p = Seq((1L, "anything at all")).toDF("id", "text")
      .select(QC.scoreMicroColumn($"text", model).as("p"))
      .head().getLong(0)
    assert(p === 500000L) // sigmoid(0) = 0.5 exactly on the grid
  }

  test("L46: fused multi-head training is bit-identical to sequential per-head training") {
    // r19 optimization pin: LangId trains its K one-vs-rest heads in
    // ONE score pass + ONE gradient pass per epoch
    // (QC.trainHeadsOnFeatures). The fused loop must reproduce each
    // head's integer weights and bias EXACTLY — the l42 oracle retrains
    // every head relationally and compares micro integers bit-for-bit,
    // so any drift here is an oracle failure waiting to happen.
    import graft.operators.{LangId => LI}
    val langs = Seq("aa", "bb", "cc")
    def permute(t: String, shift: Int): String =
      t.map(c => if (c >= 'a' && c <= 'z')
        (('a' + ((c - 'a' + shift * 7) % 26)).toChar) else c)
    val docs = (clean ++ clean.map(_.reverse)).zipWithIndex.map {
      case (t, i) => (i.toLong, permute(t, i % 3), langs(i % 3))
    }.toDF("id", "text", "lang")
    val fused = LI.train(docs, "text", "id", "lang", langs,
      dim = 128, epochs = 2, lr = 0.5, ngram = 2)
    // sequential reference: one solo single-head train per language
    // over the same feature space (the pre-r19 shape)
    val seq = langs.map { l =>
      val labeled = docs.select($"id", $"text",
        when($"lang" === l, 1).otherwise(0).as("y"))
      l -> QC.train(labeled, "text", "id", "y", dim = 128, epochs = 2,
        lr = 0.5, featsOf = LI.charNgrams(_, 2))
    }
    fused.classes.zip(seq).foreach { case ((lf, hf), (ls, hs)) =>
      assert(lf === ls)
      assert(hf.biasMicro === hs.biasMicro,
        s"head $lf bias diverged: fused ${hf.biasMicro} vs solo ${hs.biasMicro}")
      assert(hf.wMicro === hs.wMicro, s"head $lf weights diverged")
    }
  }
}
