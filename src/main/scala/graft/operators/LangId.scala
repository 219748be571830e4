package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRAINED language identification — the CCNet first stage (Wenzek et
  * al. 2020: a fastText classifier over character n-grams routes every
  * document to a language BEFORE any LM or quality scoring; the l05b
  * character-class heuristic stops at script detection). fastText's
  * language-ID model is a linear classifier over hashed char-n-gram
  * features — exactly the [[QualityClassifier]] machinery with (a)
  * char n-grams instead of word tokens and (b) one-vs-rest binary
  * heads, one per language, argmax at scoring time.
  *
  * Everything inherits the L42 engine-portability discipline: the
  * SAME polynomial feature hash ([[QualityClassifier.tokenBucket]]
  * applied to each char n-gram), the same 1e-6 integer grid, the same
  * closed-form-unrollable full-batch GD — so the DuckDB oracle
  * retrains every head from scratch and the per-class integer
  * micro-probabilities (and therefore the argmax routing) must agree
  * bit-for-bit.
  *
  * Scale shape (the L42 split, per head): training runs on the
  * LABELED SAMPLE — K heads × epochs bounded exchanges, driver pulls
  * ≤ K·(dim+1) rows (model-sized, never data-sized). Scoring — the
  * 100 TB path — is K per-row map-literal folds over the char-n-gram
  * array: no explode, no join, no shuffle; the argmax is a per-row
  * CASE fold with ties resolved to the EARLIEST class in `langs`
  * order (deterministic across engines and partitionings). */
object LangId {

  /** One-vs-rest model: `ngram` size and one LR head per language (in
    * routing-priority order — argmax ties go to the earlier entry). */
  final case class Model(ngram: Int,
      classes: Seq[(String, QualityClassifier.LrModel)]) {
    require(ngram >= 1 && classes.nonEmpty, "ngram >= 1, classes nonempty")
  }

  /** Char n-grams of the lower-cased text — the fastText feature
    * space, via the native single-pass [[graft.functions.CharNgrams]]
    * kernel (the `substr`-per-position HOF form re-evaluates the
    * lower-cased text per element AND re-scans char offsets — O(len²)
    * per row per head, the l42 attempt log's 100 s lesson; the kernel
    * is O(len), semantics identical: shorter-than-n texts yield the
    * empty list, so the doc trains/scores on the bias alone). */
  def charNgrams(text: Column, n: Int): Column =
    graft.functions.TextFunctions.charNgrams(lower(text), n)

  /** Train one head per language: label = (langCol == lang). `docs`
    * is the labeled sample (CCNet trains on Wikipedia-class corpora,
    * never the crawl). */
  def train(docs: DataFrame, textCol: String, idCol: String,
      langCol: String, langs: Seq[String], dim: Int = 256,
      epochs: Int = 2, lr: Double = 0.5, ngram: Int = 2): Model = {
    require(langs.nonEmpty && langs.distinct.size == langs.size,
      s"langs must be nonempty and distinct: $langs")
    // ONE feature pass shared by every head — the explode over the
    // labeled sample dominates training, and labels are the only
    // per-head difference (l42 attempt log: K× re-explosion was the
    // bulk of the row's cost)
    val feats = QualityClassifier.docFeatures(docs, textCol, idCol, dim,
        charNgrams(_, ngram))
      .localCheckpoint(eager = true)
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol), col(langCol).as("__lang"))
      .localCheckpoint(eager = true)
    try {
      // ALL heads train in one fused GD loop — one score pass and one
      // gradient pass per epoch for the whole model instead of per
      // language ([[QualityClassifier.trainHeadsOnFeatures]]: the heads
      // share every scan and differ only in their 0/1 label column;
      // per-head integer arithmetic, and therefore every trained
      // weight, is bit-identical to the sequential form)
      val labeled = base.select(col(idCol) +: langs.zipWithIndex.map {
        case (l, i) => when(col("__lang") === l, 1L).otherwise(0L).as(s"__y$i")
      }: _*)
      val models = QualityClassifier.trainHeadsOnFeatures(feats, labeled,
        idCol, langs.indices.map(i => s"__y$i"), dim, epochs, lr)
      Model(ngram, langs.zip(models))
    } finally {
      // the checkpoints are train-local scratch — free their blocks so
      // a long-lived session retraining in a loop doesn't accumulate
      import org.apache.spark.sql.graftshim.CheckpointBridge
      CheckpointBridge.free(feats)
      CheckpointBridge.free(base)
    }
  }

  /** Per-class micro-probability struct (field per language) — the
    * scoring pass a router and a diagnostics row share. The char
    * n-gram array builds ONCE and every head folds over the bound
    * slot (K separate builds otherwise — bindOnce). NULL text → NULL
    * fields. */
  def scoresMicro(text: Column, m: Model): Column =
    graft.functions.TextFunctions.bindOnce(charNgrams(text, m.ngram)) { cg =>
      struct(m.classes.map { case (l, head) =>
        QualityClassifier.scoreMicroColumn(text, head, _ => cg).as(l)
      }: _*)
    }

  /** Argmax routing over an ALREADY-SCORED [[scoresMicro]] struct
    * column (ties to the earliest class, the strictly-greater fold) —
    * callers that project the scores struct anyway (the l42 row, a
    * diagnostics sink) derive the prediction from it for free instead
    * of running the K scoring folds a second time. NULL scores (NULL
    * text) → NULL. */
  def predictFromScores(scores: Column, m: Model): Column = {
    val scored = m.classes.map { case (l, _) => (l, scores.getField(l)) }
    val best = scored.tail.foldLeft(
      struct(lit(scored.head._1).as("l"), scored.head._2.as("p"))) {
      case (acc, (l, p)) =>
        when(p > acc.getField("p"),
          struct(lit(l).as("l"), p.as("p"))).otherwise(acc)
    }
    when(scored.map(_._2.isNull).reduce(_ && _), lit(null).cast("string"))
      .otherwise(best.getField("l"))
  }

  /** Predicted language: argmax over the heads' micro-probabilities,
    * ties to the earliest class. NULL text → NULL. The K head scores
    * bind once before the argmax — the fold's accumulator appears
    * twice per step (condition + otherwise), so an UNBOUND fold
    * re-evaluates earlier heads' scoring passes exponentially in K
    * ([[graft.functions.TextFunctions.bindOnce]]). */
  def predict(text: Column, m: Model): Column = {
    val best = graft.functions.TextFunctions.bindOnce(
      scoresMicro(text, m))(s => predictFromScores(s, m))
    when(text.isNull, lit(null).cast("string")).otherwise(best)
  }

  /** Top (winning) micro-probability over an ALREADY-SCORED
    * [[scoresMicro]] struct — `greatest` over the head fields (the max
    * value is tie-rule-independent, so this pairs exactly with
    * [[predictFromScores]]'s earliest-class argmax). NULL scores →
    * NULL. */
  def bestScoreFromScores(scores: Column, m: Model): Column =
    m.classes.map { case (l, _) => scores.getField(l) } match {
      case Seq(one) => one
      case more => greatest(more: _*)
    }

  // ---- persistence: train once, route forever (the writeModel
  // discipline shared by NgramLm / QualityClassifier / Dsir) ----

  /** Persist a model as two managed tables: `<table>_liw` (lang,
    * bucket, w_micro) — at most K·dim rows — and `<table>_lim` (lang,
    * rank, dim, bias_micro, ngram), one row per head carrying the
    * routing-priority rank (argmax ties go to the lowest rank).
    * Integers round-trip exactly. */
  def writeModel(spark: org.apache.spark.sql.SparkSession, m: Model,
      table: String): Unit = {
    import spark.implicits._
    m.classes.flatMap { case (l, h) =>
      h.wMicro.toSeq.map { case (b, w) => (l, b, w) } }
      .toDF("lang", "bucket", "w_micro")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_liw")
    m.classes.zipWithIndex.map { case ((l, h), i) =>
      (l, i, h.dim, h.biasMicro, m.ngram) }
      .toDF("lang", "rank", "dim", "bias_micro", "ngram")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_lim")
  }

  /** Load a persisted model ([[writeModel]]) — one bounded driver pull
    * of ≤ K·(dim+1) rows, heads restored in routing-priority order. */
  def readModel(spark: org.apache.spark.sql.SparkSession,
      table: String): Model = {
    val meta = spark.table(s"${table}_lim")
      .select(col("lang"), col("rank"), col("dim"), col("bias_micro"),
        col("ngram"))
      .collect().sortBy(_.getInt(1))
    require(meta.nonEmpty, s"empty language-ID model table $table")
    val ws = spark.table(s"${table}_liw")
      .select(col("lang"), col("bucket"), col("w_micro"))
      .collect().groupBy(_.getString(0))
    val heads = meta.toSeq.map { r =>
      val w = ws.getOrElse(r.getString(0), Array.empty)
        .map(x => x.getInt(1) -> x.getLong(2)).toMap
      r.getString(0) -> QualityClassifier.LrModel(r.getInt(2),
        r.getLong(3), w)
    }
    Model(meta.head.getInt(4), heads)
  }

  /** True when both model tables exist. */
  def modelExists(spark: org.apache.spark.sql.SparkSession,
      table: String): Boolean =
    Seq("_liw", "_lim").forall(s => spark.catalog.tableExists(table + s))

  /** Drop a persisted model — tables AND warehouse locations. */
  def dropModel(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit =
    Seq("_liw", "_lim").foreach(s =>
      Layout.dropTableAndLocation(spark, table + s))

  /** The keep rule over an ALREADY-SCORED [[scoresMicro]] struct —
    * argmax membership AND the confidence floor, both reading the
    * given slot. Callers that project the scores struct anyway (the
    * l42 rows, a diagnostics sink) compose the verdict from it for
    * free instead of re-running the K scoring folds. */
  def keepsFromScores(scores: Column, m: Model, keep: Set[String],
      minScoreMicro: Long): Column = {
    require(keep.nonEmpty, "keep-language set must be nonempty")
    require(minScoreMicro >= 0L, s"minScoreMicro >= 0, got $minScoreMicro")
    predictFromScores(scores, m).isin(keep.toSeq: _*) &&
      bestScoreFromScores(scores, m) >= minScoreMicro
  }

  /** Keep-filter form (the intake-gate shape): true when the predicted
    * language is in `keep` AND the winning head's micro-probability
    * clears `minScoreMicro` — CCNet's actual routing rule drops
    * documents whose top language score is below a confidence floor
    * (~0.5), not just wrong-argmax ones (Wenzek et al. 2020 §4.2);
    * `minScoreMicro = 0` recovers pure argmax routing. NULL text
    * PASSES (no-evidence — upstream gates own NULL handling, matching
    * the other trained gates). The scores struct binds once and both
    * the argmax and the floor read the bound slot. */
  def keeps(text: Column, m: Model, keep: Set[String],
      minScoreMicro: Long = 0L): Column = {
    val ok = graft.functions.TextFunctions.bindOnce(scoresMicro(text, m))(
      s => keepsFromScores(s, m, keep, minScoreMicro))
    text.isNull || ok
  }
}
