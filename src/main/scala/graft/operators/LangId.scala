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
    * space. 1-based `substr` (the proven cross-engine indexing);
    * shorter-than-n texts yield the empty list (no features: the doc
    * trains/scores on the bias alone). */
  def charNgrams(text: Column, n: Int): Column = {
    val t = lower(text)
    when(length(t) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(t) - (n - 1)), i => t.substr(i, lit(n))))
  }

  /** Train one head per language: label = (langCol == lang). `docs`
    * is the labeled sample (CCNet trains on Wikipedia-class corpora,
    * never the crawl). */
  def train(docs: DataFrame, textCol: String, idCol: String,
      langCol: String, langs: Seq[String], dim: Int = 256,
      epochs: Int = 2, lr: Double = 0.5, ngram: Int = 2): Model = {
    require(langs.nonEmpty && langs.distinct.size == langs.size,
      s"langs must be nonempty and distinct: $langs")
    val heads = langs.map { l =>
      l -> QualityClassifier.train(
        docs.withColumn("__y", when(col(langCol) === l, 1).otherwise(0)),
        textCol, idCol, "__y", dim, epochs, lr, charNgrams(_, ngram))
    }
    Model(ngram, heads)
  }

  /** Per-class micro-probability struct (field per language) — the
    * scoring pass a router and a diagnostics row share. NULL text →
    * NULL fields. */
  def scoresMicro(text: Column, m: Model): Column =
    struct(m.classes.map { case (l, head) =>
      QualityClassifier.scoreMicroColumn(text, head,
        charNgrams(_, m.ngram)).as(l)
    }: _*)

  /** Predicted language: argmax over the heads' micro-probabilities,
    * ties to the earliest class (strictly-greater fold). NULL text →
    * NULL. */
  def predict(text: Column, m: Model): Column = {
    val scored = m.classes.map { case (l, head) =>
      (l, QualityClassifier.scoreMicroColumn(text, head,
        charNgrams(_, m.ngram)))
    }
    val best = scored.tail.foldLeft(
      struct(lit(scored.head._1).as("l"), scored.head._2.as("p"))) {
      case (acc, (l, p)) =>
        when(p > acc.getField("p"),
          struct(lit(l).as("l"), p.as("p"))).otherwise(acc)
    }
    when(text.isNull, lit(null).cast("string")).otherwise(best.getField("l"))
  }

  /** Keep-filter form (the intake-gate shape): true when the predicted
    * language is in `keep`; NULL text PASSES (no-evidence — upstream
    * gates own NULL handling, matching the other trained gates). */
  def keeps(text: Column, m: Model, keep: Set[String]): Column = {
    require(keep.nonEmpty, "keep-language set must be nonempty")
    text.isNull || predict(text, m).isin(keep.toSeq: _*)
  }
}
