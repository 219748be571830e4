package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * NeurIPS): the published recipe for selecting pretraining data that
  * MATCHES A TARGET DISTRIBUTION, where the trained classifier (L42)
  * only separates clean from garbage. Two bag-of-hashed-n-gram models
  * are fit — p̂ on a target sample (Wikipedia/books-class), q̂ on a raw
  * sample — every document gets the importance log-weight
  * `log w(x) = Σ_f count_f(x) · (log p̂_f − log q̂_f)`, and the corpus
  * is resampled by Gumbel top-k over the noised weights (sampling
  * WITHOUT replacement proportional to w — the paper's estimator).
  *
  * Reference behavior analogue: the reference's per-record SMT gating
  * (`main.sh:146-196` config chains) has no distribution-matching
  * selector; this is the corpus-recipe operator a training-data intake
  * adds on top (the L18 mixing row picks HOW MUCH of each source,
  * DSIR picks WHICH documents).
  *
  * Everything inherits the L42 engine-portability discipline:
  *  - features are word unigrams ∪ bigrams hashed by the explicit
  *    polynomial fold ([[QualityClassifier.tokenBucket]] — no
  *    engine-specific hash), the paper's hashed n-gram space;
  *  - per-bucket log-ratios are quantized ONCE to the 1e-6 integer
  *    grid (`λ_b = round(1e6·(ln((cp_b+1)/(Np+dim)) −
  *    ln((cq_b+1)/(Nq+dim))))`, Laplace-smoothed — counts and totals
  *    are exact integers, so both engines feed `ln` the same doubles;
  *    the 1-ulp `ln` class sits ten orders below the grid, the
  *    NgramLm/QualityClassifier acknowledgment);
  *  - the Gumbel draw is DETERMINISTIC off the portable hash ring:
  *    `u = (shuffleKey(id) + 0.5) / 2^31` (exact in a double, strictly
  *    inside (0,1) so neither log can overflow), `g = −ln(−ln(u))`,
  *    quantized to the grid — reproducible across runs, engines and
  *    partitionings, and restatable in the DuckDB oracle.
  *
  * Scale shape (the L42 split): `train` touches only the two SAMPLES
  * (target is curated and small by construction; raw is a slice, the
  * paper uses ~1e6-1e7 docs) — one explode + partial-agg groupBy per
  * side reduced to ≤ dim rows each, the only driver pulls, bounded by
  * the MODEL. Scoring — the 100 TB path — is a pure per-row
  * map-literal fold over the feature array: no explode, no join, no
  * shuffle. Selection: `selectTopK` is a global top-k over the noised
  * key, which Spark executes as TakeOrderedAndProject — per-partition
  * bounded heaps then a k-row merge, never a full sort or a
  * single-task funnel; the streaming/intake form `keeps` is the
  * per-row threshold analogue (fix the acceptance bar instead of the
  * count — a micro-batch cannot rank against documents it has not
  * seen, so at intake the bar IS the contract). */
object Dsir {

  /** Micro-unit grid: 1e-6, the repo-wide quantization scale. */
  private val Micro = 1000000L

  /** Trained model: `dim` feature buckets, per-bucket quantized
    * log-ratio for buckets observed in either sample, and the
    * smoothing-only default `lambda0Micro` for buckets observed in
    * neither (cp = cq = 0 still carries the totals' log-ratio). */
  final case class Model(dim: Int, lambda0Micro: Long,
      lambdaMicro: Map[Int, Long]) {
    require(dim > 0, s"dim must be positive, got $dim")
  }

  /** The paper's feature space: word unigrams ∪ word bigrams (hashed
    * n-grams, n ≤ 2). The token list BINDS once ([[TF.bindOnce]]) —
    * `ngramsOfTokens` over an unbound token expression re-tokenizes
    * per bigram (the documented O(tokens²) HOF trap). NULL text →
    * NULL (no features; scores NULL, never trains). */
  def featsOf(text: Column): Column =
    TF.bindOnce(TF.tokens(text))(ts => concat(ts, TF.ngramsOfTokens(ts, 2)))

  /** One side's bucket counts: explode features → hash → one
    * partial-agg groupBy, collected — ≤ dim rows, bounded by the model
    * like every driver pull in the trained-operator family. */
  private def bucketCounts(docs: DataFrame, textCol: String,
      dim: Int): Map[Int, Long] =
    docs.where(col(textCol).isNotNull)
      .select(explode(featsOf(col(textCol))).as("__tok"))
      .select(QualityClassifier.tokenBucket(col("__tok"), dim).as("__fb"))
      .groupBy(col("__fb")).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  /** Quantized smoothed log-ratio of one bucket. Inputs are exact
    * integers; `ln` runs on the exact ratio-free form (two lns of
    * exact-integer-valued doubles) so DuckDB reproduces the pre-round
    * double to 1 ulp — ten orders below the grid. */
  private def lambdaOf(cp: Long, np: Long, cq: Long, nq: Long,
      dim: Int): Long = {
    val x = math.log((cp + 1).toDouble / (np + dim).toDouble) -
      math.log((cq + 1).toDouble / (nq + dim).toDouble)
    val v = x * Micro.toDouble
    (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
  }

  /** Fit p̂ (on `target`) and q̂ (on `raw`) and freeze the per-bucket
    * quantized log-ratios. Both frames are SAMPLES by contract (the
    * paper's setting) — each side costs one explode + one partial-agg
    * groupBy reduced to ≤ dim rows. */
  def train(target: DataFrame, raw: DataFrame, textCol: String,
      dim: Int = 512): Model = {
    require(dim > 0, s"dim must be positive, got $dim")
    val cp = bucketCounts(target, textCol, dim)
    val cq = bucketCounts(raw, textCol, dim)
    val np = cp.valuesIterator.sum
    val nq = cq.valuesIterator.sum
    require(np > 0, "target sample has no features")
    require(nq > 0, "raw sample has no features")
    val buckets = (cp.keySet ++ cq.keySet).toSeq
    Model(dim, lambdaOf(0L, np, 0L, nq, dim),
      buckets.map { b =>
        b -> lambdaOf(cp.getOrElse(b, 0L), np, cq.getOrElse(b, 0L), nq, dim)
      }.toMap)
  }

  /** Per-row importance log-weight in micro-units — the corpus-scale
    * path: λ as a map literal, one fold over the feature array,
    * unobserved buckets contribute the smoothing default. No explode,
    * no join, no shuffle; NULL text → NULL. */
  def logWeightMicro(text: Column, m: Model): Column = {
    val lMap: Column =
      if (m.lambdaMicro.isEmpty) lit(null).cast("map<int,bigint>")
      else typedLit(m.lambdaMicro)
    // try_element_at, not element_at: ANSI mode throws on missing map
    // keys, and unobserved buckets are missing by design
    val s = aggregate(featsOf(text), lit(0L),
      (acc, t) => acc + coalesce(
        try_element_at(lMap, QualityClassifier.tokenBucket(t, m.dim)),
        lit(m.lambda0Micro)))
    when(text.isNull, lit(null).cast("bigint")).otherwise(s)
  }

  /** Deterministic quantized Gumbel noise off the portable hash ring:
    * `u = (shuffleKey(id) + 0.5) / 2^31` — exact in a double, strictly
    * in (0,1) — then `round(1e6 · −ln(−ln(u)))`. The same `pow/ln`-tie
    * caveat as [[QualityClassifier.paretoKeeps]] applies (documented
    * there): deterministic within one engine; no fixture row lands
    * within 2 micro of a .5 tie (checked when the l43 oracle was cut). */
  def gumbelMicro(id: Column): Column = {
    val u = (Sampling.shuffleKeyOf(id).cast("double") + lit(0.5)) /
      lit(2147483648.0)
    round(-log(-log(u)) * Micro.toDouble).cast("long")
  }

  /** The Gumbel-top-k sampling key: `log w + g` in micro-units. The
    * classic identity makes a descending top-k over this key an exact
    * sample WITHOUT replacement proportional to w. NULL text → NULL
    * (never selected). */
  def keyMicro(text: Column, id: Column, m: Model): Column =
    logWeightMicro(text, m) + gumbelMicro(id)

  /** Select `k` documents by Gumbel top-k — the paper's resampling
    * estimator. Plan shape: TakeOrderedAndProject (per-partition
    * bounded heaps, k-row merge — never a global sort); ties break on
    * id. NULL-text rows carry a NULL key and sort last (never selected
    * while any scored row remains). */
  def selectTopK(df: DataFrame, textCol: String, idCol: String,
      m: Model, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val key = graft.Cols.fresh(df.columns, "__dsir")
    df.withColumn(key, keyMicro(col(textCol), col(idCol), m))
      .where(col(key).isNotNull) // NULL text never enters a sample
      .orderBy(col(key).desc, col(idCol))
      .limit(k)
      .drop(key)
  }

  /** Keep-filter form (the intake-gate shape): the per-row threshold
    * analogue of [[selectTopK]] — a micro-batch cannot rank against
    * unseen documents, so the acceptance bar replaces the count (fix
    * `minKeyMicro` from a profiled quantile of the noised key). NULL
    * text PASSES (the no-evidence convention of the gate family). */
  def keeps(text: Column, id: Column, m: Model, minKeyMicro: Long): Column =
    text.isNull || keyMicro(text, id, m) >= minKeyMicro

  // ---- persistence: fit once, select forever (the writeModel
  // discipline shared by NgramLm / QualityClassifier / LangId) ----

  /** Persist a model as two managed tables: `<table>_dsl` (bucket,
    * lambda_micro) — at most `dim` rows — and the one-row
    * `<table>_dsm` (dim, lambda0_micro). Integers round-trip exactly. */
  def writeModel(spark: org.apache.spark.sql.SparkSession, model: Model,
      table: String): Unit = {
    import spark.implicits._
    model.lambdaMicro.toSeq.toDF("bucket", "lambda_micro")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_dsl")
    Seq((model.dim, model.lambda0Micro)).toDF("dim", "lambda0_micro")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_dsm")
  }

  /** Load a persisted model ([[writeModel]]) — one bounded driver pull
    * of ≤ dim+1 rows. */
  def readModel(spark: org.apache.spark.sql.SparkSession,
      table: String): Model = {
    val meta = spark.table(s"${table}_dsm")
      .select(col("dim"), col("lambda0_micro")).head()
    val l = spark.table(s"${table}_dsl")
      .select(col("bucket"), col("lambda_micro"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    Model(meta.getInt(0), meta.getLong(1), l)
  }

  /** True when both model tables exist. */
  def modelExists(spark: org.apache.spark.sql.SparkSession,
      table: String): Boolean =
    Seq("_dsl", "_dsm").forall(s => spark.catalog.tableExists(table + s))

  /** Drop a persisted model — tables AND warehouse locations. */
  def dropModel(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit =
    Seq("_dsl", "_dsm").foreach(s =>
      Layout.dropTableAndLocation(spark, table + s))
}
