package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-bigram language-model quality scoring (SURVEY §2.9 text
  * family) — the in-engine form of the public CCNet recipe (Wenzek et
  * al. 2020, "CCNet: Extracting High Quality Monolingual Datasets from
  * Web Crawl Data"): train an n-gram LM on a held-out clean slice,
  * score every document by average log-probability, and filter (or
  * bucket) on the score. CCNet uses a word 5-gram KenLM; the engine's
  * model is an additively-smoothed character bigram — the smallest
  * member of the same family whose training is ONE distributed count
  * and whose scoring restates exactly in SQL, which is what makes the
  * operator oracle-checkable rather than trust-me.
  *
  * Model: P(c2 | c1) = (count(c1 c2) + 1) / (count(c1) + V), where
  * count(c1) sums the bigram counts with left char c1 (so the
  * distribution conditions on "c1 followed by anything", summing to 1
  * over the V-sized smoothed alphabet), and V = distinct training
  * characters + 1 (one shared unseen class). A document scores the
  * mean of ln P over its consecutive character pairs; perplexity is
  * exp(-mean). Documents under 2 characters carry no evidence and
  * score NULL.
  *
  * Determinism (the oracle contract): ln is the ONE non-IEEE-exact
  * operation in the pipeline, and engines may legitimately disagree by
  * 1 ulp on it — so ln is evaluated ONCE PER MODEL ROW (an
  * alphabet²-bounded table, not a per-document path) and immediately
  * quantized to the repo's integer grid (round(x·1e6) as BIGINT, the
  * [[graft.functions.VectorFunctions.quantize]] discipline). Per-doc
  * scoring is then integer multiply-accumulate — exact and
  * order-independent, so `groupBy(doc).sum` matches bit-for-bit across
  * engines regardless of their aggregation order. The final division
  * back to a double is one IEEE-exact op on identical integers.
  *
  * Scale shape (100 TB): training is one explode + groupBy over the
  * CLEAN SLICE only (a fixed sample, not the corpus), reduced to an
  * alphabet-bounded model frame. Scoring broadcasts that model (two
  * tiny tables), explodes each document's bigrams map-side, hash-joins
  * against the broadcasts with NO exchange, and partial-aggregates on
  * doc id — one shuffled row per document, never the text. Nothing
  * about the corpus is collected to the driver.
  */
object NgramLm {

  /** Quantization grid for ln values (the VectorFunctions scale). */
  private val Scale = 1000000L

  /** Trained char-bigram model: `big` = (bg string, q_lp long) — the
    * quantized ln P of each seen bigram; `ctx` = (c1 string, q0_lp
    * long) — quantized ln of the smoothed floor P(unseen | c1) =
    * 1/(count(c1)+V); `qUnseen` = quantized ln(1/V) for bigrams whose
    * left char was never seen; `vocab` = V. The two frames are
    * alphabet-bounded (≤ |Σ|² rows) — always broadcastable. */
  final case class CharLm(big: DataFrame, ctx: DataFrame, qUnseen: Long,
      vocab: Long)

  private def qln(x: Column): Column = round(log(x) * Scale).cast("long")

  /** Train the smoothed char-bigram LM on `clean` (the held-out clean
    * slice — CCNet's target-domain corpus). Two jobs: one bounded
    * distinct-character count (V), one bigram groupBy reduced to the
    * model frames. The model frames are RESULTS (localCheckpoint'd):
    * scoring must not re-run training per consumer plan. */
  def trainCharBigram(clean: DataFrame, textCol: String): CharLm = {
    val bigrams = clean
      .select(explode(TF.charNgrams(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c"))
    // V = distinct characters + 1 (the shared unseen class); derived
    // from the bigram table's own characters so a 1-char document's
    // alphabet contribution matches what the model can ever condition on
    val vocab = bigrams
      .select(explode(array(substring(col("bg"), 1, 1),
        substring(col("bg"), 2, 1))).as("ch"))
      .agg(countDistinct(col("ch"))).collect()(0).getLong(0) + 1L
    val ctxCounts = bigrams
      .groupBy(substring(col("bg"), 1, 1).as("c1"))
      .agg(sum(col("c")).as("cc"))
    val big = bigrams
      .join(ctxCounts, substring(col("bg"), 1, 1) === col("c1"))
      .select(col("bg"),
        qln((col("c") + 1).cast("double") / (col("cc") + vocab)).as("q_lp"))
      .localCheckpoint(true)
    val ctx = ctxCounts
      .select(col("c1"),
        qln(lit(1.0) / (col("cc") + vocab)).as("q0_lp"))
      .localCheckpoint(true)
    val qUnseen = math.round(math.log(1.0 / vocab) * Scale)
    CharLm(big, ctx, qUnseen, vocab)
  }

  /** Score `df`: adds `n_big` (bigram count), `q_sum` (exact integer
    * sum of quantized ln P — the oracle-stable form) and `avg_logp`
    * (q_sum / (n_big · 1e6); NULL when the text has no bigram). Output
    * column names must be free in `df`. */
  def scoreDocs(df: DataFrame, textCol: String, idCol: String,
      lm: CharLm): DataFrame = {
    val bg = graft.Cols.fresh(df.columns, "__bg")
    val exploded = df
      .select(col(idCol), explode(TF.charNgrams(col(textCol), 2)).as(bg))
    val scored = exploded
      .join(broadcast(lm.big), col(bg) === col("bg"), "left")
      .join(broadcast(lm.ctx), substring(col(bg), 1, 1) === col("c1"), "left")
      .select(col(idCol),
        coalesce(col("q_lp"), col("q0_lp"), lit(lm.qUnseen)).as("q"))
      .groupBy(col(idCol))
      // integer sums: exact and order-free on both engines
      .agg(sum(col("q")).as("q_sum"), count(lit(1)).as("n_big"))
    df.join(scored, Seq(idCol), "left")
      .withColumn("n_big", coalesce(col("n_big"), lit(0L)))
      .withColumn("avg_logp",
        when(col("n_big") > 0,
          col("q_sum").cast("double") / (col("n_big") * Scale).cast("double")))
  }

  /** Persist a trained model as catalog tables — the BPE
    * [[Bpe.writeVocab]] discipline: train ONCE on the clean reference
    * corpus, then every scoring job (batch or the streaming intake
    * gate) loads two alphabet-bounded tables instead of re-training.
    * Three tables: `<table>_lmb` (bigram rows), `<table>_lmc` (context
    * rows), `<table>_lmm` (one meta row: vocab + the unseen floor).
    * Overwrites — a model is a versioned artifact. */
  def writeLm(spark: org.apache.spark.sql.SparkSession, lm: CharLm,
      table: String): Unit = {
    import spark.implicits._
    lm.big.write.mode("overwrite").format("parquet").saveAsTable(s"${table}_lmb")
    lm.ctx.write.mode("overwrite").format("parquet").saveAsTable(s"${table}_lmc")
    Seq((lm.vocab, lm.qUnseen)).toDF("vocab", "q_unseen")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_lmm")
  }

  /** Load a persisted model ([[writeLm]]). The frames stay lazy table
    * scans — alphabet-bounded, broadcast at scoring time. */
  def readLm(spark: org.apache.spark.sql.SparkSession, table: String): CharLm = {
    val meta = spark.table(s"${table}_lmm")
      .select(col("vocab"), col("q_unseen")).head()
    CharLm(spark.table(s"${table}_lmb"), spark.table(s"${table}_lmc"),
      meta.getLong(1), meta.getLong(0))
  }

  /** True when all three model tables exist (the session gate the
    * probe-row pattern uses). */
  def lmExists(spark: org.apache.spark.sql.SparkSession, table: String): Boolean =
    Seq("_lmb", "_lmc", "_lmm").forall(s => spark.catalog.tableExists(table + s))

  /** Drop a persisted model — tables AND warehouse locations (a new
    * session over an old warehouse has no catalog entries, so a bare
    * overwrite takes the CREATE path and refuses over the surviving
    * directory — the [[Layout.dropTableAndLocation]] rationale).
    * Callers re-creating a model after a negative [[lmExists]] must
    * call this first. */
  def dropLm(spark: org.apache.spark.sql.SparkSession, table: String): Unit =
    Seq("_lmb", "_lmc", "_lmm").foreach(s =>
      Layout.dropTableAndLocation(spark, table + s))

  /** [[scoreDocs]] + `ppl` (perplexity = exp(-avg_logp), rounded to
    * the 1e-6 grid — exp on identical doubles can differ by 1 ulp
    * cross-engine, the same class of exposure as the model's ln, and
    * at one evaluation per document it stays far below the grid). */
  def withPerplexity(df: DataFrame, textCol: String, idCol: String,
      lm: CharLm): DataFrame =
    scoreDocs(df, textCol, idCol, lm)
      .withColumn("ppl", round(exp(-col("avg_logp")), 6))

  /** CCNet-style perplexity BUCKETING — the step after [[scoreDocs]]:
    * split the corpus into `head` (lowest perplexity = highest
    * avg_logp; the slice CCNet keeps outright), `middle`, and `tail`
    * thirds, plus `unscored` for evidence-free docs (n_big = 0 — the
    * intake gate's passthrough convention).
    *
    * Thresholds are tercile boundaries over a DETERMINISTIC sample:
    * rows whose portable hash-ring bucket ([[Sampling.hashBucket]], the
    * l09 split machinery) falls below `ringPct`. Sample-exact, not
    * approximate — any engine recomputing the same ring gets the same
    * sample, the same nearest-rank boundary rows, and therefore
    * bit-identical buckets (ties at a boundary value break on id
    * against the boundary row's own id). CCNet itself draws thresholds
    * from a sample; choosing the ring instead of rand() is what makes
    * the result reproducible across runs, engines and partitionings.
    *
    * Scale shape: the sample is ring-bounded (pick `ringPct` so a
    * corpus-fraction sample is selection-manageable); each boundary is
    * a k-th-smallest pull via orderBy+limit — TakeOrderedAndProject,
    * per-partition bounded heaps and a k-row merge, never a global
    * sort — and the two boundary rows broadcast as literals into a
    * pure per-row CASE. Requires a numeric/long id column. */
  def perplexityBuckets(scored: DataFrame, idCol: String,
      ringPct: Int = 20): DataFrame = {
    val th = bucketThresholds(scored, idCol, ringPct)
    scored.withColumn("bucket",
      bucketColumn(col("avg_logp"), col(idCol).cast("long"), col("n_big"), th))
  }

  /** The two tercile boundary rows of [[perplexityBuckets]] — (avg_logp,
    * id) of the nearest-rank 1/3 and 2/3 sample rows. Draw ONCE per
    * session from a scored reference corpus, then route any stream of
    * scored rows through the pure per-row [[bucketColumn]] CASE — the
    * intake loop's shape (CCNet freezes its thresholds the same way:
    * computed on a reference slice, applied to everything after). */
  final case class PplThresholds(b1Logp: Double, b1Id: Long,
      b2Logp: Double, b2Id: Long)

  /** Compute [[PplThresholds]] from a scored frame (the threshold half
    * of [[perplexityBuckets]]; see that scaladoc for the ring-sample
    * determinism and TakeOrdered scale story).
    *
    * `exact = true` (default) is the nearest-rank pull — bit-identical
    * buckets across engines/runs, but each boundary routes the whole
    * ring sample through one k-row TakeOrdered heap merge: at a true
    * 100 TB corpus even a 0.1% ring is millions of rows into one
    * final-merge task. `exact = false` trades that for
    * `approxQuantile` (Greenwald-Khanna, `approxErr` relative rank
    * error): a bounded per-partition summary merge, two doubles to the
    * driver, no id tie-break (the boundary id degrades to
    * Long.MaxValue, so value-ties all route to the LOWER bucket).
    * Probabilities target the same nearest-rank positions ((k−0.5)/n,
    * centered so any consistent rank rounding lands on rank k), so on
    * a sample where `approxErr × n < 1` the two paths agree row for
    * row (NgramLmSpec pins this on the fixture); at scale the approx
    * path is approximate by construction — CCNet's own thresholds are
    * sample-drawn anyway. */
  def bucketThresholds(scored: DataFrame, idCol: String,
      ringPct: Int = 20, exact: Boolean = true,
      approxErr: Double = 0.001): PplThresholds = {
    require(ringPct > 0 && ringPct <= 100, s"ringPct in (0,100], got $ringPct")
    require(approxErr >= 0 && approxErr < 1,
      s"approxErr in [0,1), got $approxErr")
    // BOTH paths materialize the ring sample once, BEFORE counting:
    // the sample feeds a count plus either two nearest-rank selections
    // (exact) or one approxQuantile summary pass (approx) — without
    // the barrier the upstream scored plan (scoring joins + filter)
    // would execute once per pass, which on the very 100 TB-scale
    // input the approx flag exists for costs more than the
    // materialization it was meant to avoid. Ring-bounded by the
    // caller's ringPct choice (two narrow columns).
    val sample = scored
      .where(col("n_big") > 0 &&
        graft.operators.Sampling.hashBucket(idCol) < ringPct)
      .select(col(idCol), col("avg_logp"))
      .localCheckpoint(eager = true)
    try thresholdsOfSample(sample, idCol, approxErr, exact)
    finally {
      // threshold-local scratch — free the checkpoint blocks once the
      // two ranks are pulled (long-lived sessions otherwise accumulate)
      org.apache.spark.sql.graftshim.CheckpointBridge.free(sample)
    }
  }

  private def thresholdsOfSample(sample: DataFrame, idCol: String,
      approxErr: Double, exact: Boolean): PplThresholds = {
    if (!exact) {
      val n = sample.count()
      require(n >= 3, s"perplexity sample has $n rows — raise ringPct")
      val k1 = (n + 2) / 3
      val k2 = (2 * n + 2) / 3
      val qs = sample.stat.approxQuantile("avg_logp",
        Array((k1 - 0.5) / n, (k2 - 0.5) / n), approxErr)
      return PplThresholds(qs(0), Long.MaxValue, qs(1), Long.MaxValue)
    }
    val n = sample.count()
    require(n >= 3, s"perplexity sample has $n rows — raise ringPct")
    // the nearest-rank pull below runs limit(k.toInt); a ring sample
    // beyond ~2^31 rows would overflow to a negative limit and fail
    // mid-job instead of pointing at the documented knob
    require((2 * n + 2) / 3 <= Int.MaxValue.toLong,
      s"perplexity ring sample too large ($n rows) — lower ringPct")
    // nearest-rank k-th smallest (avg_logp, id): TakeOrdered(k) then
    // the reverse top-1 of those k rows
    def kth(k: Long): (Double, Long) = {
      val r = sample.orderBy(col("avg_logp"), col(idCol)).limit(k.toInt)
        .orderBy(col("avg_logp").desc, col(idCol).desc).limit(1)
        .select(col("avg_logp"), col(idCol).cast("long")).head()
      (r.getDouble(0), r.getLong(1))
    }
    val (b1a, b1d) = kth((n + 2) / 3)
    val (b2a, b2d) = kth((2 * n + 2) / 3)
    PplThresholds(b1a, b1d, b2a, b2d)
  }

  /** Pure per-row bucket CASE over frozen [[PplThresholds]] — 'tail' /
    * 'middle' / 'head', 'unscored' for evidence-free rows (n_big = 0);
    * ties at a boundary value break on id against the boundary row's
    * own id (the bit-identical cross-engine rule). */
  def bucketColumn(avgLogp: Column, id: Column, nBig: Column,
      th: PplThresholds): Column = {
    def le(a: Double, d: Long) = avgLogp < a || (avgLogp === a && id <= d)
    when(nBig === 0, lit("unscored"))
      .when(le(th.b1Logp, th.b1Id), lit("tail"))
      .when(le(th.b2Logp, th.b2Id), lit("middle"))
      .otherwise(lit("head"))
  }
}
