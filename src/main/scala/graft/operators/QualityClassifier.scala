package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED quality classifier — the GPT-3 appendix-A / DCLM corpus
  * recipe the heuristic score (L5c) and LM perplexity (L27) stop short
  * of: logistic regression over hashed token features, positives = a
  * curated clean slice, negatives = raw/garbage crawl, applied as a
  * per-document keep score. Public practice: GPT-3 filtered Common
  * Crawl with an LR classifier over hashed features of curated
  * positives (WebText/Wikipedia/books); DCLM-Baseline's strongest
  * single filter is a fastText classifier — both are linear models
  * over hashed token features, which is exactly what a few
  * partial-aggregated gradient passes express.
  *
  * Everything is engine-portable by construction (the [[NgramLm]]
  * train discipline):
  *  - the feature hash is an explicit per-character polynomial fold
  *    (h = (h·31 + codepoint) mod 1000003, seeded 7, then mod `dim`) —
  *    no engine-specific `hash()`/`xxhash64`, so DuckDB restates it
  *    with `list_reduce` and both engines bucket every token
  *    identically;
  *  - weights and bias live on the 1e-6 integer grid (micro-units,
  *    BIGINT): per-doc margins are integer dot products, the sigmoid
  *    is evaluated once per (doc, epoch) on a double that both engines
  *    derive from the same integers and is immediately re-quantized to
  *    the grid (exp can differ by 1 ulp cross-engine — ~1e-16, ten
  *    orders below the grid), and every gradient/update is integer
  *    arithmetic after one `round`.
  *
  * Scale shape: `train` runs over the LABELED set — in public practice
  * a curated sample (1e5-1e7 docs), never the raw corpus — with one
  * (id, bucket)-grain feature aggregation reused across epochs and,
  * per epoch, one groupBy(id) score pass and one groupBy(bucket)
  * gradient pass that partial-aggs into ≤ `dim`+1 rows (the only
  * driver pull — bounded by the model size, the bucketThresholds
  * discipline). `scoreColumn` — the 100 TB path — is a PURE PER-ROW
  * projection: the trained weights embed as a map literal and the
  * margin is one fold over the token array (no explode, no join, no
  * shuffle; the map is `dim` entries, broadcast with the plan). The
  * l39 oracle is a genuine cross-strategy differential: Spark scores
  * via the per-row map fold, DuckDB re-trains AND re-scores via
  * explode + join + groupBy, and the integer outputs must agree
  * bit-for-bit. */
object QualityClassifier {

  /** Modulus of the per-character polynomial fold (prime, small enough
    * that 31·p + max-codepoint stays far inside a Long). */
  private val FoldMod = 1000003L

  /** Micro-unit grid: 1e-6, the repo-wide quantization scale. */
  private val Micro = 1000000L

  /** Trained model: `dim` feature buckets, bias and weights in
    * micro-units (1e-6 grid). Weights map is sparse — buckets never
    * touched by a gradient stay at 0. */
  final case class LrModel(dim: Int, biasMicro: Long, wMicro: Map[Int, Long])

  /** Portable feature bucket of one token: explicit polynomial fold
    * over its characters (seed 7, ·31 + codepoint, mod [[FoldMod]]),
    * then mod `dim` — the native [[graft.functions.PolyBucket]] kernel
    * (one compiled code-point loop; the HOF `aggregate` form evaluated
    * ~30 interpreted nodes per character, the dominant cost of every
    * trained gate's scoring fold — l42/l43 attempt log). Code points,
    * not code units: the kernel matches `ascii(substr(i, 1))`
    * semantics exactly (PolyBucketSpec pins parity on non-BMP input),
    * so the DuckDB oracles' `list_reduce` restatement is unchanged. */
  def tokenBucket(tok: Column, dim: Int): Column =
    graft.functions.TextFunctions.polyBucket(tok, dim)

  /** Built-in-only form of [[tokenBucket]] — kept as the semantic
    * reference for the native kernel's parity property test. */
  private[graft] def tokenBucketHof(tok: Column, dim: Int): Column =
    (aggregate(
      transform(sequence(lit(1), length(tok)),
        i => ascii(tok.substr(i, lit(1))).cast("long")),
      lit(7L), (a, v) => (a * 31L + v) % FoldMod) % dim.toLong).cast("int")

  /** (id, __fb, __fx) term-frequency rows of the hashed features —
    * one partial-agg groupBy at (doc, bucket) grain; NULL texts carry
    * no rows (they score NULL and never train). `featsOf` maps the
    * text column to the feature-string array (word tokens by default;
    * [[LangId]] passes char n-grams — the fastText/CCNet feature
    * space) — each feature string then buckets via [[tokenBucket]]. */
  private[operators] def docFeatures(docs: DataFrame, textCol: String,
      idCol: String, dim: Int, featsOf: Column => Column): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(idCol), explode(featsOf(col(textCol))).as("__tok"))
      .select(col(idCol), tokenBucket(col("__tok"), dim).as("__fb"))
      .groupBy(col(idCol), col("__fb")).agg(count(lit(1)).as("__fx"))

  /** Quantized sigmoid: micro-margin → micro-probability on the 1e-6
    * grid. `round` is half-away-from-zero in both engines; the input
    * to exp is the same double both sides (an exact integer / 1e6). */
  private def pMicro(zMicro: Column): Column =
    round(lit(1000000.0) /
      (lit(1.0) + exp(-zMicro.cast("double") / lit(1000000.0)))).cast("long")

  /** Train by full-batch gradient descent, `epochs` passes, step
    * `lr/N` (N = labeled docs): w ← w − round(lr · Σ_d err_d·x_dj / N)
    * with err in micro-units (quantized sigmoid − label). Epoch 1 is
    * closed-form (w=0 ⇒ p=0.5 exactly), which is what lets the DuckDB
    * oracle unroll the whole computation as chained CTEs. `labelCol`
    * must be 0/1 (1 = curated-clean positive). Docs with NULL text are
    * excluded; docs with no tokens train on the bias alone. */
  def train(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String, dim: Int = 512, epochs: Int = 2,
      lr: Double = 0.5,
      featsOf: Column => Column = TF.tokens): LrModel = {
    // labeled-set-sized by contract (curated sample, not the corpus):
    // features and labels are re-read every epoch — materialize once
    val feats = docFeatures(docs, textCol, idCol, dim, featsOf)
      .localCheckpoint(eager = true)
    val labeled = docs.where(col(textCol).isNotNull)
      .select(col(idCol), col(labelCol).cast("long").as("__y"))
      .localCheckpoint(eager = true)
    try trainOnFeatures(feats, labeled, idCol, dim, epochs, lr)
    finally {
      // train-local scratch — free the checkpoint blocks (a long-lived
      // session retraining in a loop otherwise accumulates them)
      import org.apache.spark.sql.graftshim.CheckpointBridge
      CheckpointBridge.free(feats)
      CheckpointBridge.free(labeled)
    }
  }

  /** GD loop over PREPARED (id, __fb, __fx) features and (id, __y)
    * labels — both already materialized. One-vs-rest trainers
    * ([[LangId]]) share one feature pass across K heads through this
    * (labels are the only per-head difference; re-exploding the corpus
    * per head cost K× the dominant training scan — l42 attempt log). */
  private[operators] def trainOnFeatures(feats: DataFrame,
      labeled: DataFrame, idCol: String, dim: Int, epochs: Int,
      lr: Double, nRows: Option[Long] = None): LrModel =
    trainHeadsOnFeatures(feats, labeled, idCol, Seq("__y"), dim, epochs,
      lr, nRows).head

  /** The GD loop over PREPARED features, generalized to K heads that
    * share one training set and differ only in their 0/1 label column
    * (`yCols`) — the one-vs-rest shape ([[LangId]]). All K heads train
    * in ONE score pass and ONE gradient pass per epoch: the margins,
    * errors and bucket gradients are K parallel columns through the
    * same two joins/aggregations, so the labeled sample is scanned
    * 2·epochs times TOTAL instead of per head (the l42 training pass
    * was K× this scan; at the public labeled-corpus scale that is the
    * whole cost of training). Per-head arithmetic is UNCHANGED — the
    * same integer sums, the same quantized sigmoid, the same rounding —
    * so each returned head is bit-identical to a solo
    * [[trainOnFeatures]] run with that head's labels (the l42 oracle
    * retrains every head relationally and compares the micro integers
    * exactly; single-head callers delegate here, one code path). */
  private[operators] def trainHeadsOnFeatures(feats: DataFrame,
      labeled: DataFrame, idCol: String, yCols: Seq[String], dim: Int,
      epochs: Int, lr: Double, nRows: Option[Long] = None): Seq[LrModel] = {
    require(dim > 0 && epochs >= 1, s"dim=$dim epochs=$epochs")
    require(yCols.nonEmpty, "at least one label column")
    val spark = feats.sparkSession
    // one-vs-rest trainers share the SAME labeled rows across K heads —
    // one count job, not one per head (a scheduler round-trip per head
    // per retrain at cluster scale)
    val n = nRows.getOrElse(labeled.count())
    require(n >= 2, s"classifier training set has $n rows")
    val heads = yCols.indices
    val biases = Array.fill(yCols.size)(0L)
    val ws = Array.fill(yCols.size)(Map.empty[Int, Long])
    for (_ <- 1 to epochs) {
      // (bucket, w_0 … w_{K-1}) — untouched buckets are simply absent
      // (the left join's coalesce treats them as 0, per head)
      val buckets = ws.flatMap(_.keys).distinct.sorted
      val wSchema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__fb",
          org.apache.spark.sql.types.IntegerType) +:
        heads.map(h => org.apache.spark.sql.types.StructField(s"__w$h",
          org.apache.spark.sql.types.LongType)))
      val wDf = spark.createDataFrame(
        java.util.Arrays.asList(buckets.map(b => org.apache.spark.sql.Row
          .fromSeq(b +: heads.map(h => ws(h).getOrElse(b, 0L)))): _*),
        wSchema)
      val zById = feats.join(broadcast(wDf), Seq("__fb"), "left")
        .groupBy(col(idCol))
        .agg(sum(col("__fx") * coalesce(col("__w0"), lit(0L))).as("__z0"),
          heads.drop(1).map(h =>
            sum(col("__fx") * coalesce(col(s"__w$h"), lit(0L))).as(s"__z$h")): _*)
      val errs = labeled.join(zById, Seq(idCol), "left")
        .select(col(idCol) +: heads.map(h =>
          (pMicro(coalesce(col(s"__z$h"), lit(0L)) + biases(h)) -
            col(yCols(h)) * Micro).as(s"__e$h")): _*)
      // one job for every head's every gradient component: bucket
      // gradients union a sentinel -1 row stream for the biases
      // (x_bias = 1 per doc)
      val grads = feats.join(errs, Seq(idCol))
        .select(col("__fb") +: heads.map(h =>
          (col(s"__e$h") * col("__fx")).as(s"__g$h")): _*)
        .unionByName(errs.select(lit(-1).as("__fb") +: heads.map(h =>
          col(s"__e$h").as(s"__g$h")): _*))
        .groupBy(col("__fb"))
        .agg(sum(col("__g0")).as("__g0"), heads.drop(1).map(h =>
          sum(col(s"__g$h")).as(s"__g$h")): _*)
        .collect() // ≤ dim + 1 rows — bounded by the model, not the data
      grads.foreach { r =>
        val b = r.getInt(0)
        heads.foreach { h =>
          // half-AWAY-FROM-ZERO, matching SQL round() and Spark's own
          // round expression — NOT math.round, whose floor(x+0.5) rounds
          // a negative .5 tie toward +∞ and would desync the oracle
          val x = lr * r.getLong(1 + h) / n
          val step =
            (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
          if (b == -1) biases(h) -= step
          else ws(h) = ws(h).updated(b, ws(h).getOrElse(b, 0L) - step)
        }
      }
    }
    heads.map(h => LrModel(dim, biases(h), ws(h)))
  }

  /** Per-row micro-score column (BIGINT micro-probability) — the
    * corpus-scale path: weights as a map literal, margin = one fold
    * over the token array, sigmoid quantized. No explode, no join, no
    * shuffle; NULL text scores NULL. */
  def scoreMicroColumn(text: Column, model: LrModel,
      featsOf: Column => Column = TF.tokens): Column = {
    val wMap: Column =
      if (model.wMicro.isEmpty) lit(null).cast("map<int,bigint>")
      else typedLit(model.wMicro)
    // try_element_at, not element_at: ANSI mode (this engine's default)
    // makes element_at THROW on a missing map key, and untouched
    // buckets are missing by design (sparse weights)
    val z = aggregate(featsOf(text), lit(model.biasMicro),
      (acc, t) => acc +
        coalesce(try_element_at(wMap, tokenBucket(t, model.dim)), lit(0L)))
    when(text.isNull, lit(null).cast("bigint")).otherwise(pMicro(z))
  }

  /** Keep-filter form (the intake-gate shape): true when the quantized
    * micro-probability clears `minPMicro`; NULL text PASSES (the
    * no-evidence convention — the quality gate upstream already owns
    * empty/NULL handling). */
  def keeps(text: Column, model: LrModel, minPMicro: Long): Column =
    text.isNull || scoreMicroColumn(text, model) >= minPMicro

  /** GPT-3's Pareto-NOISY keep rule (appendix A): a document is kept
    * iff `β > 1 − score` with `β ~ Pareto(α)` — low-scoring documents
    * still enter the corpus with probability `(2 − score)^{−α}`, which
    * preserves tail diversity a hard threshold destroys. The noise
    * here is DETERMINISTIC: `u` comes from the portable hash ring on
    * the id (the [[Sampling.shuffleKey]] integer recipe, exact in a
    * double), `β = (1−u)^{−1/α} − 1` (the standard inverse-CDF Pareto
    * draw), and β is quantized to the 1e-6 grid so the final compare
    * is integer vs integer — reproducible across runs, engines and
    * partitionings, and restatable in the DuckDB oracle. One caveat
    * beyond the model's ln/exp class (ADVICE r15): `u` is an arbitrary
    * ring value (not integer-derived like the sigmoid's input), so the
    * pre-round `pow` double CAN land arbitrarily close to a .5 micro
    * tie, where a 1-ulp cross-engine `pow` difference would flip that
    * row's keep decision. Deterministic within one engine (the
    * property production replay needs); if strict cross-engine
    * bit-parity ever matters, derive β from an integer-only
    * approximation or widen the oracle's tie margin — no fixture row
    * has landed within 2 micro of a tie (checked when the l39d oracle
    * was cut). NULL text passes (the no-evidence convention). Pure
    * per-row projection. */
  def paretoKeeps(text: Column, id: Column, model: LrModel,
      alpha: Double = 9.0): Column = {
    require(alpha > 0, s"Pareto alpha must be positive, got $alpha")
    val p = 2147483647L
    val u = Sampling.shuffleKeyOf(id).cast("double") / p.toDouble
    val betaMicro = round(
      (pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0)) * 1000000.0)
      .cast("long")
    text.isNull || betaMicro > (lit(Micro) - scoreMicroColumn(text, model))
  }

  // ---- persistence: train once, gate forever (the writeLm/writeVocab
  // discipline — a production intake loop loads the frozen model from
  // the catalog instead of retraining per session) ----

  /** Persist a model as two managed tables: `<table>_qcw` (bucket,
    * weight) — at most `dim` rows — and the one-row `<table>_qcm`
    * (dim, bias). Integer micro-units round-trip exactly. */
  def writeModel(spark: org.apache.spark.sql.SparkSession, model: LrModel,
      table: String): Unit = {
    import spark.implicits._
    model.wMicro.toSeq.toDF("bucket", "w_micro")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_qcw")
    Seq((model.dim, model.biasMicro)).toDF("dim", "bias_micro")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_qcm")
  }

  /** Load a persisted model ([[writeModel]]) — one bounded driver pull
    * of ≤ dim+1 rows; the weights become the scoring map literal. */
  def readModel(spark: org.apache.spark.sql.SparkSession,
      table: String): LrModel = {
    val meta = spark.table(s"${table}_qcm").select(col("dim"), col("bias_micro")).head()
    val w = spark.table(s"${table}_qcw").select(col("bucket"), col("w_micro"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    LrModel(meta.getInt(0), meta.getLong(1), w)
  }

  /** True when both model tables exist (the session gate the probe-row
    * pattern uses). */
  def modelExists(spark: org.apache.spark.sql.SparkSession,
      table: String): Boolean =
    Seq("_qcw", "_qcm").forall(s => spark.catalog.tableExists(table + s))

  /** Drop a persisted model — tables AND warehouse locations (the
    * [[Layout.dropTableAndLocation]] rationale: a new session over an
    * old warehouse otherwise refuses the CREATE path). */
  def dropModel(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit =
    Seq("_qcw", "_qcm").foreach(s =>
      Layout.dropTableAndLocation(spark, table + s))
}
