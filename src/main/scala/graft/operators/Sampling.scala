package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset splitting and sampling for training pipelines (SURVEY §2.9
  * north star): train/validation splits and down-sampling over ~100 TB
  * corpora.
  *
  * The primary split is HASH-based, not random: `randomSplit` re-deals
  * rows on every run and every repartition, while a hash of a stable id
  * gives a split that is (a) reproducible across runs and engines,
  * (b) stable under data growth — a document keeps its split forever, so
  * an eval set never leaks into training when the corpus is re-ingested —
  * and (c) a pure per-row projection: no shuffle, no state, safe at any
  * scale. The multiplicative hash is spelled in portable integer
  * arithmetic so the DuckDB oracle reproduces it exactly.
  */
object Sampling {

  /** Portable bucket in [0, buckets) from a stable integer id
    * (Knuth multiplicative hashing on the 2^31 ring — exact in Long,
    * reproducible in any engine with 64-bit integer arithmetic). The id
    * is reduced mod 2^31-1 BEFORE the multiply so the product stays
    * inside Long for any id magnitude (ANSI mode would otherwise error
    * on overflow for ids ≥ ~2^32). */
  def hashBucket(idCol: String, buckets: Int = 100): org.apache.spark.sql.Column =
    pmod(shuffleKey(idCol), lit(buckets.toLong))

  /** The full ring position (before bucketing) — a portable per-row
    * shuffle key: ordering by it is a deterministic corpus shuffle,
    * reproducible across runs, engines and partitionings (unlike
    * `rand(seed)`, which re-deals whenever the partitioning changes).
    *
    * `pmod`, not `%`: Spark's `%` (like most engines') is
    * sign-preserving, so a negative id would produce a negative "bucket"
    * and silently diverge from any engine spelling it differently. The
    * portable SQL equivalent is
    * `((id % p + p) % p * 2654435761 + 104729) % p` with p = 2147483647
    * (inner term non-negative ⇒ the outer `%` needs no correction) —
    * the oracle queries spell exactly that. */
  def shuffleKey(idCol: String): org.apache.spark.sql.Column =
    shuffleKeyOf(col(idCol))

  /** [[shuffleKey]] over an arbitrary id EXPRESSION (callers composing
    * the ring into a larger per-row formula, e.g. the Pareto keep). */
  def shuffleKeyOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val p = 2147483647L
    pmod(pmod(id, lit(p)) * 2654435761L + 104729L, lit(p))
  }

  /** Deterministic corpus shuffle: total order by the portable key, id
    * as tie-break (ids sharing a ring position stay deterministic).
    * Spark executes a global sort as a range-partitioned exchange —
    * every partition sorts independently, no single-task funnel — and a
    * `limit(k)` on top becomes TakeOrderedAndProject (per-partition
    * top-k, then a k-row merge). */
  def deterministicShuffle(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("shuffle_key", shuffleKey(idCol))
      .orderBy(col("shuffle_key"), col(idCol))

  /** Deterministic train/eval split: rows whose bucket < `trainPct` are
    * train, the rest eval. Tagged, not dropped, so one scan feeds both
    * sides. */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int,
      buckets: Int = 100): DataFrame = {
    require(trainPct >= 0 && trainPct <= buckets, "trainPct out of range")
    df.withColumn("split",
      when(hashBucket(idCol, buckets) < trainPct, lit("train")).otherwise(lit("eval")))
  }

  /** Deterministic fractional down-sample: keep ids hashing below the
    * cutoff. Same row set on every run/engine — a sampled corpus can be
    * re-derived instead of stored. */
  def hashSample(df: DataFrame, idCol: String, keepPct: Int,
      buckets: Int = 100): DataFrame = {
    // same guard as hashSplit: keepPct > buckets would silently keep the
    // WHOLE corpus (every bucket < keepPct) — a no-op "down-sample" that
    // processes 100 TB instead of erroring at the call site
    require(keepPct >= 0 && keepPct <= buckets, "keepPct out of range")
    df.where(hashBucket(idCol, buckets) < keepPct)
  }

  /** Token-budget subset — the data-mixing step: within each group
    * (language, source, quality bucket), lay documents in the portable
    * shuffle order and keep the prefix whose running token total stays
    * within `budget`. Deterministic and stable: the kept set is a pure
    * function of the data, so a mixing recipe ("2B tokens of code, 500M
    * of forum text") can be re-derived instead of stored, and re-runs
    * pick the exact same documents.
    *
    * Scale shape: one window per group partition (groups are coarse —
    * languages/sources — so partitions are large but the window is a
    * single streaming cumsum; for very hot groups pre-shard like
    * [[graft.operators.Packing.packSequences]] and give each shard
    * budget/nShards). The running sum is monotone, so `cum <= budget`
    * is true exactly on a prefix. Explicit ROWS frame: the default
    * RANGE frame would make order-key peers absorb each other's tokens. */
  def tokenBudget(df: DataFrame, idCol: String, nTokCol: String,
      groupCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    // uniquified temp column (same pattern as JsonSchemaSerde): a fixed
    // "__cum" would clobber (and then drop) a caller's column of that name
    val cum = tempName(df, "__cum")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(shuffleKey(idCol), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn(cum, sum(col(nTokCol)).over(w))
      .where(col(cum) <= budget)
      .drop(cum)
  }

  /** First name in `base`, `base0`, `base1`, … absent from `df.columns` —
    * temp-column hygiene shared by the budget operators. */
  private def tempName(df: DataFrame, base: String): String =
    graft.Cols.fresh(df.columns, base)

  /** [[tokenBudget]] for HOT groups — the 100 TB straggler fix: one
    * window per group makes the dominant group (English at ~half of a web
    * corpus) a single sorted partition. Here each group is pre-sharded by
    * the portable ring hash into `nShards` independent windows, each
    * keeping a prefix under `budget / nShards` — same shape as
    * [[Packing.packSequences]]' per-shard windows. Total kept tokens stay
    * ≤ budget; the trade is bounded underfill (up to ~nShards × the
    * max document's tokens, plus the integer-division remainder) in
    * exchange for nShards-way parallelism on the hottest group. Fully
    * deterministic: shard assignment and within-shard order are both pure
    * functions of the id, so the kept set is reproducible cross-engine
    * (the `l15b` oracle replays it in SQL). */
  def tokenBudgetSharded(df: DataFrame, idCol: String, nTokCol: String,
      groupCol: String, budget: Long, nShards: Int): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(nShards >= 1, "nShards must be >= 1")
    // distribute the integer-division remainder: shard i < budget%nShards
    // gets one extra token, so per-shard budgets sum EXACTLY to `budget`
    // and a budget smaller than nShards degrades gracefully (plain
    // budget/nShards would floor to 0 and silently keep nothing)
    val baseShare = budget / nShards
    val remainder = budget % nShards
    // uniquified temp columns: fixed __shard/__cum would silently clobber
    // same-named caller columns (KafkaEnvelope/JsonSchemaSerde pattern)
    val shard = tempName(df, "__shard")
    val cum = tempName(df, "__cum")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col(shard))
      .orderBy(shuffleKey(idCol), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn(shard, pmod(shuffleKey(idCol), lit(nShards.toLong)))
      .withColumn(cum, sum(col(nTokCol)).over(w))
      .where(col(cum) <= lit(baseShare) +
        when(col(shard) < remainder, 1L).otherwise(0L))
      .drop(shard, cum)
  }

  /** L18 — deterministic corpus MIXTURE: combine N sources at integer
    * target weights, the data-recipe step every training run starts
    * with ("2 parts web, 3 parts code, 5 parts books"). Sources whose
    * target share exceeds their size are UPSAMPLED by whole epochs
    * (standard practice for small high-quality sources — books/wiki
    * repeated 2-3×, web text sub-sampled), tagged with an `epoch`
    * column; the fractional remainder of every rate is a hash-ring cut.
    *
    * All arithmetic is INTEGER (targets by integer division of
    * `totalRows * w / Σw`, epoch split by `target / n` and
    * `target % n`, the fractional cut as ring buckets) so the kept set
    * is a pure function of (data, weights, totalRows) — reproducible
    * cross-engine, and the DuckDB oracle replays it exactly. The
    * approximation vs real-valued rates is ≤ 1 part in `buckets` per
    * source — inherent to hash sampling, not a defect.
    *
    * Scale shape: one bounded `count()` aggregate per source up front;
    * everything after is a per-row projection + filter and a narrow
    * `explode(sequence)` for epoch replication — no shuffle, no window,
    * no driver data. Compose with [[deterministicShuffle]] (keyed on a
    * derived mix id, e.g. `id * maxEpochs + epoch`) to interleave the
    * sources for training order.
    *
    * Output: the shared source schema + `source` (the given name) +
    * `epoch` (0-based copy number). Rows whose source contributes
    * nothing (zero weight / zero target) are absent entirely. */
  def mixCorpora(sources: Seq[(DataFrame, Long, String)], idCol: String,
      totalRows: Long, buckets: Int = 10000): DataFrame = {
    require(sources.nonEmpty, "mixCorpora needs at least one source")
    require(totalRows >= 0, "totalRows must be non-negative")
    require(sources.forall(_._2 >= 0) && sources.exists(_._2 > 0),
      "weights must be non-negative with at least one positive")
    require(buckets >= 1, "buckets must be >= 1")
    val names = sources.map(_._3)
    require(names.distinct.size == names.size, s"duplicate source names: $names")
    val cols0 = sources.head._1.columns.toSeq
    require(sources.forall(_._1.columns.toSeq == cols0),
      "sources must share one schema (same columns, same order)")
    require(!cols0.contains("source") && !cols0.contains("epoch"),
      "sources must not already carry 'source'/'epoch' columns")
    val wsum = sources.map(_._2).sum
    val parts = sources.flatMap { case (df, w, name) =>
      val n = df.count() // bounded: one scalar aggregate per source
      val target = totalRows * w / wsum
      if (n == 0 || target == 0) None
      else {
        val full = target / n            // whole epochs
        val cut = (target % n) * buckets / n // fractional epoch, ring cut
        val epochsName = tempName(df, "__epochs")
        Some(df
          .withColumn("source", lit(name))
          .withColumn(epochsName,
            lit(full) + when(hashBucket(idCol, buckets) < cut, 1L).otherwise(0L))
          .where(col(epochsName) > 0)
          // explicit step 1: two-arg sequence infers step -1 when the
          // bound is negative, which would resurrect zero-epoch rows
          .withColumn("epoch",
            explode(sequence(lit(0L), col(epochsName) - 1, lit(1L))))
          .drop(epochsName))
      }
    }
    parts.reduceOption(_.unionByName(_)).getOrElse {
      sources.head._1.limit(0)
        .withColumn("source", lit(null).cast("string"))
        .withColumn("epoch", lit(null).cast("long"))
    }
  }

  /** Seeded uniform random sample (Spark-deterministic for a fixed seed,
    * partitioning and engine — use [[hashSample]] when cross-run
    * stability matters). */
  def randomSample(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Stratified sample: per-stratum keep fractions (e.g. down-weight a
    * dominant language), seeded. Map must cover every stratum value or
    * uncovered rows are dropped (Spark `sampleBy` semantics). */
  def stratifiedSample[T](df: DataFrame, stratumCol: String,
      fractions: Map[T, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)
}
