package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators (SURVEY §2.3). The reference's Connect stack never joins
  * (per-record SMTs only); joins enter via the north-star query surface.
  * Everything here is expressed on the DataFrame API so Catalyst plans the
  * physical strategy (broadcast vs shuffled-hash vs sort-merge), with
  * explicit `broadcast()` where the dimension side is known-small.
  *
  * Scale notes (100 TB discipline):
  *  - dims (region/nation/supplier/part at TPC-H shape) stay broadcast-able
  *    far beyond sf0.1; fact-fact joins shuffle on the join key and rely on
  *    AQE for skew splitting.
  *  - the as-of join avoids the O(n·m) naive expansion by a union+window
  *    pass: one shuffle on the partition key, one sort — the same shape a
  *    dedicated as-of physical operator would produce. AQE does NOT split
  *    skewed WINDOW partitions (only joins), so a hot key is one task in
  *    the per-key forms; [[asofJoinBucketed]] is the hot-key scale form.
  */
object Joins {

  /** J1 — broadcast hash join: explicitly ship the small side. */
  def broadcastJoin(fact: DataFrame, dim: DataFrame, on: Seq[String]): DataFrame =
    fact.join(broadcast(dim), on)

  /** J2 — shuffle (sort-merge / shuffled-hash) equi join. */
  def equiJoin(l: DataFrame, r: DataFrame, on: Seq[String], how: String = "inner"): DataFrame =
    l.join(r, on, how)

  /** J7 — range/interval join: equality on `on` plus a band predicate.
    * Planned as BroadcastNestedLoop unless one side is broadcast; callers
    * should band the range at scale (see AsOf below for the banded form). */
  def rangeJoin(l: DataFrame, r: DataFrame, cond: Column, how: String = "inner"): DataFrame =
    l.join(r, cond, how)

  /** J9 — stream-static enrichment join: the streaming side keeps its
    * watermark/trigger semantics, the static side is re-planned per
    * micro-batch (and broadcast when small) — the Spark idiom replacing
    * "sink joins source-of-truth" in Connect pipelines. */
  def streamStaticJoin(stream: DataFrame, static: DataFrame, on: Seq[String],
      broadcastStatic: Boolean = true): DataFrame =
    stream.join(if (broadcastStatic) broadcast(static) else static, on)

  /** J10 — stream-stream equi join with event-time bounds: both sides
    * watermarked, right timestamps constrained to
    * [leftTs - lookBehind, leftTs + lookAhead] so the state store can
    * evict rows once the watermark passes — bounded state at any scale.
    * Column names must be disjoint apart from `key`. */
  def streamStreamJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, watermarkDelay: String,
      lookBehind: String, lookAhead: String, how: String = "inner"): DataFrame = {
    // backtick-quote every column reference: an unquoted dotted payload
    // name (e.g. "a.b") would mis-resolve as a nested field path — same
    // hardening as Smt.qcol / JsonSchemaSerde (shared helper)
    def bq(c: String): String = graft.SqlIdent.bq(c)
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    val joined = l.join(r, expr(
      s"l.${bq(key)} = r.${bq(key)} AND r.${bq(rightTs)} >= l.${bq(leftTs)} - interval $lookBehind" +
        s" AND r.${bq(rightTs)} <= l.${bq(leftTs)} + interval $lookAhead"), how)
    // one key column out, not two ambiguous ones (an unqualified
    // col(key) downstream would throw AMBIGUOUS_REFERENCE): equal in
    // every matched row, coalesce keeps it populated for either outer
    // side's unmatched rows
    joined.select(coalesce(col(s"l.${bq(key)}"), col(s"r.${bq(key)}")).alias(key) +:
      (left.columns.filterNot(_ == key).map(c => col(s"l.${bq(c)}")) ++
        right.columns.filterNot(_ == key).map(c => col(s"r.${bq(c)}"))): _*)
  }

  /** J8 — as-of join: for each left row, the latest right row with
    * rightTs <= leftTs (matching DuckDB `ASOF JOIN` semantics: strict on
    * nothing, ties take the equal timestamp), optionally key-partitioned.
    *
    * Implementation: union both sides tagged, window-sort by (key, ts,
    * side-order) and carry the last non-null right payload forward. One
    * shuffle + one sort — linear, no row-pair expansion, skew-safe under
    * AQE. Right rows at the same ts as a left row sort BEFORE it so the
    * equal timestamp is visible (<= semantics).
    *
    * @param valueCols right-side payload columns to attach. Must all be
    *   orderable types (no MapType): the payload struct participates in
    *   the window ORDER BY as the deterministic tie-break for equal-ts
    *   right rows, and Spark rejects un-orderable sort keys at analysis.
    *   With a MapType payload, project the map to sorted entries first
    *   (or drop it from valueCols and re-attach by id afterwards).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, leftTs: String,
      rightTs: String, valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns
    val rightStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)))
    // NULL-keyed / NULL-ts RIGHT rows can never be an as-of match
    // (`c.key = p.key AND c.ts >= p.ts` is never true on NULL in the SQL
    // form) — but the window would happily match them: NULLs group into
    // a real partition and sort FIRST, so an unfiltered null-ts row
    // becomes the carried payload for every left row above it. Filter
    // them out; NULL-keyed/ts LEFT rows then read NULL payload naturally
    // (their partition holds no right rows / nothing sorts before them).
    val rClean = right.where(col(key).isNotNull && col(rightTs).isNotNull)
    // The whole right payload travels as ONE struct so the carried-forward
    // values always come from a single right row — per-column last() would
    // stitch values from different rows when payload columns are NULL.
    // tag: right=0 sorts before left=1 at equal ts → inclusive (<=) match;
    // equal-ts right rows tie-break on the payload struct for determinism.
    val rTagged = rClean.select(
      (col(key).alias(key) +:
        col(rightTs).alias("__ts") +:
        lit(0).alias("__side") +:
        struct(valueCols.map(col): _*).alias("__v") +:
        lCols.filterNot(c => c == key).map(c =>
          lit(null).cast(left.schema(c).dataType).alias(c))): _*)
    val lTagged = left.select(
      (col(key) +:
        col(leftTs).alias("__ts") +:
        lit(1).alias("__side") +:
        lit(null).cast(rightStructType).alias("__v") +:
        lCols.filterNot(c => c == key).map(col)): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"), col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rTagged.unionByName(lTagged)
      .select((col(key) +: col("__side") +:
        lCols.filterNot(_ == key).map(col)) :+
        last(col("__v"), ignoreNulls = true).over(w).alias("__v"): _*)
    filled.where(col("__side") === 1)
      .select(lCols.map(col) ++ valueCols.map(c => col(s"__v.$c").alias(c)): _*)
  }

  /** As-of join, time-bucketed two-pass variant — the HOT-KEY scale form.
    * [[asofJoin]] windows per key, so one key carrying a large share of
    * both sides (a bot user, a default tenant) becomes a single sorted
    * task however many executors exist. Here the window partitions by
    * (key, time bucket) — per-task work is bounded by bucket population,
    * not key population — and the cross-bucket carry is recovered with a
    * classic two-pass parallel prefix: pass 1 summarizes each populated
    * bucket to its LAST right payload (a groupBy, one row per (key,
    * bucket)); pass 2 runs the carry window over that tiny summary frame
    * (rows = populated buckets per key, not events per key) and joins
    * the carry-in back by (key, bucket). A left row's match is its
    * within-bucket window value when a right row precedes it in the same
    * bucket, else the carry-in from strictly earlier buckets — exactly
    * [[asofJoin]]'s semantics (equivalence is property-tested, and j08c
    * shares j08's DuckDB ASOF oracle).
    *
    * Bucketing uses truncating integer division of `unix_micros` (exact
    * for any timestamp; monotone, which is all correctness needs).
    * Choose `bucketSeconds` so a hot key's densest bucket fits a task —
    * at 100 TB that's the same dial as shuffle partition sizing. */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, key: String, leftTs: String,
      rightTs: String, valueCols: Seq[String], bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val lCols = left.columns
    // uniquified temp names (Sampling.tempName pattern): the fixed names
    // the first cut used corrupted silently on clash — withColumn("__b")
    // REPLACES a caller's same-named left column, and the final
    // select(lCols) then emits bucket ids as that column's data. (Plain
    // asofJoin's select-with-alias shape fails loudly instead.)
    val used = (lCols ++ right.columns).toSet
    def tn(base: String): String = graft.Cols.fresh(used, base)
    val cTs = tn("__ts"); val cSide = tn("__side"); val cV = tn("__v")
    val cB = tn("__b"); val cVin = tn("__vin"); val cLast = tn("__last")
    val cPrev = tn("__prev"); val cM = tn("__m")
    val rightStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)))
    val widthUs = bucketSeconds * 1000000L
    // integral `div` (exact at any magnitude; the double detour of
    // floor(a/b) loses precision past 2^53 µs) — truncation's only
    // quirk is a double-width bucket straddling the 1970 epoch, which
    // is harmless: correctness needs monotone, not uniform, buckets
    // applies to the tagged frames' ts temp column
    def bucketOf: Column = expr(s"unix_micros(`$cTs`) div $widthUs")
    // same NULL-key/ts right-row exclusion as asofJoin (see there)
    val rClean = right.where(col(key).isNotNull && col(rightTs).isNotNull)
    val rTagged = rClean.select(
      (col(key).alias(key) +:
        col(rightTs).alias(cTs) +:
        lit(0).alias(cSide) +:
        struct(valueCols.map(col): _*).alias(cV) +:
        lCols.filterNot(c => c == key).map(c =>
          lit(null).cast(left.schema(c).dataType).alias(c))): _*)
    val lTagged = left.select(
      (col(key) +:
        col(leftTs).alias(cTs) +:
        lit(1).alias(cSide) +:
        lit(null).cast(rightStructType).alias(cV) +:
        lCols.filterNot(c => c == key).map(col)): _*)
    val tagged = rTagged.unionByName(lTagged).withColumn(cB, bucketOf)
    // pass 0: within-bucket as-of (same ordering contract as asofJoin)
    val w1 = Window.partitionBy(col(key), col(cB))
      .orderBy(col(cTs), col(cSide), col(cV))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = tagged
      .select((col(key) +: col(cB) +: col(cSide) +:
        lCols.filterNot(_ == key).map(col)) :+
        last(col(cV), ignoreNulls = true).over(w1).alias(cVin): _*)
      .where(col(cSide) === 1)
    // pass 1: last right payload per populated (key, bucket) — max_by on
    // (ts, payload) matches w1's (ts, side, payload) order for right rows
    val lastPerBucket = rClean.select(col(key),
        col(rightTs).alias(cTs),
        struct(valueCols.map(col): _*).alias(cV))
      .withColumn(cB, bucketOf)
      .groupBy(col(key), col(cB))
      .agg(max_by(col(cV), struct(col(cTs), col(cV))).alias(cLast))
    // pass 2: carry-in per bucket = last over STRICTLY earlier buckets,
    // computed over every bucket either side populates (a left-only
    // bucket still needs its carry-in)
    val wPrev = Window.partitionBy(col(key)).orderBy(col(cB))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = tagged.select(col(key), col(cB)).distinct()
      .join(lastPerBucket.select(col(key), col(cB), col(cLast)), Seq(key, cB), "left")
      .select(col(key), col(cB),
        last(col(cLast), ignoreNulls = true).over(wPrev).alias(cPrev))
    // STRUCT-level coalesce: the match is one right ROW — a present
    // within-bucket row with a NULL payload FIELD must not leak the
    // carried bucket's field through a per-column coalesce
    filled.join(carry, Seq(key, cB), "left")
      .withColumn(cM, coalesce(col(cVin), col(cPrev)))
      .select(lCols.map(col) ++ valueCols.map(c => col(s"`$cM`.`$c`").alias(c)): _*)
  }

  /** As-of join, narrow-sort variant: the union+window pass carries only
    * (key, ts, side, leftId, right payload) — for a wide left table this
    * keeps the sort rows small, then one equi-join on `leftId` re-attaches
    * the left payload. `leftId` MUST be unique and non-null per left row
    * (e.g. an event id): the re-attach is a left join, so a null id keeps
    * its row but reads null as-of values instead of a window match —
    * that's the one divergence from [[asofJoin]]. Prefer this form when
    * the left side is wide, the plain form when it's already narrow. */
  def asofJoinNarrow(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, leftId: String,
      valueCols: Seq[String]): DataFrame = {
    val rightStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)))
    // same NULL-key/ts right-row exclusion as asofJoin (see there)
    val rTagged = right.where(col(key).isNotNull && col(rightTs).isNotNull).select(
      col(key),
      col(rightTs).alias("__ts"),
      lit(0).alias("__side"),
      lit(null).cast(left.schema(leftId).dataType).alias("__lid"),
      struct(valueCols.map(col): _*).alias("__v"))
    val lTagged = left.select(
      col(key),
      col(leftTs).alias("__ts"),
      lit(1).alias("__side"),
      col(leftId).alias("__lid"),
      lit(null).cast(rightStructType).alias("__v"))
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"), col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rTagged.unionByName(lTagged)
      .select(col("__side"), col("__lid"),
        last(col("__v"), ignoreNulls = true).over(w).alias("__v"))
      .where(col("__side") === 1)
      .select(col("__lid") +: valueCols.map(c => col(s"__v.$c").alias(c)): _*)
    left.join(matched, left(leftId) === matched("__lid"), "left").drop("__lid")
  }
}
