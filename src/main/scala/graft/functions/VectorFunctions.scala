package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY §2.9 L3/L4),
  * built entirely from Spark higher-order functions (`zip_with`,
  * `aggregate`, `transform`) so everything stays inside Catalyst/codegen —
  * no UDF boundary, no serialization per row.
  *
  * Scale notes: all functions are per-row scalar expressions — they
  * parallelize trivially and never shuffle. The quantized variants exist
  * for the DuckDB-oracle determinism contract: float summation order is
  * engine-defined, so oracle-checked queries quantize to a fixed integer
  * grid first (exact integer arithmetic is order-independent), while the
  * float path is covered by unit tests.
  */
object VectorFunctions {

  /** Sum of a double-array via ordered left fold (deterministic within
    * Spark; cross-engine determinism needs the quantized variant). */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0d), (acc, x) => acc + x)

  /** Dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(fsum(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine via the native codegen'd [[CosineF32]] expression — one fused
    * loop, no intermediate arrays (~30x the higher-order-function form on
    * 64-dim float vectors). Built directly from the expression so it works
    * on any session; [[graft.GraftExtensions]] additionally registers it
    * as SQL `cosine_f32`. `dot/sqrt(nx*ny)`, so it can differ from
    * [[cosine]] by ≤1 ulp. */
  def cosineNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(CosineF32(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Quantize a float vector to a BIGINT grid: round(x * scale).
    * float→double is exact and x*scale stays exact in double for
    * |x|<~100 and scale≤1e6, so both Spark and DuckDB round the same
    * exact value — integer results match bit-for-bit. */
  def quantize(a: Column, scale: Long = 1000000L): Column =
    transform(a, x => round(x.cast("double") * scale).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(aq: Column, bq: Column): Column =
    aggregate(zip_with(aq, bq, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Exact integer squared-norm of a quantized vector. */
  def normSqQ(aq: Column): Column =
    aggregate(transform(aq, x => x * x), lit(0L), (acc, x) => acc + x)

  /** Cosine over the integer grid: dotQ / sqrt(normSqQ*normSqQ) — the
    * only float ops are two exact long→double conversions, one multiply,
    * one sqrt and one divide on identical inputs → cross-engine
    * deterministic. Backed by the native [[CosineQ64]] kernel (one fused
    * integer loop, bit-identical to the HOF fold — parity is
    * property-tested); the HOF form below is kept as the reference
    * semantics. */
  def cosineQ(aq: Column, bq: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(CosineQ64(ColumnBridge.expression(aq), ColumnBridge.expression(bq)))
  }

  /** Reference HOF implementation of [[cosineQ]] (zip_with+aggregate):
    * used by the native-vs-HOF parity test, not by hot paths. */
  def cosineQHof(aq: Column, bq: Column): Column =
    dotQ(aq, bq).cast("double") /
      sqrt(normSqQ(aq).cast("double") * normSqQ(bq).cast("double"))

  /** SimHash-style signature for a vector: sign bits against
    * deterministic pseudo-random hyperplanes, packed into a BIGINT.
    * Hyperplane component (j,d) = fractional hash of (j,d) centered at 0;
    * pure integer arithmetic so any engine reproduces it.
    *
    * Single-pass fold carrying ALL plane accumulators in one array —
    * nPlanes separate aggregates would re-traverse the vector (and
    * re-materialize its index sequence) once per plane, the same
    * N-per-bit anti-pattern Dedup.simhash was rewritten away from
    * (measured ~20× there). Per-plane summation order is unchanged
    * (element order), so signatures are bit-identical to the old form.
    *
    * NULL/empty vectors yield NULL, not the valid signature 0 — they
    * must drop out of LSH bucket joins, not pile into bucket 0 with
    * genuinely all-negative-projection vectors. */
  def hyperplaneSig(vec: Column, nPlanes: Int): Column = {
    // ≤63: bit j packs as 1L << j and 64+ would silently alias mod 64
    // (and the additive pack would then corrupt colliding bits)
    require(nPlanes >= 1 && nPlanes <= 63, "hyperplaneSig needs 1 <= nPlanes <= 63")
    val planeIdx = array((0 until nPlanes).map(j => lit(j.toLong)): _*)
    val powers = array((0 until nPlanes).map(j => lit(1L << j)): _*)
    // accumulator = struct(element index d, per-plane running sums)
    val folded = aggregate(vec,
      struct(lit(0L).alias("d"), array_repeat(lit(0.0d), nPlanes).alias("acc")),
      (st, x) => struct(
        (st.getField("d") + 1L).alias("d"),
        zip_with(st.getField("acc"), planeIdx, (a, j) =>
          // component_d = ((j*2654435761 + d*40503) mod 8191) - 4095
          a + x.cast("double") *
            (((j * 2654435761L + st.getField("d") * 40503L) % 8191L) - 4095L).cast("double"))
          .alias("acc")))
    val packed = aggregate(
      zip_with(folded.getField("acc"), powers,
        (proj, p) => when(proj >= 0, p).otherwise(0L)),
      lit(0L), (acc, b) => acc + b)
    when(vec.isNull || size(vec) === 0, lit(null).cast("long")).otherwise(packed)
  }
}
