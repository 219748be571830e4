package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §2.9 L3/L4):
  * brute-force cosine top-k as the exact baseline, and an LSH-bucketed
  * approximate variant as the scale path.
  *
  * Zero-norm/empty embeddings score NaN and are excluded from every
  * top-k (Spark sorts NaN above all doubles — unfiltered, one broken
  * vector would rank #1 for every query).
  *
  * 100 TB shapes:
  *  - brute force: `queries` is small (user-supplied) → broadcast it;
  *    the corpus streams through map-side scoring and a per-query top-k
  *    (window over query_id — shuffle keyed by query, tiny rows).
  *    Never materializes the full cross product to disk: score+filter
  *    happen in one whole-stage-codegen'd pass over the corpus.
  *  - ANN: corpus pre-bucketed by hyperplane signature (narrow, one
  *    pass); a query probes only its own bucket → per-bucket scan.
  *    Multi-probe (flip one bit) bounds recall loss; recall/latency is
  *    tuned by nPlanes.
  */
object Similarity {

  /** L4 — exact brute-force cosine top-k for each query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qId), col(cId), VF.cosineNative(col(qVec), col(cVec)).alias("cos_sim"))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos_sim").desc, col(cId))
    scored.where(!isnan(col("cos_sim")))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** L4 (oracle-deterministic variant) — brute-force top-k over the
    * integer-quantized grid: exact cross-engine-reproducible scores
    * (see VectorFunctions.cosineQ), same broadcast + window shape. */
  def bruteForceTopKQ(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qId), col(cId),
        VF.cosineQ(VF.quantize(col(qVec)), VF.quantize(col(cVec))).alias("cos_sim"))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos_sim").desc, col(cId))
    scored.where(!isnan(col("cos_sim")))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** ANN via IVF (inverted-file) coarse quantization: `nLists` corpus
    * vectors with the smallest ids act as deterministic coarse centroids
    * (id-order sampling — no iterative k-means, so the index is
    * reproducible and builds in one pass); every corpus vector is
    * assigned to its nearest centroid, and a query scans only the
    * `nProbe` centroid lists closest to it.
    *
    * 100 TB shape: centroids broadcast (nLists ≪ corpus); assignment is
    * one map-side pass; the probe join shuffles on list id only. Recall
    * improves with nProbe at linear cost — the classic IVF trade-off. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.Column
    // Collect the nLists centroid vectors (bounded, driver-side by
    // design — same footprint as broadcasting them) into one literal
    // array<struct<list, cent>> so assignment is a pure projection.
    val centRows = corpus.orderBy(col(cId)).limit(nLists)
      .select(col(cId).cast("long"), col(cVec)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val cents = typedLit(centRows.toSeq)
    // per-vector scored lists: array<struct<list, sim>>
    def scored(vec: Column): Column =
      transform(cents, c => struct(c.getField("_1").alias("list"),
        VF.cosineNative(vec, c.getField("_2")).alias("sim")))
    // nearest list = running-max fold (no shuffle, no window)
    def nearestList(vec: Column): Column =
      aggregate(scored(vec),
        struct(lit(-1L).alias("list"), lit(-2.0d).alias("sim")),
        (acc, x) => when(x.getField("sim") > acc.getField("sim"), x).otherwise(acc))
        .getField("list")
    // nProbe nearest lists = sort the scored array desc, slice
    def probeLists(vec: Column): Column =
      transform(slice(array_sort(scored(vec),
        (a, b) => when(a.getField("sim") > b.getField("sim"), -1)
          .when(a.getField("sim") < b.getField("sim"), 1).otherwise(0)),
        1, nProbe), c => c.getField("list"))
    val assigned = corpus.select(col(cId), col(cVec),
      nearestList(col(cVec)).alias("__list"))
    val probes = queries.select(col(qId), col(qVec),
      explode(probeLists(col(qVec))).alias("__list"))
    val wTop = Window.partitionBy(col(qId)).orderBy(col("cos_sim").desc, col(cId))
    assigned.join(broadcast(probes), Seq("__list"))
      .select(col(qId), col(cId), VF.cosineNative(col(qVec), col(cVec)).alias("cos_sim"))
      .where(!isnan(col("cos_sim")))
      .withColumn("rank", row_number().over(wTop)).where(col("rank") <= k)
  }

  /** ANN: bucket corpus by hyperplane signature; probe the query's own
    * bucket plus all 1-bit-flip neighbors (multi-probe) and top-k within. */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int = 6,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val bucketed = corpus.withColumn("__bucket", VF.hyperplaneSig(col(cVec), nPlanes))
    val probes = queries
      .withColumn("__sig", VF.hyperplaneSig(col(qVec), nPlanes))
      .select(col(qId), col(qVec),
        explode(array_distinct(array(
          col("__sig") +: (0 until nPlanes).map(b => col("__sig").bitwiseXOR(lit(1L << b))): _*)))
          .alias("__bucket"))
    val scored = bucketed.join(broadcast(probes), Seq("__bucket"))
      .select(col(qId), col(cId), VF.cosineNative(col(qVec), col(cVec)).alias("cos_sim"))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos_sim").desc, col(cId))
    scored.where(!isnan(col("cos_sim")))
      .groupBy(col(qId), col(cId)).agg(first(col("cos_sim")).alias("cos_sim"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
