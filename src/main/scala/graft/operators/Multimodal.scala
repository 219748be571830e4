package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY §2.9 L8): image/audio/video payloads
  * travel as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract run per-partition so batches amortize codec setup.
  *
  * The actual media codecs are NOT available in this container, so
  * `decodeStub` derives deterministic fake features from the bytes — the
  * Spark-side plumbing (schema, partition-wise batching, spill-free
  * row-at-a-time iterators) is real and tested; swap `decodeStub` for a
  * JNI/codec call in production.
  *
  * Scale notes: payloads never pass through a shuffle here (narrow
  * mapPartitions); at 100 TB keep payloads in their own column family
  * (parquet column) so metadata-only queries never read the blob pages —
  * Spark's parquet column pruning gives that for free.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("modality", StringType),
    StructField("byte_len", LongType),
    StructField("format", StringType)))

  /** Wrap a source column as a multimodal envelope:
    * (payload binary, meta struct). */
  def toEnvelope(df: DataFrame, srcCol: String, modality: String, format: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast(BinaryType))
      .withColumn("meta", struct(
        lit(modality).alias("modality"),
        length(col(srcCol).cast(BinaryType)).cast(LongType).alias("byte_len"),
        lit(format).alias("format")))

  /** STUB decode: deterministic fake "feature vector" from payload bytes
    * (first 8 bytes folded). Stands in for image decode / audio frames. */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val seed = payload.take(8).foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L)
    Array.tabulate(dim) { i =>
      val x = seed * (i + 1) + 0x9e3779b97f4a7c15L * i
      ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
    }
  }

  /** Per-partition decode+featurize: adds `features array<float>`.
    * mapPartitions (not per-row UDF) so a real codec could init once per
    * partition; output schema is explicit for downstream pruning. */
  def extractFeatures(df: DataFrame, dim: Int = 8): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val feats = if (payload == null) null else decodeStub(payload, dim)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Resize stub: truncate the payload to `targetBytes` and update the
    * metadata — the byte-level shape of an image downscale (real codec
    * absent from this container; the schema and per-row transform are
    * the production plumbing). */
  def resize(df: DataFrame, targetBytes: Int): DataFrame =
    df.withColumn("payload", substring(col("payload"), 1, targetBytes))
      .withColumn("meta", struct(
        col("meta.modality").alias("modality"),
        length(col("payload")).cast(LongType).alias("byte_len"),
        col("meta.format").alias("format")))

  /** Frame-sample stub: emit every `stride`-th "frame" index with a
    * per-frame fingerprint — the 1→N explode shape of video sampling. */
  def frameSample(df: DataFrame, nFrames: Int, stride: Int): DataFrame = {
    // sequence(0, (n-1)*stride, stride) throws at RUNTIME on the first
    // row for nFrames=0 (stop below start) or stride=0 (zero step) —
    // fail at the call site instead
    require(nFrames >= 1, "frameSample needs nFrames >= 1")
    require(stride >= 1, "frameSample needs stride >= 1")
    df.withColumn("frame_idx",
        explode(sequence(lit(0), lit((nFrames - 1) * stride), lit(stride))))
      .withColumn("frame_fp",
        abs(hash(col("payload"), col("frame_idx")).cast(LongType)))
  }
}
