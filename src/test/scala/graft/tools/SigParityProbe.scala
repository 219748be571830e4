package graft.tools

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** One-shot parity check: the single-pass hyperplaneSig must produce
  * bit-identical signatures to the old per-plane-fold form on real
  * embeddings (the LSH queries are rows-only, so the gate can't see a
  * silent signature change). */
object SigParityProbe {
  def oldSig(vec: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { j =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, d) =>
          x.cast("double") *
            (((lit(j.toLong) * 2654435761L + d.cast("long") * 40503L) % 8191L) - 4095L).cast("double")),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    for (n <- Seq(1, 6, 8, 16, 63)) {
      val diff = emb.select(
          graft.functions.VectorFunctions.hyperplaneSig(col("embedding"), n).alias("a"),
          oldSig(col("embedding"), n).alias("b"))
        .where(!(col("a") <=> col("b"))).count()
      println(s"[parity] nPlanes=$n mismatches=$diff")
    }
    spark.stop()
  }
}
