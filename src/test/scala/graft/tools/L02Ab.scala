package graft.tools

import graft.functions.{TextFunctions => TF}
import graft.operators.Dedup
import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** VERDICT r19 #5 A/B: the l02 candidates path re-derives the
  * tokenize+shingle pipeline 3× (banded signatures + both Jaccard
  * join-back sides). Variant B materializes the narrow (id, __sh)
  * shingle frame ONCE via a lazy localCheckpoint and derives all three
  * consumers from it. Both variants must return identical pairs; the
  * timing decides which shape ships (recorded in BASELINE.md). */
object L02Ab {
  def time[T](label: String)(f: => T): Unit =
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      f
      println(f"[l02ab] $label rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // variant B: one shingle pass, lazily materialized; signatures and
    // both join-back sides derive from the blocks
    def candidatesB(df: DataFrame): DataFrame = {
      val shingled = df
        .withColumn("__toks", TF.tokens(col("text")))
        .select(col("doc_id"),
          TF.shingleSetOfTokens(col("__toks"), 3).alias("__sh"))
        .localCheckpoint(false)
      val banded = shingled
        .withColumn("__hashes", Dedup.shingleHashes(col("__sh")))
        .withColumn("__sig", Dedup.minhashSignatureOfHashes(col("__hashes"), 16))
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(0), lit(3)),
            b => slice(col("__sig"), b * 4 + lit(1), lit(4)))))
        .withColumnRenamed("pos", "__band")
        .withColumnRenamed("col", "__bandsig")
      val bounded = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__band"), col("__bandsig"))
        banded.withColumn("__bn", count(lit(1)).over(w))
          .where(col("__bn") <= 128).drop("__bn")
      }
      val pairs = bounded.as("a").join(bounded.as("b"),
          col("a.__band") === col("b.__band") &&
            col("a.__bandsig") === col("b.__bandsig"))
        .where(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").alias("id_a"), col("b.doc_id").alias("id_b"))
        .distinct()
      pairs
        .join(shingled.select(col("doc_id").alias("id_a"), col("__sh").alias("sh_a")), Seq("id_a"))
        .join(shingled.select(col("doc_id").alias("id_b"), col("__sh").alias("sh_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), TF.jaccard(col("sh_a"), col("sh_b")).alias("jaccard"))
    }
    // parity first
    val a = Dedup.minhashCandidates(docs, "text", "doc_id")
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val b = candidatesB(docs)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[l02ab] parity diff rows = $diff")
    time("A current (noop)")(noop(Dedup.minhashCandidates(docs, "text", "doc_id")))
    time("B shingle barrier (noop)")(noop(candidatesB(docs)))
    time("A nearDupClusters")(noop(Dedup.nearDupClusters(docs, "text", "doc_id", 0.8)))
    spark.stop()
  }
}
