package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver: where does minhashCandidates spend its time at sf0.1? */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.GraftSession.local(32)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.sources.Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val aug = docs.unionByName(docs.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" zzextra")).as("text")))

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      System.err.println(f"[lsh] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // warm
    spark.range(1000000).selectExpr("sum(id)").collect()
    aug.write.format("noop").mode("overwrite").save()

    val cands = Dedup.minhashCandidates(aug, "text", "doc_id")
    time("full candidates")(cands.write.format("noop").mode("overwrite").save())
    time("full candidates (2nd)")(cands.write.format("noop").mode("overwrite").save())
    val dedup = Dedup.nearDedupMinhash(aug, "text", "doc_id", 0.8)
    time("nearDedup (l02 shape)")(dedup.write.format("noop").mode("overwrite").save())
    time("nearDedup (2nd)")(dedup.write.format("noop").mode("overwrite").save())
    (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      val fresh = Dedup.nearDedupMinhash(aug, "text", "doc_id", 0.8)
      time(s"nearDedup bench-style $i")(fresh.write.format("noop").mode("overwrite").save())
    }
    spark.catalog.clearCache()
    val dup = Dedup.minhashCandidates(aug, "text", "doc_id")
      .where(col("jaccard") >= 0.8).select(col("id_b").alias("doc_id")).distinct()
    time("dupIds alone")(dup.write.format("noop").mode("overwrite").save())
    System.err.println(dedup.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Reused") || l.contains("Join") ||
        l.contains("Window") || l.contains("Generate") || l.contains("Aggregate") ||
        l.contains("Scan"))
      .map(l => "[plan] " + l.take(160)).mkString("\n"))
    System.err.println(cands.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Reused") || l.contains("Join") ||
        l.contains("Window") || l.contains("Generate") || l.contains("Aggregate"))
      .mkString("\n"))

    // stage costs
    val banded = {
      val rows = 16 / 4
      aug.withColumn("__toks", graft.functions.TextFunctions.tokens(col("text")))
        .withColumn("__shingles", graft.functions.TextFunctions.shingleSetOfTokens(col("__toks"), 3))
        .withColumn("__sig", Dedup.minhashSignature(col("__shingles"), 16))
        .select(col("doc_id"), posexplode(transform(sequence(lit(0), lit(3)),
          b => slice(col("__sig"), b * rows + lit(1), lit(rows)))))
    }
    time("signatures+banding only")(banded.write.format("noop").mode("overwrite").save())
    val pairsOnly = cands.select(col("id_a"), col("id_b"))
    time("pairs only (2nd run)")(pairsOnly.write.format("noop").mode("overwrite").save())

    // isolate the attach: cache the pairs so only the attach is timed
    import graft.functions.{TextFunctions => TF}
    val pairsCached = pairsOnly.cache()
    System.err.println(s"[lsh] n pairs = ${pairsCached.count()}")
    val texts = aug.select(col("doc_id"), col("text"))
    val attach = pairsCached
      .join(texts.select(col("doc_id").alias("id_a"), col("text").alias("__t_a")), Seq("id_a"))
      .join(texts.select(col("doc_id").alias("id_b"), col("text").alias("__t_b")), Seq("id_b"))
      .withColumn("sh_a", TF.shingleSetOfTokens(TF.tokens(col("__t_a")), 3))
      .withColumn("sh_b", TF.shingleSetOfTokens(TF.tokens(col("__t_b")), 3))
      .select(col("id_a"), col("id_b"), TF.jaccard(col("sh_a"), col("sh_b")).alias("jaccard"))
    time("attach texts+jaccard")(attach.write.format("noop").mode("overwrite").save())
    // variant: shingle in the texts frame BEFORE the join
    val shingled = aug.select(col("doc_id"),
      TF.shingleSetOfTokens(TF.tokens(col("text")), 3).alias("sh"))
    val attach2 = pairsCached
      .join(shingled.select(col("doc_id").alias("id_a"), col("sh").alias("sh_a")), Seq("id_a"))
      .join(shingled.select(col("doc_id").alias("id_b"), col("sh").alias("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), TF.jaccard(col("sh_a"), col("sh_b")).alias("jaccard"))
    time("attach shingled+jaccard")(attach2.write.format("noop").mode("overwrite").save())
    // jaccard cost itself, no join: adjacent-doc pairs
    val adj = aug.withColumn("sh", TF.shingleSetOfTokens(TF.tokens(col("text")), 3))
    val jac = adj.as("a").join(adj.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
      .select(TF.jaccard(col("a.sh"), col("b.sh")).alias("j"))
    time("adjacent jaccard")(jac.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
