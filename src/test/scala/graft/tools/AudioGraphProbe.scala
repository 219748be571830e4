package graft.tools

import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.functions._

/** Diagnostic for the audio ScaleSpec straggler: candidate-pair volume,
  * hottest ids, component sizes at the 60k melody corpus. */
object AudioGraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 60000
    val seeds = spark.range(n).select($"id".as("doc_id"),
      when($"id" >= n - 10000, lit(7L)).otherwise($"id").as("__seed"))
    val originals = Multimodal.syntheticWavPcm16(seeds, "__seed")
      .select($"doc_id", $"payload")
    val sigs = Multimodal.audioFingerprint(originals)
      .where($"afp".isNotNull).select($"doc_id", $"afp")
      .localCheckpoint(true)
    val cands = Dedup.audioCandidates(sigs, "doc_id", "afp", maxBucket = 1024)
      .localCheckpoint(true)
    println(s"[audiograph] pairs = ${cands.count()}")
    val deg = cands.select($"id_a".as("id")).unionAll(cands.select($"id_b".as("id")))
      .groupBy($"id").count().orderBy($"count".desc)
    deg.limit(10).collect().foreach(r =>
      println(s"[audiograph] id ${r.getLong(0)} degree ${r.getLong(1)}"))
    val dist = cands.groupBy($"hamming_dist").count().orderBy($"hamming_dist")
    dist.collect().foreach(r =>
      println(s"[audiograph] dist ${r.getInt(0)} pairs ${r.getLong(1)}"))
    spark.stop()
  }
}
object AudioPairProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 60000
    val seeds = spark.range(n).select($"id".as("doc_id"),
      when($"id" >= n - 10000, lit(7L)).otherwise($"id").as("__seed"))
    val originals = Multimodal.syntheticWavPcm16(seeds, "__seed")
      .select($"doc_id", $"payload")
    val copies = Multimodal.syntheticWavMulawTone(
        seeds.where($"doc_id" % 997 === 0 && $"doc_id" < n - 10000)
          .select(($"doc_id" + 10000000L).as("doc_id"), $"__seed"), "__seed")
      .select($"doc_id", $"payload")
    val sigs = Multimodal.audioFingerprint(originals.unionByName(copies))
      .where($"afp".isNotNull).select($"doc_id", $"afp").localCheckpoint(true)
    val m = sigs.where($"doc_id" === 3988L || $"doc_id" === 10003988L)
      .as[(Long, Long)].collect().toMap
    println(s"[pair] sig(3988)=${m.get(3988L)} sig(copy)=${m.get(10003988L)} " +
      s"dist=${m.values.toSeq match { case Seq(a, b) => java.lang.Long.bitCount(a ^ b); case _ => -1 }}")
    val cands = Dedup.audioCandidates(sigs, "doc_id", "afp", maxBucket = 1024)
      .localCheckpoint(true)
    println(s"[pair] total pairs = ${cands.count()}")
    println("[pair] copy pairs: " + cands
      .where($"id_a" === 10003988L || $"id_b" === 10003988L).count())
    println("[pair] orig pairs: " + cands
      .where($"id_a" === 3988L || $"id_b" === 3988L).count())
    spark.stop()
  }
}
