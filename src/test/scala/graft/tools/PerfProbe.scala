package graft.tools

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql._
import org.apache.spark.sql.functions._

object PerfProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    time("count docs")(docs.count())
    // signature alone, materialized via noop write
    time("simhash sig only")(
      docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sig")).write.format("noop").mode("overwrite").save())
    time("simhash candidates full")(println("pairs=" + Dedup.simhashCandidates(docs, "text", "doc_id").count()))
    time("minhash sig only")(
      docs.select(col("doc_id"), Dedup.minhashSignature(graft.functions.TextFunctions.shingleSet(col("text"), 3), 16).as("sig")).write.format("noop").mode("overwrite").save())
    time("minhash candidates full")(println("pairs=" + Dedup.minhashCandidates(docs, "text", "doc_id").count()))
    // envelope stage breakdown
    import graft.sources.{KafkaEnvelope, Tables}
    import org.apache.spark.sql.types._
    val ev = Tables.events(spark, d)
    time("events scan only")(ev.write.format("noop").mode("overwrite").save())
    val env = KafkaEnvelope.wrap(ev, "user_id", "ts", "events")
    time("wrap only")(env.write.format("noop").mode("overwrite").save())
    val payloadSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    time("wrap+unwrap")(KafkaEnvelope.unwrapJson(env, payloadSchema)
      .write.format("noop").mode("overwrite").save())
    // native vs HOF cosine on an all-pairs scoring workload
    val emb = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    import graft.functions.{VectorFunctions => VF}
    val pairs = emb.as("a").crossJoin(emb.limit(500).as("b"))
    time("cosine HOF 1M pairs")(
      pairs.select(VF.cosine(col("a.embedding"), col("b.embedding")).as("c"))
        .write.format("noop").mode("overwrite").save())
    time("cosine native 1M pairs")(
      pairs.select(VF.cosineNative(col("a.embedding"), col("b.embedding")).as("c"))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
