package graft.tools

/** Batched-only BPE round-count measurement at larger k than
  * [[BpeProbe]] can afford to run serially (serial per-merge cost is
  * k-invariant — measured there — so the serial wall for these rows is
  * an extrapolation, stated as such in BASELINE.md). The question this
  * probe answers: does the batch size keep growing down the 32k-merge
  * tail, where symbols are longer and share less?
  * Usage: Test/runMain graft.tools.BpeBatchProbe [k] [dictRows] */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val k = if (args.nonEmpty) args(0).toInt else 1024
    val n = if (args.length > 1) args(1).toLong else 100000L
    import org.apache.spark.sql.functions._
    val synth = spark.range(n).select(
      concat_ws("", (0 until 8).map(i =>
        substring(conv(abs(hash(col("id") * 31 + i)) % 26 + 10, 10, 36), 1, 1)): _*)
        .as("word"),
      (col("id") % 1000 + 1).as("count"))
      .groupBy("word").agg(sum("count").as("count"))
      .localCheckpoint(eager = true)
    val rows = synth.count()
    val t0 = System.nanoTime()
    val (merges, rounds) = graft.operators.Bpe.learnMergesCounted(synth, k)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[bpeb] dict=$rows k=$k learned=${merges.length} rounds=$rounds " +
      f"total=$sec%.1f s rounds/merge=${rounds.toDouble / merges.length}%.3f " +
      f"(x-fewer=${merges.length.toDouble / rounds}%.1f)")
    // optional third arg: persist the learned vocabulary through the
    // l17c catalog path and prove the artifact round-trips at this size
    if (args.length > 2) {
      val table = args(2)
      graft.operators.Layout.dropTableAndLocation(spark, table)
      graft.operators.Bpe.writeVocab(spark, merges, table)
      val back = graft.operators.Bpe.readVocab(spark, table)
      println(s"[bpeb] persisted $table roundtrip=${back == merges} rows=${back.length}")
      // and the production tokenize path loads + applies it
      import spark.implicits._
      val sample = Seq((1L, "the quick brown fox jumps over the lazy dog"))
        .toDF("id", "content")
      val toks = graft.operators.Bpe.applyBpeFromTable(spark, sample, "content", table)
        .select(col("bpe_tokens")).collect().head.getSeq[String](0)
      println(s"[bpeb] applyFromTable tokens=${toks.length}")
    }
    spark.stop()
  }
}
