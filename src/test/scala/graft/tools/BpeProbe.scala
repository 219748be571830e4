package graft.tools

/** One-off measurement for the BPE training loop at realistic vocab
  * sizes: per-merge cost is the number that extrapolates to 100 TB
  * (the dictionary is bounded by content, so corpus scale changes only
  * the one wordDict shuffle — the k-iteration loop costs the same).
  * Usage: Test/runMain graft.tools.BpeProbe [k ...] (default 8 64 256). */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 64, 256)
    val docs = graft.sources.Tables.documents(spark, d)
      .select(org.apache.spark.sql.functions.col("text"))
    val dict = graft.operators.Bpe.wordDict(docs, "text")
      .localCheckpoint(eager = true)
    println(s"[bpe] dict rows: ${dict.count()}")
    for (k <- ks) {
      val t0 = System.nanoTime()
      val merges = graft.operators.Bpe.learnMerges(dict, k)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[bpe] k=$k%-4d learned=${merges.length}%-4d total=$sec%.2f s " +
        f"per-merge=${sec / math.max(1, merges.length)}%.3f s")
    }
    // dictionary-size scaling: the synthetic corpus has ~31 distinct
    // words, so the rows above measure only the per-iteration driver
    // round-trip floor. A generated dictionary (hash-derived 8-char
    // words, Zipf-ish counts — a measurement harness, not test data)
    // shows how the per-merge cost grows with dictionary rows, the
    // number that extrapolates to a real corpus vocabulary.
    import org.apache.spark.sql.functions._
    for (n <- Seq(100000L, 1000000L)) {
      val synth = spark.range(n).select(
        concat_ws("", (0 until 8).map(i =>
          substring(conv(abs(hash(col("id") * 31 + i)) % 26 + 10, 10, 36), 1, 1)): _*)
          .as("word"),
        (col("id") % 1000 + 1).as("count"))
        .groupBy("word").agg(sum("count").as("count"))
        .localCheckpoint(eager = true)
      val rows = synth.count()
      val t0 = System.nanoTime()
      val merges = graft.operators.Bpe.learnMerges(synth, 64)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[bpe] synth-dict rows=$rows%-8d k=64 learned=${merges.length}%-4d " +
        f"total=$sec%.2f s per-merge=${sec / math.max(1, merges.length)}%.3f s")
    }
    spark.stop()
  }
}
