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
      val (merges, rounds) = graft.operators.Bpe.learnMergesCounted(dict, k)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[bpe] k=$k%-4d learned=${merges.length}%-4d rounds=$rounds%-4d " +
        f"total=$sec%.2f s per-merge=${sec / math.max(1, merges.length)}%.3f s")
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
      val kk = ks.max
      // serial (the r9 baseline loop) vs batched (r10): same merges by
      // the BpeSpec parity proof — the comparison is rounds and wall
      val t0 = System.nanoTime()
      val serial = graft.operators.Bpe.learnMergesSerial(synth, kk)
      val sSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val (batched, rounds) = graft.operators.Bpe.learnMergesCounted(synth, kk)
      val bSec = (System.nanoTime() - t1) / 1e9
      require(batched == serial, "batched/serial divergence in probe!")
      println(f"[bpe] synth-dict rows=$rows%-8d k=$kk learned=${serial.length}%-4d " +
        f"serial: total=$sSec%.2f s per-merge=${sSec / math.max(1, serial.length)}%.3f s | " +
        f"batched: rounds=$rounds total=$bSec%.2f s " +
        f"per-merge=${bSec / math.max(1, batched.length)}%.3f s " +
        f"(${serial.length.toDouble / math.max(1, rounds)}%.1fx fewer rounds)")
    }
    spark.stop()
  }
}
