package graft.tools

/** Price unigram-LM training at realistic vocabulary sizes (the
  * BpeProbe discipline — BASELINE carries the BPE family's measured
  * 8k/32k walls, this backs the L51 numbers next to them). The
  * training loop is corpus-scale-independent by the dictionary
  * reduction; what this measures is the loop itself: seed explode +
  * hard-EM Viterbi rounds over a 100k-row dictionary, with the
  * per-round driver pull (must stay model-sized) printed per run.
  * Usage: Test/runMain graft.tools.UnigramProbe [target ...]
  * (default 8192 32768). */
object UnigramProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val targets = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(8192, 32768)
    // the sf0.1 real dictionary first (the registry rows' regime)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("text"))
    val real = graft.operators.Bpe.wordDict(docs, "text")
      .localCheckpoint(eager = true)
    println(s"[unigram] real dict rows: ${real.count()}")
    // the BpeProbe synthetic harness: 100k hash-derived 8-char words,
    // Zipf-ish counts — a measurement harness, not test data
    val synth = spark.range(100000L).select(
      concat_ws("", (0 until 8).map(i =>
        substring(conv(abs(hash(col("id") * 31 + i)) % 26 + 10, 10, 36), 1, 1)): _*)
        .as("word"),
      (col("id") % 1000 + 1).as("count"))
      .groupBy("word").agg(sum("count").as("count"))
      .localCheckpoint(eager = true)
    val rows = synth.count()
    for (dictLabel <- Seq("real", "synth"); t <- targets;
         em <- Seq("hard", "soft")) {
      val dict = if (dictLabel == "real") real else synth
      val t0 = System.nanoTime()
      val (m, rounds, maxPull) =
        if (em == "hard")
          graft.operators.Unigram.trainCounted(dict, targetSize = t)
        else graft.operators.Unigram.trainSoftCounted(dict, targetSize = t)
      val sec = (System.nanoTime() - t0) / 1e9
      // rounds + seed + final re-estimation = the distributed passes
      val passes = rounds + 2
      println(f"[unigram] dict=$dictLabel%-5s rows=${if (dictLabel == "real") real.count() else rows}%-7d " +
        f"em=$em%-4s target=$t%-6d pieces=${m.pieces.size}%-6d em_rounds=$rounds " +
        f"max_driver_pull_rows=$maxPull total=$sec%.1f s " +
        f"per_pass=${sec / passes}%.2f s")
      require(maxPull <= 4L * t + 64,
        s"driver pull $maxPull exceeded the model-sized bound for target $t")
    }
    spark.stop()
  }
}
