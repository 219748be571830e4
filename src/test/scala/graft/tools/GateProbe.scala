package graft.tools

import org.apache.spark.sql.functions._

/** Per-gate attribution probe for the L48 composition fixture: prints
  * each doc's verdict under every gate separately. */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    import graft.operators.{Dsir, GopherRules, LangId, QualityClassifier => QC}
    val vocab = (0 until 420).map(i => s"word$i")
    def slice(j: Int) = vocab.slice(30 * j, 30 * j + 30).mkString(" ")
    def gib(t: String) =
      t.map(c => if (c >= 'a' && c <= 'z') ('z' - (c - 'a')).toChar else c)
    def junk(j: Int) = vocab.slice(30 * j, 30 * j + 30)
      .map(w => w + "droj").mkString(" ")
    val langModel = LangId.train(
      ((0 to 3).map(j => (900L + j, slice(j), "en")) ++
        (0 to 3).map(j => (910L + j, gib(slice(j)), "xx")))
        .toDF("id", "text", "lang"),
      "text", "id", "lang", Seq("en", "xx"), dim = 1024, epochs = 2)
    val clf = QC.train(
      (Seq(0, 1, 2, 3, 4, 7).zipWithIndex.map { case (j, i) =>
        (920L + i, slice(j), 1) } :+
        ((930L, slice(12).replace("word", "negword"), 0)))
        .toDF("id", "text", "y"),
      "text", "id", "y", dim = 2048, epochs = 2)
    val dsirModel = Dsir.train(
      (0 to 3).map(j => (940L + j, slice(j))).toDF("id", "text"),
      ((0 to 3).map(j => (950L + j, slice(j))) ++
        (4 to 7).map(j => (960L + j, junk(j)))).toDF("id", "text"),
      "text", dim = 8192)
    val gopher = GopherRules.Config(minWords = 5, minStopWords = 0,
      minAlphaFrac = 0.0, maxMeanWordLen = 20.0, maxBulletFrac = 0.5)
    val rows = Seq(
      (1L, slice(0)), (4L, slice(3) + " a@x.io b@y.io c@z.io 10.0.0.7 10.0.0.8"),
      (5L, slice(4) + " reach bob@mail.example.org"),
      (6L, gib(slice(5))),
      (7L, ("• buy now\n" * 12) + slice(6).split(" ").take(8).mkString(" ")),
      (8L, slice(12).replace("word", "negword")),
      (9L, junk(5)), (10L, slice(7)), (13L, slice(9)))
    val df = rows.toDF("doc_id", "text")
      .select($"doc_id", TF.maskPiiAll($"text").as("text"))
      .select($"doc_id",
        TF.piiKeeps($"text", 2).as("pii"),
        LangId.predict($"text", langModel).as("lang"),
        GopherRules.keeps($"text", gopher).as("gopher"),
        QC.scoreMicroColumn($"text", clf).as("p_micro"),
        QC.paretoKeeps($"text", $"doc_id", clf, 0.5).as("pareto"),
        Dsir.logWeightMicro($"text", dsirModel).as("logw"),
        Dsir.keyMicro($"text", $"doc_id", dsirModel).as("dsir_key"),
        TF.qualityScore($"text").as("q"))
    df.orderBy($"doc_id").collect().foreach(println)
    spark.stop()
  }
}
