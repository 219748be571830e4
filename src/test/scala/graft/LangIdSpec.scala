package graft

import graft.operators.{LangId => LI}
import org.apache.spark.sql.functions._

/** Unit contracts for the trained language-ID operator beyond the l42
  * oracle rows: the confidence floor's semantics and the persistence
  * round trip (the l39c/l17c discipline). */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private def gib(t: String): String =
    t.map(c => if (c >= 'a' && c <= 'z') ('z' - (c - 'a')).toChar else c)

  private def toks(seed: Long) =
    (0 until 25).map(i => s"word${seed}x$i").mkString(" ")

  private def trainModel(): LI.Model = {
    val labeled = ((1L to 10L).map(i => (i, toks(i), "en")) ++
      (11L to 20L).map(i => (i, gib(toks(i)), "xx")))
      .toDF("id", "text", "lang")
    LI.train(labeled, "text", "id", "lang", Seq("en", "xx"),
      dim = 2048, epochs = 2, ngram = 2)
  }

  test("L46: the confidence floor drops low-top-score docs that argmax routing admits; floor 0 recovers pure argmax; NULL passes both") {
    val m = trainModel()
    val soup = (0 until 25).map(_ => "##@@%%^^&&**").mkString(" ")
    val df = Seq((1L, Option(toks(30))), (2L, Option(soup)),
      (3L, Option.empty[String])).toDF("id", "text")
    val got = df.select($"id",
        LI.keeps($"text", m, Set("en", "xx")).as("k0"),
        LI.keeps($"text", m, Set("en", "xx"), 900000L).as("kf"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2))))
      .toMap
    assert(got(1L) === ((true, true)), "in-distribution doc passes both")
    assert(got(2L)._1 === true, "argmax alone admits the unseen-alphabet doc")
    assert(got(2L)._2 === false, "the floor kills it on confidence")
    assert(got(3L) === ((true, true)), "NULL text passes (no evidence)")
  }

  test("L46: persisted model round-trips exactly — scores, routing and floor verdicts bit-identical") {
    val table = "t_langid_model"
    LI.dropModel(spark, table)
    try {
      val m = trainModel()
      LI.writeModel(spark, m, table)
      val back = LI.readModel(spark, table)
      assert(back === m, "write→read must be exact on the integer grid")
      assert(LI.modelExists(spark, table))
      // and the loaded model scores a frame identically
      val df = (21L to 24L).map(i => (i, toks(i)))
        .toDF("id", "text")
      val a = df.select($"id", LI.scoresMicro($"text", m).as("s"))
        .select($"id", $"s.en", $"s.xx").collect().map(_.toSeq).toSeq
      val b = df.select($"id", LI.scoresMicro($"text", back).as("s"))
        .select($"id", $"s.en", $"s.xx").collect().map(_.toSeq).toSeq
      assert(a === b)
    } finally LI.dropModel(spark, table)
  }
}
