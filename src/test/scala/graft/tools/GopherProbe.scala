package graft.tools

import org.apache.spark.sql.functions._

/** Same-JVM attribution probe for the Gopher/LangId/DSIR per-row
  * gates: times each expression shape in isolation at sf0.1 and
  * counts how many times the expensive subtree survives optimization
  * in each query shape (the bindOnce/CollapseProject audit). */
object GopherProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{GopherRules => G}
    val d = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    spark.range(10).count()
    def time(tag: String)(f: => Unit): Unit = {
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[probe] $tag rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val m = G.metrics(col("text"))
    def planCount(df: org.apache.spark.sql.DataFrame, needle: String): Int = {
      val s = df.queryExecution.executedPlan.verboseString(Int.MaxValue)
      needle.r.findAllIn(s).length
    }
    val one = docs.select(col("doc_id"), m.getField("n_words").as("nw"))
    val struct1 = docs.select(col("doc_id"), m.as("m"))
    val wide = docs.select(col("doc_id"), m.as("__m"))
      .select(col("doc_id"), col("__m.n_words"), col("__m.mean_word_len"),
        col("__m.dup_line_frac"), col("__m.top2_char_frac"),
        col("__m.top3_char_frac"), col("__m.top4_char_frac"))
    val gate = docs.where(G.keeps(col("text")))
    println(s"[plan] one-field array_sort count: ${planCount(one, "array_sort")}")
    println(s"[plan] struct array_sort count: ${planCount(struct1, "array_sort")}")
    println(s"[plan] wide array_sort count: ${planCount(wide, "array_sort")}")
    println(s"[plan] gate array_sort count: ${planCount(gate, "array_sort")}")
    time("metrics-struct-only")(struct1.write.format("noop").mode("overwrite").save())
    time("one-field")(one.write.format("noop").mode("overwrite").save())
    time("wide-6-fields")(wide.write.format("noop").mode("overwrite").save())
    time("gate-keeps")(gate.write.format("noop").mode("overwrite").save())
    time("tokens-only")(docs.select(size(graft.functions.TextFunctions.tokens(col("text")))).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
