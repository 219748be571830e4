package graft.tools

import graft.sources.{KafkaEnvelope, Tables}
import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Same-JVM decomposition of the Kafka-envelope wrap cost: JSON value
  * encode (with the µs timestamp format) vs the offset window vs the
  * decode. Informs whether the p-family's per-query envelope toll has
  * headroom or is already at the floor. */
object EnvelopeProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val ev = Tables.events(spark, d)
    time("warm")(ev.count())

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to 3) {
      // full wrap (what every p-query pays)
      time(s"wrap full        rep$rep")(noop(KafkaEnvelope.wrap(ev, "user_id", "ts", "t")))
      // value encode only — no partition/offset/window
      time(s"to_json µs fmt   rep$rep")(noop(ev.select(
        to_json(struct(ev.columns.map(col): _*),
          Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")).alias("v"))))
      // value encode with ts pre-cast to epoch micros (no formatter)
      time(s"to_json epoch-µs rep$rep")(noop(ev.select(
        to_json(struct(ev.columns.map(c =>
          if (c == "ts") unix_micros(col(c)).alias(c) else col(c)): _*)).alias("v"))))
      // offset window only — no value encode
      time(s"offset window    rep$rep") {
        import org.apache.spark.sql.expressions.Window
        val part = pmod(hash(col("user_id")), lit(32))
        val w = Window.partitionBy(part).orderBy(col("ts"), col("user_id"))
        noop(ev.select(part.alias("p"), (row_number().over(w) - 1).alias("o")))
      }
    }
    spark.stop()
  }
}
