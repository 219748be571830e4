package graft.tools

import graft.sources.{JsonSchemaSerde, Tables}
import org.apache.spark.sql._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Same-JVM A/B: schema-carrying JSON decode via three string parses
  * (get_json_object payload + from_json + get_json_object schema.name)
  * vs the single nested from_json parse in JsonSchemaSerde.deserialize. */
object SerdeProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val ev = Tables.events(spark, d).select(cols.map(col): _*)
    val schema = StructType(cols.map(c => ev.schema(c)))
    val enc = JsonSchemaSerde.serialize(ev, cols, "events.Value", "wire")
      .select(col("wire")).persist()
    time("encode+persist")(enc.count())

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val wire = StructType(schema.fields.map { f =>
      f.dataType match {
        case TimestampType => f.copy(dataType = LongType)
        case _ => f
      }
    })
    def oldForm(df: DataFrame): DataFrame = {
      val asStr = col("wire").cast(StringType)
      df.withColumn("__wire", from_json(get_json_object(asStr, "$.payload"), wire))
        .withColumn("schema_name", get_json_object(asStr, "$.schema.name"))
        .withColumn("p", struct(schema.fields.map { f =>
          (f.dataType match {
            case TimestampType => timestamp_millis(col(s"__wire.${f.name}"))
            case _ => col(s"__wire.${f.name}")
          }).alias(f.name)
        }: _*))
        .drop("__wire")
        .select(col("p.*"), col("schema_name"))
    }
    def newForm(df: DataFrame): DataFrame =
      JsonSchemaSerde.deserialize(df, "wire", schema, "p", "schema_name")
        .select(col("p.*"), col("schema_name"))

    for (rep <- 1 to 3) {
      time(s"decode 3-parse rep$rep")(noop(oldForm(enc)))
      time(s"decode 1-parse rep$rep")(noop(newForm(enc)))
    }
    spark.stop()
  }
}
