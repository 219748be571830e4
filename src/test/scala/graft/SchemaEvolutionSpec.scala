package graft

import graft.sources.SchemaEvolution
import org.apache.spark.sql.types._

/** S12 — schema evolution: mergeSchema reads across drifted parquet
  * files; alignTo/evolve reproduce the Debezium sink's `basic` column
  * evolution (add, never drop, typed NULL backfill). */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("readEvolved unions drifted file schemas; old rows read NULL") {
    val dir = tmpDir("evo")
    Seq((1L, "a")).toDF("id", "s").write.parquet(s"$dir/p=1")
    Seq((2L, "b", 9.5)).toDF("id", "s", "score").write.parquet(s"$dir/p=2")
    val df = SchemaEvolution.readEvolved(spark, dir)
    assert(df.columns.toSet === Set("id", "s", "score", "p"))
    val byId = df.select("id", "score").as[(Long, Option[Double])].collect().toMap
    assert(byId(1L).isEmpty && byId(2L).contains(9.5))
  }

  test("evolve adds new batch columns to state and backfills NULLs") {
    val state = Seq((1L, "a")).toDF("id", "s")
    val batch = Seq((2L, "b", 9.5)).toDF("id", "s", "score")
    val (s2, b2) = SchemaEvolution.evolve(state, batch)
    assert(s2.columns.toSeq === Seq("id", "s", "score"))
    assert(s2.schema("score").dataType === DoubleType)
    assert(s2.select("score").collect().head.isNullAt(0))
    assert(b2.columns.toSeq === s2.columns.toSeq)
    // columns are never dropped: a narrower batch gets NULL-extended
    val narrow = Seq(3L).toDF("id")
    val (_, n2) = SchemaEvolution.evolve(s2, narrow)
    assert(n2.columns.toSeq === Seq("id", "s", "score"))
  }

  test("incompatible type drift fails instead of silently nulling data") {
    // int state column arriving as strings: a lenient cast would upsert
    // NULLs over real values with no error (non-ANSI session)
    val state = Seq((1L, 10)).toDF("id", "v")
    val drifted = Seq((1L, "abc")).toDF("id", "v")
    val e = intercept[IllegalArgumentException](
      SchemaEvolution.evolve(state, drifted))
    assert(e.getMessage.contains("incompatible type drift on 'v'"))
    // loss-free widening still evolves: int batch into long state
    val wide = Seq((1L, 5)).toDF("id", "v")
      .select($"id", $"v".cast("int").as("v"))
    val longState = Seq((1L, 10L)).toDF("id", "v")
    val (_, b) = SchemaEvolution.evolve(longState, wide)
    assert(b.schema("v").dataType === LongType)
  }

  test("case-colliding new fields in one batch are rejected, not both appended") {
    val base = StructType(Seq(StructField("id", LongType)))
    val incoming = StructType(Seq(
      StructField("Score", DoubleType), StructField("score", DoubleType)))
    val e = intercept[IllegalArgumentException](
      SchemaEvolution.merged(base, incoming))
    assert(e.getMessage.contains("case-colliding"))
  }
}
