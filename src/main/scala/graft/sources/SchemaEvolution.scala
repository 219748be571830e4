package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S12 — schema evolution (SURVEY §2.1). The reference's Debezium JDBC
  * sink runs `schema.evolution=basic` (installed at reference
  * `Dockerfile:28-31`): new record fields become new target-table columns,
  * existing columns are never dropped, and old rows read NULL for columns
  * they predate. The registry side (reference `main.sh:72-75`) allows
  * compatible drift between record batches.
  *
  * Spark mapping: Parquet `mergeSchema=true` on read unions column sets
  * across files, and `alignTo`/`evolve` give the sink-side column
  * reconciliation for `foreachBatch` writers (see StreamOps /
  * FileSink). All metadata-only — no data shuffle, scale-free.
  */
object SchemaEvolution {

  /** Read a directory whose parquet files have drifted schemas; the
    * result schema is the union of all file schemas (missing columns
    * read as NULL) — registry-compatible drift, Spark-side. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Union of two schemas: `base` columns first (their types win on
    * name collision — 'basic' evolution never retypes), then columns
    * only `incoming` has. Name matching is case-insensitive, mirroring
    * Spark's default resolution — a case-only variant is the same
    * column, not a new one (two would make every reference ambiguous). */
  def merged(base: StructType, incoming: StructType): StructType = {
    val names = base.fieldNames.map(_.toLowerCase).toSet
    val fresh = incoming.fields.filterNot(f => names(f.name.toLowerCase))
    // case-variant NEW fields must also collapse among themselves:
    // {Score, score} arriving together would otherwise both append and
    // poison every downstream reference as ambiguous
    val caseDups = fresh.groupBy(_.name.toLowerCase).filter(_._2.length > 1)
    require(caseDups.isEmpty,
      s"incoming batch carries case-colliding new fields: " +
        caseDups.values.map(_.map(_.name).mkString("/")).mkString(", "))
    StructType(base.fields ++ fresh)
  }

  /** Project `df` onto `target`: missing columns become typed NULLs,
    * column order normalized (case-insensitive name matching, like
    * Spark resolution). The sink-side half of basic evolution. */
  def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
    df.select(target.fields.map { f =>
      byLower.get(f.name.toLowerCase) match {
        case Some(src) =>
          val from = df.schema(src).dataType
          // only loss-free widening: a lenient cast of incompatible
          // drift (int column arriving as strings) yields NULL under
          // the session's non-ANSI config — the batch would silently
          // upsert NULLs over real values. Debezium 'basic' evolution
          // REJECTS incompatible retypes; so do we.
          if (!org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, f.dataType))
            throw new IllegalArgumentException(
              s"incompatible type drift on '${f.name}': $from cannot evolve to " +
                s"${f.dataType} (basic evolution never retypes; fix the producer " +
                "or migrate the state schema explicitly)")
          col(src).cast(f.dataType).alias(f.name)
        case None => lit(null).cast(f.dataType).alias(f.name)
      }
    }.toIndexedSeq: _*)
  }

  /** Evolve both sides to the merged schema — what the Debezium sink
    * does before an upsert batch whose records carry new fields. */
  def evolve(state: DataFrame, batch: DataFrame): (DataFrame, DataFrame) = {
    val target = merged(state.schema, batch.schema)
    (alignTo(state, target), alignTo(batch, target))
  }
}
