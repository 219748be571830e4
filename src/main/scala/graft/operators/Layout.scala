package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB join paths (SURVEY §4,
  * "Partitioning & shuffle"):
  *
  *  - **Bucketing**: persist both join sides bucketed on the join key →
  *    Catalyst plans the join with zero Exchange (each bucket pair joins
  *    in place). This is the steady-state layout for a fact table that
  *    is joined on the same key every day.
  *  - **Salting**: when one key dominates (hot key), spread it over
  *    `salts` sub-keys on the fact side and replicate the dim side per
  *    salt — turns one straggler partition into `salts` even ones.
  */
object Layout {

  /** Write `df` as a bucketed managed table (sorted within buckets for
    * merge-friendly reads). Join two tables bucketed with the same
    * (cols, numBuckets) and the plan has no shuffle on either side.
    *
    * File-count note for 100 TB: Spark's bucketed write emits one file
    * per (writing task × populated bucket) — no shuffle at write time,
    * but a wide write fans out to tasks×buckets files. Set
    * `onePassPerBucket` to pre-shuffle on the bucket columns so each
    * bucket lands in exactly one file (costs one exchange at write
    * time; buys single-file sorted buckets, so bucket-side reads skip
    * the per-file merge sort). The zero-exchange JOIN property is the
    * same either way. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, mode: String = "overwrite",
      onePassPerBucket: Boolean = false): Unit = {
    val laid =
      if (onePassPerBucket) df.repartition(numBuckets, bucketCols.map(df.col): _*)
      else df
    laid.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Drop a managed table AND its warehouse location. The location
    * delete matters across sessions — with a non-durable metastore (the
    * default in-memory Derby) a new session's catalog has no entry for
    * the old table, `mode=overwrite` therefore takes the CREATE path,
    * and `saveAsTable` refuses with LOCATION_ALREADY_EXISTS over the
    * surviving directory. */
  def dropTableAndLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir")), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Equi-join of two same-bucketed tables by name — shuffle-free when
    * both were written with identical bucketing. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      on: Seq[String], how: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on, how)

  /** The per-row salt expression for [[saltedJoin]] — a pure function of
    * the row's hashable columns, so the SAME row salts identically across
    * task retries, speculative attempts and input repartitionings (the
    * previous `monotonically_increasing_id()` salt was correct — any salt
    * is — but changed assignment per attempt, making runs irreproducible).
    * Map-typed columns are skipped (`hash()` rejects MapType); rows that
    * are byte-identical on every hashable column share a salt, which is
    * the one residual skew case — such rows are indistinguishable anyway,
    * and exact dedup (L1) is the right tool for mass-identical data.
    * Package-visible so LayoutSpec can pin the spread/determinism. */
  private[graft] def saltExpr(fact: DataFrame, salts: Int): Column = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val cols = fact.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(cols.nonEmpty, "saltedJoin needs at least one non-map column to salt on")
    pmod(hash(cols: _*), lit(salts))
  }

  /** Skew-safe equi-join: fact rows get a deterministic salt in
    * [0, salts), the (small) dim side is replicated once per salt, and
    * the join key becomes (key, salt) — a hot key's rows land in `salts`
    * partitions instead of one. Result equals a plain equi-join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, how: String = "inner"): DataFrame = {
    require(salts > 0)
    // right/full outer would emit each unmatched dim row once per salt
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")(how),
      s"saltedJoin supports fact-preserving join types only, got $how")
    // uniquified temp column: a fixed "__salt" would silently clobber
    // (and then drop) a caller column of that name on either side
    val salt = (Iterator("__salt") ++ Iterator.from(0).map(i => s"__salt$i"))
      .find(n => !fact.columns.contains(n) && !dim.columns.contains(n)).get
    val salted = fact.withColumn(salt, saltExpr(fact, salts))
    val replicated = dim.crossJoin(
      dim.sparkSession.range(salts).select(col("id").cast("int").alias(salt)))
    salted.join(replicated, Seq(key, salt), how).drop(salt)
  }
}
