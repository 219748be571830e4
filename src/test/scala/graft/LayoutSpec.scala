package graft

import graft.operators.Layout
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Physical-layout contracts: bucketed joins must plan with no Exchange
  * on either side; salted joins must be result-identical to plain
  * equi-joins while spreading each key over `salts` partitions. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero shuffle") {
    val orders = Tables.orders(spark, sf0001).select($"o_custkey", $"o_totalprice")
    val cust = Tables.customer(spark, sf0001)
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    Layout.writeBucketed(orders, "t_orders_bucketed", Seq("o_custkey"), 8)
    Layout.writeBucketed(cust, "t_cust_bucketed", Seq("o_custkey"), 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // forbid broadcast so the join must rely on the bucket layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Layout.bucketedJoin(spark, "t_orders_bucketed", "t_cust_bucketed",
        Seq("o_custkey"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(j.count() === orders.join(cust, Seq("o_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS t_cust_bucketed")
    }
  }

  test("salted join equals the plain equi-join") {
    val fact = Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val dim = Tables.customer(spark, sf0001)
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    val plain = fact.join(dim, Seq("o_custkey"))
      .select($"o_orderkey", $"c_mktsegment").as[(Long, String)].collect().toSet
    val salted = Layout.saltedJoin(fact, dim, "o_custkey", salts = 7)
      .select($"o_orderkey", $"c_mktsegment").as[(Long, String)].collect().toSet
    assert(salted === plain)
    // dim-duplicating join types are rejected up front
    intercept[IllegalArgumentException](
      Layout.saltedJoin(fact, dim, "o_custkey", salts = 7, how = "full"))
  }

  test("salted join spreads a planted hot key over all salts, deterministically") {
    // ONE key carries every fact row — the skew shape saltedJoin exists
    // for. The salt is a pure function of the row, so (a) the hot key's
    // rows must actually fan out across all `salts` sub-keys, and (b) the
    // assignment must be identical across reruns and repartitionings
    // (the old monotonically_increasing_id salt failed (b): a retried or
    // differently-partitioned run re-dealt every salt).
    val fact = spark.range(0, 512).select(lit(42L).as("k"), $"id".as("payload"))
    val dim = Seq((42L, "hot")).toDF("k", "v")
    val joined = Layout.saltedJoin(fact, dim, "k", salts = 8)
      .select($"payload", $"v").as[(Long, String)].collect().toSet
    assert(joined === (0L until 512L).map((_, "hot")).toSet)
    def salts(df: org.apache.spark.sql.DataFrame) =
      df.select($"payload", Layout.saltExpr(df, 8).as("s"))
        .as[(Long, Int)].collect().toMap
    val assign = salts(fact)
    assert(assign.values.toSet.size === 8, "hot key's rows did not spread over all salts")
    // deterministic under repartitioning (pure function of the row)
    assert(salts(fact.repartition(7)) === assign)
    // a caller column named __salt survives (temp name is uniquified)
    val withSalt = fact.withColumn("__salt", lit("mine"))
    val out = Layout.saltedJoin(withSalt, dim, "k", salts = 4)
    assert(out.columns.count(_ == "__salt") === 1)
    assert(out.select($"__salt").distinct().as[String].collect().toSeq === Seq("mine"))
  }

  test("writeBucketed onePassPerBucket: each bucket lands in exactly one file, rows intact") {
    // the repartition hash must equal the bucketing hash, or rows would
    // scatter across bucket files (and reads would silently mis-bucket)
    val orders = Tables.orders(spark, sf0001).select($"o_orderkey", $"o_custkey")
    Layout.writeBucketed(orders, "t_onepass", Seq("o_custkey"), 4,
      onePassPerBucket = true)
    try {
      val loc = new java.io.File(new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath, "t_onepass")
      val files = loc.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 4, s"expected 4 bucket files: ${files.map(_.getName).mkString(",")}")
      assert(spark.table("t_onepass").count() === orders.count())
      // still a valid zero-exchange join partner after the pre-shuffle
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        Layout.writeBucketed(orders, "t_onepass_b", Seq("o_custkey"), 4,
          onePassPerBucket = true)
        val j = Layout.bucketedJoin(spark, "t_onepass", "t_onepass_b", Seq("o_custkey"))
        j.collect()
        assert(!j.queryExecution.executedPlan.toString.contains("Exchange"))
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_onepass_b")
      }
    } finally spark.sql("DROP TABLE IF EXISTS t_onepass")
  }

  test("writeZOrdered: second-column filter decodes a fraction of the linear layout's rows") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val li = Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey", $"l_quantity")
    val zDir = tmpDir("zorder"); val linDir = tmpDir("linear")
    // same file count, same sort machinery — the ONLY difference is the
    // ordering key: l_partkey alone vs the (l_partkey, l_suppkey) Morton key
    Layout.writeZOrdered(li, zDir, Seq("l_partkey", "l_suppkey"), numFiles = 64)
    li.repartitionByRange(64, $"l_partkey").sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linDir)

    // decoded-row metric of the parquet scan under a filter NOT on the
    // linear sort column; AQE off for a plain tree walk
    def decodedRows(dir: String): Long = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val df = spark.read.parquet(dir).where($"l_suppkey" === 7)
        df.collect()
        val scan = df.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f
        }.head
        scan.metrics("numOutputRows").value
      } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    val lin = decodedRows(linDir)
    val z = decodedRows(zDir)
    // linear layout: suppkey is unsorted within every file — stats prune
    // nothing, every row decodes. Z-order: only files whose suppkey slab
    // contains 7 decode (an 8x8-ish grid → about 1/8 of the corpus)
    assert(lin === li.count(), s"linear layout unexpectedly pruned: $lin")
    assert(z * 4 <= lin, s"z-order decoded $z of $lin rows — no real pruning")
    // layout is a pure reorder: identical bag of rows either way (order
    // by EVERY column — the synthetic lineitem has duplicate
    // (l_orderkey, l_linenumber) pairs, so a partial key ties)
    val key = li.columns.toSeq
    assert(spark.read.parquet(zDir).orderBy(key.map(col): _*).collect()
      === spark.read.parquet(linDir).orderBy(key.map(col): _*).collect())
  }

  test("compact: many small files collapse to the byte-target count, rows intact") {
    val orders = Tables.orders(spark, sf0001).select($"o_orderkey", $"o_custkey")
    val dir = tmpDir("compact") + "/data"
    orders.repartition(64).write.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files() = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    assert(files() === 64)
    val before = orders.orderBy($"o_orderkey", $"o_custkey").collect()
    // generous byte target → everything fits one file
    val n = Layout.compact(spark, dir, targetBytes = 1L << 30)
    assert(n === 1 && files() === 1)
    assert(spark.read.parquet(dir).orderBy($"o_orderkey", $"o_custkey").collect()
      === before)
    // idempotent: compacting a compacted dir keeps the single file
    assert(Layout.compact(spark, dir, targetBytes = 1L << 30) === 1)
    // an empty/fileless dir is a 0-file no-op, not a schema-inference crash
    val empty = tmpDir("compact_empty")
    assert(Layout.compact(spark, empty, targetBytes = 1L << 30) === 0)
    // and no swap debris left behind
    val parent = new org.apache.hadoop.fs.Path(dir).getParent
    assert(fs.listStatus(parent).map(_.getPath.getName).toSet === Set("data"))
  }

  test("writeZOrderedQuantile: equal-frequency grid out-prunes equi-width on a power-law column") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // y is power-law: ~half the rows land in y < 2, a long tail reaches
    // 10000 — the equi-width grid puts almost everything in one y-cell
    val n = 20000
    val base = spark.range(n).select($"id",
      pmod(hash($"id"), lit(1000)).cast("long").as("x"),
      (lit(10000) / (pmod(hash($"id", lit(1)), lit(100)) + 1)).cast("long").as("y"))
    val eqDir = tmpDir("z_eq"); val qDir = tmpDir("z_q")
    Layout.writeZOrdered(base, eqDir, Seq("x", "y"), numFiles = 64)
    Layout.writeZOrderedQuantile(base, qDir, Seq("x", "y"), numFiles = 64)
    def decodedRows(dir: String): Long = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        // a selective box in the DENSE region: y∈[100,105] is ~6% of
        // rows but only ~0.05% of the value range — the case where the
        // equi-width grid collapses (its first cell spans y≤138, which
        // holds ~28% of all rows)
        val df = spark.read.parquet(dir).where($"y".between(100, 105))
        df.collect()
        df.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
          .head.metrics("numOutputRows").value
      } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    val eq = decodedRows(eqDir); val q = decodedRows(qDir)
    info(s"power-law y box: equi-width decoded $eq, quantile decoded $q of $n")
    // equi-width: y<=200 is 2% of the value range — one grid cell holds
    // ~90% of rows, and every file containing it spans the whole y range
    assert(q * 2 <= eq, s"quantile grid did not out-prune: $q vs $eq")
    // purity: same bag of rows either way
    assert(spark.read.parquet(qDir).orderBy($"id").collect()
      === spark.read.parquet(eqDir).orderBy($"id").collect())
    // NULL ranks NULL (not 0): a null-y row must not crash or vanish
    val withNull = Seq((1L, Some(5L), 7L), (2L, None, 8L)).toDF("id", "y", "x")
    val nd = tmpDir("z_qnull")
    Layout.writeZOrderedQuantile(withNull, nd, Seq("y", "x"), numFiles = 2)
    assert(spark.read.parquet(nd).count() === 2)
  }

  test("writeZOrdered: NULL and constant z columns degrade to rank 0, rows intact") {
    val df = Seq((1L, Some(3.0), 5.0), (2L, None, 5.0), (3L, Some(9.0), 5.0))
      .toDF("id", "a", "c")
    val dir = tmpDir("zdegenerate")
    // 'c' is constant (empty width_bucket range) and 'a' has a NULL —
    // neither may crash or drop rows
    Layout.writeZOrdered(df, dir, Seq("a", "c"), numFiles = 2)
    assert(spark.read.parquet(dir).orderBy("id").as[(Long, Option[Double], Double)]
      .collect() === Array((1L, Some(3.0), 5.0), (2L, None, 5.0), (3L, Some(9.0), 5.0)))
  }

  test("hilbertTranspose: a bijective unit-step walk of the full grid, in 2-D and 3-D") {
    // the two defining Hilbert properties, checked EXHAUSTIVELY on small
    // grids: (1) the key is a bijection onto [0, 2^(n*bits)) — no cell
    // lost, none doubled; (2) consecutive keys are GRID NEIGHBORS
    // (Manhattan distance exactly 1) — the locality Morton gives up at
    // every power-of-two boundary. Any implementation slip (wrong bit
    // order, a missed exchange, the trailing correction dropped) breaks
    // one of the two.
    for ((n, bits) <- Seq((2, 5), (3, 3))) {
      val side = 1 << bits
      val cells = math.pow(side, n).toLong
      val coords = (0 until n).map(d =>
        (col("id") / math.pow(side, n - 1 - d).toLong).cast("long") % side)
      val names = (0 until n).map(d => s"hx$d")
      val grid = spark.range(cells).select(
        col("id") +: coords.zip(names).map { case (c, nm) => c.as(nm) }: _*)
      // the column ladder and the native expression must agree cell-for-
      // cell — two independently-written derivations of the same curve.
      // Compared Scala-side: a `ladder =!= native` filter would push the
      // predicate down through the ladder's ~bits x n chained
      // projections, substituting the whole tree per step (measured
      // OOM at 16 bits)
      val ladder = Layout.hilbertTranspose(grid, names, bits)
        .withColumn("h", Layout.zKey(names.reverse.map(col), bits))
        .select(col("id"), col("h")).as[(Long, Long)].collect().toMap
      val byKey = grid
        .withColumn("h", Layout.hilbertKey(names.map(col), bits))
        // rank cols are scaffolding — the ORIGINAL cell re-derives
        // from id below, Scala-side
        .select(col("h"), col("id")).orderBy("h").as[(Long, Long)].collect()
      assert(byKey.map { case (h, id) => (id, h) }.toMap === ladder,
        s"$n-D/$bits-bit native hilbert_key diverged from the column ladder")
      def cell(id: Long): Seq[Long] =
        (0 until n).map(d => (id / math.pow(side, n - 1 - d).toLong) % side)
      assert(byKey.map(_._1).toSeq === (0L until cells),
        s"$n-D/$bits-bit Hilbert key is not a bijection onto the key range")
      byKey.sliding(2).foreach { case Array((ha, ia), (hb, ib)) =>
        val dist = cell(ia).zip(cell(ib)).map { case (a, b) => math.abs(a - b) }.sum
        assert(dist === 1, s"$n-D keys $ha -> $hb jump $dist cells")
      }
    }
  }

  test("hilbert_key native: 16-bit parity, NULL ranks, SQL registration") {
    import graft.functions.HilbertKey
    // the exhaustive grids above stop at 5 bits — a random sample at the
    // writeZOrdered default width (16) pins the wide-q path of the
    // codegen'd loop against the driver-side function (same algorithm,
    // interpreted JVM path vs generated-Java path)
    val rnd = spark.range(20000).select(col("id"),
      pmod(hash(col("id")), lit(1 << 16)).cast("long").as("hx0"),
      pmod(hash(col("id") * 31), lit(1 << 16)).cast("long").as("hx1"))
    rnd.withColumn("hn", Layout.hilbertKey(Seq(col("hx0"), col("hx1")), 16))
      .select(col("hx0"), col("hx1"), col("hn"))
      .as[(Long, Long, Long)].collect().foreach { case (x0, x1, hn) =>
        assert(hn === HilbertKey.index(Array(x0, x1), 16),
          s"codegen path diverged from driver path at ($x0, $x1)")
      }
    // NULL rank -> NULL key (ladder semantics: those rows z-sort first)
    val nulled = spark.range(3).select(
      when(col("id") === 1, lit(null)).otherwise(col("id")).cast("long").as("hx0"),
      col("id").cast("long").as("hx1"))
    assert(nulled.select(
        Layout.hilbertKey(Seq(col("hx0"), col("hx1")), 4).as("h"))
      .where(col("h").isNull).count() === 1)
    // SQL surface: variadic hilbert_key(bits, ...) via GraftExtensions
    rnd.limit(100).selectExpr("hilbert_key(16, hx0, hx1) as h", "hx0", "hx1")
      .as[(Long, Long, Long)].collect().foreach { case (h, x0, x1) =>
        assert(h === HilbertKey.index(Array(x0, x1), 16))
      }
  }

  test("writeZOrdered(curve=hilbert): same bag of rows, box filter prunes at least as well as Morton") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val li = Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey", $"l_quantity")
    val mDir = tmpDir("z_morton"); val hDir = tmpDir("z_hilbert")
    Layout.writeZOrdered(li, mDir, Seq("l_partkey", "l_suppkey"), numFiles = 64)
    Layout.writeZOrdered(li, hDir, Seq("l_partkey", "l_suppkey"), numFiles = 64,
      curve = "hilbert")
    def decodedRows(dir: String, cond: org.apache.spark.sql.Column): Long = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val df = spark.read.parquet(dir).where(cond)
        df.collect()
        df.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
          .head.metrics("numOutputRows").value
      } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    // a box straddling the partkey midline — the Morton worst case (the
    // two halves of the box sit in different key halves, dragging in
    // every file between); Hilbert's walk keeps the region connected.
    // Summed over a sweep of suppkey slabs to average out grid luck.
    val boxes = Seq(1 -> 3, 4 -> 6, 7 -> 9).map { case (lo, hi) =>
      $"l_partkey".between(90, 110) && $"l_suppkey".between(lo, hi) }
    val m = boxes.map(decodedRows(mDir, _)).sum
    val h = boxes.map(decodedRows(hDir, _)).sum
    info(s"midline box sweep: morton decoded $m, hilbert decoded $h")
    assert(h <= m, s"hilbert decoded MORE than morton: $h vs $m")
    // purity: the curve only reorders rows
    val key = li.columns.toSeq
    assert(spark.read.parquet(hDir).orderBy(key.map(col): _*).collect()
      === spark.read.parquet(mDir).orderBy(key.map(col): _*).collect())
    // and the quantile-grid writer takes the same option
    val qDir = tmpDir("zq_hilbert")
    Layout.writeZOrderedQuantile(li, qDir, Seq("l_partkey", "l_suppkey"),
      numFiles = 16, curve = "hilbert")
    assert(spark.read.parquet(qDir).orderBy(key.map(col): _*).collect()
      === spark.read.parquet(mDir).orderBy(key.map(col): _*).collect())
  }
}
