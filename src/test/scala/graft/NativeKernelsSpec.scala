package graft

import graft.functions.{TextFunctions => TF}
import graft.operators.{QualityClassifier => QC}
import org.apache.spark.sql.functions._

/** Parity pins for the round-16 native kernels (the charNgramsHof
  * discipline: the built-in HOF form stays in the tree as the semantic
  * reference, the kernel must match it bit-for-bit on adversarial
  * unicode input — any divergence would silently break the trained
  * operators' DuckDB oracles, which restate the HOF arithmetic). */
class NativeKernelsSpec extends SparkSpec {
  import spark.implicits._

  private val alphabet =
    IndexedSeq("a", "b", "c", "7", "#", "é", "好", "你", "🎉", "🚀", "x")

  test("poly_bucket: native kernel matches the ascii-fold form (unicode, non-BMP) and works from SQL") {
    val rng = new scala.util.Random(43)
    // code-point strings (indexing a String would split surrogate pairs);
    // no empty strings — the fold's sequence(1, 0) counts DOWN on them
    // (two phantom zeros), the kernel's one documented divergence, and
    // no caller hashes an empty feature
    val toks = (0 until 300).map { i =>
      val len = 1 + rng.nextInt(10)
      (i.toLong, (0 until len).map(_ => alphabet(rng.nextInt(alphabet.size))).mkString)
    } :+ ((300L, null))
    val df = toks.toDF("id", "tok")
    for (dim <- Seq(7, 256, 1024)) {
      val both = df.select(
        QC.tokenBucket($"tok", dim).as("native"),
        QC.tokenBucketHof($"tok", dim).as("hof")).collect()
      both.foreach { r =>
        assert(r.isNullAt(0) === r.isNullAt(1), s"dim=$dim null parity")
        if (!r.isNullAt(0))
          assert(r.getInt(0) === r.getInt(1), s"dim=$dim")
      }
    }
    df.createOrReplaceTempView("poly_bucket_test")
    val viaSql = spark.sql(
      "SELECT poly_bucket(tok, 256) b, poly_bucket(tok, 255+1) b2 " +
        "FROM poly_bucket_test WHERE tok IS NOT NULL").collect()
    assert(viaSql.nonEmpty && viaSql.forall(r => r.getInt(0) === r.getInt(1)))
  }

  test("sorted_run_stats: native kernel matches an independent regroup (runs, ties, extraChars, edges) and works from SQL") {
    val rng = new scala.util.Random(44)
    // lists with PLANTED duplicate runs and count ties of different
    // lengths (the tie-to-longest branch must fire)
    val lists: Seq[(Long, Seq[String])] = (0 until 200).map { i =>
      val pool = (0 until 1 + rng.nextInt(6)).map(_ =>
        (0 until 1 + rng.nextInt(8)).map(_ => alphabet(rng.nextInt(alphabet.size))).mkString)
      val n = rng.nextInt(20)
      (i.toLong, (0 until n).map(_ => pool(rng.nextInt(pool.size))))
    } :+ ((200L, Seq.empty[String])) :+
      ((201L, Seq("aa", "b", "aa", "ccc", "b"))) // 2-vs-2 tie, lengths 2 vs 1
    val df = lists.toDF("id", "arr")
    for (extra <- Seq(0, 1, 3)) {
      val got = df.select($"id", TF.sortedRunStats($"arr", extra).as("s"))
        .select($"id", $"s.occ", $"s.chars", $"s.bc", $"s.bl")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      lists.foreach { case (id, arr) =>
        val runs = arr.groupBy(identity).toSeq.map { case (v, occs) =>
          // numChars = code points, matching Spark length()
          (v.codePointCount(0, v.length).toLong, occs.size.toLong)
        }
        val occ = runs.collect { case (_, c) if c > 1 => c }.sum
        val chars = runs.collect { case (len, c) if c > 1 => c * len }.sum
        val bc = if (runs.isEmpty) 0L else runs.map(_._2).max
        val bl = if (runs.isEmpty) 0L
          else runs.collect { case (len, c) if c == bc => len - extra }.max
        assert(got(id) === ((occ, chars, bc, bl)), s"id=$id extra=$extra arr=$arr")
      }
    }
    df.createOrReplaceTempView("srs_test")
    val viaSql = spark.sql(
      "SELECT sorted_run_stats(arr, 0).occ o FROM srs_test").collect()
    assert(viaSql.length === lists.size)
  }

  test("sorted_run_stats: NULL list elements are ignored (absent-element contract)") {
    // no real caller produces element nulls (lists come from trimmed
    // segments / n-grams); the kernel's documented contract is that a
    // null contributes nothing — same result as filtering it out
    val got = spark.sql(
      "SELECT sorted_run_stats(array('a', CAST(NULL AS STRING), 'a', 'bb'), 0) s, " +
        "sorted_run_stats(array(CAST(NULL AS STRING)), 0) e").collect()(0)
    val s = got.getStruct(0)
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) === ((2L, 2L, 2L, 1L)))
    val e = got.getStruct(1)
    assert((e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3)) === ((0L, 0L, 0L, 0L)))
  }
}
