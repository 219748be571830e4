package graft

import graft.functions.{TextFunctions => TF}
import graft.operators.Smt
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties run through the live engine: each property
  * evaluates its column expressions on a real DataFrame, so these are
  * generator-driven checks of the engine's semantics, not of Scala
  * reimplementations. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(20)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(name: String, prop: Prop): Unit = {
    val r = SCTest.check(params, prop)
    assert(r.passed, s"$name falsified: ${r.status}")
  }

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
  private val textGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))

  test("jaccard is within [0,1], symmetric, and 1 on self") {
    check("jaccard", Prop.forAll(textGen, textGen) { (ta, tb) =>
      val df = Seq((ta, tb)).toDF("a", "b")
        .select(
          TF.jaccard(TF.shingleSet(col("a"), 2), TF.shingleSet(col("b"), 2)).as("ab"),
          TF.jaccard(TF.shingleSet(col("b"), 2), TF.shingleSet(col("a"), 2)).as("ba"),
          TF.jaccard(TF.shingleSet(col("a"), 2), TF.shingleSet(col("a"), 2)).as("aa"))
      val r = df.collect().head
      val (ab, ba, aa) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      ab >= 0.0 && ab <= 1.0 && ab == ba && (aa == 1.0 || ta.split("\\s+").length < 2)
    })
  }

  test("fingerprint is deterministic and word-order sensitive") {
    check("fingerprint", Prop.forAll(textGen) { t =>
      val df = Seq((t, t.split(" ").reverse.mkString(" "))).toDF("a", "rev")
        .select(TF.fingerprint(col("a")).as("f1"), TF.fingerprint(col("a")).as("f2"),
          TF.fingerprint(col("rev")).as("fr"))
      val r = df.collect().head
      // same text → same hash; reversal changes it unless palindromic
      r.getLong(0) == r.getLong(1) &&
        (r.getLong(0) == r.getLong(2)) == (t == t.split(" ").reverse.mkString(" "))
    })
  }

  test("SMT rename chain is equivalent to direct rename") {
    val nameGen = Gen.identifier.map(_.take(10)).suchThat(_.nonEmpty)
    check("rename", Prop.forAll(nameGen, nameGen) { (n1, n2) =>
      (n1 == "v" || n2 == "v" || n1 == n2 || n1 == "id" || n2 == "id") || {
        val df = Seq((1L, 2.0)).toDF("id", "v")
        val chained = df.transform(Smt.renameFields("v" -> n1))
          .transform(Smt.renameFields(n1 -> n2))
        val direct = df.transform(Smt.renameFields("v" -> n2))
        chained.columns.toSeq == direct.columns.toSeq &&
          chained.collect().toSeq == direct.collect().toSeq
      }
    })
  }

  test("qualityScore: NULL text scores NULL, never a passing number") {
    // Spark's `least` SKIPS null arguments (least(null, 1.0) = 1.0), so
    // an unguarded composite scored NULL text at 0.6 — above any gate
    // at τ ≤ 0.6. Both the scalar and the DataFrame form must refuse to
    // manufacture quality from absent text; empty text stays a REAL
    // (terrible) score, not NULL.
    val rows = Seq((1L, null: String), (2L, ""), (3L, "a solid enough sentence"))
      .toDF("id", "t")
    val scalar = rows.select($"id", TF.qualityScore($"t").as("q"))
      .orderBy($"id").collect()
    assert(scalar(0).isNullAt(1), "NULL text must score NULL (scalar form)")
    assert(!scalar(1).isNullAt(1) && scalar(1).getDouble(1) < 0.5)
    assert(!scalar(2).isNullAt(1))
    val df = TF.withQuality(rows, "t").orderBy($"id").select($"quality").collect()
    assert(df(0).isNullAt(0), "NULL text must score NULL (DataFrame form)")
    assert(!df(1).isNullAt(0) && df(1).getDouble(0) == scalar(1).getDouble(1))
    assert(df(2).getDouble(0) == scalar(2).getDouble(1),
      "scalar and DataFrame forms must agree")
  }
}
