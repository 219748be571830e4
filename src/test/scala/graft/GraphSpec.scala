package graft

import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Connected-components properties the l13 oracle can't fully exercise:
  * random graphs against a union-find reference, duplicate/self-loop
  * tolerance, isolated-node handling, and the transitive near-dedup
  * cluster (chain A≈B≈C merges even when jaccard(A,C) is below the
  * threshold — the case one-hop pair dropping cannot express). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], nodes: Option[Seq[Long]] = None) = {
    val e = edges.toDF("src", "dst")
    val n = nodes.map(_.toDF("id"))
    val rows = Graph.connectedComponents(e, "src", "dst", n)
      .as[(Long, Long)].collect()
    // one row per id — a premature-convergence bug emits the same id
    // with conflicting components, which .toMap would silently collapse
    assert(rows.map(_._1).distinct.length === rows.length,
      s"duplicate ids in CC output: ${rows.groupBy(_._1).filter(_._2.length > 1)}")
    rows.toMap
  }

  /** Reference union-find over the same edge list. */
  private def ufComponents(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] = {
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    nodes.foreach(find)
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are not guaranteed minimal under arbitrary union order above,
    // so normalize: component label = min member id
    val byRoot = parent.keys.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }.toMap
  }

  test("CC: chain collapses transitively to the minimum id") {
    val got = cc(Seq((10L, 20L), (20L, 30L), (30L, 40L)))
    assert(got === Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L))
  }

  test("CC: self-loops and duplicate/reversed edges are tolerated") {
    val got = cc(Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L), (3L, 3L)))
    // 3 only has a self-loop: the edge is dropped, and with no node list
    // it does not appear in the output at all
    assert(got === Map(1L -> 1L, 2L -> 1L))
  }

  test("CC: nodes frame adds isolated ids mapping to themselves") {
    val got = cc(Seq((1L, 2L)), nodes = Some(Seq(1L, 2L, 7L, 9L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 9L -> 9L))
  }

  test("CC: union-shaped edge frames don't trip Catalyst constraint rewriting (regression)") {
    // a union whose second child aliases its own input attributes
    // (`lit(0) AS a` next to `id AS b`) plants the alias-equality
    // constraints that made Union.rewriteConstraints throw
    // NoSuchElementException inside the star rounds' join before the
    // internal unions became single-pass explodes — any caller unioning
    // candidate-pair frames (minhash + simhash) hits this shape
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val star = spark.range(1, 101).select(lit(0L).as("a"), col("id").as("b"))
    val chains = spark.range(200, 250).select(col("id").as("a"), (col("id") + 1).as("b"))
    val random = spark.range(200).select(
      pmod(hash(col("id")), lit(300)).cast("long").as("a"),
      pmod(hash(col("id"), lit(1)), lit(300)).cast("long").as("b"))
    val edges = star.unionByName(chains).unionByName(random)
    val comps = Graph.connectedComponents(edges, "a", "b")
    assert(comps.where(col("component") === 0).count() >= 101) // the star resolved
  }

  test("CC: random graphs match a union-find reference") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 40
      val nodes = (0L until n.toLong).toSeq
      val edges = Seq.fill(n * 2)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      assert(cc(edges, Some(nodes)) === ufComponents(edges, nodes),
        s"trial $trial diverged from union-find")
    }
  }

  test("CC: non-monotone path is not split by premature convergence") {
    // Path 1–10–5–20–2: after one large-star/small-star round the edge
    // set is {(5,1),(10,1),(5,2),(20,2)} — parents and children are
    // disjoint (the old, insufficient convergence test passed here), but
    // child 5 still has TWO parents bridging the halves. The star-forest
    // test must force another round that merges everything into 1.
    val got = cc(Seq((1L, 10L), (5L, 10L), (5L, 20L), (2L, 20L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 10L -> 1L, 20L -> 1L))
  }

  test("CC: long path (worst case for round count) converges") {
    val path = (0L until 200L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = cc(path)
    assert(got.values.toSet === Set(0L))
    assert(got.size === 200)
  }

  test("componentSizes: histogram of the star + isolated layout") {
    val e = Seq((1L, 2L), (1L, 3L), (10L, 11L)).toDF("a", "b")
    val comp = Graph.connectedComponents(e, "a", "b",
      nodes = Some(Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")))
    val sizes = Graph.componentSizes(comp)
      .as[(Long, Long)].collect().toMap
    assert(sizes === Map(1L -> 3L, 10L -> 2L, 99L -> 1L))
  }

  test("L2 transitive: near-dup chain merges into one cluster across the threshold gap") {
    // doc1 = t1..t20; doc2 = doc1 + x; doc3 = doc2 + y
    // jaccard(1,2) = 20/21 ≈ .952, jaccard(2,3) = 21/22 ≈ .955,
    // jaccard(1,3) = 20/22 ≈ .909 — below the 0.93 threshold, so the
    // (1,3) pair never surfaces; only transitive resolution merges 3.
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base + " xx"), (3L, base + " xx yy"),
      (50L, "completely different content entirely")
    ).toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(docs, "text", "doc_id", threshold = 0.93)
      .as[(Long, Long)].collect().toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 50L -> 50L))
    // sanity: the pair list itself must NOT contain (1,3)
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id")
      .where($"jaccard" >= 0.93)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (2L, 3L)))
  }
}
