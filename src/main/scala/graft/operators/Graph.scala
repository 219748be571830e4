package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster-
  * resolution stage of near-duplicate removal (candidate pairs from
  * MinHash/SimHash banding or exact-Jaccard join → duplicate CLUSTERS,
  * so a chain A≈B≈C collapses to one representative even when A and C
  * are not themselves similar). The reference stack has no graph stage;
  * this is part of the LLM-pipeline surface (SURVEY §2.9).
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
  * and Beyond", ACM SoCC 2014, public). Each round is a groupBy-min plus
  * an equi-join on node id:
  *
  *   large-star(u): point every neighbor v > u at m = min(Γ(u) ∪ {u})
  *   small-star(u): point every neighbor v ≤ u (and u) at m = min(Γ(u))
  *
  * Scale shape, chosen for 100 TB corpora:
  *   - No per-node neighbor list is ever materialized (`collect_list`
  *     over a hot node — a boilerplate document duplicated millions of
  *     times — would put one cluster in one task). A groupBy MIN and a
  *     shuffle join both stream.
  *   - Rounds are O(log²  n) worst-case, and near-dup graphs (stars and
  *     short chains of copies) converge in 2-3 rounds.
  *   - Each round `localCheckpoint`s the edge frame: iterative plans
  *     otherwise double the lineage each round and the optimizer
  *     re-derives the whole pipeline per iteration. (On a cluster,
  *     a reliable `checkpoint` to HDFS trades re-compute risk for
  *     durability; local mode has no checkpoint dir by default.)
  *
  * Convergence test is exact, not heuristic: after small-star all edges
  * point child → parent with child > parent, so the edge set is a
  * forest of depth-1 stars iff no parent also appears as a child AND
  * every child has exactly one parent. (The first condition alone is
  * NOT sufficient: on the path 1–10–5–20–2 one round yields
  * {(5,1),(10,1),(5,2),(20,2)} — parents {1,2} and children {5,10,20}
  * are disjoint, yet 5 still bridges two would-be components and the
  * next round must merge them.) A star forest is a fixpoint of both
  * rounds, and the rounds preserve connectivity, so at the fixpoint
  * each star is a whole component and its root the component minimum.
  */
object Graph {

  /** Connected components of the undirected graph given by `edges`.
    *
    * @param edges  one row per edge; self-loops and duplicates are fine
    * @param nodes  optional one-column frame of all node ids — isolated
    *               nodes (no edge) appear in the result with themselves
    *               as component; without it the result covers only ids
    *               present in `edges`
    * @param assumeDistinct skip the input-dedup exchange when the caller
    *               guarantees one row per undirected edge (every LSH
    *               candidate generator ends in a distinct/groupBy).
    *               Duplicates would still resolve CORRECTLY (each round
    *               dedups), they'd just bloat the first checkpoint — so
    *               this is purely the redundant-shuffle cut.
    * @return (`id`, `component`) — component = smallest node id reachable
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: Option[DataFrame] = None, maxIter: Int = 50,
      assumeDistinct: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges
      .select(col(srcCol).alias("a"), col(dstCol).alias("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    var e = (if (assumeDistinct) e0 else e0.distinct())
      .localCheckpoint()

    var converged = e.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      // LAZY round checkpoint: the convergence test below aggregates
      // over EVERY partition of the new edge frame (a groupBy's partial
      // aggregation reads them all before its limit-1), so its one job
      // both materializes the checkpoint and answers convergence —
      // where an eager checkpoint paid a separate materialization job
      // per round first (2 jobs/round → 1; at production cadence each
      // removed job is a scheduler round-trip per CC call per batch).
      // Lazy is safe ONLY because the first action is partition-total;
      // a take()-shaped first action would truncate lineage with
      // partitions uncomputed.
      e = smallStar(largeStar(e)).localCheckpoint(eager = false)
      // star-forest fixpoint, both conditions (see scaladoc): every node
      // is EITHER a root (parent only) or a child with exactly ONE
      // parent. One aggregation over the role-tagged endpoints — same
      // shuffle cost as the previous (insufficient) semi-join test.
      val roles = biEmit(e, Seq("n", "c", "p"))(
        col("a").alias("n"), lit(1L).alias("c"), lit(0L).alias("p"))(
        col("b").alias("n"), lit(0L).alias("c"), lit(1L).alias("p"))
      converged = roles.groupBy(col("n"))
        .agg(sum(col("c")).alias("nc"), sum(col("p")).alias("np"))
        .where(col("nc") > 1 || (col("nc") >= 1 && col("np") >= 1))
        .isEmpty
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")

    val fromEdges = biEmit(e, Seq("id", "component"))(
      col("b").alias("id"), col("b").alias("component"))(
      col("a").alias("id"), col("b").alias("component")).distinct()
    nodes match {
      case None => fromEdges
      case Some(n) =>
        val ids = n.select(col(n.columns.head).alias("id"))
        val isolated = ids.join(fromEdges, Seq("id"), "left_anti")
          .select(col("id"), col("id").alias("component"))
        fromEdges.unionByName(isolated)
    }
  }

  /** Two output rows per input row in ONE pass (explode over a 2-struct
    * array), replacing the `df.select(...).unionByName(df.select(...))`
    * shape everywhere in this file. Besides scanning once instead of
    * twice, this dodges a Catalyst constraint-propagation crash: a union
    * child that aliases one of its own input attributes into its output
    * (`select(b AS a, a AS b)`) carries an alias-equality constraint
    * referencing the NON-output attribute, and `Union.rewriteConstraints`
    * throws `NoSuchElementException` the moment a downstream join or
    * filter asks for constraints (hit by any union-shaped `edges`
    * argument; reproduced in ScaleSpec's star-plus-chains graph). */
  private def biEmit(df: DataFrame, names: Seq[String])(first: Column*)(second: Column*): DataFrame =
    df.select(explode(array(struct(first: _*), struct(second: _*))).alias("__bi"))
      .select(names.map(n => col(s"__bi.$n").alias(n)): _*)

  /** Emit (v, m) for every neighbor v > u, where m = min(Γ(u) ∪ {u}).
    * No self-loop is possible: m ≤ u < v. Connectivity is preserved
    * because v stays linked to m which stays linked (through u's other
    * edges) to the rest of u's neighborhood. */
  private def largeStar(e: DataFrame): DataFrame = {
    val bi = biEmit(e, Seq("a", "b"))(col("a"), col("b"))(
      col("b").alias("a"), col("a").alias("b"))
    val mins = bi.groupBy(col("a")).agg(min(col("b")).alias("__mn"))
      .select(col("a"), least(col("__mn"), col("a")).alias("__m"))
    bi.join(mins, Seq("a"))
      .where(col("b") > col("a"))
      .select(col("b").alias("a"), col("__m").alias("b"))
      .distinct()
  }

  /** Direct every edge large → small, then emit (v, m) for every small
    * neighbor v of u plus (u, m), m = min(Γ⁻(u)). After this pass every
    * edge points child → parent with child > parent. Emitting (u, m)
    * per EDGE row then distinct-ing is set-identical to emitting it
    * once per u (`mins` itself), so both outputs ride one explode. */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("a"), col("b")).alias("a"),
      least(col("a"), col("b")).alias("b"))
    val mins = dir.groupBy(col("a")).agg(min(col("b")).alias("__m"))
    biEmit(dir.join(mins, Seq("a")), Seq("a", "b"))(
        col("b").alias("a"), col("__m").alias("b"))(
        col("a"), col("__m").alias("b"))
      .where(col("a") =!= col("b"))
      .distinct()
  }

  /** Per-component sizes — the usual post-CC summary (cluster-size
    * histogram drives dedup-policy decisions). */
  def componentSizes(cc: DataFrame): DataFrame =
    cc.groupBy(col("component")).agg(count(lit(1)).alias("n_members"))
}
