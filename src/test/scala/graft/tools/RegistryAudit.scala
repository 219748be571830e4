package graft.tools

/** Print registry/oracle consistency: counts, keys with/without oracles,
  * and any oracle key missing from the query map (driver contract). */
object RegistryAudit {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size} rows_only=${(q -- o).toSeq.sorted.mkString(",")}")
    val orphans = (o -- q).toSeq.sorted
    println(s"oracle_without_query=${orphans.mkString(",")}")
    require(orphans.isEmpty, "oracle entries must reference real queries")
  }
}
