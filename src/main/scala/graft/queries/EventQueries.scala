package graft.queries

/** Streaming batch-equivalents (SURVEY §2.8 T2-T5/T8) over `events`.
  * Filled in query batch 3. */
object EventQueries {
  val defs: Seq[(String, QU.Q, Option[String])] = Seq()
}
