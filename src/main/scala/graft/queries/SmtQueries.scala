package graft.queries

/** SMT catalog (SURVEY §2.2 P1-P14) + scalar-function pack (§2.7) queries.
  * Filled in query batch 2. */
object SmtQueries {
  val defs: Seq[(String, QU.Q, Option[String])] = Seq()
}
