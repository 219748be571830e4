package graft.queries

/** LLM-data-pipeline operators (SURVEY §2.9 L1-L8) over documents /
  * embeddings. Filled in query batch 3. */
object LlmQueries {
  val defs: Seq[(String, QU.Q, Option[String])] = Seq()
}
