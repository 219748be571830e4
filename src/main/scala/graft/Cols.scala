package graft

/** Fresh temp-column names: `base`, else `base0`, `base1`, … — the
  * first not colliding with `taken`. Every operator that scaffolds temp
  * columns routes through this (a FIXED temp name would silently
  * clobber, then drop, a caller column of the same name — the
  * saltedJoin/tokenBudget hygiene rule, pinned per-operator in the
  * suites). One definition so a future change to the uniquification
  * rule (e.g. case-insensitive resolution) lands once. */
private[graft] object Cols {
  def fresh(taken: Iterable[String], base: String): String = {
    val t = taken.toSet
    (Iterator(base) ++ Iterator.from(0).map(i => s"$base$i")).find(n => !t(n)).get
  }
}
