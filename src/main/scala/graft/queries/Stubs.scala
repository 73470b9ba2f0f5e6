package graft.queries

/** Filled in by later build steps (see SURVEY.md §7). */
object TextQueries { val qs: Seq[Q] = Seq() }
object SimilarityQueries { val qs: Seq[Q] = Seq() }
object StreamQueries { val qs: Seq[Q] = Seq() }
