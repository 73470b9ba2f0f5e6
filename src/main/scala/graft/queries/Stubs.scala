package graft.queries

/** Filled in by later build steps (see SURVEY.md §7). */
object StreamQueries { val qs: Seq[Q] = Seq() }
