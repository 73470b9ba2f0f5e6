package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named driver query: the Spark plan builder and (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables. Column
  * names/aliases MUST match between the two — the driver sorts columns by
  * name and hash-compares values.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)

object Registry {
  lazy val all: Seq[Q] = {
    val qs = Relational.qs ++ TypeQueries.qs ++ TextQueries.qs ++
      CurationQueries.qs ++ SimilarityQueries.qs ++ SimilarityQueries2.qs ++
      StreamQueries.qs ++ StatsQueries.qs ++ StatsQueries2.qs ++
      AppliedQueries.qs ++
      TpchQueries.qs ++ MlPipelineQueries.qs ++ LayoutQueries.qs
    // a duplicate name would silently shadow a query in the toMap below and
    // the driver's gate would "pass" while never running the shadowed one
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    qs
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  lazy val oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
