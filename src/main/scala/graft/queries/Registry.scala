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
  lazy val all: Seq[Q] = Relational.qs ++ TypeQueries.qs ++ TextQueries.qs ++
    CurationQueries.qs ++ SimilarityQueries.qs ++ StreamQueries.qs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  lazy val oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
