package graft

import graft.queries.Registry

/** Smoke: every registered query builds and returns rows at sf0.001, and the
  * oracle map stays consistent with the query map (driver contract).
  */
class RegistrySpec extends SparkSpec {

  test("oracle keys are a subset of query keys") {
    val unknown = Registry.oracles.keySet -- Registry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- Registry.all) {
    test(s"${q.name} builds and executes at sf0.001") {
      val df = q.build(spark, sf0001)
      assert(df.columns.nonEmpty)
      // count executes the whole plan; >0 keeps queries non-degenerate
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
