package graft.queries

import graft.SparkSpec

/** Every declared query must run on sf0.001 and (except set-difference
  * shapes that legitimately return nothing) produce rows. The DuckDB
  * hash-match itself is driven by tools/compare.py + the round harness;
  * this spec is the fast in-JVM guard that nothing in the inventory
  * regresses to a runtime error.
  */
class QueriesSmokeSpec extends SparkSpec {
  private val mayBeEmpty = Set("q21_except")

  graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    val qs = graft.SparkEntry.queries.keySet
    val missing = graft.SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
