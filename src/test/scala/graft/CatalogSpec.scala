package graft

import graft.queries.Catalog

/** Smoke: every catalog query runs at sf0.001 and yields rows; the
  * oracle map stays consistent with the query map. (Value-level
  * correctness is the driver's DuckDB gate — tools/local_verify.py
  * replays it locally at sf0.01.)
  */
class CatalogSpec extends SparkSpec {

  test("oracle keys are a subset of query keys") {
    val qs = Catalog.queries.keySet
    val orphans = Catalog.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("query names are unique") {
    val names = Catalog.defs.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- Catalog.defs) {
    test(s"${q.name} runs at sf0.001 with rows > 0") {
      assert(q.run(spark, sf).count() > 0)
    }
  }
}
