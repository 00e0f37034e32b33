package graft

/** Driver-contract smoke (t1 shape): every declared query runs at
  * sf0.001 and produces a well-formed result; entry() returns rows. */
class QueriesSmokeSpec extends SparkSpec {

  test("entry() produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has an oracle") {
    // since round 8 the inventory carries ZERO rows-only entries: the
    // one ANSI-unreplayable path (the float/xxhash IVF fast trainer,
    // whose centroids average floats in shuffle-merge order) is pinned
    // spec-only by IvfSpec, and q48 runs the checked trainer at the
    // tuner-chosen probe depth
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"oracle omissions: $noOracle")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 with a non-empty schema") {
      val df = fn(spark, TestSpark.sf0001)
      assert(df.schema.fields.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
