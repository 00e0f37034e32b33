package graft

/** Driver-contract smoke (t1 shape): every declared query runs at
  * sf0.001 and produces a well-formed result; entry() returns rows. */
class QueriesSmokeSpec extends SparkSpec {

  test("entry() produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has either an oracle or a documented omission") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // q48 only: IVF training averages floats in shuffle-merge order, so
    // its centroids are not bit-deterministic — an exact-hash oracle
    // would be flaky. Recall is covered by IvfSpec instead.
    assert(noOracle == Set("q48_ann_ivf"),
      s"unexplained oracle omissions: $noOracle")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 with a non-empty schema") {
      val df = fn(spark, TestSpark.sf0001)
      assert(df.schema.fields.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
