package graft

/** Driver-contract smoke (t1 shape): every declared query runs at
  * sf0.001 and produces a well-formed result; entry() returns rows. */
class QueriesSmokeSpec extends SparkSpec {

  test("entry() produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has either an oracle or a documented omission") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // LSH / langid / sketch queries are intentionally rows-only
    // (not SQL-expressible, or approximations that must not be hashed)
    assert(noOracle.forall(k => k.contains("lsh") || k.contains("langid") ||
      k.contains("minhash") || k.contains("simhash") || k.contains("neardups") ||
      k.contains("approx") || k.contains("ivf")),
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
