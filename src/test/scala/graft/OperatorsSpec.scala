package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Operators

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  lazy val clicks = Seq(
    (1L, 100L, t("2024-01-01 10:00:00")),
    (1L, 101L, t("2024-01-01 12:00:00")),
    (2L, 200L, t("2024-01-01 09:00:00"))
  ).toDF("user_id", "event_id", "ts")

  lazy val purchases = Seq(
    (1L, t("2024-01-01 09:30:00"), 10.0),
    (1L, t("2024-01-01 11:00:00"), 20.0),
    (3L, t("2024-01-01 08:00:00"), 30.0)
  ).toDF("user_id", "ts", "purchase_value")

  test("asofJoin: latest right row at-or-before each left time") {
    val got = Operators.asofJoin(clicks, purchases, Seq("user_id"), "ts",
      Seq("purchase_value"))
      .select("event_id", "purchase_value")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got === Map(100L -> Some(10.0), 101L -> Some(20.0), 200L -> None))
  }

  test("asofJoin: inclusive at equal timestamps") {
    val sameTs = Seq((1L, t("2024-01-01 11:00:00"), 99.0))
      .toDF("user_id", "ts", "purchase_value")
    val oneClick = Seq((1L, 7L, t("2024-01-01 11:00:00")))
      .toDF("user_id", "event_id", "ts")
    val got = Operators.asofJoin(oneClick, sameTs, Seq("user_id"), "ts",
      Seq("purchase_value")).head()
    assert(got.getAs[Double]("purchase_value") === 99.0)
  }

  test("asofJoin: tolerance horizon nulls stale matches") {
    val got = Operators.asofJoin(clicks, purchases, Seq("user_id"), "ts",
      Seq("purchase_value"), toleranceSeconds = Some(1800L))
      .select("event_id", "purchase_value")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // click 100 is 30 min after purchase (ok at 1800s); click 101 is 60 min after
    assert(got === Map(100L -> Some(10.0), 101L -> None, 200L -> None))
  }

  test("saltedJoin ≡ plain join (skew mitigation is semantics-neutral)") {
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val oKeyed = Tables.load(spark, TestSpark.sf0001, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(oKeyed, Seq("l_orderkey")).agg(
      count(lit(1)), round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)).head()
    val salted = Operators.saltedJoin(li, oKeyed, Seq("l_orderkey"), salts = 8).agg(
      count(lit(1)), round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)).head()
    assert(plain === salted)
  }

  test("skewJoinDecision: salting on the skewed key, plain on uniform keys") {
    // lineitem gives the fixture's strongest constructed hot key at
    // sf0.001 (events has only ~15 users there — imbalance barely 4)
    val ev = Tables.load(spark, TestSpark.sf0001, "lineitem")
      .withColumn("k", when(col("l_partkey") % 2 === 0, lit(0L))
        .otherwise(col("l_partkey")).cast("long"))
    val (saltedHot, saltsHot, imbHot) = Operators.skewJoinDecision(ev, Seq("k"))
    assert(saltedHot, f"hot key not detected (imbalance $imbHot%.1f)")
    assert(saltsHot >= 2 && saltsHot <= 64)
    assert(imbHot > 4.0)
    // natural keys in the fixture are near-uniform → plain join
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val (saltedU, saltsU, imbU) = Operators.skewJoinDecision(li, Seq("l_partkey"))
    assert(!saltedU, f"uniform key mis-flagged (imbalance $imbU%.1f)")
    assert(saltsU === 1)
  }

  test("skewAwareJoin ≡ plain join on both strategy branches") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
      .withColumn("k", when(col("user_id") % 3 === 0, lit(0L))
        .otherwise(col("user_id")).cast("long"))
    val dim = ev.select(col("k")).distinct()
      .withColumn("label", concat(lit("seg_"), col("k")))
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k", "label").agg(count(lit(1)).as("n"))
        .orderBy("k").collect().toSeq
    assert(agg(Operators.skewAwareJoin(ev, dim, Seq("k"))) ===
      agg(ev.join(dim, Seq("k"))))
    // force the plain branch via a precomputed decision and re-check
    assert(agg(Operators.skewAwareJoin(ev, dim, Seq("k"),
      decision = Some((false, 1, 1.0)))) === agg(ev.join(dim, Seq("k"))))
  }

  test("bloomPrefilterJoin ≡ plain join; prunes non-matching fact rows") {
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    // selective dim: only large orders
    val dim = Tables.load(spark, TestSpark.sf0001, "orders")
      .filter(col("o_totalprice") > 300000.0)
      .select("o_orderkey", "o_totalprice")
    val plain = li.join(dim, li("l_orderkey") === dim("o_orderkey"))
      .agg(count(lit(1)), round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2))
      .head()
    val bloomed = Operators.bloomPrefilterJoin(li, dim, "l_orderkey", "o_orderkey",
      expectedItems = 10000L)
      .agg(count(lit(1)), round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2))
      .head()
    assert(plain === bloomed)
    // the probe itself must prune most of the fact side (fpp 3%)
    val sketch = dim.stat.bloomFilter("o_orderkey", 10000L, 0.03)
    val kept = li.filter(
      graft.expressions.BloomMightContain(col("l_orderkey"), sketch)).count()
    assert(kept < li.count() / 2, s"bloom kept $kept of ${li.count()}")
  }

  test("BloomMightContain works for string keys too") {
    val dim = Tables.load(spark, TestSpark.sf0001, "customer")
      .filter(col("c_custkey") < 100)
    val sketch = dim.stat.bloomFilter("c_name", 1000L, 0.03)
    val all = Tables.load(spark, TestSpark.sf0001, "customer")
    val kept = all.filter(
      graft.expressions.BloomMightContain(col("c_name"), sketch))
    // supersets the true matches (no false negatives)
    assert(kept.count() >= dim.count())
    assert(dim.join(kept, Seq("c_custkey"), "left_anti").count() === 0)
  }

  test("withRunningTotal: exact global prefix sum; empty input survives") {
    import spark.implicits._
    val df = spark.range(1000).select(col("id"), (col("id") % 7 + 1).as("w"))
    val got = Operators.withRunningTotal(df, col("w"), Seq(col("id")))
      .orderBy("id").select("id", "__run")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var acc = 0L
    got.foreach { case (id, run) =>
      acc += id % 7 + 1
      assert(run === acc, s"at id=$id")
    }
    val empty = Operators.withRunningTotal(
      df.filter(col("id") < 0), col("w"), Seq(col("id")))
    assert(empty.count() === 0)
  }

  test("weightedSystematicSample: expected size, heavy rows favored") {
    import spark.implicits._
    // weights 1 and 100: total = 500*1 + 500*100 = 50500; step 500 → ~101 rows
    val df = spark.range(1000)
      .select(col("id"), when(col("id") >= 500, 100L).otherwise(1L).as("w"))
    val picked = operators.Sampling
      .weightedSystematicSample(df, col("w"), Seq(col("id")), 500.0)
    val n = picked.count()
    assert(n >= 95 && n <= 107, s"n=$n")
    // heavy rows (id >= 500) should dominate the sample
    val heavy = picked.filter(col("id") >= 500).count()
    assert(heavy.toDouble / n > 0.9)
    // deterministic across runs
    assert(picked.select("id").collect().toSeq ===
      operators.Sampling.weightedSystematicSample(df, col("w"), Seq(col("id")), 500.0)
        .select("id").collect().toSeq)
  }

  test("bucketed tables join without a shuffle exchange") {
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, TestSpark.sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    Operators.writeBucketed(li, "b_lineitem", Seq("l_orderkey"), 4)
    Operators.writeBucketed(
      o.withColumnRenamed("o_orderkey", "l_orderkey"), "b_orders", Seq("l_orderkey"), 4)
    val joined = spark.table("b_lineitem").join(spark.table("b_orders"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
  }
}
