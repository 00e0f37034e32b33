package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Sessions, Tables}

/** Throwaway measurement harness for the q235 prefix-filtered weighted
  * overlap join: times the shipped form against candidate-pruning
  * variants at a given SF dir so the verification stage attacks a
  * measured constant. Negative results worth keeping (sf1, minWeight
  * 3e6, 2 GiB driver — candidate count 2,332,163 for the shipped form):
  *  - localCheckpoint(true) on the shared weighted index: NO speedup
  *    (ReuseExchange already dedups the token-keyed shuffles) and the
  *    materialized frame's small runtime size estimate baits AQE into
  *    a driver-OOM broadcast at 2 GiB — do not ship;
  *  - heaviest-shared-token bound `w(t)·min(sz_a, sz_b) ≥ minWeight`
  *    in the candidate join (variant D): prunes ZERO candidates here —
  *    collisions already come from rare tokens on ~50-shingle docs;
  *  - aggregate-prefix-collisions-then-suffix-mass bound
  *    `prefix_shared + suffA + suffB ≥ minWeight` (variant E): also
  *    prunes ZERO — per-doc suffix mass sits just under minWeight BY
  *    CONSTRUCTION of the prefix cut, so the two suffixes alone cover
  *    the threshold. Both bounds are sound; at q122's low threshold
  *    they are simply vacuous, so the shipped form stays the minimal
  *    one and its cost is honest verification work over an
  *    answer-bounded candidate set.
  * Not part of any query; diagnostic main only (the PercentileProbe
  * discipline). */
object WeightedPrefixProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1gen")
    val spark = Sessions.builder("local[32]", 32, "wo-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.load(spark, dir, "customer").agg(sum("c_acctbal")).collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = Tables.load(spark, dir, "documents")
    val items = graft.text.TextAnalysis.ngrams(
      graft.text.TextAnalysis.tokens(col("text")), 3)
    val mw = 3000000L

    time("A shipped") {
      println("[A rows] " + graft.dedup.Dedup
        .prefixFilterWeightedOverlapJoinOn(docs, col("doc_id"), items, mw)
        .count())
    }

    // D: heaviest-shared-token bound — collision token must be able to
    // carry the pair: w(t) * min(sz_a, sz_b) >= minWeight
    time("D bounded") {
      val toks = docs.select(col("doc_id").as("id"), array_distinct(items).as("toks"))
        .withColumn("sz", size(col("toks")).cast("long"))
      val inv = toks.select(col("id"), col("sz"), explode(col("toks")).as("tok"))
      val wInv = inv.join(
        inv.groupBy("tok").agg(count(lit(1)).as("__df")), "tok")
        .select(col("id"), col("sz"), col("tok"),
          expr("CAST(1000000 AS BIGINT) div __df").as("w"))
      val byWeight = Window.partitionBy(col("id"))
        .orderBy(col("w").desc, col("tok").asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val prefix = wInv.withColumn("__tail", sum(col("w")).over(byWeight))
        .filter(col("__tail") >= mw)
        .select(col("id"), col("sz"), col("tok"), col("w"))
      val cand = prefix.alias("a")
        .join(prefix.alias("b"),
          col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
            col("a.w") * least(col("a.sz"), col("b.sz")) >= mw)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
      println("[D cand] " + cand.count())
      val wa = wInv.select(col("id").as("id_a"), col("tok").as("__tok"),
        col("w").as("__w"))
      val wb = wInv.select(col("id").as("id_b"), col("tok").as("__tok"))
      println("[D rows] " + cand.join(wa, "id_a")
        .join(wb, Seq("id_b", "__tok"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("inter"), sum(col("__w")).as("w_overlap"))
        .filter(col("w_overlap") >= mw).count())
    }
    // E: aggregate prefix collisions per pair, then the suffix-mass
    // bound: total_shared <= prefix_shared + suffA + suffB
    time("E agg-first") {
      val toks = docs.select(col("doc_id").as("id"), array_distinct(items).as("toks"))
      val inv = toks.select(col("id"), explode(col("toks")).as("tok"))
      val wInv = inv.join(
        inv.groupBy("tok").agg(count(lit(1)).as("__df")), "tok")
        .select(col("id"), col("tok"),
          expr("CAST(1000000 AS BIGINT) div __df").as("w"))
      val byWeight = Window.partitionBy(col("id"))
        .orderBy(col("w").desc, col("tok").asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val prefix = wInv.withColumn("__tail", sum(col("w")).over(byWeight))
        .filter(col("__tail") >= mw)
        .select(col("id"), col("tok"), col("w"))
      val tot = wInv.groupBy("id").agg(sum("w").as("__tot"))
      val pw = prefix.groupBy("id").agg(sum("w").as("__pw"))
      val suff = tot.join(pw, "id")
        .select(col("id"), (col("__tot") - col("__pw")).as("__suff"))
      val pairsPref = prefix.alias("a")
        .join(prefix.alias("b"),
          col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(sum(col("a.w")).as("__ps"))
      val cand = pairsPref
        .join(suff.select(col("id").as("id_a"), col("__suff").as("__sa")), "id_a")
        .join(suff.select(col("id").as("id_b"), col("__suff").as("__sb")), "id_b")
        .filter(col("__ps") + col("__sa") + col("__sb") >= mw)
        .select(col("id_a"), col("id_b"))
      println("[E cand] " + cand.count())
      val wa = wInv.select(col("id").as("id_a"), col("tok").as("__tok"),
        col("w").as("__w"))
      val wb = wInv.select(col("id").as("id_b"), col("tok").as("__tok"))
      println("[E rows] " + cand.join(wa, "id_a")
        .join(wb, Seq("id_b", "__tok"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("inter"), sum(col("__w")).as("w_overlap"))
        .filter(col("w_overlap") >= mw).count())
    }
    spark.stop()
  }
}
