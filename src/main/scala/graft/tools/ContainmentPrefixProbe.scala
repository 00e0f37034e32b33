package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Sessions, Tables}

/** Throwaway measurement harness for the q234 prefix-filtered
  * containment join (the suite's most expensive sf0.1 query after the
  * q235 verification rebuild): decomposes the shipped form into its
  * candidate and verification stages and prices a PPJoin-style
  * positional filter on the candidates.
  *
  * The positional argument (one-sided, matching the one-sided prefix):
  * for a candidate pair let t0 be the globally-rarest shared token
  * (rarest-first order: df asc, token asc — consistent across docs
  * because both keys are global item properties). Every shared token
  * ranks at-or-after t0 on BOTH sides, so
  * overlap ≤ min(szA − i0 + 1, szB − j0 + 1) where i0/j0 are t0's
  * 1-based ranks in A and B. The pair needs overlap ≥ ⌈t·szA⌉
  * (szA ≤ szB). The A-side bound is VACUOUS BY CONSTRUCTION —
  * collisions only come from A's prefix, whose length is exactly
  * szA − ⌈t·szA⌉ + 1 — so only the container-side bound
  * `j0 ≤ szB − ⌈t·szA⌉ + 1` can prune, and it needs B's full postings
  * ranked (an extra per-doc window). This probe measures whether that
  * pruning pays for its ranking window. Not part of any query;
  * diagnostic main only (the WeightedPrefixProbe discipline).
  *
  * MEASURED (sf1 /tmp/sf1gen, t=0.8, 32 cores — negative results kept):
  *  - shipped q234: 21.0 s for 2,560 answer rows;
  *  - candidates: 1,778,640 pre-distinct → 1,709,684 post (duplicate
  *    collisions are 3.9% — the distinct is not the cost);
  *  - positional filter keeps 1,663,390 of 1,709,684 (prunes 2.7%) —
  *    VACUOUS at this threshold/corpus, like the weighted family's
  *    suffix-mass bounds, and it costs an extra full-postings ranking
  *    window. Do not ship;
  *  - the fixed constants are small (inv scan+shingle+explode 0.86 s,
  *    df aggregation 1.2 s): the runtime is spread across the
  *    candidate join's token-keyed shuffles and the per-pair
  *    verification of a 1.7M-candidate set for a 2.5k answer —
  *    honestly verification/volume-bound, no single hotspot. */
object ContainmentPrefixProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1gen")
    val t = args.lift(1).map(_.toDouble).getOrElse(0.8)
    val spark = Sessions.builder("local[32]", 32, "ct-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.load(spark, dir, "customer").agg(sum("c_acctbal")).collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = Tables.load(spark, dir, "documents")
    val items = graft.text.TextAnalysis.ngrams(
      graft.text.TextAnalysis.tokens(col("text")), 3)
    val tMicro = math.round(t * 1e6)

    time("A shipped full") {
      println("[A rows] " + graft.dedup.Dedup
        .prefixFilterContainmentJoinOn(docs, col("doc_id"), items, t)
        .count())
    }

    val toks = docs.select(col("doc_id").as("id"), array_distinct(items).as("toks"))
      .withColumn("sz", size(col("toks")).cast("long"))
      .filter(col("sz") > 0)
    val inv = toks.select(col("id"), col("sz"), explode(col("toks")).as("tok"))
    val dfreq = inv.groupBy("tok").agg(count(lit(1)).as("__df"))
    val byRarity = Window.partitionBy(col("id")).orderBy(col("__df"), col("tok"))
    val ranked = inv.join(dfreq, "tok")
      .withColumn("__rn", row_number().over(byRarity))
    val prefix = ranked
      .filter(col("__rn") <= col("sz") - expr(s"(${tMicro} * sz) div 1000000") + 1)

    // B: candidate volume pre/post distinct (the shipped scheme)
    time("B candidates") {
      val cand = prefix.alias("a")
        .join(inv.alias("b"),
          col("a.tok") === col("b.tok") && col("a.id") =!= col("b.id") &&
            col("a.sz") <= col("b.sz"))
      val pre = cand.count()
      val post = cand
        .select(least(col("a.id"), col("b.id")).as("id_a"),
          greatest(col("a.id"), col("b.id")).as("id_b")).distinct().count()
      println(s"[B pre-distinct] $pre  [B post-distinct] $post")
    }

    // C: positional filter — rank B's postings too; keep a collision
    // only if the container-side bound can still reach the required
    // overlap, then aggregate the RAREST collision per pair and apply
    // the exact bound before verification.
    time("C positional") {
      val candP = prefix.alias("a")
        .join(ranked.alias("b"),
          col("a.tok") === col("b.tok") && col("a.id") =!= col("b.id") &&
            col("a.sz") <= col("b.sz"))
        .select(least(col("a.id"), col("b.id")).as("id_a"),
          greatest(col("a.id"), col("b.id")).as("id_b"),
          col("a.sz").as("szA"), col("b.sz").as("szB"),
          col("a.__rn").as("i"), col("b.__rn").as("j"),
          col("a.id").as("aid"))
      // required overlap: ceil(t·szA) in micro-units, exact integers
      val req = expr(s"-((-${tMicro} * szA) div 1000000)")
      val kept = candP
        .groupBy("id_a", "id_b")
        .agg(min(col("i")).as("i0"), min(col("j")).as("j0"),
          first(col("szA")).as("szA"), first(col("szB")).as("szB"))
        .filter(least(col("szA") - col("i0") + 1,
          col("szB") - col("j0") + 1) >= req)
      println("[C kept] " + kept.count())
    }
    // D: the fixed constants — one pass of scan+tokenize+shingle+explode
    // (inv) and the df aggregation; the candidate stage re-derives the
    // ngram pipeline in every branch that Catalyst can't ReuseExchange.
    time("D inv once") { println("[D inv rows] " + inv.count()) }
    time("D dfreq once") { println("[D dfreq rows] " + dfreq.count()) }
    spark.stop()
  }
}
