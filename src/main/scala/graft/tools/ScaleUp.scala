package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bench-only corpus scaler: replicate a testdata SF directory `factor`
  * times with CONSISTENT key shifts, so the scaling-shape of every query
  * can be measured beyond the largest provided SF (the "would this
  * survive 100×" claim, checked empirically instead of by plan reading).
  *
  * Key domains shift together across tables (orderkey in orders AND
  * lineitem, custkey in customer AND orders, …) so join fan-outs are
  * preserved; nation/region stay fixed (true dimensions).
  *
  * Replicas are PERTURBED so they are not accidental near-duplicates of
  * the original — a naive copy makes every document/vector 3-plicated,
  * which inflates LSH/dedup candidate pairs ~quadratically in the factor
  * (each doc pairs with its own clones), not ~linearly as in a real
  * larger corpus:
  *  - text: per-replica vowel rotation (translate) — token sets become
  *    disjoint from the original, while WITHIN-replica duplicate
  *    structure (what dedup measures) is preserved exactly;
  *  - embeddings: per-replica array rotation — rotated Gaussian-ish
  *    vectors are near-orthogonal to their originals, preserving the
  *    within-replica neighbor structure.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <dstDir> <factor>
  */
object ScaleUp {

  private val KeyDomains: Map[String, (String, String)] = Map(
    "custkey" -> ("customer", "c_custkey"),
    "orderkey" -> ("orders", "o_orderkey"),
    "partkey" -> ("part", "p_partkey"),
    "suppkey" -> ("supplier", "s_suppkey"),
    "doc" -> ("documents", "doc_id"),
    "vec" -> ("embeddings", "vec_id"),
    "event" -> ("events", "event_id"),
    "user" -> ("events", "user_id"))

  private val TableKeyCols: Map[String, Map[String, String]] = Map(
    "customer" -> Map("c_custkey" -> "custkey"),
    "orders" -> Map("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"),
    "lineitem" -> Map("l_orderkey" -> "orderkey", "l_partkey" -> "partkey",
      "l_suppkey" -> "suppkey"),
    "part" -> Map("p_partkey" -> "partkey"),
    "supplier" -> Map("s_suppkey" -> "suppkey"),
    "documents" -> Map("doc_id" -> "doc"),
    "embeddings" -> Map("vec_id" -> "vec"),
    "events" -> Map("event_id" -> "event", "user_id" -> "user"))

  private val Vowels = "aeiouAEIOU"
  private val Digits = "0123456789"

  private def rot(s: String, k: Int): String = s.drop(k) + s.take(k)

  /** Per-replica text perturbation: vowel rotation (1..9, never the
    * identity) composed with digit rotation. Two replicas share a map
    * only when i ≡ j (mod 90) — the earlier single rotation had period
    * 5, so factor > 5 produced byte-identical text across replicas and
    * quadratic near-dup growth, exactly what this tool must avoid. */
  private def perturbText(c: Column, i: Int): Column =
    if (i == 0) c
    else translate(translate(c, Vowels, rot(Vowels, i % 9 + 1)),
      Digits, rot(Digits, i % 10))

  /** Per-replica embedding perturbation: rotate the array by 7·i. */
  private def perturbVec(c: Column, i: Int, dim: Int = 64): Column =
    if (i == 0) c
    else {
      val k = (7 * i) % dim
      concat(slice(c, k + 1, dim - k), slice(c, 1, k))
    }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcSfDir> <dstDir> <factor>")
    val Array(src, dst, factorStr) = args
    val factor = factorStr.toInt
    val spark = graft.Sessions.builder(
      s"local[${Runtime.getRuntime.availableProcessors()}]", 32,
      "graft-scaleup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val offsets: Map[String, Long] = KeyDomains.map { case (dom, (table, keyCol)) =>
      dom -> (Tables.load(spark, src, table)
        .agg(max(col(keyCol).cast("long"))).head().getLong(0) + 1L)
    }

    val allTables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    allTables.foreach { t =>
      val base = Tables.load(spark, src, t)
      val keyMap = TableKeyCols.getOrElse(t, Map.empty)
      val out =
        if (keyMap.isEmpty) base // true dimensions: copy once, no replicas
        else (0 until factor).map { i =>
          base.select(base.schema.fields.map { f =>
            val c = col(f.name)
            keyMap.get(f.name) match {
              case Some(dom) =>
                (c.cast("long") + lit(i * offsets(dom))).cast(f.dataType).as(f.name)
              case None if t == "events" && f.name == "ts" =>
                // Tables.load converts the source's TIMESTAMP(NANOS) long
                // to a timestamp on read; write it back as nanos BIGINT so
                // the generated dir round-trips through the same loader
                (unix_micros(c) * lit(1000L)).as(f.name)
              case None if t == "documents" && f.name == "text" =>
                perturbText(c, i).as(f.name)
              case None if t == "embeddings" && f.name == "embedding" =>
                perturbVec(c, i).as(f.name)
              case None => c
            }
          }.toSeq: _*)
        }.reduce(_.unionByName(_))
      out.write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t x${if (keyMap.isEmpty) 1 else factor}")
    }
    spark.stop()
  }
}
