package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN detection — the "deduplicating training data"
  * operator (Lee et al. 2022): find every maximal token span of length
  * >= `L` that occurs more than once ANYWHERE in the corpus (across
  * documents or repeated inside one), the op suffix-array pipelines
  * compute single-node. Where [[LineDedup]] dedups fixed, aligned
  * chunks, this catches duplicated passages at ANY offset: a span of
  * >= L tokens repeats iff every L-token sliding window inside it
  * repeats, so the k-gram inverted index recovers exactly the
  * suffix-array answer for spans >= L (windows at every offset, not
  * every L tokens).
  *
  * 100 TB shape: the window index carries (doc_id, pos, 16-hex md5
  * key) — never the window text — so the corpus-wide repeat test is
  * one map-side-combined groupBy on a 16-byte key plus one shuffle
  * join back. Span reconstruction is a per-document window (partition
  * = one document's duplicated positions, bounded by doc length).
  * Nothing is ever all-pairs and no driver-side state exists at all.
  */
object SpanDedup {

  /** One row per L-token sliding window: (doc_id, pos, key) where
    * `pos` is the 0-based token offset and `key` a 16-hex md5 prefix
    * of the window text. Docs shorter than L tokens emit nothing. */
  def windows(df: DataFrame, idCol: Column, textCol: Column, L: Int): DataFrame =
    df.select(idCol.as("doc_id"), TextAnalysis.tokens(textCol).as("t"))
      .filter(size(col("t")) >= L)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("t")) - L),
          i => substring(md5(array_join(
            slice(col("t"), i + 1, lit(L)), " ")), 1, 16)))
          .as(Seq("pos", "key")))

  /** The production-scale window index: one native Rabin–Karp pass
    * ([[graft.expressions.RollingTokenHash]]) emitting (doc_id, pos,
    * key) with a 64-bit rolling hash — O(n) per document vs the md5
    * path's O(n·L) string builds, and an 8-byte key on the wire
    * instead of 16 hex chars. Same downstream shape; SpanDedupSpec
    * pins that both paths find identical duplicated positions. */
  def windowsFast(df: DataFrame, idCol: Column, textCol: Column, L: Int): DataFrame =
    df.select(idCol.as("doc_id"),
      transform(TextAnalysis.tokens(textCol), t => xxhash64(t)).as("th"))
      .select(col("doc_id"),
        posexplode(graft.expressions.RollingHash
          .rolling_token_hash(col("th"), L)).as(Seq("pos", "key")))

  /** [[census]] over the fast window index — identical output as long
    * as the 64-bit rolling hash is collision-free on the corpus (the
    * expected-collision count at 10^9 windows is ~0.03). */
  def censusFast(df: DataFrame, idCol: Column, textCol: Column, L: Int): DataFrame =
    censusFrom(windowsFast(df, idCol, textCol, L), df, idCol, textCol, L)

  /** Window positions whose key occurs >= 2 times corpus-wide —
    * duplication across docs AND self-repetition inside one doc both
    * count, matching suffix-array semantics. */
  def dupPositions(w: DataFrame): DataFrame = {
    val hot = w.groupBy("key").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("key")
    w.join(hot, "key").select("doc_id", "pos")
  }

  /** Merge duplicated window positions into maximal spans: windows at
    * prev and pos cover overlapping-or-adjacent token intervals iff
    * pos - prev <= L, so a gap > L starts a new span. Output one row
    * per maximal span: (doc_id, span_start, span_end) in token
    * offsets, end inclusive. */
  def spans(dup: DataFrame, L: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    dup
      .withColumn("prev", lag("pos", 1).over(byDoc))
      .withColumn("ns",
        (col("prev").isNull || col("pos") - col("prev") > L).cast("int"))
      .withColumn("sid", sum("ns").over(byDoc))
      .groupBy("doc_id", "sid")
      .agg(min("pos").as("span_start"),
        (max(col("pos")) + lit(L - 1)).as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }

  /** The dedup TRANSFORM (Lee et al.'s actual output, not just the
    * census): the corpus-wide FIRST occurrence of each duplicated
    * window — ordered by (doc_id, pos) — keeps its text; every later
    * occurrence's covering span is removed, and each document is
    * reassembled from its surviving tokens. Output per document:
    * (doc_id, n_tokens, n_removed, kept_fp) where kept_fp is the md5
    * of the surviving tokens in original order.
    *
    * Same 100 TB shape as the census plus one first-occurrence window
    * per KEY (partition = one key's duplicate count) and a per-doc
    * anti-join of token positions against removed intervals (intervals
    * explode to positions only AFTER merging, so the explosion is
    * bounded by the doc's own removed-token count). */
  def rewrite(df: DataFrame, idCol: Column, textCol: Column, L: Int): DataFrame = {
    val w = windows(df, idCol, textCol, L)
    val hot = w.groupBy("key").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("key")
    val dup = w.join(hot, "key")
    val firstW = Window.partitionBy("key").orderBy("doc_id", "pos")
    val later = dup.withColumn("rn", row_number().over(firstW))
      .filter(col("rn") > 1).select("doc_id", "pos")
    val covered = spans(later, L)
      .select(col("doc_id"),
        explode(sequence(col("span_start"), col("span_end"))).as("pos"))
    val toks = df.select(idCol.as("doc_id"),
      posexplode(TextAnalysis.tokens(textCol)).as(Seq("pos", "token")))
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
    val reassembled = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("token")))),
            x => x.getField("token")),
          " ")).as("kept_fp"))
    df.select(idCol.as("doc_id"),
      size(TextAnalysis.tokens(textCol)).cast("long").as("n_tokens"))
      .join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("kept_fp"), md5(lit(""))).as("kept_fp"))
  }

  /** Incremental-ingest form: spans of INCOMING documents that already
    * exist in the stored corpus (the q156/q173 ingest discipline
    * applied to spans). Only batch windows whose key appears among the
    * corpus's DISTINCT window keys count — batch-internal duplication
    * is deliberately ignored here (the full [[census]] over the merged
    * corpus owns that); output is the per-batch-doc census with zeros
    * for clean docs.
    *
    * 100 TB shape: corpus windows collapse to distinct keys once
    * (map-side combined) and the batch — the small side — joins
    * against them; only batch-sized state flows after the join. */
  def incrementalCensus(batch: DataFrame, corpus: DataFrame, idCol: Column,
                        textCol: Column, L: Int): DataFrame = {
    val corpusKeys = windows(corpus, idCol, textCol, L)
      .select("key").distinct()
    val dupPos = windows(batch, idCol, textCol, L)
      .join(corpusKeys, "key").select("doc_id", "pos")
    censusOf(dupPos, batch, idCol, textCol, L)
  }

  /** Per-document census over the WHOLE corpus (docs with no
    * duplicated span report zeros): token count, number of maximal
    * duplicated spans, total and longest duplicated-token coverage,
    * and the integer-micro duplicated fraction. */
  def census(df: DataFrame, idCol: Column, textCol: Column, L: Int): DataFrame =
    censusFrom(windows(df, idCol, textCol, L), df, idCol, textCol, L)

  private def censusFrom(w: DataFrame, df: DataFrame, idCol: Column,
                         textCol: Column, L: Int): DataFrame =
    censusOf(dupPositions(w), df, idCol, textCol, L)

  private def censusOf(dupPos: DataFrame, df: DataFrame, idCol: Column,
                       textCol: Column, L: Int): DataFrame = {
    val base = df.select(idCol.as("doc_id"),
      size(TextAnalysis.tokens(textCol)).cast("long").as("n_tokens"))
    val sp = spans(dupPos, L)
      .withColumn("len", col("span_end") - col("span_start") + 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum("len").as("dup_tokens"),
        max("len").as("max_span"))
    base.join(sp, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).cast("long").as("dup_tokens"),
        coalesce(col("max_span"), lit(0L)).cast("long").as("max_span"))
      .withColumn("dup_frac_micro",
        expr("dup_tokens * 1000000L div n_tokens"))
  }
}
