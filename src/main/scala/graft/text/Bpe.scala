package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning — the tokenizer-training step of a
  * training-data pipeline, distributed: the corpus collapses to a
  * frequency-weighted vocabulary once, every subsequent pair count runs
  * over that (word, freq) table (vocabulary-sized, NOT corpus-sized —
  * the standard BPE trick), and the driver holds only the k winning
  * pairs. Each round is one small pair-count shuffle + a 1-row argmax
  * collect, with an eager localCheckpoint so the plan stays flat across
  * rounds (the label-propagation lesson).
  *
  * Determinism contract (what makes this DuckDB-replayable): ties on
  * pair frequency break lexicographically; the merge rewrite is the
  * engine-native literal `replace` over space-padded sequences, whose
  * leftmost-non-overlapping scan is identical in Spark and DuckDB. On
  * runs of a repeated token ("a a a a") that scan merges every OTHER
  * pair in one pass rather than canonical BPE's strict left-to-right
  * re-scan — a documented simplification, consistent across engines.
  * No end-of-word marker is used (plain char-spaced words). */
object Bpe {

  /** One learned merge: rank (1-based), the winning pair ("l o" means
    * tokens "l"+"o"), and its corpus frequency at selection time. */
  final case class Merge(step: Int, pair: String, freq: Long)

  /** Learn `k` BPE merges over `textCol` of `docs`. */
  def learnMerges(docs: DataFrame, textCol: Column, k: Int): Seq[Merge] = {
    // corpus → (word, freq): the only corpus-sized pass
    val words = docs
      .select(explode(split(lower(trim(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    // char-spaced sequences: "low" → "l o w"
    var seqs = words.select(
      trim(regexp_replace(col("word"), "(.)", "$1 ")).as("seq"),
      col("freq"))
      .localCheckpoint(true)
    (1 to k).map { step =>
      // pair counting: tokens materialized in their own projection so
      // the ngram HOF zips an attribute, not a re-split expression
      val best = seqs
        .select(split(col("seq"), " ").as("tk"), col("freq"))
        .select(explode(TextAnalysis.ngrams(col("tk"), 2)).as("pair"), col("freq"))
        .groupBy("pair").agg(sum("freq").as("c"))
        .orderBy(col("c").desc, col("pair").asc)
        .limit(1).head()
      val pair = best.getString(0)
      val merged = pair.replace(" ", "")
      seqs = seqs.select(
        trim(replace(concat(lit(" "), col("seq"), lit(" ")),
          lit(s" $pair "), lit(s" $merged "))).as("seq"),
        col("freq"))
        .localCheckpoint(true)
      Merge(step, pair, best.getLong(1))
    }
  }

  /** The char-spaced form of a word column: "low" → "l o w". */
  private def charSpaced(word: Column): Column =
    trim(regexp_replace(word, "(.)", "$1 "))

  /** Apply learned merges to one char-spaced sequence column — the k
    * replaces fold into a single projection (codegen'd, no HOF), each
    * step the exact rewrite `learnMerges` used when it picked the pair. */
  def applyMerges(seq: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(seq) { (acc, m) =>
      val merged = m.pair.replace(" ", "")
      trim(replace(concat(lit(" "), acc, lit(" ")),
        lit(s" ${m.pair} "), lit(s" $merged ")))
    }

  /** Encode the corpus vocabulary with learned merges: (word, tokens).
    * The k-step replace chain runs VOCABULARY-sized (distinct words),
    * not corpus-sized — the standard BPE-apply trick; the corpus then
    * pays only one explode + one equi-join on `word` (broadcastable:
    * a natural-language vocabulary is tiny next to its corpus). */
  def encodedVocab(docs: DataFrame, textCol: Column, merges: Seq[Merge]): DataFrame =
    docs
      .select(explode(split(lower(trim(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .select(col("word"), split(applyMerges(charSpaced(col("word")), merges), " ").as("tokens"))

  /** Per-document BPE token counts under `merges`: (doc_id, n_bpe_tokens).
    * Token counting joins the exploded corpus to the encoded vocabulary —
    * the per-word token count travels, never the token arrays. */
  def tokenCounts(docs: DataFrame, idCol: Column, textCol: Column,
                  merges: Seq[Merge]): DataFrame = {
    val words = docs
      .select(idCol.as("doc_id"), explode(split(lower(trim(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val vocab = encodedVocab(docs, textCol, merges)
      .select(col("word"), size(col("tokens")).cast("long").as("n_tok"))
    words.join(vocab, "word")
      .groupBy("doc_id").agg(sum("n_tok").as("n_bpe_tokens"))
  }
}
