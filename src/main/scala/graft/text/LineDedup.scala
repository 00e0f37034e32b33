package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-wide exact line deduplication — the RefinedWeb / MassiveText
  * cleaning stage that removes every repeated line across the WHOLE
  * corpus, keeping only its first occurrence (document order, then
  * position order), and reassembles each document from its surviving
  * lines.
  *
  * The reference corpus carries no newlines, so "lines" here are fixed
  * `tokensPerLine` word chunks — the operator is identical once a real
  * corpus swaps in `split(text, '\n')`.
  *
  * 100 TB shape: one shuffle keyed by line content decides first
  * occurrence (a `row_number` window partitioned BY LINE — partition
  * size = duplicate count of one line, never corpus-sized), one shuffle
  * keyed by doc_id reassembles. Line text never moves more than those
  * two hops; for extreme corpora group on `xxhash64(line)` first and
  * keep the text only on the winner. Both aggregations map-side
  * combine.
  */
object LineDedup {

  /** Explode `textCol` into (idCol, line_idx, line) rows of
    * `tokensPerLine` whitespace tokens each. */
  def chunkLines(df: DataFrame, idCol: Column, textCol: Column,
                 tokensPerLine: Int): DataFrame = {
    val toks = TextAnalysis.tokens(textCol)
    val nLines = ceil(size(toks) / lit(tokensPerLine.toDouble)).cast("long")
    val lines = transform(
      sequence(lit(0L), greatest(nLines, lit(1L)) - 1),
      i => array_join(slice(toks, (i * tokensPerLine + 1).cast("int"),
        lit(tokensPerLine)), " "))
    df.select(idCol.as("doc_id"), posexplode(lines).as(Seq("line_idx", "line")))
  }

  /** Mark each (doc_id, line_idx, line) row with `keep`: true iff it is
    * the corpus-wide first occurrence of that exact line. */
  def markFirstOccurrence(lines: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("line"))
      .orderBy(col("doc_id").asc, col("line_idx").asc)
    lines.withColumn("keep", row_number().over(w) === 1)
  }

  /** Directed (symmetric) doc–doc edge list: an edge joins every pair
    * of documents sharing a line that appears in `minDocs..maxDocs`
    * distinct documents — the duplicate-cluster graph. The occupancy
    * cap (`maxDocs`) is the df-cut analog: a boilerplate line shared
    * by millions of docs would otherwise emit a quadratic clique. */
  def shareEdges(lines: DataFrame, minDocs: Int, maxDocs: Int): DataFrame = {
    val eligible = lines.groupBy("line")
      .agg(countDistinct(col("doc_id")).as("d"))
      .filter(col("d").between(minDocs, maxDocs))
      .select("line")
    val l = lines.select(col("line"), col("doc_id")).distinct()
      .join(eligible, "line")
    l.join(l.withColumnRenamed("doc_id", "other"), "line")
      .filter(col("doc_id") =!= col("other"))
      .select(col("doc_id").as("src"), col("other").as("dst"))
      .distinct()
  }

  /** Per-document reassembly after corpus-wide line dedup:
    * (doc_id, n_lines, n_kept, kept_text) with surviving lines in
    * original order. */
  def rewrite(df: DataFrame, idCol: Column, textCol: Column,
              tokensPerLine: Int): DataFrame = {
    val marked = markFirstOccurrence(chunkLines(df, idCol, textCol, tokensPerLine))
    marked.groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("keep"), lit(1))).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("line_idx"), col("line"))))),
            x => x.getField("line")),
          " ").as("kept_text"))
  }

  /** Per-document census after corpus-wide line dedup: total lines,
    * surviving lines, and an md5 fingerprint of the reassembled
    * (kept-lines-only, original order) text. */
  def dedupCensus(df: DataFrame, idCol: Column, textCol: Column,
                  tokensPerLine: Int): DataFrame =
    rewrite(df, idCol, textCol, tokensPerLine)
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        md5(col("kept_text")).as("kept_fp"))

  /** Within-group boilerplate line removal — the CCNet/RefinedWeb
    * cleaning rule that [[markFirstOccurrence]] deliberately is NOT:
    * a line repeating across `minDocs`+ distinct documents of the SAME
    * group (site/domain/source) is navigation, cookie banners, or a
    * template, and EVERY occurrence goes — first included — while a
    * line repeated only across groups survives (shared quotations are
    * not boilerplate). Documents reassemble from surviving lines;
    * output is (doc_id, n_lines, n_kept, kept_fp) with `kept_fp` an
    * md5 of the rewritten text, pinning the edit itself.
    *
    * 100 TB shape: the boilerplate table is a (group, line) aggregate
    * with map-side combine, cut by the document-frequency threshold —
    * its survivors are df-capped and broadcastable per group; the
    * decision rejoins on the same (group, line) keys (for extreme
    * corpora key both sides by `xxhash64(line)` and keep text only on
    * the census side). Reassembly is the one doc-keyed shuffle. */
  def boilerplateCensus(df: DataFrame, idCol: Column, groupCol: Column,
                        textCol: Column, tokensPerLine: Int,
                        minDocs: Int): DataFrame = {
    require(minDocs >= 2, "boilerplateCensus: minDocs must be at least 2")
    val toks = TextAnalysis.tokens(textCol)
    val nLines = ceil(size(toks) / lit(tokensPerLine.toDouble)).cast("long")
    val lineArr = transform(
      sequence(lit(0L), greatest(nLines, lit(1L)) - 1),
      i => array_join(slice(toks, (i * tokensPerLine + 1).cast("int"),
        lit(tokensPerLine)), " "))
    val lines = df.select(idCol.as("doc_id"), groupCol.as("g"),
      posexplode(lineArr).as(Seq("line_idx", "line")))
    val boiler = lines.groupBy("g", "line")
      .agg(countDistinct(col("doc_id")).as("d"))
      .filter(col("d") >= minDocs)
      .select(col("g"), col("line"), lit(true).as("boiler"))
    lines.join(boiler, Seq("g", "line"), "left")
      .withColumn("keep", col("boiler").isNull)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("keep"), lit(1))).as("n_kept"),
        md5(array_join(
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("line_idx"), col("line"))))),
            x => x.getField("line")),
          " ")).as("kept_fp"))
  }
}
