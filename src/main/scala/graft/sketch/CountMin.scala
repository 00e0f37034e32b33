package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: the mergeable frequency summary that answers
  * "how often does item x occur?" in O(depth·width) space with a
  * one-sided error — estimates never undercount, and overcount by at
  * most εN with probability 1−δ (width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉).
  * The streaming/rollup companion to [[graft.expressions.MisraGriesAgg]]
  * (which keeps exact candidates, but only for the top-k): a CMS
  * answers point queries for EVERY item, long tail included, and two
  * sketches of disjoint data merge by cell-wise addition — the
  * per-day/per-partition rollup shape.
  *
  * Determinism: row hashes derive from md5 (identical hex in both
  * engines) — `h_i(x) = int(md5("i:x")[0,8)) mod width` — so the
  * sketch is a pure function of the multiset and replays exactly in
  * DuckDB; counts are exact BIGINTs (no float registers, unlike HLL).
  *
  * 100 TB shape: building is ONE map-side-combined groupBy of
  * depth keys per occurrence — depth·width cells out (KBs), shuffle
  * bounded by cells × tasks regardless of corpus size. Point
  * estimates join the (small) query set against the cell table;
  * a missing cell means a count of zero. */
object CountMin {

  /** Row-i bucket of `item` (any type; hashed via its string form). */
  def bucket(i: Int, item: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$i:"), item.cast("string"))), 1, 8),
      16, 10).cast("long"), lit(width.toLong))

  /** Build the sketch: (row_i, bucket, c) — only non-zero cells are
    * materialized (≤ depth·width rows). Null items are ignored. */
  def sketch(df: DataFrame, item: Column, depth: Int = 4,
             width: Int = 256): DataFrame = {
    val it = df.select(item.cast("string").as("__it"))
      .filter(col("__it").isNotNull)
    it.select(explode(array((0 until depth).map { i =>
        struct(lit(i).as("row_i"), bucket(i, col("__it"), width).as("bucket"))
      }: _*)).as("cell"))
      .groupBy(col("cell.row_i").as("row_i"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-estimate every row of `items`: adds `cms_n` =
    * min over rows of the item's cell (0 if absent — CMS never
    * undercounts, so 0 means "definitely never seen"). `depth` and
    * `width` must match the sketch's build parameters. */
  def estimate(sketchCells: DataFrame, items: DataFrame, item: Column,
               depth: Int = 4, width: Int = 256): DataFrame = {
    val probes = items.withColumn("__it", item.cast("string"))
      .select(items.columns.map(col) :+ col("__it") :+
        explode(array((0 until depth).map { i =>
          struct(lit(i).as("row_i"), bucket(i, col("__it"), width).as("bucket"))
        }: _*)).as("cell"): _*)
      .select(items.columns.map(col) :+ col("cell.row_i").as("row_i") :+
        col("cell.bucket").as("bucket"): _*)
    probes.join(sketchCells, Seq("row_i", "bucket"), "left")
      .groupBy(items.columns.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_n"))
  }
}
