package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting over data-derived graphs (duplicate-cluster
  * graphs, co-occurrence graphs): the per-node triangle count is the
  * standard clustering/cohesion signal a dedup pass uses to separate
  * "dense near-identical cluster" from "chain of pairwise-similar
  * docs".
  *
  * 100 TB shape: the classic ORIENTED-edge algorithm — keep only
  * `src < dst`, join wedges (a<b)⋈(b<c) on the middle node, then
  * equi-join the closing edge (a,c). Every triangle is materialized
  * exactly once, every join is an equi-join keyed on node ids (no
  * cross product), and wedge fan-out is bounded by per-node ORIENTED
  * out-degree. For power-law graphs orient by (degree, id) instead of
  * raw id so hubs get low out-degree — here the upstream
  * occupancy cap ([[graft.text.LineDedup.shareEdges]] `maxDocs`)
  * already bounds degree, so id-orientation suffices and keeps the
  * oracle replayable. All aggregations map-side combine.
  */
object Triangles {

  /** Per-node (node, degree, n_tri) over a SYMMETRIC directed edge
    * list (both directions present, no self-loops) — degree is the
    * undirected degree, n_tri the number of triangles the node closes.
    * Nodes with no triangles report 0; isolated nodes are absent (no
    * edges → not in the graph).
    *
    * The edge list is referenced four times (degree + three triangle
    * legs), so it is materialized ONCE through `checkpoint` — an
    * expensive upstream derivation (e.g. the line-share self-join)
    * must not replay per reference. Swap in a cluster-reliable
    * `.checkpoint()` for multi-executor deployments, exactly like
    * [[PageRank.run]]. */
  def nodeTriangles(edges: DataFrame,
                    checkpoint: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    val e = checkpoint(edges.select(col("src"), col("dst")).distinct())
    val und = e.filter(col("src") < col("dst"))
    val wedges = und.select(col("src").as("a"), col("dst").as("b"))
      .join(und.select(col("src").as("b"), col("dst").as("c")), "b")
    val tri = wedges.join(
      und.select(col("src").as("a"), col("dst").as("c")), Seq("a", "c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }
}
