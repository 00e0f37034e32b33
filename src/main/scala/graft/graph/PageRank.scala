package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in exact integer micro-units — graph
  * analytics over data-derived graphs (duplicate clusters, citation
  * or link graphs) with a bit-replayable result: rank mass starts as
  * `totalMass div N`, every per-edge contribution is `r div deg`, and
  * the damping mix is integer percent arithmetic — no float anywhere,
  * so an ANSI oracle unrolls the same iterations and matches exactly
  * (the [[graft.similarity.Ivf.trainChecked]] discipline applied to
  * graph iteration).
  *
  * 100 TB shape: each iteration is one join of ranks onto the
  * (src-degree-annotated) edge list keyed by src and one dst-keyed
  * aggregation — both map-side combined, both partitioned by node id;
  * nothing is ever driver-resident. The edge list is degree-annotated
  * ONCE and checkpointed; per-round `checkpoint` truncates the
  * doubling lineage exactly like the label-propagation dedup
  * ([[graft.dedup.Dedup]]) does. Rank skew equals in-degree skew —
  * for web-scale power laws, pre-split hub nodes with the salting
  * helper before aggregation.
  */
object PageRank {

  /** `iters` exact-integer PageRank rounds over a DIRECTED edge list
    * (pass both directions for an undirected graph). Returns
    * (node, r) with Σr ≈ totalMass (floor losses stay in-system).
    * dampPct = 85 is the classic d = 0.85. */
  def run(edges: DataFrame, iters: Int,
          totalMass: Long = 1000000000000L, dampPct: Int = 85,
          checkpoint: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val eDeg = checkpoint(e.join(deg, "src"))
    // node set = src ∪ dst: a dst-only sink must still hold rank (its
    // received mass leaks on the next round — the classic simple-
    // PageRank dangling behavior — but it is never silently absent)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
    val nRow = nodes.agg(count(lit(1)).as("n"))
    val base = s"(((100 - $dampPct) * ($totalMass div n)) div 100)"
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), expr(s"$totalMass div n").as("r"), col("n"))
    for (_ <- 1 to iters) {
      val inc = ranks.join(eDeg, col("node") === col("src"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("inc"))
      ranks = checkpoint(ranks.select("node", "n")
        .join(inc, col("node") === col("dst"), "left")
        .select(col("node"),
          expr(s"$base + ($dampPct * coalesce(inc, CAST(0 AS BIGINT))) div 100")
            .as("r"),
          col("n")))
    }
    ranks.select("node", "r")
  }
}
