package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation — the cluster-forming
  * step of a dedup pipeline (candidate pairs → duplicate groups →
  * keeper per group).
  *
  * Each vertex starts labeled with its own id; every round each vertex
  * takes the minimum label among itself and its neighbors, until a
  * fixpoint. Rounds = graph diameter; duplicate-candidate graphs are
  * shallow (near-cliques), so this converges in a few rounds. For
  * adversarially long chains at planet scale, swap the loop body for
  * alternating large-star/small-star (O(log n) rounds, same join
  * shape) — the per-round dataflow here (shuffle on vertex id, 16-byte
  * rows) is already the scalable one.
  */
object ConnectedComponents {

  /** `vertices`: one `id` column; `edges`: `src`,`dst` (undirected —
    * symmetrized internally). Returns (id, component) with component =
    * min vertex id in the component. */
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    // localCheckpoint (not cache) each round: caching keeps the logical
    // plan growing — after ~15 iterations Catalyst analysis time
    // explodes exponentially. Checkpointing truncates the lineage so
    // every round plans against a flat scan.
    var comp = vertices.select(col("id"), col("id").as("comp")).localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val viaNeighbor = sym.join(comp, sym("src") === comp("id"))
        .select(col("dst").as("id"), col("comp"))
      val next = comp.select(col("id"), col("comp")).union(viaNeighbor)
        .groupBy(col("id")).agg(min(col("comp")).as("comp")).localCheckpoint()
      changed = next.as("n").join(comp.as("c"), col("n.id") === col("c.id"))
        .filter(col("n.comp") =!= col("c.comp")).count()
      comp = next
      i += 1
    }
    sym.unpersist()
    comp
  }
}
