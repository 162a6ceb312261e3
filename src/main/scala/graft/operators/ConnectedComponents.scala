package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  *
  * Per-round cost: ONE shuffle (the min aggregation). The edge set is
  * pre-partitioned on `src` to match the aggregation's hash(id) output
  * partitioning, so the propagate join is exchange-free, and the
  * convergence flag is computed INSIDE the same aggregation (the old
  * label rides along and is compared post-agg) — reading the changed
  * count is a scan of the just-materialized round, not a second
  * aggregate-and-join job.
  *
  * Lineage: each round is truncated with `localCheckpoint` (executor
  * memory — without it Catalyst analysis time grows exponentially in
  * the round number). On a large cluster where losing an executor
  * mid-run matters, pass `checkpointDir` to use reliable HDFS
  * checkpointing instead.
  */
object ConnectedComponents {

  /** `vertices`: one `id` column; `edges`: `src`,`dst` (undirected —
    * symmetrized internally). Returns (id, component) with component =
    * min vertex id in the component. */
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 25,
          checkpointDir: Option[String] = None): DataFrame =
    runCounted(vertices, edges, maxIter, checkpointDir)._1

  /** [[run]], also returning the number of rounds executed (diameter
    * + 1 detection round for a converging input). */
  def runCounted(vertices: DataFrame, edges: DataFrame, maxIter: Int = 25,
                 checkpointDir: Option[String] = None): (DataFrame, Int) = {
    val (comp, i, converged, sym) =
      propagateCore(vertices, edges, maxIter, checkpointDir)
    sym.unpersist()
    // an under-converged labeling is SILENTLY WRONG (vertices deep in a
    // chain still carry a non-minimal label) — refuse loudly instead;
    // rounds = diameter, so a cap hit means the graph outgrew this loop
    require(converged,
      s"min-label propagation did not converge in $maxIter rounds " +
        "— the component diameter exceeds the round budget; use " +
        "runAdaptive (propagation with a star-contraction finish) or " +
        "runStarContraction (O(log n) rounds), or raise maxIter")
    (comp, i)
  }

  /** Min-label propagation loop body shared by [[runCounted]] (which
    * refuses on cap exhaustion) and [[runAdaptive]] (which finishes
    * the residual with star contraction). Returns (labels, rounds,
    * converged, cachedSymEdges) — the STILL-CACHED distinct
    * symmetrized edge set, so the adaptive fallback can build its
    * quotient from the materialized cache instead of re-running the
    * caller's (possibly expensive) edge lineage; every caller owns
    * the unpersist. */
  private def propagateCore(vertices: DataFrame, edges: DataFrame,
                            maxIter: Int, checkpointDir: Option[String])
      : (DataFrame, Int, Boolean, DataFrame) = {
    val spark = vertices.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()

    // hash-partitioned on src to align with the aggregation's hash(id)
    // output: the per-round join then needs no exchange on either side
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
      .cache()
    var comp = materialize(vertices.select(col("id"), col("id").as("comp")))
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val next = materialize(round(sym, comp))
      changed = next.filter(col("chg")).count() // scan of the cached round
      comp = next.select(col("id"), col("comp"))
      i += 1
    }
    (comp, i, changed == 0, sym)
  }

  /** The production loop (r14): min-label propagation for a small
    * round budget — near-clique duplicate graphs (the common case)
    * converge there at ONE cheap shuffle per round — then, only if the
    * graph outran the budget, a star-contraction finish over the
    * QUOTIENT graph of the partial labels. Measured at sf0.1 the pure
    * star loop is ~2× slower than propagation on the minhash cluster
    * graph (2 window shuffles + dedup + signature per round vs one
    * aggregation), while propagation alone ABORTS on a >`maxIter`-hop
    * chain — this composition keeps the cheap path cheap and makes the
    * pathological path complete instead of refuse.
    *
    * Correctness of the composition: every partial label is an id
    * reachable from its vertex, so a label class lies inside ONE true
    * component (ids are component-unique), and the global minimum id
    * m of a component keeps label m (nothing smaller is reachable at
    * any radius). Quotient edges are the cross-class originals, so
    * any original path induces a quotient walk over the classes it
    * visits and conversely every quotient edge certifies same-
    * component — the quotient has exactly one component per original
    * component, carrying its minimum label. Star contraction roots
    * each quotient component at that minimum, and composing
    * `root ∘ label` labels every vertex with exactly the true
    * component minimum. (No claim that a label class is internally
    * connected is needed — a class may be split across the quotient
    * node's preimage without affecting either direction.) */
  def runAdaptive(vertices: DataFrame, edges: DataFrame,
                  propRounds: Int = 8, maxIter: Int = 50,
                  checkpointDir: Option[String] = None): (DataFrame, Int) = {
    val (partial, rounds, converged, sym) =
      propagateCore(vertices, edges, propRounds, checkpointDir)
    if (converged) { sym.unpersist(); (partial, rounds) }
    else {
      // quotient graph: one node per partial label, an edge wherever an
      // edge crosses label classes. Built from the CACHED symmetrized
      // edge set propagation already materialized — never by
      // re-running the caller's edge lineage (for the dedup graphs
      // that lineage is the banded candidate-pair verification). The
      // chain that defeated propagation shrinks ~propRounds× before
      // star contraction runs.
      val srcLbl = partial.select(col("id").as("src"), col("comp").as("csrc"))
      val dstLbl = partial.select(col("id").as("dst"), col("comp").as("cdst"))
      val qEdges = sym
        .join(srcLbl, "src").join(dstLbl, "dst")
        .filter(col("csrc") =!= col("cdst"))
        .select(col("csrc").as("src"), col("cdst").as("dst"))
      val qVerts = partial.select(col("comp").as("id")).distinct()
      // runStarContraction materializes its edge input up front
      // (localCheckpoint), after which the cache is safe to release
      val (qComp, sRounds) =
        runStarContraction(qVerts, qEdges, maxIter, checkpointDir)
      sym.unpersist()
      val root = qComp.select(col("id").as("comp"), col("comp").as("root"))
      val fin = partial.join(root, "comp")
        .select(col("id"), col("root").as("comp"))
      (fin, rounds + sRounds)
    }
  }

  /** Connected components by alternating large-star/small-star edge
    * contraction — O(log n) rounds versus min-propagation's
    * O(diameter), the right loop body when the candidate graph can
    * contain adversarially long chains (cross-shard duplicate trails
    * at planet scale). Per round: one window shuffle + one dedup
    * shuffle per star op (all on node ids with 16-byte rows):
    *
    *  - large-star: every node's HIGHER neighbors re-point at the
    *    minimum of its neighborhood (incl. itself). Its output edges
    *    already satisfy u > v (v is a neighborhood minimum), so they
    *    feed small-star directly — no re-orientation pass;
    *  - small-star: every node and its LOWER neighbors re-point at the
    *    minimum of the lower neighborhood.
    *
    * The edge set monotonically contracts toward stars rooted at each
    * component's minimum id; convergence = the edge multiset stops
    * changing (checked with a count + order-independent hash aggregate
    * over the materialized round — no extra join). `checkpointDir`
    * has the same meaning as in [[runCounted]]: reliable checkpointing
    * for cluster runs instead of executor-memory lineage truncation. */
  def runStarContraction(vertices: DataFrame, edges: DataFrame,
                         maxIter: Int = 50,
                         checkpointDir: Option[String] = None): (DataFrame, Int) = {
    val spark = vertices.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    var e = materialize(edges.select(col("src").as("u"), col("dst").as("v"))
      .filter(col("u") =!= col("v")).distinct())
    def signature(df: DataFrame): (Long, Long) = {
      // bit_xor: order-independent and overflow-free (edges are
      // distinct, so xor-cancellation of duplicates cannot occur)
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = signature(e)
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      // large-star over the full (symmetrized) neighborhood of u
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val wU = Window.partitionBy(col("u"))
      val ls = sym.withColumn("m", least(col("u"), min(col("v")).over(wU)))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star over the already high->low-oriented large-star
      // output, grouped at the high end
      val wHi = Window.partitionBy(col("hi"))
      val withMin = ls.select(col("u").as("hi"), col("v").as("lo"))
        .withColumn("m", min(col("lo")).over(wHi))
      val ss = materialize(withMin.filter(col("lo") =!= col("m"))
        .select(col("lo").as("u"), col("m").as("v"))
        .union(withMin.select(col("hi").as("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct())
      val nextSig = signature(ss)
      converged = nextSig == sig
      sig = nextSig
      e = ss
      i += 1
    }
    require(converged,
      s"star contraction did not converge in $maxIter rounds — " +
        "raise maxIter (rounds are O(log n); a cap hit at this depth " +
        "suggests a pathological edge feed)")
    // stars point u -> root; roots and isolated vertices map to themselves
    val comp = vertices
      .join(e.select(col("u").as("id"), col("v").as("ptr")), Seq("id"), "left")
      .groupBy(col("id")).agg(min(col("ptr")).as("ptr"))
      .select(col("id"), coalesce(col("ptr"), col("id")).as("comp"))
    (comp, i)
  }

  /** One propagation round: min label over self + neighbors, with the
    * previous label carried through the SAME aggregation (`own` rows
    * are unique per id, so `min(when(own, comp))` recovers it) and the
    * changed flag derived post-agg — one shuffle, no follow-up join. */
  private[operators] def round(sym: DataFrame, comp: DataFrame): DataFrame = {
    val viaNeighbor = sym.join(comp, sym("src") === comp("id"))
      .select(col("dst").as("id"), col("comp"), lit(false).as("own"))
    comp.select(col("id"), col("comp"), lit(true).as("own"))
      .union(viaNeighbor)
      .groupBy(col("id"))
      .agg(min(col("comp")).as("comp"),
        min(when(col("own"), col("comp"))).as("prev"))
      .withColumn("chg", col("comp") =!= col("prev"))
  }
}
