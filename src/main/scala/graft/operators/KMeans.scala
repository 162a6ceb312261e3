package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions

/** Distributed Lloyd k-means over quantized integer vectors — the
  * trainer for the IVF coarse quantizer. Every IVF query runs the one
  * shared assign→probe→score construction over a centroid table;
  * `sim_ivf_centroid_topk` passes the untrained [[initFirstK]] table,
  * `sim_ivf_trained_topk` the [[fit]]ted one — production swaps the
  * table, nothing else.
  *
  * Scale shape (the same one Spark MLlib's k-means uses): the centroid
  * set is O(K·d) — independent of corpus size — so it lives on the
  * driver and enters each job as plan-time literal arrays. Per Lloyd
  * iteration:
  *
  *   - ASSIGNMENT at small K is a pure projection — zero shuffle.
  *     Each row computes K squared distances via the codegen'd
  *     `dot_i64` (d2 = x·x − 2·x·c + c·c, x·x computed once and
  *     shared by codegen subexpression elimination) and takes the
  *     argmin with `array_min` over (d2, cell) structs —
  *     lexicographic struct ordering breaks distance ties on the
  *     lower cell id, so assignment is total and deterministic.
  *     Past [[LiteralAssignMaxK]] cells it switches to a broadcast
  *     join + min aggregate (same total order, one exchange of one
  *     row per vector) — plan-literal expansion stops fitting
  *     codegen at the K a production coarse quantizer uses.
  *   - RECOMPUTE shuffles only per-(cell, dim) partial sums:
  *     `posexplode` + hash aggregate means map-side combine caps each
  *     input partition's contribution at K·d rows no matter how many
  *     vectors it holds. The driver then collects K rows.
  *
  * Everything is integer-exact: inputs are fixed-point quantized longs
  * and the new centroid component is the floor mean
  * `(s − pmod(s, n)) div n` — an exact multiple before the division,
  * so any engine's integer-division convention agrees and a DuckDB
  * oracle can replay training bit-for-bit.
  *
  * Empty cells simply drop out (their id disappears from the centroid
  * set); ids are stable across iterations — they are the init ids, not
  * positional indexes.
  */
object KMeans {

  /** A fitted centroid: stable id + quantized components. */
  final case class Centroid(id: Long, v: Seq[Long]) {
    /** c·c, precomputed once driver-side per iteration. */
    def normSq: Long = v.map(x => x * x).sum
  }

  /** The SORTED (d2 ASC, cell ASC) distance table over the literal
    * centroid set — ONE native expression
    * ([[graft.functions.NearestCells]]) whose loop runs over the
    * whole quantizer: the old K-way unrolled expression tree
    * (K × (CreateArray(dims) + dot + struct)) generated Java so large
    * it recompiled every Lloyd round (fresh inlined literals) and ran
    * bytecode-interpreted past the JIT's method limits — measured 2×
    * slower than this on the PQ training round. The centroid matrix
    * travels as three foldable array literals through the codegen
    * references array, so the generated source is identical across
    * rounds and the compile cache actually hits. */
  private def cellDists(v: Column, cents: Seq[Centroid]): Column =
    call_function("nearest_cells_i64", v,
      typedlit(cents.map(_.v)),
      typedlit(cents.map(_.id)),
      typedlit(cents.map(_.normSq)))

  /** (d2, cell) argmin struct over the literal centroid set — the
    * table is sorted, so the argmin (lower-cell-id tie break
    * included) is element 1. */
  private def bestCell(v: Column, cents: Seq[Centroid]): Column =
    element_at(cellDists(v, cents), 1)

  /** Above this K, assignment switches from plan-literal centroids to
    * the broadcast-join path: K·d literal add/subtract terms stop
    * fitting whole-stage codegen long before they stop being correct,
    * and production coarse quantizers run K in the thousands. */
  val LiteralAssignMaxK = 64

  /** Assign every vector to its nearest centroid: `(id, v, cell, d2)`,
    * ties to the lower cell id. Small K: a pure shuffle-free
    * projection over literal centroids. Large K: a broadcast hash
    * join (the centroid table is still O(K·d) — broadcast, never
    * shuffled) + ONE map-side-combined min aggregate on a
    * lexicographic (d2, cell) struct — no window, no sort; the
    * aggregate's exchange carries one row per vector. */
  def assign(vecs: DataFrame, cents: Seq[Centroid]): DataFrame = {
    require(cents.nonEmpty, "need at least one centroid")
    NativeExpressions.register(vecs.sparkSession)
    if (cents.size <= LiteralAssignMaxK) {
      val best = bestCell(col("v"), cents)
      vecs.select(col("id"), col("v"),
        best.getField("cell").as("cell"), best.getField("d2").as("d2"))
    } else assignViaJoin(vecs, cents)
  }

  /** [[assign]]'s argmin as a bare COLUMN over an arbitrary vector
    * expression — for encoders that assign several independent
    * quantizers in one projection (product quantization: M subspace
    * codes per row, zero joins). Same total order as [[assign]]
    * (d2 ASC, cell ASC), literal-centroid path only. */
  def cellOf(v: Column, cents: Seq[Centroid]): Column = {
    require(cents.nonEmpty && cents.size <= LiteralAssignMaxK,
      s"cellOf embeds centroids as plan literals (≤ $LiteralAssignMaxK)")
    bestCell(v, cents).getField("cell")
  }

  private[graft] def assignViaJoin(vecs: DataFrame, cents: Seq[Centroid]): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val cdf = cents.map(c => (c.id, c.v, c.normSq)).toDF("c_id", "cv", "cc")
    val xx = call_function("dot_i64", col("v"), col("v"))
    vecs.crossJoin(broadcast(cdf))
      .select(col("id"), col("v"),
        struct(
          (xx - lit(2L) * call_function("dot_i64", col("v"), col("cv")) +
            col("cc")).as("d2"),
          col("c_id").as("cell")).as("cand"))
      .groupBy(col("id"))
      .agg(min(col("cand")).as("best"), first(col("v")).as("v"))
      .select(col("id"), col("v"),
        col("best.cell").as("cell"), col("best.d2").as("d2"))
  }

  /** IVF multiprobe: each vector's `nprobe` nearest cells, one row per
    * (id, cell) — still a pure projection + generate, no exchange.
    * Probe order is (d2 ASC, cell ASC), the same total order as
    * [[assign]], so probe 1 is always the assignment cell. */
  def probeCells(vecs: DataFrame, cents: Seq[Centroid], nprobe: Int): DataFrame = {
    require(nprobe > 0 && nprobe <= cents.size)
    require(cents.size <= LiteralAssignMaxK,
      s"probeCells embeds centroids as plan literals; beyond " +
        s"$LiteralAssignMaxK cells probe via a broadcast join + " +
        "rank over (d2, cell), the assignViaJoin shape")
    NativeExpressions.register(vecs.sparkSession)
    // cellDists is already (d2 ASC, cell ASC)-sorted — no re-sort
    val probes = slice(cellDists(col("v"), cents), 1, nprobe)
    vecs.select(col("id"), col("v"), explode(probes).as("p"))
      .select(col("id"), col("v"), col("p.cell").as("cell"))
  }

  /** Floor-mean recompute: one partial-sum shuffle, K rows out. */
  private def recompute(assigned: DataFrame): Seq[Centroid] =
    // ONE aggregate over whole vectors (vec_sum_i64, a k-bounded-state
    // TypedImperativeAggregate like topk_pairs): the hash aggregate
    // sees rows, not rows × dims — the old posexplode route paid a
    // 256× row blowup plus a second aggregate to restore element
    // order. Floor-mean per element is unchanged bit-for-bit.
    assigned
      // a null vector assigns to a null cell (the dot_i64 null
      // convention); the old posexplode route dropped such rows
      // implicitly — keep that contract instead of NPE-ing on the
      // driver when reading the null-cell group's key
      .filter(col("cell").isNotNull)
      .groupBy(col("cell"))
      .agg(call_function("vec_sum_i64", col("v")).as("ss"),
        count(lit(1)).as("n"))
      .selectExpr("cell",
        "transform(ss, s -> ((s - ((s % n) + n) % n) div n)) AS cv")
      .collect()
      .map(r => Centroid(r.getLong(0), r.getSeq[Long](1)))
      .toIndexedSeq.sortBy(_.id)

  /** Deterministic init: the k vectors with the smallest ids (a k-row
    * TakeOrdered — k driver rows, never a data-scale collect). */
  def initFirstK(vecs: DataFrame, k: Int): Seq[Centroid] =
    vecs.orderBy(col("id")).limit(k).collect()
      .map(r => Centroid(r.getLong(0), r.getSeq[Long](1)))
      .toIndexedSeq.sortBy(_.id)

  /** Farthest-first (k-center) init: seed with the smallest id, then
    * k−1 times add the vector farthest from its nearest centroid
    * (ties to the lower id). Each step is one TakeOrdered scan — a
    * 1-row driver collect, never a sort. Spreads seeds across the
    * data's extent, so Lloyd starts from distinct basins instead of
    * whatever the first k ids happen to be — the standard quality
    * upgrade for the IVF coarse quantizer, still fully deterministic. */
  def initFarthest(vecs: DataFrame, k: Int): Seq[Centroid] = {
    require(k > 0)
    var cents = initFirstK(vecs, 1)
    var exhausted = false
    for (_ <- 2 to k if !exhausted) {
      val far = assign(vecs, cents)
        .orderBy(col("d2").desc, col("id").asc).limit(1).collect()(0)
      // max distance 0 ⇒ every vector coincides with a seed: fewer
      // than k distinct points exist, and adding the "farthest" would
      // duplicate a seed id — stop with the distinct seeds found
      if (far.getLong(3) == 0L) exhausted = true
      else cents = (cents :+ Centroid(far.getLong(0), far.getSeq[Long](1)))
        .sortBy(_.id)
    }
    cents
  }

  /** [[fit]] from the farthest-first init. */
  def fitFarthest(vecs: DataFrame, k: Int, iters: Int): Seq[Centroid] = {
    var cents = initFarthest(vecs, k)
    for (_ <- 1 to iters) cents = recompute(assign(vecs, cents))
    cents
  }

  /** `iters` Lloyd updates from the first-k init. Each iteration is one
    * Spark job (scan + partial-sum aggregate); the loop state is K·d
    * driver-side longs, so lineage never grows with iterations. */
  def fit(vecs: DataFrame, k: Int, iters: Int): Seq[Centroid] = {
    require(k > 0 && iters >= 0)
    graft.functions.NativeExpressions.register(vecs.sparkSession)
    var cents = initFirstK(vecs, k)
    for (_ <- 1 to iters) cents = recompute(assign(vecs, cents))
    cents
  }

  /** Persist a fitted centroid table as a parquet artifact — the
    * train-once / search-many lifecycle: an ingestion-time trainer
    * publishes the quantizer, every later assignment / IVF search /
    * drift monitor loads it instead of re-running Lloyd. The artifact
    * is K rows of (c_id, cv), so one file regardless of the corpus
    * that trained it. */
  def save(model: Seq[Centroid], spark: org.apache.spark.sql.SparkSession,
           path: String): Unit = {
    require(model.nonEmpty, "refusing to save an empty centroid table")
    import spark.implicits._
    model.map(c => (c.id, c.v)).toDF("c_id", "cv")
      .coalesce(1).write.mode("errorifexists").parquet(path)
  }

  /** Load a [[save]]d centroid table. Round-trips exactly: quantized
    * components are longs, so load(save(m)) == m and every assignment
    * made with the loaded model is bit-identical. */
  def load(spark: org.apache.spark.sql.SparkSession,
           path: String): Seq[Centroid] = {
    val m = spark.read.parquet(path).select(col("c_id"), col("cv"))
      .collect()
      .map(r => Centroid(r.getLong(0), r.getSeq[Long](1)))
      .toIndexedSeq.sortBy(_.id)
    require(m.nonEmpty, s"no centroids at $path")
    m
  }

  /** M independent per-subspace Lloyd trainings (product-quantization
    * codebooks) fused into ONE distributed pass per step: assignment
    * is M literal-centroid argmins in a single scan, recompute
    * shuffles (m, cell, dim) partial sums in one aggregate. Results
    * are bit-identical to calling [[fit]] on each subspace slice
    * (same first-k init ids, same (d2, cell) total order, same
    * floor-mean update) — but the job count is O(1 + iters), not
    * O(M·(1 + iters)). At M=8 the per-job fixed overhead WAS the PQ
    * trainer's cost profile; the data-side work is unchanged. */
  def fitSubspaces(vecs: DataFrame, m: Int, subDims: Int, k: Int,
                   iters: Int): Seq[Seq[Centroid]] = {
    require(m > 0 && subDims > 0 && k > 0 && iters >= 0)
    NativeExpressions.register(vecs.sparkSession)
    val first = vecs.orderBy(col("id")).limit(k).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_._1)
    var books: Seq[Seq[Centroid]] = (0 until m).map { mi =>
      first.toSeq.map { case (id, v) =>
        Centroid(id, v.slice(mi * subDims, (mi + 1) * subDims))
      }
    }
    for (_ <- 1 to iters) {
      val subs = array((0 until m).map { mi =>
        val sv = slice(col("v"), mi * subDims + 1, subDims)
        struct(lit(mi).as("m"), cellOf(sv, books(mi)).as("cell"),
          sv.as("sv"))
      }: _*)
      // whole-subvector aggregation (see recompute): corpus × M rows
      // through the hash aggregate instead of corpus × dims
      val rows = vecs.select(explode(subs).as("s"))
        .select(col("s.m").as("m"), col("s.cell").as("cell"),
          col("s.sv").as("sv"))
        .filter(col("cell").isNotNull) // null subvector -> no contribution
        .groupBy(col("m"), col("cell"))
        .agg(call_function("vec_sum_i64", col("sv")).as("ss"),
          count(lit(1)).as("n"))
        .selectExpr("m", "cell",
          "transform(ss, s -> ((s - ((s % n) + n) % n) div n)) AS cv")
        .collect()
      books = (0 until m).map { mi =>
        rows.filter(_.getInt(0) == mi)
          .map(r => Centroid(r.getLong(1), r.getSeq[Long](2)))
          .sortBy(_.id).toSeq
      }
    }
    books
  }

  /** Per-cell population and inertia (Σ d2) under a centroid set. */
  def cellStats(vecs: DataFrame, cents: Seq[Centroid]): DataFrame =
    assign(vecs, cents)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("d2")).as("inertia"))
      .orderBy(col("cell"))

  /** Total inertia under a centroid set (driver-side scalar). */
  def inertia(vecs: DataFrame, cents: Seq[Centroid]): Long =
    assign(vecs, cents).agg(sum(col("d2"))).collect()(0).getLong(0)
}
