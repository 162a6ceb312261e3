package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSuite

class KMeansSpec extends SparkSuite {
  import spark.implicits._

  private def df(rows: (Long, Seq[Long])*) = rows.toDF("id", "v")

  test("two well-separated clusters converge to their floor means") {
    // cluster A around (0, 0), cluster B around (100, 100)
    val vecs = df(
      0L -> Seq(0L, 1L), 1L -> Seq(100L, 99L),
      2L -> Seq(1L, 0L), 3L -> Seq(99L, 100L),
      4L -> Seq(2L, 2L), 5L -> Seq(101L, 101L))
    val cents = KMeans.fit(vecs, k = 2, iters = 3)
    assert(cents.map(_.id) === Seq(0L, 1L))
    assert(cents(0).v === Seq(1L, 1L)) // floor mean of {0,1,2}×{1,0,2}
    assert(cents(1).v === Seq(100L, 100L))
    val byCell = KMeans.assign(vecs, cents)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    assert(byCell === Map(0L -> 0L, 2L -> 0L, 4L -> 0L,
      1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("null vectors contribute nothing to recompute (the posexplode-era contract)") {
    // a null v assigns to a null cell; the old posexplode aggregation
    // dropped it implicitly — the whole-vector aggregate must too,
    // not NPE on the driver reading a null-cell group key
    val rows = Seq[(Long, Option[Seq[Long]])](
      0L -> Some(Seq(0L, 1L)), 1L -> Some(Seq(100L, 99L)),
      2L -> Some(Seq(1L, 0L)), 3L -> Some(Seq(99L, 100L)),
      4L -> None, 5L -> None)
    val vecs = rows.toDF("id", "v")
    val clean = df(0L -> Seq(0L, 1L), 1L -> Seq(100L, 99L),
      2L -> Seq(1L, 0L), 3L -> Seq(99L, 100L))
    assert(KMeans.fit(vecs, k = 2, iters = 3) ===
      KMeans.fit(clean, k = 2, iters = 3))
  }

  test("inertia is non-increasing across Lloyd iterations") {
    // deterministic pseudo-random layout (no RNG: hash-ish arithmetic)
    val vecs = (0L until 40L).map { i =>
      i -> Seq((i * 37 % 101) - 50, (i * 53 % 97) - 48, (i * 71 % 89) - 44)
    }
    val d = df(vecs: _*)
    val inertias = (0 to 3).map(t => KMeans.inertia(d, KMeans.fit(d, 4, t)))
    assert(inertias.sliding(2).forall { case Seq(a, b) => b <= a },
      s"inertia must not increase: $inertias")
    assert(inertias.last < inertias.head, "training must actually improve")
  }

  test("fit is deterministic") {
    val d = df((0L until 20L).map(i => i -> Seq(i * 13 % 31, i * 7 % 23)): _*)
    assert(KMeans.fit(d, 3, 2) === KMeans.fit(d, 3, 2))
  }

  test("fitSubspaces is bit-identical to fitting each subspace slice") {
    // 4 subspaces × 2 dims, values spread so cells differ per subspace
    val m = 4
    val subDims = 2
    val d = df((0L until 24L).map { i =>
      i -> (0 until m * subDims).map(j => (i * (j * 2 + 13) % 67) - 30L)
    }: _*)
    for (iters <- 0 to 2) {
      val fused = KMeans.fitSubspaces(d, m, subDims, k = 3, iters = iters)
      val perSub = (0 until m).map { mi =>
        import org.apache.spark.sql.functions.{col, slice}
        KMeans.fit(
          d.select(col("id"),
            slice(col("v"), mi * subDims + 1, subDims).as("v")),
          k = 3, iters = iters)
      }
      assert(fused === perSub, s"diverged at iters=$iters")
    }
  }

  test("a cell that loses all members drops out; ids stay stable") {
    // init picks ids 0,1,2; ids 0 and 1 are duplicate points, so the
    // distance tie breaks to the lower cell id and cell 1 gets nothing
    val d = df(
      0L -> Seq(0L), 1L -> Seq(0L), 2L -> Seq(50L),
      3L -> Seq(0L), 4L -> Seq(50L), 5L -> Seq(0L), 6L -> Seq(50L))
    val cents = KMeans.fit(d, k = 3, iters = 2)
    assert(cents.map(_.id).toSet.subsetOf(Set(0L, 1L, 2L)))
    assert(cents.size < 3, "one centroid must have emptied")
    // stats remain consistent: every vector lands in a surviving cell
    val stats = KMeans.cellStats(d, cents).collect()
    assert(stats.map(_.getLong(1)).sum === 7L)
  }

  test("farthest-first init spreads seeds and beats first-k on clustered data") {
    // ids 0 and 1 are duplicate points: first-K(2) seeds both
    // centroids at (0,0), the tie collapses cell 1 to empty in round
    // one, and Lloyd is stuck with a single centroid forever.
    // Farthest-first can never pick a duplicate of an existing seed.
    val vecs = df(
      0L -> Seq(0L, 0L), 1L -> Seq(0L, 0L), 2L -> Seq(0L, 1L),
      3L -> Seq(1L, 0L),
      4L -> Seq(100L, 100L), 5L -> Seq(101L, 100L), 6L -> Seq(100L, 101L))
    val init = KMeans.initFarthest(vecs, 2)
    // seed 0, then the true farthest: (101,100) at d²=20201 beats
    // (100,100)'s 20000; the d²=20201 tie between ids 5 and 6 → 5
    assert(init.map(_.id) === Seq(0L, 5L))
    val far = KMeans.inertia(vecs, KMeans.fitFarthest(vecs, 2, 2))
    val first = KMeans.inertia(vecs, KMeans.fit(vecs, 2, 2))
    assert(KMeans.fit(vecs, 2, 2).size === 1, "first-K collapsed (by design)")
    assert(KMeans.fitFarthest(vecs, 2, 2).size === 2)
    assert(far < first,
      s"farthest init must separate the clusters: far=$far first=$first")
  }

  test("initFarthest stops at the distinct-point count instead of duplicating seeds") {
    val d = df(0L -> Seq(0L), 1L -> Seq(0L), 2L -> Seq(7L))
    // only two distinct points exist; k=3 must yield 2 distinct seeds
    val init = KMeans.initFarthest(d, 3)
    assert(init.map(_.id) === Seq(0L, 2L))
  }

  test("probeCells yields nprobe rows per vector, nearest-first, no shuffle") {
    val d = df(0L -> Seq(0L), 1L -> Seq(10L), 2L -> Seq(21L))
    val cents = Seq(KMeans.Centroid(0L, Seq(0L)),
      KMeans.Centroid(1L, Seq(10L)), KMeans.Centroid(2L, Seq(20L)))
    val probed = KMeans.probeCells(d, cents, nprobe = 2)
    assert(probed.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e }.isEmpty)
    val rows = probed.select("id", "cell").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(rows(0L) === Seq(0L, 1L)) // sort_array keeps (d2, cell) order
    assert(rows(1L) === Seq(1L, 0L)) // d2 to cell 0 (100) < cell 2 (121)
    assert(rows(2L) === Seq(2L, 1L))
    // probe 1 always equals the assignment cell
    val a = KMeans.assign(d, cents).select("id", "cell")
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, cells) => assert(cells.head === a(id)) }
  }

  test("literal and broadcast-join assignment paths agree exactly") {
    val vecs = df((0L until 30L).map(i =>
      i -> Seq(i * 37 % 101 - 50, i * 53 % 97 - 48)): _*)
    val cents = (0L until 6L).map(c =>
      KMeans.Centroid(c * 5, Seq(c * 29 % 101 - 50, c * 41 % 97 - 48)))
    val lit = KMeans.assign(vecs, cents)
      .select("id", "cell", "d2").as[(Long, Long, Long)].collect().sortBy(_._1)
    val join = KMeans.assignViaJoin(vecs, cents)
      .select("id", "cell", "d2").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(lit === join)
    // and the dispatch actually switches: >64 centroids must still work
    val many = (0L until 70L).map(c =>
      KMeans.Centroid(c, Seq(c % 101 - 50, c * 7 % 97 - 48)))
    val big = KMeans.assign(vecs, many)
    assert(big.count() === 30)
  }

  test("assignment is a pure projection — no shuffle exchange") {
    val d = df(0L -> Seq(1L, 2L), 1L -> Seq(3L, 4L))
    val cents = Seq(KMeans.Centroid(0L, Seq(1L, 2L)),
      KMeans.Centroid(1L, Seq(3L, 4L)))
    val plan = KMeans.assign(d, cents).queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"assignment must not exchange:\n$plan")
  }

  test("a saved model round-trips and assigns bit-identically") {
    val vecs = df(
      0L -> Seq(0L, 1L), 1L -> Seq(100L, 99L),
      2L -> Seq(1L, 0L), 3L -> Seq(99L, 100L))
    val model = KMeans.fit(vecs, k = 2, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("kmeans-model").toString + "/m"
    KMeans.save(model, spark, path)
    val loaded = KMeans.load(spark, path)
    assert(loaded === model)
    val a = KMeans.assign(vecs, model)
      .select("id", "cell", "d2").as[(Long, Long, Long)].collect().sorted
    val b = KMeans.assign(vecs, loaded)
      .select("id", "cell", "d2").as[(Long, Long, Long)].collect().sorted
    assert(a === b)
    // publishing over an existing artifact must fail, not overwrite
    intercept[Exception] { KMeans.save(model, spark, path) }
    ()
  }
}
