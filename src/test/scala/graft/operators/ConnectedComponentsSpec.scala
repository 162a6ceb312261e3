package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ConnectedComponentsSpec extends SparkSuite {
  import spark.implicits._

  test("chain, clique, and singleton resolve to min-id components") {
    // chain 1-2-3-4 (diameter > 1), clique {10,11}, singleton 20
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val got = ConnectedComponents.run(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("direction of input edges does not matter") {
    val vertices = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((3L, 2L), (2L, 1L)).toDF("src", "dst") // all "backwards"
    val got = ConnectedComponents.run(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet === Set(1L))
  }

  test("round count is diameter + 1 and the convergence flag needs no extra join") {
    val vertices = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val (got, rounds) = ConnectedComponents.runCounted(vertices, edges)
    assert(got.as[(Long, Long)].collect().toMap.values.forall(_ == 1L))
    assert(rounds === 4) // diameter 3 + 1 fixpoint-detection round
  }

  test("reliable checkpointing produces the same components and writes the dir") {
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    val vertices = Seq(1L, 2L, 3L, 10L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = ConnectedComponents.run(vertices, edges, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L))
    assert(new java.io.File(dir).listFiles().nonEmpty, "checkpoint dir used")
  }

  test("one exchange per round: the propagate join reuses aligned partitioning") {
    val vertices = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().repartition(col("src")).cache()
    sym.count()
    val comp = vertices.select(col("id"), col("id").as("comp")).localCheckpoint()
    // comp here is hash-partitioned only after round 1; emulate the
    // steady state by passing one round's output back in. AQE and
    // broadcast are disabled so the sort-merge path must stand on the
    // aligned hash partitioning alone.
    val conf = spark.conf
    val (aqe, bc) = (conf.get("spark.sql.adaptive.enabled"),
      conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val r1 = ConnectedComponents.round(sym, comp).localCheckpoint()
      val r2 = ConnectedComponents.round(sym, r1.select(col("id"), col("comp")))
      val exchanges = r2.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
      assert(exchanges === 1,
        s"want exactly the aggregation exchange in a steady-state round, got $exchanges")
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
      sym.unpersist()
    }
  }

  test("star contraction matches min-propagation on a random graph") {
    val rnd = new scala.util.Random(31)
    val n = 60L
    val vertices = (0L until n).toDF("id")
    val edges = Seq.fill(50)((rnd.nextLong(n), rnd.nextLong(n)))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val viaProp = ConnectedComponents.run(vertices, edges)
      .as[(Long, Long)].collect().toMap
    val (starDf, _) = ConnectedComponents.runStarContraction(vertices, edges)
    val viaStar = starDf.as[(Long, Long)].collect().toMap
    assert(viaStar === viaProp)
  }

  test("star contraction converges in O(log n) rounds on a 256-node path") {
    val n = 256L
    val vertices = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val (comp, rounds) = ConnectedComponents.runStarContraction(vertices, edges)
    assert(comp.as[(Long, Long)].collect().forall(_._2 == 1L))
    // min-propagation would need ~n rounds on this diameter; star
    // contraction is logarithmic (plus the convergence-detect round)
    assert(rounds <= 14, s"expected O(log n) rounds, got $rounds")
  }

  test("long path converges within the iteration cap") {
    val n = 20L
    val vertices = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val got = ConnectedComponents.run(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(got.values.forall(_ == 1L))
  }

  test("adaptive: converges inside the propagation budget on shallow graphs") {
    // near-clique + singleton — the common duplicate-graph shape; the
    // star-contraction finish must NOT run (rounds stay at the
    // propagation count, diameter + 1)
    val vertices = Seq(1L, 2L, 3L, 4L, 20L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val (comp, rounds) = ConnectedComponents.runAdaptive(vertices, edges)
    assert(comp.as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 20L -> 20L))
    assert(rounds <= 4, s"shallow graph should finish in propagation, got $rounds")
  }

  test("adaptive: a chain deeper than the budget completes via the quotient finish") {
    // 64-hop path with a tiny propagation budget: propagation alone
    // would refuse; adaptive must contract the partial labels and
    // finish with star contraction — every vertex at the true minimum
    val n = 65L
    val vertices = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val (comp, _) = ConnectedComponents.runAdaptive(vertices, edges, propRounds = 3)
    assert(comp.as[(Long, Long)].collect().forall(_._2 == 1L))
  }

  test("adaptive matches min-propagation on a random graph regardless of budget") {
    val rnd = new scala.util.Random(77)
    val n = 80L
    val vertices = (0L until n).toDF("id")
    val edges = Seq.fill(70)((rnd.nextLong(n), rnd.nextLong(n)))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val exact = ConnectedComponents.run(vertices, edges, maxIter = 100)
      .as[(Long, Long)].collect().toMap
    for (budget <- Seq(1, 2, 8)) {
      val (adf, _) = ConnectedComponents.runAdaptive(vertices, edges, propRounds = budget)
      assert(adf.as[(Long, Long)].collect().toMap === exact,
        s"budget=$budget diverged from the exact labeling")
    }
  }

  test("exhausting the round budget fails LOUDLY, never silently wrong") {
    // a 40-hop path outruns min-propagation's default 25 rounds; the
    // pre-fix behavior returned the under-converged labels (chain
    // tails keeping non-minimal components) — exactly the sf1
    // embedding-cluster bug. Star contraction handles the same graph
    // in O(log n) rounds.
    val n = 41L
    val vertices = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      ConnectedComponents.run(vertices, edges)
    }
    assert(e.getMessage.contains("did not converge"))
    val (comp, _) =
      ConnectedComponents.runStarContraction(vertices, edges)
    assert(comp.as[(Long, Long)].collect().forall(_._2 == 1L))
  }
}
