package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ScaleJoinsSpec extends SparkSuite {
  import spark.implicits._

  test("saltedJoin returns exactly the plain-join result") {
    val facts = (1L to 1000L).map(i => (i % 3, s"f$i")).toDF("k", "fv") // heavy skew on 3 keys
    val dims = Seq((0L, "a"), (1L, "b"), (2L, "c"), (9L, "unmatched")).toDF("k", "dv")
    val plain = facts.join(dims, "k").select("k", "fv", "dv")
      .as[(Long, String, String)].collect().toSet
    val salted = ScaleJoins.saltedJoin(facts, dims, "k", saltFactor = 8)
      .select("k", "fv", "dv").as[(Long, String, String)].collect().toSet
    assert(salted === plain)
    assert(salted.size === 1000)
  }

  test("deriveSaltFactor measures skew: hot key scales it, uniform keys disable it") {
    // uniform: every key appears once — no task can overflow, factor 1
    val uniform = (1L to 2000L).map(i => (i, "v")).toDF("k", "fv")
    assert(ScaleJoins.deriveSaltFactor(uniform, "k", targetTasks = 8,
      sampleFraction = 1.0) === 1)
    // one key owns half the table: it overflows a level task (1/8 of
    // rows) by ~4x -> factor 4
    val hot = ((1L to 1000L).map(_ => (7L, "hot")) ++
      (1L to 1000L).map(i => (i + 100L, "cold"))).toDF("k", "fv")
    assert(ScaleJoins.deriveSaltFactor(hot, "k", targetTasks = 8,
      sampleFraction = 1.0) === 4)
    // a single-key table derives ~targetTasks, clamped by maxFactor
    val onekey = (1L to 1000L).map(_ => (1L, "x")).toDF("k", "fv")
    assert(ScaleJoins.deriveSaltFactor(onekey, "k", targetTasks = 8,
      sampleFraction = 1.0) === 8)
    assert(ScaleJoins.deriveSaltFactor(onekey, "k", targetTasks = 100,
      sampleFraction = 1.0, maxFactor = 16) === 16)
    // sampled derivation lands on the same order for the hot table
    // (seeded -> deterministic), and the derived join is still exact
    val f = ScaleJoins.deriveSaltFactor(hot, "k", targetTasks = 8)
    assert(f >= 2 && f <= 8, s"sampled factor out of band: $f")
    val dims = ((1L to 1000L).map(i => i + 100L) :+ 7L).map((_, "d"))
      .toDF("k", "dv")
    val plain = hot.join(dims, "k").select("k", "fv", "dv")
      .as[(Long, String, String)].collect().toSet
    val derived = ScaleJoins.saltedJoinDerived(hot, dims, "k")
      .select("k", "fv", "dv").as[(Long, String, String)].collect().toSet
    assert(derived === plain)
    // empty facts: no evidence, factor 1 (and no crash)
    assert(ScaleJoins.deriveSaltFactor(uniform.filter(col("k") < 0L), "k",
      targetTasks = 8, sampleFraction = 1.0) === 1)
  }

  test("bucketedRangeJoin equals the plain BETWEEN join, across bucket spans") {
    // intervals deliberately span 1, 2, and 4 buckets at bucketMs=100;
    // bounds are inclusive on both ends
    val points = Seq(
      (1L, 0L, "p0"), (1L, 99L, "p99"), (1L, 100L, "p100"), (1L, 250L, "p250"),
      (1L, 399L, "p399"), (1L, 400L, "p400"), (2L, 250L, "q250"))
      .toDF("key", "ts_ms", "pv")
    val intervals = Seq(
      (1L, 0L, 99L, "i-a"),     // exactly one bucket
      (1L, 50L, 150L, "i-b"),   // two buckets
      (1L, 0L, 399L, "i-c"),    // four buckets
      (2L, 200L, 300L, "i-d"),  // other key
      (1L, 500L, 600L, "i-e"))  // matches nothing
      .toDF("key", "start_ms", "end_ms", "iv")
    val got = ScaleJoins.bucketedRangeJoin(points, intervals, 100L)
      .select("pv", "iv").as[(String, String)].collect().toSet
    val want = points.as("p").join(intervals.as("i"),
        col("p.key") === col("i.key") &&
          col("ts_ms").between(col("start_ms"), col("end_ms")))
      .select("pv", "iv").as[(String, String)].collect().toSet
    assert(got === want)
    assert(want === Set(
      ("p0", "i-a"), ("p99", "i-a"),
      ("p99", "i-b"), ("p100", "i-b"),
      ("p0", "i-c"), ("p99", "i-c"), ("p100", "i-c"), ("p250", "i-c"), ("p399", "i-c"),
      ("q250", "i-d")))
  }

  test("joining two same-bucketed tables runs without a shuffle exchange") {
    val left = (1L to 500L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 500L).map(i => (i, s"r$i")).toDF("k", "rv")
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
    ScaleJoins.writeBucketed(left, "b_left", "k", numBuckets = 4)
    ScaleJoins.writeBucketed(right, "b_right", "k", numBuckets = 4)

    val joined = ScaleJoins.readTable(spark, "b_left")
      .join(ScaleJoins.readTable(spark, "b_right"), "k")
    assert(joined.count() === 500)
    // the bucketed layout satisfies the join's distribution requirement:
    // no ShuffleExchange anywhere in the executed plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)

    spark.sql("DROP TABLE b_left")
    spark.sql("DROP TABLE b_right")
  }
}
