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
