package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MinKAggregateSpec extends SparkSuite {
  import spark.implicits._

  private def mink(rows: Seq[(Long, Long)], k: Int, parts: Int = 7) = {
    NativeExpressions.register(spark)
    rows.toDF("key", "h")
      .repartition(parts) // force partial buffers + serialize/merge
      .groupBy(col("key"))
      .agg(call_function("min_k_distinct", col("h"), lit(k)).as("sk"))
      .select(col("key"), col("sk"))
      .as[(Long, Seq[Long])].collect().toMap
  }

  test("keeps the k smallest distinct values ascending, across many partitions") {
    val rows = (0L until 100L).map(i => (1L, 99L - i)) // 0..99 descending insert order
    assert(mink(rows, 5)(1L) === Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("duplicates never occupy a sketch slot") {
    val rows = Seq.fill(50)((1L, 7L)) ++ Seq((1L, 3L), (1L, 9L), (1L, 11L))
    assert(mink(rows, 3)(1L) === Seq(3L, 7L, 9L))
  }

  test("a group with fewer than k distinct values returns them all") {
    val got = mink(Seq((1L, 5L), (1L, 5L), (1L, 2L), (2L, 8L)), k = 10)
    assert(got(1L) === Seq(2L, 5L))
    assert(got(2L) === Seq(8L))
  }

  test("matches the distinct + rank-window formulation on random data") {
    val rnd = new scala.util.Random(29)
    val rows = (0 until 2000).map(_ => (rnd.nextInt(4).toLong, rnd.nextInt(300).toLong))
    val got = mink(rows, 16)
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).distinct.sorted.take(16)
    }
    assert(got === expected)
  }

  test("nulls are ignored") {
    NativeExpressions.register(spark)
    val got = Seq((1L, Some(3L)), (1L, None), (1L, Some(5L)))
      .toDF("key", "h")
      .groupBy(col("key"))
      .agg(call_function("min_k_distinct", col("h"), lit(4)).as("sk"))
      .select(col("sk")).as[Seq[Long]].head()
    assert(got === Seq(3L, 5L))
  }

  test("the plan aggregates — no corpus distinct, no rank window") {
    NativeExpressions.register(spark)
    val df = (0L until 64L).map(i => (i % 4, i)).toDF("key", "h")
      .groupBy(col("key"))
      .agg(call_function("min_k_distinct", col("h"), lit(3)).as("sk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("non-literal or non-positive k refuses at analysis") {
    NativeExpressions.register(spark)
    val df = Seq((1L, 2L)).toDF("key", "h")
    intercept[Exception] {
      df.groupBy(col("key"))
        .agg(call_function("min_k_distinct", col("h"), lit(0)).as("sk"))
        .collect()
    }
  }
}
