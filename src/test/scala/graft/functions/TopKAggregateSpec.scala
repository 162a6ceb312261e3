package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TopKAggregateSpec extends SparkSuite {
  import spark.implicits._

  private def topk(rows: Seq[(Long, Long, Long)], k: Int, parts: Int = 7) = {
    NativeExpressions.register(spark)
    rows.toDF("key", "ord", "id")
      .repartition(parts) // force partial buffers + serialize/merge
      .groupBy(col("key"))
      .agg(call_function("topk_pairs", col("ord"), col("id"), lit(k)).as("top"))
      .select(col("key"), col("top"))
      .as[(Long, Seq[(Long, Long)])].collect().toMap
  }

  test("keeps the k best pairs ranked ord desc, id asc, across many partitions") {
    val rows = (0L until 100L).map(i => (1L, i % 10, i)) // ords 0..9, 10 ids each
    val got = topk(rows, 3)
    // best ord is 9 (ids 9,19,..,99) — ties break on smallest id
    assert(got(1L) === Seq((9L, 9L), (9L, 19L), (9L, 29L)))
  }

  test("a group smaller than k returns all its rows, still ranked") {
    val got = topk(Seq((1L, 5L, 50L), (1L, 7L, 70L), (2L, 1L, 10L)), k = 10)
    assert(got(1L) === Seq((7L, 70L), (5L, 50L)))
    assert(got(2L) === Seq((1L, 10L)))
  }

  test("matches the window row_number formulation on random data") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 500L).map(i =>
      (i % 5, rnd.nextInt(40).toLong, i)) // heavy ties across 5 groups
    val got = topk(rows, 7)
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sortBy(p => (-p._1, p._2)).take(7)
    }
    assert(got === expected)
  }

  test("null ords are ignored like max_by") {
    NativeExpressions.register(spark)
    val got = Seq((1L, Some(3L), 30L), (1L, None, 99L), (1L, Some(5L), 50L))
      .toDF("key", "ord", "id")
      .groupBy(col("key"))
      .agg(call_function("topk_pairs", col("ord"), col("id"), lit(2)).as("top"))
      .select(col("top")).as[Seq[(Long, Long)]].head()
    assert(got === Seq((5L, 50L), (3L, 30L)))
  }

  test("the plan aggregates — no window, no global sort of candidates") {
    NativeExpressions.register(spark)
    val df = (0L until 64L).map(i => (i % 4, i, i)).toDF("key", "ord", "id")
      .groupBy(col("key"))
      .agg(call_function("topk_pairs", col("ord"), col("id"), lit(3)).as("top"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), plan)
    assert(!plan.contains("Window"), s"top-k agg must not plan a window:\n$plan")
  }
}
