package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** `vec_sum_i64` — the element-wise vector-sum aggregate behind every
  * Lloyd update step (KMeans.recompute / fitSubspaces): rows, not
  * rows × dims, through the hash aggregate. */
class VecSumAggregateSpec extends SparkSuite {
  import spark.implicits._

  test("sums element-wise per group, positions never move") {
    NativeExpressions.register(spark)
    val df = Seq(
      (1L, Seq(1L, 2L, 3L)), (1L, Seq(10L, 20L, 30L)),
      (2L, Seq(-5L, 0L, 5L)))
      .toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(call_function("vec_sum_i64", col("v")).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got === Map(1L -> Seq(11L, 22L, 33L), 2L -> Seq(-5L, 0L, 5L)))
  }

  test("matches the posexplode+sum route on random vectors (the route it replaced)") {
    NativeExpressions.register(spark)
    val rnd = new scala.util.Random(7)
    val df = (0 until 500).map(i =>
      (i.toLong % 7, Seq.fill(16)(rnd.nextLong() % 1000)))
      .toDF("g", "v")
    val direct = df.groupBy(col("g"))
      .agg(call_function("vec_sum_i64", col("v")).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    val exploded = df
      .select(col("g"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("g"), col("pos")).agg(sum(col("x")).as("s"))
      .groupBy(col("g"))
      .agg(array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"))
      .selectExpr("g", "transform(ps, p -> p.s) AS s")
      .as[(Long, Seq[Long])].collect().toMap
    assert(direct === exploded)
  }

  test("null ELEMENTS contribute nothing — the posexplode sum-skips-null parity") {
    NativeExpressions.register(spark)
    val df = Seq((1L, Seq(Some(1L), None, Some(3L))),
      (1L, Seq(Some(10L), Some(20L), None)))
      .toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(call_function("vec_sum_i64", col("v")).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got === Map(1L -> Seq(11L, 20L, 3L)))
  }

  test("null arrays are ignored; ragged vectors refuse loudly") {
    NativeExpressions.register(spark)
    val withNull = Seq((1L, Some(Seq(1L, 2L))), (1L, None), (1L, Some(Seq(3L, 4L))))
      .toDF("g", "v")
    val got = withNull.groupBy(col("g"))
      .agg(call_function("vec_sum_i64", col("v")).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got === Map(1L -> Seq(4L, 6L)))
    val ragged = Seq((1L, Seq(1L, 2L)), (1L, Seq(1L, 2L, 3L))).toDF("g", "v")
    val e = intercept[Exception] {
      ragged.groupBy(col("g"))
        .agg(call_function("vec_sum_i64", col("v")).as("s")).collect()
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
  }

  test("non-long arrays are a type error at analysis, not mid-job") {
    NativeExpressions.register(spark)
    val bad = Seq((1L, Seq(1.5, 2.5))).toDF("g", "v")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.groupBy(col("g"))
        .agg(call_function("vec_sum_i64", col("v")).as("s")).collect()
    }
  }
}
